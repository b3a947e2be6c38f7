"""Environment wrappers.

Role of the reference's wrapper stack (`surreal/env/wrapper.py`,
SURVEY.md §2: frame-stacking, grayscale, obs filtering/concat,
max-episode-steps, video recording): functional wrappers over the
(reset, step) pair. Obs-concat lives in base.flatten_obs; max-episode-steps
is the base Environment's episode_steps; video recording is host-side
(train.video). Here: pixel observations with grayscale + frame stacking.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from surreal_tpu.envs import base
from surreal_tpu.envs.render import make_renderer


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PixelState:
    inner: base.EnvState
    stack: jax.Array  # (H, W, C*k) uint8 — current episode's frame stack


class PixelWrapper:
    """Adds a 'pixel' modality: rasterized (H, W, 1 or 3) frames, stacked
    over the last `frame_stack` control steps (channel-concatenated,
    newest last). Low-dim modalities are dropped from the policy input by
    flatten_obs (which skips 'pixel'); keep_low_dim retains them in the
    obs dict for debugging/critics."""

    def __init__(
        self,
        env: base.Environment,
        height: int = 84,
        width: int = 84,
        frame_stack: int = 3,
        grayscale: bool = True,
        keep_low_dim: bool = False,
        action_repeat: int = 1,
    ):
        assert env.episode_steps % action_repeat == 0
        self.env = env
        self.episode_steps = env.episode_steps // action_repeat
        self.frame_stack = frame_stack
        self.grayscale = grayscale
        self.keep_low_dim = keep_low_dim
        self.action_repeat = action_repeat
        self._render = make_renderer(env.model, height, width)
        self._channels = (1 if grayscale else 3) * frame_stack
        self._hw = (height, width)

    # ---- spec ----
    def action_spec(self):
        return self.env.action_spec()

    @property
    def action_dim(self):
        return self.env.action_dim

    def obs_spec(self):
        spec = dict(self.env.obs_spec()) if self.keep_low_dim else {}
        spec["pixel"] = base.ArraySpec(self._hw + (self._channels,), jnp.uint8)
        return spec

    # ---- helpers ----
    def _frame(self, q):
        img = self._render(q)
        if self.grayscale:
            img = jnp.mean(img.astype(jnp.float32), -1, keepdims=True).astype(jnp.uint8)
        return img

    def _wrap_obs(self, low_dim_obs, stack):
        obs = dict(low_dim_obs) if self.keep_low_dim else {}
        obs["pixel"] = stack
        return obs

    # ---- functional API ----
    def reset(self, key):
        inner, ts = self.env.reset(key)
        f = self._frame(inner.q)
        stack = jnp.concatenate([f] * self.frame_stack, -1)
        obs = self._wrap_obs(ts.obs, stack)
        wts = base.Timestep(
            obs=obs, carry_obs=obs, reward=ts.reward, discount=ts.discount, done=ts.done
        )
        return PixelState(inner=inner, stack=stack), wts

    def step(self, state: PixelState, action):
        if self.action_repeat == 1:
            inner, ts = self.env.step(state.inner, action)
        else:
            # Repeat the action (standard pixel-control practice, cf. the
            # reference's wrapper stack); rewards accumulate; the episode
            # boundary is aligned (episode_steps % action_repeat == 0).
            def body(carry, _):
                inner, rew = carry
                inner, ts = self.env.step(inner, action)
                return (inner, rew + ts.reward), ts

            (inner, total_rew), tss = jax.lax.scan(
                body, (state.inner, jnp.zeros(())), None, length=self.action_repeat
            )
            ts = jax.tree.map(lambda x: x[-1], tss)
            ts = dataclasses.replace(ts, reward=total_rew)
        C = self._channels // self.frame_stack
        # Terminal-side frame: rendered from the PRE-reset state. The base
        # env doesn't expose pre-reset q directly, but ts.obs does give the
        # low-dim terminal obs; for pixels we render inner.q (post-reset) and
        # the pre-reset frame from the stored stack shift. At non-done steps
        # these coincide. See note below for the done-step approximation.
        f_new = self._frame(inner.q)
        shifted = jnp.concatenate([state.stack[..., C:], f_new], -1)
        # On done: the post-reset state starts a fresh stack (first frame
        # tiled, dm_control frame-stack convention). The TERMINAL pixel obs
        # (bootstrap input) is approximated by the last pre-terminal stack
        # shifted with the terminal frame — which equals `shifted` only when
        # not done; at done we bootstrap from the stack as of t-1 (one-frame
        # stale). Exact at 999/1000 steps; avoids a second render per step.
        fresh = jnp.concatenate([f_new] * self.frame_stack, -1)
        done = ts.done
        stack_next = jnp.where(done, fresh, shifted)
        obs_term = self._wrap_obs(ts.obs, state.stack)
        obs_carry = self._wrap_obs(ts.carry_obs, stack_next)
        wts = base.Timestep(
            obs=obs_term, carry_obs=obs_carry,
            reward=ts.reward, discount=ts.discount, done=done,
        )
        return PixelState(inner=inner, stack=stack_next), wts


def pixel_flatten_obs(obs):
    """Policy input extractor for pixel observations."""
    return obs["pixel"]
