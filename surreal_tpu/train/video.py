"""Eval video recording.

Role of the reference's video wrapper (`surreal/env/video_env.py`,
SURVEY.md §2/§3.5: periodic eval rollouts recorded to video files). Two
render backends:
- 'raster': the on-device SDF rasterizer (works for contact domains,
  no GL needed) — frames come straight off the recorded q-trajectory.
- 'mujoco': ground-truth dm_control GL rendering of the same q-trajectory
  replayed through the host oracle (requires MUJOCO_GL=egl).
Output is an animated GIF (PIL; no ffmpeg dependency in the image).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from surreal_tpu.envs import base as env_base


def rollout_states(env, policy_fn, params, steps: int, seed: int = 0,
                   zfilter=None, flatten=None):
    """Run ONE env under the deterministic policy; return the q trajectory
    (steps, nv) plus episode return."""
    from surreal_tpu.models.z_filter import zfilter_normalize

    flatten = flatten or env_base.flatten_obs
    reset_fn, step_fn = env_base.vectorize(env)
    key = jax.random.PRNGKey(seed)

    def run():
        env_state, ts = reset_fn(jax.random.split(key, 1))
        obs = flatten(ts.obs)

        def step(carry, _):
            env_state, obs, ret = carry
            o = zfilter_normalize(zfilter, obs) if zfilter is not None else obs
            action = policy_fn(params, o)
            env_state, ts = step_fn(env_state, action)
            return (env_state, flatten(ts.carry_obs), ret + ts.reward), env_state.q[0]

        (_, _, ret), qs = jax.lax.scan(step, (env_state, obs, jnp.zeros(1)), None, length=steps)
        return qs, ret[0]

    qs, ret = jax.jit(run)()
    return np.asarray(qs), float(ret)


def save_gif(frames: np.ndarray, path: str, fps: int = 40) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:],
        duration=max(int(1000 / fps), 20), loop=0,
    )


def record_video(env, policy_fn, params, path: str, steps: int = 400, seed: int = 0,
                 zfilter=None, flatten=None, backend: str = "raster",
                 size: int = 168) -> float:
    """Record a deterministic-policy rollout to an animated GIF. Returns
    the episode return over the recorded steps."""
    qs, ret = rollout_states(env, policy_fn, params, steps, seed, zfilter, flatten)
    base_env = getattr(env, "env", env)  # unwrap PixelWrapper
    if backend == "raster":
        from surreal_tpu.envs.render import make_renderer

        render = jax.jit(jax.vmap(make_renderer(base_env.model, size, size)))
        frames = np.asarray(render(jnp.asarray(qs)))
    elif backend == "mujoco":
        frames = _mujoco_frames(base_env, qs, size)
    else:
        raise ValueError(backend)
    save_gif(frames, path)
    return ret


def _mujoco_frames(env, qs: np.ndarray, size: int) -> np.ndarray:
    """Ground-truth GL rendering: replay the q trajectory in dm_control."""
    os.environ.setdefault("MUJOCO_GL", "egl")
    from dm_control import suite

    domain = type(env).__module__.rsplit(".", 1)[-1]
    name_map = {"cheetah": ("cheetah", "run"), "walker": ("walker", "walk"),
                "cartpole": ("cartpole", "balance")}
    dom, task = name_map[domain]
    denv = suite.load(dom, task)
    frames = []
    denv.reset()
    for q in qs:
        denv.physics.data.qpos[:] = q
        import mujoco

        mujoco.mj_forward(denv.physics.model._model, denv.physics.data._data)
        frames.append(denv.physics.render(size, size, camera_id=0))
    return np.stack(frames)
