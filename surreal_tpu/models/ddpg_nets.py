"""DDPG actor and critic networks.

Role of the reference's `surreal/model/ddpg_net.py` [SURVEY.md §2]:
tanh-squashed deterministic actor, critic over (obs, action), optional
layer norm (the reference exposes batch/layer-norm toggles; we use
LayerNorm which is batch-size independent and jit-friendly).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from surreal_tpu.models.blocks import MLP, ConvStem


class DDPGActor(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (300, 200)
    layer_norm: bool = True
    pixel_obs: bool = False
    # Shared-encoder mode (DDPGConfig.shared_encoder, SAC-AE/DrQ-style): the
    # actor's conv stem is a stop-gradient COPY of the critic's, refreshed
    # from critic_params after every critic update (algos/ddpg._sync_encoder)
    # — the encoder learns only through the TD loss; the actor loss cannot
    # drag it toward degenerate features.
    detach_stem: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs):
        if self.pixel_obs:
            x = ConvStem(compute_dtype=self.compute_dtype)(obs)
            if self.detach_stem:
                x = jax.lax.stop_gradient(x)
        else:
            x = obs
        x = MLP(self.hidden, "relu", self.layer_norm, self.compute_dtype)(x)
        a = nn.Dense(
            self.action_dim,
            dtype=self.compute_dtype,
            kernel_init=nn.initializers.variance_scaling(1e-3, "fan_in", "uniform"),
        )(x)
        return jnp.tanh(a.astype(jnp.float32))


class DDPGCritic(nn.Module):
    hidden: Sequence[int] = (400, 300)
    layer_norm: bool = True
    pixel_obs: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs, action):
        x = ConvStem(compute_dtype=self.compute_dtype)(obs) if self.pixel_obs else obs
        x = jnp.concatenate([x, action], axis=-1)
        x = MLP(self.hidden, "relu", self.layer_norm, self.compute_dtype)(x)
        q = nn.Dense(
            1,
            dtype=self.compute_dtype,
            kernel_init=nn.initializers.variance_scaling(1e-3, "fan_in", "uniform"),
        )(x)
        return q.astype(jnp.float32)[..., 0]
