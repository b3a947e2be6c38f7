"""Reusable network blocks.

Role of the reference's `surreal/model/model_builders/` [SURVEY.md §2]:
MLP torsos for low-dim observations, a conv stem for 84×84-ish pixel
observations, weight init. Flax modules; matmuls land on the MXU, compute
dtype is configurable (bfloat16 by default on TPU, params stay f32).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    """MLP torso: hidden layers with activation, optional LayerNorm."""

    hidden: Sequence[int]
    activation: str = "tanh"
    layer_norm: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        x = x.astype(self.compute_dtype)
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, dtype=self.compute_dtype, name=f"dense_{i}")(x)
            if self.layer_norm and i == 0:
                x = nn.LayerNorm(dtype=self.compute_dtype)(x)
            x = act(x)
        return x


class ConvStem(nn.Module):
    """Conv encoder for pixel observations (84×84×C uint8 or stacked
    frames), DQN/Surreal-style: 3 conv layers then a projection."""

    features: Sequence[int] = (32, 64, 64)
    kernels: Sequence[int] = (8, 4, 3)
    strides: Sequence[int] = (4, 2, 1)
    out_dim: int = 256
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.dtype == jnp.uint8:
            x = x.astype(self.compute_dtype) / 255.0
        else:
            x = x.astype(self.compute_dtype)
        for f, k, s in zip(self.features, self.kernels, self.strides):
            x = nn.Conv(f, (k, k), strides=(s, s), dtype=self.compute_dtype)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[:-3] + (-1,))
        x = nn.Dense(self.out_dim, dtype=self.compute_dtype)(x)
        return nn.relu(x)
