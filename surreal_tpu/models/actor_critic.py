"""PPO actor-critic network.

Role of the reference's `PPOModel` (`surreal/model/ppo_net.py`,
SURVEY.md §2): actor-critic with MLP torso for low-dim obs, optional conv
stem for pixels, optional LSTM, diagonal-Gaussian policy head with
state-independent log-std, separate value head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from surreal_tpu.models.blocks import MLP, ConvStem


class PPOActorCritic(nn.Module):
    action_dim: int
    hidden: Sequence[int] = (64, 64)
    activation: str = "tanh"
    init_log_std: float = 0.0
    pixel_obs: bool = False
    use_lstm: bool = False
    lstm_size: int = 128
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.pixel_obs:
            self.stem = ConvStem(compute_dtype=self.compute_dtype)
        self.actor_torso = MLP(self.hidden, self.activation, compute_dtype=self.compute_dtype)
        self.critic_torso = MLP(self.hidden, self.activation, compute_dtype=self.compute_dtype)
        self.mean_head = nn.Dense(
            self.action_dim,
            dtype=self.compute_dtype,
            kernel_init=nn.initializers.orthogonal(0.01),
        )
        self.value_head = nn.Dense(
            1, dtype=self.compute_dtype, kernel_init=nn.initializers.orthogonal(1.0)
        )
        self.log_std = self.param(
            "log_std", nn.initializers.constant(self.init_log_std), (self.action_dim,)
        )
        if self.use_lstm:
            self.lstm = nn.OptimizedLSTMCell(self.lstm_size, dtype=self.compute_dtype)

    def _encode(self, obs):
        return self.stem(obs) if self.pixel_obs else obs

    def __call__(self, obs, carry=None):
        """Returns (mean, log_std, value[, new_carry]). obs: (..., D) or
        pixels (..., H, W, C). With use_lstm, `carry` is the LSTM state."""
        x = self._encode(obs)
        if self.use_lstm:
            carry, x = self.lstm(carry, x.astype(self.compute_dtype))
        mean = self.mean_head(self.actor_torso(x)).astype(jnp.float32)
        value = self.value_head(self.critic_torso(x)).astype(jnp.float32)[..., 0]
        # Bounded state-independent log-std (reference keeps it free; the
        # clip only binds when training is already diverging — σ below
        # e^-8≈3e-4 or above e^2≈7.4 has no policy meaning on [-1,1] action
        # spaces and is the first step of the entropy-NaN death spiral seen
        # on finger-spin, results/finger_spin_ppo_r2).
        log_std = jnp.clip(self.log_std.astype(jnp.float32), -8.0, 2.0)
        if self.use_lstm:
            return mean, log_std, value, carry
        return mean, log_std, value

    def initial_carry(self, batch_shape=()):
        if not self.use_lstm:
            return None
        zeros = jnp.zeros(batch_shape + (self.lstm_size,), self.compute_dtype)
        return (zeros, zeros)
