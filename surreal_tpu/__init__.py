"""surreal_tpu: a TPU-native distributed RL framework.

A ground-up re-design of the capabilities of SurrealAI/surreal (distributed
actor-learner RL: PPO with GAE + clipped surrogate / adaptive KL, DDPG with
uniform replay and target networks, dm_control-class continuous control) as a
single SPMD JAX program:

- Thousands of vectorized environments step in lockstep under ``jit`` on
  sharded hosts (``surreal_tpu.envs``, JAX-native planar physics).
- Rollouts land in HBM-resident trajectory / replay buffers
  (``surreal_tpu.data``).
- Fused, jitted train steps update a sharded learner (``surreal_tpu.algos``,
  with Pallas kernels in ``surreal_tpu.ops``).
- Parameter broadcast and gradient reduction ride ICI/DCN collectives
  (``surreal_tpu.parallel``) instead of ZMQ sockets; Kubernetes orchestration
  collapses to one mesh definition.

See SURVEY.md at the repo root for the structural analysis of the reference
and the mapping from its components (surreal.agent, surreal.replay,
surreal.learner, surreal.distributed, caraml, symphony, tensorplex) onto the
modules here.
"""

__version__ = "0.1.0"
