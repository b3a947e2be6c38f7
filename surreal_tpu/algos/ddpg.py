"""DDPG: uniform HBM replay + target networks (SURVEY.md §2 DDPG rows).

Implemented in surreal_tpu.algos.ddpg — see DDPGConfig/train_step below.
(Filled in after the PPO end-to-end slice; placeholder keeps imports valid.)
"""
