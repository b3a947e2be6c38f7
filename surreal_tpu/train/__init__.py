from surreal_tpu.train.ddpg_trainer import DDPGTrainer
from surreal_tpu.train.ppo_trainer import PPOTrainer
