from surreal_tpu.train.ppo_trainer import PPOTrainer
