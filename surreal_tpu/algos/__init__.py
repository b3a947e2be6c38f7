from surreal_tpu.algos import ppo
from surreal_tpu.algos import ddpg
