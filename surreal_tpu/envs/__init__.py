from surreal_tpu.envs.base import ArraySpec, Environment, EnvState, Timestep, vectorize
from surreal_tpu.envs.registry import available_envs, make_env
from surreal_tpu.envs.rewards import tolerance
