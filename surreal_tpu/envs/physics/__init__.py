from surreal_tpu.envs.physics.model import PlanarModel
from surreal_tpu.envs.physics import engine
