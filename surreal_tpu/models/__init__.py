from surreal_tpu.models.actor_critic import PPOActorCritic
from surreal_tpu.models.ddpg_nets import DDPGActor, DDPGCritic
from surreal_tpu.models.distributions import DiagGauss
from surreal_tpu.models.z_filter import ZFilterState, zfilter_init, zfilter_normalize, zfilter_update
