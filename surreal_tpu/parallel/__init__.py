from surreal_tpu.parallel.mesh import make_mesh, data_axis_size
from surreal_tpu.parallel.dp import (
    make_sharded_ddpg_step,
    make_sharded_ppo_lstm_step,
    make_sharded_ppo_step,
    replicate,
    shard_env_batch,
)
from surreal_tpu.parallel.param_sync import ParamSyncState, param_sync_init, param_sync_refresh
from surreal_tpu.parallel.tshard import time_sharded_reverse_scan
