from surreal_tpu.data.replay import ReplayState, replay_init, replay_insert, replay_sample_nstep
