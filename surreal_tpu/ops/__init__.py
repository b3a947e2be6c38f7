from surreal_tpu.ops.returns import discounted_reverse_scan, gae, nstep_returns
