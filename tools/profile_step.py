"""Profile the fused PPO train step on-chip (SURVEY.md §5 tracing row).

Produces, for a given env/num_envs shape:
  1. results/profile_<tag>/tb/...   - raw jax.profiler trace (TensorBoard
     profile plugin artifact; xplane.pb inside)
  2. results/profile_<tag>.txt      - stage-decomposition timings (full
     train step vs rollout vs update vs raw env scan vs NN-only scan)
     plus the top-K device ops by self-time parsed from the trace.

Usage:
    python tools/profile_step.py --env cheetah-run --num-envs 256
    python tools/profile_step.py --env hopper-stand --num-envs 128 [--cpu]

The stage decomposition answers "where does the iteration go" without any
trace tooling; the xplane parse attributes it to individual HLO ops.
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _force(out):
    """Host-fetch the smallest output leaf: on the axon tunnel backend
    block_until_ready can return before remote execution finishes (measured:
    a 171 ms step 'completes' in 0.6 ms); a device_get of any output buffer
    genuinely waits for the program."""
    import jax
    import numpy as np

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "shape")]
    smallest = min(leaves, key=lambda x: x.size)
    np.asarray(jax.device_get(smallest))


def timeit(fn, *args, iters=10, warmup=2):
    """Median wall seconds per call of an already-jitted fn."""
    for _ in range(warmup):
        _force(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def parse_xplane_top_ops(logdir: str, k: int = 15):
    """Parse the trace's xplane.pb for per-op self-times, in a subprocess
    (the plugin's protos need PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python
    which must be set before protobuf import). Returns list of
    (self_time_us, occurrences, op_name) or None."""
    paths = glob.glob(os.path.join(logdir, "plugins/profile/*/*.xplane.pb"))
    if not paths:
        return None
    src = r"""
import collections, json, sys
from tensorflow.tsl.profiler.protobuf import xplane_pb2
xs = xplane_pb2.XSpace()
xs.ParseFromString(open(sys.argv[1], 'rb').read())
per_op = collections.Counter()
occ = collections.Counter()
# device planes when present (TPU/GPU); the CPU backend's op timeline
# lives on '/host:CPU'
planes = [p for p in xs.planes
          if p.name.lower().startswith('/device') or 'tpu' in p.name.lower()]
if not planes:
    planes = [p for p in xs.planes if p.name == '/host:CPU']
for plane in planes:
    for line in plane.lines:
        for ev in line.events:
            md = plane.event_metadata[ev.metadata_id]
            per_op[md.name] += ev.duration_ps / 1e6  # -> us
            occ[md.name] += 1
rows = sorted(((t, occ[n], n) for n, t in per_op.items()), reverse=True)
print(json.dumps(rows[:%d]))
""" % k
    env = dict(os.environ, PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python")
    try:
        out = subprocess.run(
            [sys.executable, "-c", src, max(paths, key=os.path.getmtime)],
            capture_output=True, text=True, timeout=300, env=env,
        )
        if out.returncode != 0:
            return [("PARSE_ERROR", 0, out.stderr[-400:])]
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:  # noqa: BLE001 - diagnostic tool, record and move on
        return [("PARSE_ERROR", 0, repr(e))]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", default="cheetah-run")
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--horizon", type=int, default=128)
    p.add_argument("--iters", type=int, default=3, help="trace iterations")
    p.add_argument("--tag", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--no-trace", action="store_true",
                   help="stage decomposition only (skip jax.profiler)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_surreal")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    from functools import partial

    from surreal_tpu.algos import ppo
    from surreal_tpu.envs import base as env_base
    from surreal_tpu.train import PPOTrainer
    from surreal_tpu.utils import profiling

    tag = args.tag or f"{args.env.replace('-', '_')}_{args.num_envs}"
    out_txt = os.path.join(ROOT, "results", f"profile_{tag}.txt")
    logdir = os.path.join(ROOT, "results", f"profile_{tag}", "tb")

    cfg = ppo.PPOConfig(horizon=args.horizon, epochs=4, num_minibatches=8)
    trainer = PPOTrainer(args.env, cfg, num_envs=args.num_envs, seed=0,
                         hidden=(256, 256))
    env = trainer.env
    _, step_fn = env_base.vectorize(env)
    apply_fn = trainer.net.apply

    lines = [f"# {' '.join(sys.argv)}",
             f"# backend={jax.default_backend()} devices={jax.device_count()}",
             f"# env={args.env} num_envs={args.num_envs} horizon={args.horizon}"]

    key = jax.random.PRNGKey(0)

    # ---- stage pieces, each jitted standalone ----
    full = trainer._train_step
    roll = jax.jit(partial(ppo.rollout, cfg, apply_fn, step_fn, trainer._flatten))
    upd = jax.jit(partial(ppo.update, cfg, apply_fn))

    traj, env_state2, obs2, ep2, _ = roll(
        trainer.state, trainer.env_state, trainer.obs, trainer.ep_ret, key)
    jax.block_until_ready(traj.reward)

    # raw env scan: physics + reward + obs, zero-action, no NN
    def env_scan(env_state, action):
        def body(s, _):
            s, ts = step_fn(s, action)
            return s, ts.reward
        return jax.lax.scan(body, env_state, None, length=args.horizon)

    env_scan_j = jax.jit(env_scan)
    zero_act = jnp.zeros((args.num_envs, env.action_dim), jnp.float32)

    # NN-only scan: policy+value forward + sample, horizon times, no env
    def nn_scan(params, obs, key):
        def body(carry, key_t):
            obs, = carry
            mean, log_std, value = apply_fn(params, obs)
            from surreal_tpu.models.distributions import DiagGauss
            a = DiagGauss.sample(key_t, mean, log_std)
            # feed something obs-shaped back so the scan isn't dead-code
            obs = obs + value[:, None] * 0 + a.sum() * 0
            return (obs,), None
        keys = jax.random.split(key, args.horizon)
        (obs,), _ = jax.lax.scan(body, (obs,), keys)
        return obs

    nn_scan_j = jax.jit(nn_scan)

    t_full = timeit(lambda: full(trainer.state, trainer.env_state, trainer.obs,
                                 trainer.ep_ret, key))
    t_roll = timeit(lambda: roll(trainer.state, trainer.env_state, trainer.obs,
                                 trainer.ep_ret, key))
    t_upd = timeit(lambda: upd(trainer.state, traj, key))
    t_env = timeit(lambda: env_scan_j(trainer.env_state, zero_act))
    t_nn = timeit(lambda: nn_scan_j(trainer.state.params, trainer.obs, key))

    sps = args.horizon * args.num_envs / t_full
    lines += [
        "",
        "## Stage decomposition (median wall s per iteration-equivalent)",
        f"full_train_step      {t_full * 1e3:9.2f} ms   ({sps:,.0f} env-steps/s)",
        f"rollout_only         {t_roll * 1e3:9.2f} ms   ({100 * t_roll / t_full:.0f}% of full)",
        f"update_only          {t_upd * 1e3:9.2f} ms   ({100 * t_upd / t_full:.0f}% of full)",
        f"env_scan_no_nn       {t_env * 1e3:9.2f} ms   ({100 * t_env / t_full:.0f}% of full; physics+reward+obs only)",
        f"nn_scan_no_env       {t_nn * 1e3:9.2f} ms   ({100 * t_nn / t_full:.0f}% of full; policy fwd+sample only)",
        f"substeps/control-step: {getattr(env, 'n_substeps', '?')}",
    ]

    if not args.no_trace:
        with profiling.trace(logdir):
            for _ in range(args.iters):
                out = full(trainer.state, trainer.env_state, trainer.obs,
                           trainer.ep_ret, key)
            jax.block_until_ready(out[0].params)
        top = parse_xplane_top_ops(logdir)
        lines += ["", f"## Top device ops by self-time ({args.iters} traced iterations; us total)"]
        if top is None:
            lines.append("NO XPLANE ARTIFACT FOUND under " + logdir)
        else:
            for t_us, n, name in top:
                lines.append(f"{t_us if isinstance(t_us, str) else round(t_us, 1):>12}  x{n:<6} {name[:120]}")

    txt = "\n".join(lines) + "\n"
    with open(out_txt, "w") as f:
        f.write(txt)
    print(txt)


if __name__ == "__main__":
    main()
