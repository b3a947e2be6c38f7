"""surreal-tpu CLI: train / eval / bench / envs.

Role of the reference's CLIs (`surreal-subproc`, `surreal-tmux`,
`surreal-kube` [SURVEY.md §2, §3.1]): where the reference launches a
constellation of processes (agents, eval, learner, replay, ps, tensorplex,
loggerplex, tensorboard) on a machine or a Kubernetes cluster, the TPU
build IS one SPMD program — so a single `train` subcommand replaces all
three launchers, and multi-host runs differ only by `--session.multihost.*`
flags (jax.distributed handles discovery).

Usage:
    python -m surreal_tpu.cli.main train ppo --env.env_name cheetah-run \
        --session.experiment_name run1 --learner.lr 1e-4
    python -m surreal_tpu.cli.main eval --experiment results/run1 [--best]
    python -m surreal_tpu.cli.main envs
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from surreal_tpu.cli.configs import generate_configs, to_algo_config
from surreal_tpu.utils import get_logger


def _parse_overrides(unknown: list[str]) -> dict:
    """--learner.lr 1e-4 --env.num_envs 512 ... -> nested override dict."""
    from surreal_tpu.config import Config

    out = Config({"learner": {}, "env": {}, "session": {}})
    i = 0
    while i < len(unknown):
        tok = unknown[i]
        if not tok.startswith("--"):
            raise SystemExit(f"unexpected argument {tok!r}")
        key = tok[2:]
        if "=" in key:
            key, val = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(unknown):
                raise SystemExit(f"missing value for {tok!r}")
            val = unknown[i + 1]
            i += 2
        out.set_dotted(key, val)
    return out.to_dict()


def _make_mesh(session):
    """session.mesh.{data,model,time} -> Mesh or None (single device).
    data=None leaves the trainer unsharded; data='all' or an int builds the
    mesh (the reference's symphony topology collapsed to axis sizes).
    model>1 selects the GSPMD tensor-parallel PPO step; time>1 shards the
    GAE scan over the time axis (both golden-tested in tests/test_tp.py;
    DDPG accepts the data axis only and rejects the others)."""
    m = session.mesh
    if m.data is None and int(m.model) == 1 and int(m.time) == 1:
        return None
    from surreal_tpu.parallel.mesh import make_mesh

    data = None if m.data in (None, "all") else int(m.data)
    return make_mesh(data=data, model=int(m.model), time=int(m.time))


def _build_trainer(learner, env_cfg, session):
    import jax.numpy as jnp

    seed = int(session.seed)
    algo_cfg = to_algo_config(learner)
    mesh = _make_mesh(session)
    # bf16 training knob (SURVEY.md §7: bf16 matmul on the MXU) — the
    # network's compute dtype; params/optimizer stay f32 (flax convention).
    dtype = jnp.dtype(str(learner.compute_dtype))
    if learner.algo == "ppo":
        from surreal_tpu.train import PPOTrainer

        return PPOTrainer(
            env_cfg.env_name, algo_cfg, num_envs=int(env_cfg.num_envs), seed=seed,
            hidden=tuple(learner.hidden), mesh=mesh, compute_dtype=dtype,
            pixel_obs=bool(env_cfg.pixel_obs),
            pixel_kwargs=env_cfg.pixel.to_dict() if env_cfg.pixel_obs else None,
            use_lstm=bool(learner.use_lstm), lstm_size=int(learner.lstm_size),
            overlap=bool(learner.overlap),
        )
    else:
        from surreal_tpu.train import DDPGTrainer

        return DDPGTrainer(
            env_cfg.env_name, algo_cfg, num_envs=int(env_cfg.num_envs), seed=seed,
            actor_hidden=tuple(learner.actor_hidden),
            critic_hidden=tuple(learner.critic_hidden), mesh=mesh,
            compute_dtype=dtype,
            pixel_obs=bool(env_cfg.pixel_obs),
            pixel_kwargs=env_cfg.pixel.to_dict() if env_cfg.pixel_obs else None,
        )


def cmd_train(algo: str, overrides: dict) -> int:
    from surreal_tpu.parallel.mesh import distributed_init

    learner, env_cfg, session = generate_configs(algo, overrides)
    log = get_logger("cli")
    mh = session.multihost
    distributed_init(mh.coordinator, mh.num_processes, mh.process_id)
    import jax

    primary = jax.process_index() == 0  # single-writer host-side IO

    exp_dir = os.path.join(session.results_dir, session.experiment_name)
    os.makedirs(exp_dir, exist_ok=True)
    if primary:
        with open(os.path.join(exp_dir, "config.json"), "w") as f:
            f.write(
                json.dumps(
                    {"learner": learner.to_dict(), "env": env_cfg.to_dict(),
                     "session": session.to_dict()},
                    indent=2, default=str,
                )
            )

    trainer = _build_trainer(learner, env_cfg, session)

    from surreal_tpu.train.checkpoint import Checkpointer
    from surreal_tpu.train.metrics import MetricsWriter

    ckpt = Checkpointer(
        os.path.join(exp_dir, "checkpoints"), keep_latest=int(session.keep_latest_checkpoints)
    )
    tb = MetricsWriter(
        os.path.join(exp_dir, "tb") if (session.tensorboard and primary) else None
    )

    # ---- resume (SURVEY.md §5 checkpoint/resume: the FULL training state —
    # params/opt/Z-filter/env batch/replay/RNG/counters — survives a kill) ----
    restore = str(session.restore).lower()
    latest = ckpt.latest_step()
    if restore in ("auto", "true", "1") and latest is not None:
        trainer.load_full_state(ckpt.restore(trainer.full_state))
        log.info("resumed from checkpoint @ %d env steps (iter %d)",
                 latest, trainer.global_iter)
    elif restore in ("true", "1"):
        raise SystemExit(f"--session.restore true but no checkpoint under {exp_dir}")

    steps_per_iter = trainer.steps_per_iteration
    total_iters = max(int(session.total_env_steps) // steps_per_iter, 1)
    eval_every = max(int(session.eval_every_steps) // steps_per_iter, 1)
    ckpt_every = max(int(session.checkpoint_every_steps) // steps_per_iter, 1)
    seg = max(min(eval_every, ckpt_every), 1)
    log.info(
        "experiment %s: %s on %s, %d iters (%d env-steps/iter)",
        session.experiment_name, algo, env_cfg.env_name, total_iters, steps_per_iter,
    )

    # Periodic triggers + smoothed throughput (the reference's session
    # trackers, surreal/session/tracker.py — SURVEY.md §2 trackers row).
    from surreal_tpu.utils.trackers import PeriodicTracker, ThroughputTracker

    start_steps = trainer.global_iter * steps_per_iter
    eval_trk = PeriodicTracker(eval_every * steps_per_iter, init_count=start_steps)
    ckpt_trk = PeriodicTracker(ckpt_every * steps_per_iter, init_count=start_steps)
    thru = ThroughputTracker()

    def sink(m):
        m["env_steps_per_s_smoothed"] = thru.update(m["env_steps"])
        tb.write(int(m["env_steps"]), m)

    while trainer.global_iter < total_iters:
        n = min(seg, total_iters - trainer.global_iter)
        trainer.run(n, log_every=int(session.log_every_iterations), metric_sink=sink)
        env_steps = trainer.global_iter * steps_per_iter
        finished = trainer.global_iter >= total_iters
        score = None
        if eval_trk.track(env_steps) or finished:
            ev = trainer.evaluate(episodes=int(session.eval_episodes))
            score = ev["return_mean"]
            tb.write(env_steps, ev, section="eval")
            log.info("eval @ %.2e steps: %.1f ± %.1f", env_steps, ev["return_mean"], ev["return_std"])
            if session.video and primary:  # reference's eval-worker videos
                pol = trainer.deterministic_policy()
                if pol is not None:
                    from surreal_tpu.train.video import record_video

                    policy_fn, params, zf = pol
                    path = os.path.join(exp_dir, "videos", f"steps_{env_steps}.gif")
                    record_video(
                        trainer.env, policy_fn, params, path,
                        steps=int(session.video_steps), zfilter=zf,
                        flatten=getattr(trainer, "_flatten", None),
                    )
                    log.info("video -> %s", path)
        if ckpt_trk.track(env_steps) or finished:
            ckpt.save(env_steps, trainer.full_state, score=score)
    ckpt.close()
    tb.close()
    return 0


def cmd_eval(experiment: str, best: bool, episodes: int, stochastic: bool) -> int:
    from surreal_tpu.train.checkpoint import Checkpointer

    with open(os.path.join(experiment, "config.json")) as f:
        saved = json.load(f)
    from surreal_tpu.config import Config

    learner = Config(saved["learner"])
    env_cfg = Config(saved["env"])
    session = Config(saved["session"])
    trainer = _build_trainer(learner, env_cfg, session)
    ckpt = Checkpointer(os.path.join(experiment, "checkpoints"))
    trainer.load_full_state(ckpt.restore(trainer.full_state, best=best))
    # eval-deterministic / eval-stochastic agent modes (reference's paired
    # eval workers, SURVEY.md §3.5); DDPG eval is deterministic by nature.
    kw = {"stochastic": True} if (stochastic and learner.algo == "ppo") else {}
    result = trainer.evaluate(episodes=episodes, **kw)
    print(json.dumps(result))
    return 0


def main(argv=None) -> int:
    # Backend override (the axon sitecustomize pre-imports jax with the TPU
    # platform pinned; env var alone is unreliable — see verify skill).
    platform = os.environ.get("SURREAL_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    parser = argparse.ArgumentParser(prog="surreal-tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_train = sub.add_parser("train", help="run a training experiment")
    p_train.add_argument("algo", choices=["ppo", "ddpg"])

    p_eval = sub.add_parser("eval", help="evaluate a saved experiment")
    p_eval.add_argument("--experiment", required=True)
    p_eval.add_argument("--best", action="store_true")
    p_eval.add_argument("--episodes", type=int, default=16)
    p_eval.add_argument("--stochastic", action="store_true",
                        help="sample the policy (reference's eval-stochastic mode)")

    sub.add_parser("envs", help="list available environments")
    sub.add_parser("bench", help="run the headline benchmark")

    args, unknown = parser.parse_known_args(argv)
    if args.cmd == "train":
        return cmd_train(args.algo, _parse_overrides(unknown))
    if args.cmd == "eval":
        if unknown:
            raise SystemExit(f"unexpected args: {unknown}")
        return cmd_eval(args.experiment, args.best, args.episodes, args.stochastic)
    if args.cmd == "envs":
        from surreal_tpu.envs import available_envs

        print("\n".join(available_envs()))
        return 0
    if args.cmd == "bench":
        import runpy

        runpy.run_path(os.path.join(os.path.dirname(__file__), "..", "..", "bench.py"),
                       run_name="__main__")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
