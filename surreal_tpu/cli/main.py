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


def _build_trainer(learner, env_cfg, session):
    import jax

    seed = int(session.seed)
    algo_cfg = to_algo_config(learner)
    if learner.algo == "ppo":
        from surreal_tpu.train import PPOTrainer

        return PPOTrainer(
            env_cfg.env_name, algo_cfg, num_envs=int(env_cfg.num_envs), seed=seed,
            hidden=tuple(learner.hidden),
        )
    else:
        from surreal_tpu.train import DDPGTrainer

        return DDPGTrainer(
            env_cfg.env_name, algo_cfg, num_envs=int(env_cfg.num_envs), seed=seed,
            actor_hidden=tuple(learner.actor_hidden),
            critic_hidden=tuple(learner.critic_hidden),
        )


def cmd_train(algo: str, overrides: dict) -> int:
    from surreal_tpu.parallel.mesh import distributed_init

    learner, env_cfg, session = generate_configs(algo, overrides)
    log = get_logger("cli")
    mh = session.multihost
    distributed_init(mh.coordinator, mh.num_processes, mh.process_id)

    exp_dir = os.path.join(session.results_dir, session.experiment_name)
    os.makedirs(exp_dir, exist_ok=True)
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
    tb = MetricsWriter(os.path.join(exp_dir, "tb") if session.tensorboard else None)

    steps_per_iter = trainer.steps_per_iteration
    total_iters = max(int(session.total_env_steps) // steps_per_iter, 1)
    eval_every = max(int(session.eval_every_steps) // steps_per_iter, 1)
    ckpt_every = max(int(session.checkpoint_every_steps) // steps_per_iter, 1)
    seg = max(min(eval_every, ckpt_every), 1)
    log.info(
        "experiment %s: %s on %s, %d iters (%d env-steps/iter)",
        session.experiment_name, algo, env_cfg.env_name, total_iters, steps_per_iter,
    )

    done_iters = 0
    while done_iters < total_iters:
        n = min(seg, total_iters - done_iters)
        logs = trainer.run(
            n,
            log_every=int(session.log_every_iterations),
            metric_sink=lambda m: tb.write(int(m["env_steps"]), m),
        )
        done_iters += n
        env_steps = done_iters * steps_per_iter
        score = None
        if (done_iters % eval_every == 0) or done_iters >= total_iters:
            ev = trainer.evaluate(episodes=int(session.eval_episodes))
            score = ev["return_mean"]
            tb.write(env_steps, ev, section="eval")
            log.info("eval @ %.2e steps: %.1f ± %.1f", env_steps, ev["return_mean"], ev["return_std"])
        if (done_iters % ckpt_every == 0) or done_iters >= total_iters:
            ckpt.save(env_steps, trainer.state, score=score)
    ckpt.close()
    tb.close()
    return 0


def cmd_eval(experiment: str, best: bool, episodes: int) -> int:
    from surreal_tpu.train.checkpoint import Checkpointer

    with open(os.path.join(experiment, "config.json")) as f:
        saved = json.load(f)
    from surreal_tpu.config import Config

    learner = Config(saved["learner"])
    env_cfg = Config(saved["env"])
    session = Config(saved["session"])
    trainer = _build_trainer(learner, env_cfg, session)
    ckpt = Checkpointer(os.path.join(experiment, "checkpoints"))
    trainer.state = ckpt.restore(trainer.state, best=best)
    result = trainer.evaluate(episodes=episodes)
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

    sub.add_parser("envs", help="list available environments")
    sub.add_parser("bench", help="run the headline benchmark")

    args, unknown = parser.parse_known_args(argv)
    if args.cmd == "train":
        return cmd_train(args.algo, _parse_overrides(unknown))
    if args.cmd == "eval":
        if unknown:
            raise SystemExit(f"unexpected args: {unknown}")
        return cmd_eval(args.experiment, args.best, args.episodes)
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
