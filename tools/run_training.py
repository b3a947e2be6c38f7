"""Run a training curve and write results/<tag>.txt (CURVE lines + EVAL).

The reproducible producer of the results/ files referenced in BASELINE.md.

    python tools/run_training.py --env ball_in_cup-catch --algo ppo \
        --steps 5_000_000 --tag bic_ppo_r1 [--cpu]

CURVE columns: env_steps  episode_return  wall_s
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _parse_sets(pairs):
    out = {}
    for p in pairs:
        k, v = p.split("=", 1)
        try:
            out[k] = int(v)
        except ValueError:
            try:
                out[k] = float(v)
            except ValueError:
                out[k] = {"true": True, "false": False}.get(v.lower(), v)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--env", required=True)
    p.add_argument("--algo", choices=("ppo", "ddpg"), default="ppo")
    p.add_argument("--steps", type=float, default=5e6)
    p.add_argument("--tag", default=None)
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--horizon", type=int, default=128)
    p.add_argument("--epochs", type=int, default=4)
    p.add_argument("--minibatches", type=int, default=8)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--hidden", default="256,256")
    p.add_argument("--entropy", type=float, default=None)
    p.add_argument("--set", action="append", default=[],
                   help="extra AlgoConfig fields, e.g. --set lr_max_scale=2")
    p.add_argument("--pixel", action="store_true",
                   help="PPO from pixels (PixelWrapper; BASELINE config 4)")
    p.add_argument("--lstm", action="store_true", help="recurrent PPO policy")
    p.add_argument("--lstm-size", type=int, default=128)
    p.add_argument("--action-repeat", type=int, default=4)
    p.add_argument("--frame-stack", type=int, default=3)
    p.add_argument("--eval-episodes", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="float32",
                   help="network compute dtype (bfloat16 for MXU-native)")
    p.add_argument("--overlap", action="store_true",
                   help="double-buffered rollout/train overlap (PPO)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_surreal")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    tag = args.tag or f"{args.env.replace('-', '_')}_{args.algo}"
    out_path = os.path.join(os.path.dirname(__file__), "..", "results", f"{tag}.txt")
    # Write to .partial and rename only after EVAL lands: a crashed/killed job
    # must never leave an empty results/<tag>.txt that reads as silent success.
    out = open(out_path + ".partial", "w")
    out.write(f"# {' '.join(sys.argv)}\n")
    hidden = tuple(int(x) for x in args.hidden.split(","))
    t_start = time.perf_counter()

    if args.algo == "ppo":
        from surreal_tpu.algos.ppo import PPOConfig
        from surreal_tpu.train import PPOTrainer

        kw = dict(horizon=args.horizon, epochs=args.epochs,
                  num_minibatches=args.minibatches, lr=args.lr)
        if args.entropy is not None:
            kw["entropy_coef"] = args.entropy
        kw.update(_parse_sets(args.set))
        cfg = PPOConfig(**kw)
        pixel_kwargs = None
        if args.pixel:
            pixel_kwargs = dict(
                frame_stack=args.frame_stack, grayscale=True,
                action_repeat=args.action_repeat,
            )
        import jax.numpy as jnp

        trainer = PPOTrainer(args.env, cfg, num_envs=args.num_envs,
                             seed=args.seed, hidden=hidden,
                             compute_dtype=jnp.dtype(args.dtype),
                             pixel_obs=args.pixel, pixel_kwargs=pixel_kwargs,
                             use_lstm=args.lstm, lstm_size=args.lstm_size,
                             overlap=args.overlap)
    else:
        from surreal_tpu.algos.ddpg import DDPGConfig
        from surreal_tpu.train import DDPGTrainer

        cfg = DDPGConfig(**_parse_sets(args.set)) if args.set else None
        pixel_kwargs = None
        if args.pixel:
            pixel_kwargs = dict(
                frame_stack=args.frame_stack, grayscale=True,
                action_repeat=args.action_repeat,
            )
        trainer = DDPGTrainer(args.env, cfg, num_envs=args.num_envs, seed=args.seed,
                              pixel_obs=args.pixel, pixel_kwargs=pixel_kwargs)

    iters = max(1, int(args.steps / trainer.steps_per_iteration))
    log_every = max(1, iters // 25)

    def sink(m):
        out.write(
            f"CURVE {m['env_steps']} "
            f"{m.get('episode_return', float('nan')):.1f} "
            f"{time.perf_counter() - t_start:.0f}\n"
        )
        out.flush()

    trainer.run(iters, log_every=log_every, metric_sink=sink)
    stats = trainer.evaluate(episodes=args.eval_episodes, seed=123)
    stats = {k: float(v) if hasattr(v, "item") else v for k, v in stats.items()}
    if args.algo == "ppo":  # reference's paired eval-stochastic worker
        st = trainer.evaluate(episodes=args.eval_episodes, stochastic=True, seed=124)
        out.write(
            "EVAL_STOCH "
            + json.dumps({k: float(v) if hasattr(v, "item") else v
                          for k, v in st.items()}) + "\n"
        )
    out.write(f"EVAL {json.dumps(stats)}\n")
    out.write(f"WALL_S {time.perf_counter() - t_start:.0f}\n")
    out.close()
    os.replace(out_path + ".partial", out_path)
    print("eval:", stats)
    print("wrote", os.path.relpath(out_path))


if __name__ == "__main__":
    main()
