"""Microbenchmark: Pallas kernels vs XLA at production (bench.py) shapes.

VERDICT.md round-1 item 6: "put the Pallas kernels in the game or retire
the claim" — measure `gae(backend='pallas')` vs the XLA associative-scan
path, and the fused clip-loss kernel (value_and_grad) vs the jnp loss, on
the REAL chip at the shapes the cheetah bench uses (T=128, B=256 envs,
minibatch N=4096, act_dim 6). Writes results/kernels_r2.txt.

Run: timeout 600 python tools/bench_kernels.py   (TPU; one process only)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

T, B = 128, 256
N, A = (T * B) // 8, 6  # minibatch shape at num_minibatches=8
ITERS = 200


def timeit(fn, *args, iters=ITERS):
    out = fn(*args)
    jax.block_until_ready(out)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6  # us/call


def bench_gae(report):
    from surreal_tpu.ops.returns import gae

    k = jax.random.PRNGKey(0)
    r = jax.random.normal(k, (T, B))
    v = jax.random.normal(jax.random.fold_in(k, 1), (T, B))
    nv = jax.random.normal(jax.random.fold_in(k, 2), (T, B))
    disc = jnp.ones((T, B))
    done = jnp.zeros((T, B))

    f_xla = jax.jit(lambda *a: gae(*a, 0.99, 0.95, backend="xla"))
    f_pal = jax.jit(lambda *a: gae(*a, 0.99, 0.95, backend="pallas"))
    args = (r, v, nv, disc, done)
    us_x = timeit(f_xla, *args)
    us_p = timeit(f_pal, *args)
    # numerics agree
    ax, _ = f_xla(*args)
    ap, _ = f_pal(*args)
    err = float(jnp.max(jnp.abs(ax - ap)))
    report.append(
        f"gae (T={T},B={B})            xla {us_x:8.1f} us   pallas {us_p:8.1f} us   "
        f"speedup {us_x / us_p:5.2f}x   max|diff| {err:.2e}"
    )
    return us_x, us_p


def bench_fused_loss(report):
    from surreal_tpu.algos.ppo import PPOConfig, _loss_fn
    from surreal_tpu.models.actor_critic import PPOActorCritic

    net = PPOActorCritic(action_dim=A, hidden=(256, 256))
    obs = jax.random.normal(jax.random.PRNGKey(0), (N, 17))
    params = net.init(jax.random.PRNGKey(1), obs[:1])
    k = jax.random.PRNGKey(2)
    action = jax.random.normal(jax.random.fold_in(k, 0), (N, A))
    mean_old = jax.random.normal(jax.random.fold_in(k, 1), (N, A)) * 0.1
    log_std_old = jnp.full((N, A), -0.5)
    from surreal_tpu.models.distributions import DiagGauss

    logp_old = DiagGauss.log_prob(mean_old, log_std_old, action)
    adv = jax.random.normal(jax.random.fold_in(k, 2), (N,))
    vtarg = jax.random.normal(jax.random.fold_in(k, 3), (N,))
    v_old = jax.random.normal(jax.random.fold_in(k, 4), (N,)) * 0.1
    batch = (obs, action, logp_old, mean_old, log_std_old, adv, vtarg, v_old)

    results = {}
    for fused in (False, True):
        cfg = PPOConfig(fused_loss=fused)

        @jax.jit
        def step(params, batch):
            (_, m), g = jax.value_and_grad(
                lambda p: _loss_fn(cfg, net.apply, p, batch, jnp.asarray(1.0),
                                   jnp.asarray(cfg.entropy_coef)),
                has_aux=True,
            )(params)
            return m["kl"], jax.tree.leaves(g)[0]

        results[fused] = (timeit(step, params, batch), step(params, batch))
    us_j, (kl_j, g_j) = results[False]
    us_f, (kl_f, g_f) = results[True]
    gerr = float(jnp.max(jnp.abs(g_j - g_f)))
    report.append(
        f"clip-loss grad (N={N},A={A}) jnp {us_j:8.1f} us   pallas {us_f:8.1f} us   "
        f"speedup {us_j / us_f:5.2f}x   max|grad diff| {gerr:.2e}"
    )
    return us_j, us_f


def main():
    report = [f"Pallas-vs-XLA kernel microbench — backend={jax.default_backend()}, "
              f"device={jax.devices()[0].device_kind}, iters={ITERS}"]
    bench_gae(report)
    bench_fused_loss(report)
    txt = "\n".join(report) + "\n"
    print(txt)
    out = os.path.join(os.path.dirname(__file__), "..", "results", "kernels_r2.txt")
    with open(out, "w") as f:
        f.write(txt)


if __name__ == "__main__":
    main()
