"""Marginal training-step A/B at the production recipe: the composed
XLA + fused-walk-kernel step vs the whole-run walk-train kernel
(ops/walk_train.py), f32 and bf16-MXU arms.

Chain-M-vs-4M differencing (BENCH_NOTES.md methodology): the tunnel adds a
large fixed per-execute transport constant, so only the difference between
an M-minibatch and a 4M-minibatch program is honest.  A fresh nonce
perturbation defeats the remote execution service's (program, inputs)
memoization.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_walk_train.py \
      [--arms composed,wtrain,wtrain_bf16] [--m 32] [--batch 128] [--hidden 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", type=str, default="composed,wtrain,wtrain_bf16")
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=50)
    ap.add_argument("--obs-fraction", type=float, default=0.1)
    ap.add_argument("--dt-ode-step", type=float, default=0.01)
    ap.add_argument("--n-steps", type=int, default=100)
    ap.add_argument("--ode-solver", type=str, default="euler")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import lax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from njode_tpu import NeuralJumpODE
    from njode_tpu.models import nj_ode_loss_dense
    from njode_tpu.ops.train_kernel import pack_minibatches
    from njode_tpu.ops.walk_train import (fused_walk_train_run,
                                          init_walk_state)
    from njode_tpu.simulation import simulate_batch
    from njode_tpu.utils import make_adam
    from njode_tpu.utils.backend import ensure_backend

    devices = ensure_backend()
    log(f"platform={devices[0].platform}")

    B = args.batch
    M = 4 * args.m
    big = simulate_batch(jax.random.PRNGKey(0), M * B, "black_scholes",
                         args.obs_fraction, obs_only=True, T=1.0,
                         n_steps=args.n_steps, mu=0.1, sigma=0.5, x0=1.0)
    times, values, mask = big.times, big.values, big.mask
    N = int(times.shape[1])
    max_sub = int(round(1.0 / args.dt_ode_step))
    log(f"data: {times.shape}, N={N}, max_substeps={max_sub}")
    nonce = int.from_bytes(os.urandom(4), "little")
    key0 = jax.random.fold_in(jax.random.PRNGKey(1), nonce)

    results = {}
    for arm in args.arms.split(","):
        model = NeuralJumpODE(
            input_dim=1, hidden_dim=args.hidden, output_dim=1,
            num_moments=2, n_hidden_layers=1, activation="relu",
            variance_method="direct", t_max=1.0, shared_network=True,
            dt_ode_step=args.dt_ode_step, ode_solver=args.ode_solver,
            use_pallas=("auto" if arm == "composed" else False),
            grid_walk=(arm == "composed"))
        tx = make_adam(1e-3, 5e-4)
        params = model.init(jax.random.PRNGKey(0))
        opt_state = tx.init(params)

        if arm == "composed":
            def one_step(p, s, t, v):
                def loss_fn(pp):
                    preds, before = model.apply(pp, t, v)
                    return nj_ode_loss_dense(v, preds, before, None,
                                             ignore_first_continuity=True,
                                             moment_weights=[1.0, 10.0])
                loss, g = jax.value_and_grad(loss_fn)(p)
                updates, s = tx.update(g, s, p)
                return optax.apply_updates(p, updates), s, loss

            def chain(n):
                ts = times[:n * B].reshape(n, B, N)
                vs = values[:n * B].reshape(n, B, N, 1)

                def run(p, s, key):
                    p = jax.tree_util.tree_map(
                        lambda x: x + 0.0 * jax.random.uniform(key, ()), p)

                    def body(c, x):
                        p, s = c
                        t, v = x
                        p, s, loss = one_step(p, s, t, v)
                        return (p, s), loss
                    (p, s), losses = lax.scan(body, (p, s), (ts, vs))
                    return losses[-1]
                return jax.jit(run)

            f1, f4 = chain(args.m), chain(4 * args.m)
            a1, a2 = (params, opt_state), (params, opt_state)
        else:
            mxu = "bfloat16" if arm.endswith("bf16") else "float32"
            st = init_walk_state(params, num_moments=2,
                                 hidden_dim=args.hidden)
            kw = dict(n_slots=N, num_moments=2, batch_size=B,
                      hidden_dim=args.hidden, dt_ode_step=args.dt_ode_step,
                      max_substeps=max_sub, lr=1e-3, weight_decay=5e-4,
                      moment_weights=[1.0, 10.0], mxu_dtype=mxu,
                      ode_solver=args.ode_solver)

            def chain(n):
                data = pack_minibatches(times[:n * B], values[:n * B],
                                        jnp.ones((n * B,), bool), B)

                def run(st, key):
                    st = tuple(
                        x + 0.0 * jax.random.uniform(key, ()) for x in st)
                    st, losses = fused_walk_train_run(st, data, **kw)
                    return losses[-1]
                return jax.jit(run)

            f1, f4 = chain(args.m), chain(4 * args.m)
            a1 = a2 = (st,)

        t0 = time.perf_counter()
        l1 = np.asarray(f1(*a1, key0))
        l4 = np.asarray(f4(*a2, key0))
        log(f"{arm}: warmup+compile {time.perf_counter()-t0:.1f}s "
            f"(losses {float(l1):.4f}/{float(l4):.4f})")

        deltas = []
        for rep in range(args.reps):
            k = jax.random.fold_in(key0, rep + 1)
            t0 = time.perf_counter()
            np.asarray(f1(*a1, k))
            t1 = time.perf_counter()
            np.asarray(f4(*a2, k))
            t2 = time.perf_counter()
            deltas.append(((t2 - t1) - (t1 - t0)) / (3 * args.m))
        step_s = min(deltas)
        results[arm] = step_s
        print(f"{arm:12s} step {step_s*1e3:7.3f} ms  "
              f"(deltas {[f'{d*1e3:.3f}' for d in deltas]})", flush=True)

    a, b = results.get("composed"), results.get("wtrain")
    if a and b:
        print(f"speedup f32: {a/b:.2f}x", flush=True)
    c = results.get("wtrain_bf16")
    if a and c:
        print(f"speedup bf16: {a/c:.2f}x", flush=True)


if __name__ == "__main__":
    main()
