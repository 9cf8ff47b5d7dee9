"""Marginal training-step A/B at the production recipe: per-gap substep
loops vs the time-major grid walk (``grid_walk=True``).

The production config (``--dt-ode-step 0.01 --shared-network --hidden-dim
50``) integrates every inter-observation gap with max_substeps=100
predicated Euler substeps over the folded (B*S) rows — ~n_slots x more
ODEFunc work than the gaps actually contain.  The grid walk covers all
gaps with ONE 100-cell walk per batch.  Timing uses the chain-M-vs-4M
differencing from BENCH_NOTES.md (the tunnel adds a ~36 ms fixed
per-execute transport constant; only the difference between an M-step and
a 4M-step chained program is honest).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_grid_walk.py \
      [--arms pergap,walk] [--m 32] [--batch 256] [--hidden 50] \
      [--obs-fraction 0.1] [--solver euler] [--separate]
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
    ap.add_argument("--arms", type=str, default="pergap,walk,kernel")
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=50)
    ap.add_argument("--obs-fraction", type=float, default=0.1)
    ap.add_argument("--dt-ode-step", type=float, default=0.01)
    ap.add_argument("--n-steps", type=int, default=100)
    ap.add_argument("--solver", type=str, default="euler")
    ap.add_argument("--separate", action="store_true",
                    help="separate moment networks (production is shared)")
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
    from njode_tpu.simulation import simulate_batch
    from njode_tpu.utils import make_adam
    from njode_tpu.utils.backend import ensure_backend

    devices = ensure_backend()
    log(f"platform={devices[0].platform}")

    B = args.batch
    batch = simulate_batch(jax.random.PRNGKey(0), B, "black_scholes",
                           args.obs_fraction, obs_only=True, T=1.0,
                           n_steps=args.n_steps, mu=0.1, sigma=0.5, x0=1.0)
    times, values, mask = batch.times, batch.values, batch.mask
    log(f"batch: times {times.shape}")
    nonce = int.from_bytes(os.urandom(4), "little")

    results = {}
    for arm in args.arms.split(","):
        model = NeuralJumpODE(
            input_dim=1, hidden_dim=args.hidden, output_dim=1,
            num_moments=2, n_hidden_layers=1, activation="relu",
            variance_method="direct", t_max=1.0,
            shared_network=not args.separate,
            dt_ode_step=args.dt_ode_step, ode_solver=args.solver,
            use_pallas=(True if arm == "kernel" else False),
            grid_walk=(arm in ("walk", "kernel")))
        if arm == "kernel" and not model._use_walk_kernel():
            log(f"SKIP {arm}: walk kernel ineligible")
            continue
        tx = make_adam(1e-3, 5e-4)
        params = model.init(jax.random.PRNGKey(0))
        opt_state = tx.init(params)

        def one_step(p, s):
            def loss_fn(pp):
                preds, before = model.apply(pp, times, values, mask)
                return nj_ode_loss_dense(values, preds, before, mask,
                                         ignore_first_continuity=True,
                                         moment_weights=[1.0, 10.0])
            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(g, s, p)
            return optax.apply_updates(p, updates), s, loss

        def chain(n):
            def run(p, s, key):
                # fresh-nonce perturbation defeats the remote execution
                # service's (program, inputs) memoization across reps
                p = jax.tree_util.tree_map(
                    lambda x: x + 0.0 * jax.random.uniform(key, ()), p)

                def body(c, _):
                    p, s = c
                    p, s, loss = one_step(p, s)
                    return (p, s), loss
                (p, s), losses = lax.scan(body, (p, s), None, length=n)
                return losses[-1]
            return jax.jit(run)

        f1, f4 = chain(args.m), chain(4 * args.m)
        try:
            cost = (jax.jit(one_step).lower(params, opt_state)
                    .compile().cost_analysis())
            step_flops = float(cost.get("flops", 0.0))
        except Exception:
            step_flops = 0.0

        key = jax.random.fold_in(jax.random.PRNGKey(1), nonce)
        t0 = time.perf_counter()
        l1 = np.asarray(f1(params, opt_state, key))
        l4 = np.asarray(f4(params, opt_state, key))
        log(f"{arm}: warmup+compile {time.perf_counter()-t0:.1f}s "
            f"(losses {float(l1):.4f}/{float(l4):.4f})")

        deltas = []
        for rep in range(args.reps):
            k = jax.random.fold_in(key, rep + 1)
            t0 = time.perf_counter()
            np.asarray(f1(params, opt_state, k))
            t1 = time.perf_counter()
            np.asarray(f4(params, opt_state, k))
            t2 = time.perf_counter()
            deltas.append(((t2 - t1) - (t1 - t0)) / (3 * args.m))
        step_s = min(deltas)
        results[arm] = step_s
        print(f"{arm:7s} step {step_s*1e3:7.3f} ms  "
              f"(flops/step {step_flops:.3g}, deltas "
              f"{[f'{d*1e3:.3f}' for d in deltas]})", flush=True)

    a, b = results.get("pergap"), results.get("walk")
    if a and b:
        print(f"speedup: {a/b:.2f}x (pergap {a*1e3:.3f} ms -> "
              f"walk {b*1e3:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
