"""Marginal streaming-filter latency (NJODEFilter update+predict) at the
production config, gap kernel on vs off.

Chain-M-vs-4M differencing (BENCH_NOTES.md methodology): the tunnel's
fixed per-execute transport constant cancels in the difference between an
M-tick and a 4M-tick program; a fresh nonce defeats the remote execution
service's (program, inputs) memoization; the chain threads the filter
state so XLA can't hoist loop-invariant bodies.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_serving.py \
      [--arms xla,gap] [--m 64] [--streams 256] [--hidden 50]
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
    ap.add_argument("--arms", type=str, default="xla,gap")
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--streams", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=50)
    ap.add_argument("--dt-ode-step", type=float, default=0.01)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from njode_tpu import NeuralJumpODE
    from njode_tpu.serving import NJODEFilter
    from njode_tpu.utils.backend import ensure_backend

    devices = ensure_backend()
    log(f"platform={devices[0].platform}")

    B = args.streams
    nonce = int.from_bytes(os.urandom(4), "little")
    key0 = jax.random.fold_in(jax.random.PRNGKey(1), nonce)

    results = {}
    for arm in args.arms.split(","):
        model = NeuralJumpODE(
            input_dim=1, hidden_dim=args.hidden, output_dim=1,
            num_moments=2, n_hidden_layers=1, activation="relu",
            variance_method="direct", t_max=float(args.m) * 0.02 * 4 + 1.0,
            shared_network=True, dt_ode_step=args.dt_ode_step,
            use_pallas=(True if arm == "gap" else False))
        params = model.init(jax.random.PRNGKey(0))
        filt = NJODEFilter(model, params)

        def chain(n_ticks):
            # one tick = ingest an observation, integrate 0.02 (2 substeps)
            # ahead, read the prediction — the streaming serving loop
            def run(state, xs):
                def tick(carry, i):
                    st, acc = carry
                    t = 0.02 * (i + 1).astype(jnp.float32)
                    x = xs + 1e-6 * acc[:, None]      # thread data dep
                    st = filt._update_impl(params, st, t, x)
                    out = filt._predict_impl(params, st, t + 0.02)
                    return (st, out["mean"][:, 0]), ()
                (state, acc), _ = lax.scan(
                    tick, (state, jnp.zeros((B,))), jnp.arange(n_ticks))
                return acc
            return jax.jit(run)

        st0 = filt.init_state(B)
        xs = jax.random.uniform(key0, (B, 1)) + 1.0
        f1, f4 = chain(args.m), chain(4 * args.m)

        t0 = time.perf_counter()
        a1 = np.asarray(f1(st0, xs))
        a4 = np.asarray(f4(st0, xs))
        log(f"{arm}: warmup+compile {time.perf_counter()-t0:.1f}s "
            f"(acc {float(a1.mean()):.4f}/{float(a4.mean()):.4f})")

        deltas = []
        for rep in range(args.reps):
            k = jax.random.fold_in(key0, rep + 1)
            xs_r = jax.random.uniform(k, (B, 1)) + 1.0
            t0 = time.perf_counter()
            np.asarray(f1(st0, xs_r))
            t1 = time.perf_counter()
            np.asarray(f4(st0, xs_r))
            t2 = time.perf_counter()
            deltas.append(((t2 - t1) - (t1 - t0)) / (3 * args.m))
        tick_s = min(deltas)
        results[arm] = tick_s
        print(f"{arm:4s} update+predict tick {tick_s*1e6:8.1f} us "
              f"({B} streams; deltas {[f'{d*1e6:.1f}' for d in deltas]})",
              flush=True)

    a, b = results.get("xla"), results.get("gap")
    if a and b:
        print(f"gap-kernel speedup: {a/b:.2f}x", flush=True)


if __name__ == "__main__":
    main()
