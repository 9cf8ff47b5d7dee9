"""Stage-split breakdown of the default-recipe bench program.

bench.py's default BS recipe runs ONE jitted program: vmapped obs_only
data generation for all E epochs -> pack_minibatches -> the whole-run
training kernel.  This probe times that program with stages ablated,
using the chain-M-vs-4M differencing from BENCH_NOTES.md (the tunneled
backend adds a ~36 ms fixed per-execute transport constant plus one-sided
jitter, so only the difference between an M-epoch and a 4M-epoch program,
divided by 3M, is an honest per-epoch number).

NOTE: the 'full' stage hand-mirrors bench.py's kernel-path train_all
composition (pad -> pack_minibatches -> fused_train_run with the default
recipe's lr 1e-3 / wd 5e-4 / weights (1, 10) / hidden 32) as of r3f; if
bench's default recipe changes, update this probe in the same commit or
its published attribution goes stale.

Stages (cumulative, exactly the bench composition):
  times   - observation slots + times only (Floyd subset + arithmetic)
  datagen - + exact BS values at the obs times (full simulate_batch)
  pack    - + zero-pad to the minibatch multiple + pack_minibatches
  full    - + fused_train_run (the complete timed bench program)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python \
      scripts/measure_default_breakdown.py [--m 200] [--reps 3]
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
    ap.add_argument("--m", type=int, default=200,
                    help="epoch count of the short arm (long arm = 4M)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n-train", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--stages", type=str, default="times,datagen,pack,full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from njode_tpu import NeuralJumpODE
    from njode_tpu.simulation import simulate_batch
    from njode_tpu.ops.train_kernel import (fused_train_run, init_train_state,
                                            pack_minibatches,
                                            train_state_params)
    from njode_tpu.utils.backend import ensure_backend

    devices = ensure_backend()
    log(f"platform={devices[0].platform}")
    nonce = int.from_bytes(os.urandom(4), "little")

    P = dict(T=1.0, n_steps=100, mu=0.1, sigma=0.5, x0=1.0)
    n, bs = args.n_train, args.batch_size
    nb = -(-n // bs)
    n_pad = nb * bs
    H = 32
    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2, n_hidden_layers=1,
                          activation="relu", t_max=1.0)
    params0 = model.init(jax.random.PRNGKey(0))
    N_slots = int(simulate_batch(jax.random.PRNGKey(0), 1, "black_scholes",
                                 0.1, obs_only=True, **P).times.shape[1])

    def epoch_data(key, e):
        k_data, _ = jax.random.split(jax.random.fold_in(key, e))
        b = simulate_batch(k_data, n, "black_scholes", 0.1, obs_only=True,
                           **P)
        return b.times, b.values

    def build(stage, E):
        """One jitted program covering E epochs at the given stage depth."""

        def run(key):
            if stage == "times":
                # values ablated: sample the slots/times, checksum them.
                # (simulate_batch always draws values; reproduce its
                # times-side only — sample_obs_indices + grid arithmetic.)
                from njode_tpu.simulation.sde import sample_obs_indices

                def one(e):
                    k_data, _ = jax.random.split(jax.random.fold_in(key, e))
                    idx = sample_obs_indices(k_data, n, P["n_steps"] + 1, 0.1)
                    times = idx.astype(jnp.float32) * (P["T"] / P["n_steps"])
                    return jnp.sum(times)

                return jnp.sum(jax.vmap(one)(jnp.arange(E)))
            if stage in ("datagen", "pack"):
                def one(e):
                    ts, vs = epoch_data(key, e)
                    if stage == "datagen":
                        return jnp.sum(ts) + jnp.sum(vs)
                    pad = jnp.zeros((n_pad - n, ts.shape[1]), ts.dtype)
                    vpad = jnp.zeros((n_pad - n,) + vs.shape[1:], vs.dtype)
                    data = pack_minibatches(
                        jnp.concatenate([ts, pad]),
                        jnp.concatenate([vs, vpad]),
                        jnp.arange(n_pad) < n, bs)
                    return jnp.sum(data)

                return jnp.sum(jax.vmap(one)(jnp.arange(E)))
            # full: the bench's exact composition
            def one(e):
                ts, vs = epoch_data(key, e)
                pad = jnp.zeros((n_pad - n, ts.shape[1]), ts.dtype)
                vpad = jnp.zeros((n_pad - n,) + vs.shape[1:], vs.dtype)
                return (jnp.concatenate([ts, pad]),
                        jnp.concatenate([vs, vpad]),
                        jnp.arange(n_pad) < n)

            ts, vs, valid = jax.vmap(one)(jnp.arange(E))
            data = pack_minibatches(ts.reshape(E * n_pad, N_slots),
                                    vs.reshape(E * n_pad, N_slots, 1),
                                    valid.reshape(E * n_pad), bs)
            st = init_train_state(params0, num_moments=2, hidden_dim=H)
            st, losses = fused_train_run(
                st, data, n_slots=N_slots, num_moments=2, batch_size=bs,
                lr=1e-3, weight_decay=5e-4, moment_weights=(1.0, 10.0))
            p = train_state_params(st, num_moments=2, hidden_dim=H)
            return jnp.sum(losses) + sum(jnp.sum(x)
                                         for x in jax.tree_util.tree_leaves(p))

        return jax.jit(run)

    def timed(fn, key):
        t0 = time.perf_counter()
        np.asarray(fn(key))          # device->host copy is the fence
        return time.perf_counter() - t0

    M = args.m
    base_key = jax.random.fold_in(jax.random.PRNGKey(17), nonce)
    # the [stage-only] column differences consecutive CUMULATIVE stages, so
    # the requested list must be an in-order subsequence of the canonical
    # stage order — reject anything else rather than print wrong attribution
    canonical = ["times", "datagen", "pack", "full"]
    stages = args.stages.split(",")
    order = [canonical.index(s) for s in stages if s in canonical]
    if len(order) != len(stages) or order != sorted(order):
        raise SystemExit(f"--stages must be an in-order subset of "
                         f"{','.join(canonical)} (got {args.stages})")
    print(f"{'stage':>8s} {'ms/epoch':>9s}  (deltas over reps)")
    prev = 0.0
    for stage in stages:
        f1, f4 = build(stage, M), build(stage, 4 * M)
        # warmup both programs (first execute pays variable transport)
        timed(f1, jax.random.fold_in(base_key, 990))
        timed(f4, jax.random.fold_in(base_key, 991))
        deltas = []
        for rep in range(args.reps):
            k = jax.random.fold_in(base_key, rep)
            t1, t4 = timed(f1, k), timed(f4, k)
            deltas.append((t4 - t1) / (3 * M))
        best = min(deltas)
        print(f"{stage:>8s} {best * 1e3:9.4f}  "
              f"({' '.join(f'{d * 1e3:.4f}' for d in deltas)})"
              f"   [stage-only {max(best - prev, 0.0) * 1e3:.4f} ms]")
        prev = best


if __name__ == "__main__":
    main()
