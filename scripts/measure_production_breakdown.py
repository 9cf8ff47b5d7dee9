"""Stage-split breakdown of the PRODUCTION-recipe bench program (r5).

bench.py's production row (--dt-ode-step 0.01 --shared-network
--hidden-dim 50 --n-train 10000) runs ONE jitted program: vmapped
obs_only datagen for all E epochs -> pack_minibatches -> the whole-run
WALK-train kernel (ops/walk_train.py).  This probe times that program
with stages ablated, chain-M-vs-4M differenced (BENCH_NOTES.md
methodology: the tunnel adds a ~36 ms fixed per-execute constant plus
one-sided jitter; only the (4M - M)/3M difference is honest).

NOTE: the 'full' stage hand-mirrors bench.py's walk-train train_all
composition as of r4a; if bench's production recipe changes, update this
probe in the same commit.

Cumulative stages (exactly the bench composition):
  times   - observation slots + times only
  datagen - + exact BS values at the obs times (full simulate_batch)
  pack    - + zero-pad to the minibatch multiple + pack_minibatches
  full    - + fused_walk_train_run (the complete timed bench program)

Separate (non-cumulative) VALIDATION stages — the production bench row
does NOT time validation, but the CLI production run pays it per
--print-every epochs; these size how much a >512-row walk kernel
(VERDICT r4 item 2) could save:
  val_pergap  - one 2000-row validation forward on the per-gap XLA path
                (what 'auto' does today above the walk row ceiling)
  val_walk    - the same forward FORCED through the fused walk kernel
                (measured 0.62-0.84x above one row tile, r3h)
  val_chunked - the same 2000 rows split into ceil(2000/512)-row chunks
                that each ride the walk kernel under 'auto'

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python \
      scripts/measure_production_breakdown.py [--m 20] [--reps 3]
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
    ap.add_argument("--m", type=int, default=20,
                    help="epoch count of the short arm (long arm = 4M)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--n-train", type=int, default=10_000)
    ap.add_argument("--n-val", type=int, default=2000)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=50)
    ap.add_argument("--dt", type=float, default=0.01)
    ap.add_argument("--stages", type=str,
                    default="times,datagen,pack,full,"
                            "val_pergap,val_walk,val_chunked")
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
    from njode_tpu.simulation import simulate_batch
    from njode_tpu.ops.train_kernel import pack_minibatches
    from njode_tpu.ops.walk_train import (fused_walk_train_run,
                                          init_walk_state,
                                          unpack_walk_params)
    from njode_tpu.ops.walk_scan import auto_max_rows
    from njode_tpu.utils.backend import ensure_backend

    devices = ensure_backend()
    log(f"platform={devices[0].platform}")
    nonce = int.from_bytes(os.urandom(4), "little")

    P = dict(T=1.0, n_steps=100, mu=0.1, sigma=0.5, x0=1.0)
    n, bs, H, dt = args.n_train, args.batch_size, args.hidden, args.dt
    nb = -(-n // bs)
    n_pad = nb * bs
    M_cells = int(round(P["T"] / dt))

    def mk_model(use_pallas):
        return NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                             num_moments=2, n_hidden_layers=1,
                             activation="relu", t_max=1.0,
                             shared_network=True, dt_ode_step=dt,
                             grid_walk=True, use_pallas=use_pallas)

    model = mk_model("auto")
    params0 = model.init(jax.random.PRNGKey(0))
    N_slots = int(simulate_batch(jax.random.PRNGKey(0), 1, "black_scholes",
                                 0.1, obs_only=True, **P).times.shape[1])
    log(f"N_slots={N_slots}, M_cells={M_cells}, "
        f"walk auto ceiling={auto_max_rows(H)} raw rows")

    def epoch_data(key, e, rows):
        k_data, _ = jax.random.split(jax.random.fold_in(key, e))
        b = simulate_batch(k_data, rows, "black_scholes", 0.1, obs_only=True,
                           **P)
        return b.times, b.values

    def build(stage, E):
        """One jitted program covering E epochs at the given stage depth."""

        def run(key):
            if stage == "times":
                from njode_tpu.simulation.sde import sample_obs_indices

                def one(e):
                    k_data, _ = jax.random.split(jax.random.fold_in(key, e))
                    idx = sample_obs_indices(k_data, n, P["n_steps"] + 1, 0.1)
                    times = idx.astype(jnp.float32) * (P["T"] / P["n_steps"])
                    return jnp.sum(times)

                return jnp.sum(jax.vmap(one)(jnp.arange(E)))
            if stage in ("datagen", "pack"):
                def one(e):
                    ts, vs = epoch_data(key, e, n)
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
            if stage == "kernel_const":
                # the kernel at the bench's exact grid count but with ONE
                # epoch's rows tiled E times: no fresh-datagen dependence.
                # full - kernel_const = what interleaving fresh data costs.
                ts, vs = epoch_data(key, 0, n)
                pad = jnp.zeros((n_pad - n, ts.shape[1]), ts.dtype)
                vpad = jnp.zeros((n_pad - n,) + vs.shape[1:], vs.dtype)
                data1 = pack_minibatches(jnp.concatenate([ts, pad]),
                                         jnp.concatenate([vs, vpad]),
                                         jnp.arange(n_pad) < n, bs)
                data = jnp.tile(data1, (E, 1))
                st = init_walk_state(params0, num_moments=2, hidden_dim=H)
                st, losses = fused_walk_train_run(
                    st, data, n_slots=N_slots, num_moments=2, batch_size=bs,
                    hidden_dim=H, dt_ode_step=dt, max_substeps=M_cells,
                    lr=1e-3, weight_decay=5e-4, moment_weights=(1.0, 10.0))
                return jnp.sum(losses)
            if stage == "full":
                def one(e):
                    ts, vs = epoch_data(key, e, n)
                    pad = jnp.zeros((n_pad - n, ts.shape[1]), ts.dtype)
                    vpad = jnp.zeros((n_pad - n,) + vs.shape[1:], vs.dtype)
                    return (jnp.concatenate([ts, pad]),
                            jnp.concatenate([vs, vpad]),
                            jnp.arange(n_pad) < n)

                ts, vs, valid = jax.vmap(one)(jnp.arange(E))
                data = pack_minibatches(ts.reshape(E * n_pad, N_slots),
                                        vs.reshape(E * n_pad, N_slots, 1),
                                        valid.reshape(E * n_pad), bs)
                st = init_walk_state(params0, num_moments=2, hidden_dim=H)
                st, losses = fused_walk_train_run(
                    st, data, n_slots=N_slots, num_moments=2, batch_size=bs,
                    hidden_dim=H, dt_ode_step=dt, max_substeps=M_cells,
                    lr=1e-3, weight_decay=5e-4, moment_weights=(1.0, 10.0))
                p = unpack_walk_params(st[0], st[1], num_moments=2,
                                       hidden_dim=H)
                return jnp.sum(losses) + sum(
                    jnp.sum(x) for x in jax.tree_util.tree_leaves(p))

            # ---- validation stages: E independent val passes (scanned —
            # vmap of the walk kernel's ANY-space streams doesn't lower) ----
            nv = args.n_val
            vmodel = mk_model(True if stage == "val_walk" else "auto")
            if stage == "val_chunked":
                chunk = auto_max_rows(H)
                n_chunks = -(-nv // chunk)
                nv_pad = n_chunks * chunk
            else:
                chunk = nv
                n_chunks = 1
                nv_pad = nv

            def one(e):
                ts, vs = epoch_data(key, e, nv)
                mask = jnp.ones(ts.shape, bool)
                if nv_pad != nv:
                    # pad rows repeat t=0 (no gaps; negligible extra work)
                    ts_p = jnp.concatenate(
                        [ts, jnp.zeros((nv_pad - nv, N_slots), ts.dtype)])
                    vs_p = jnp.concatenate(
                        [vs, jnp.ones((nv_pad - nv, N_slots, 1), vs.dtype)])
                    mask = jnp.concatenate(
                        [mask, jnp.zeros((nv_pad - nv, N_slots), bool)])
                else:
                    ts_p, vs_p = ts, vs
                tot = 0.0
                for c in range(n_chunks):
                    sl = slice(c * chunk, (c + 1) * chunk)
                    preds, before = vmodel.apply(params0, ts_p[sl], vs_p[sl],
                                                 mask[sl])
                    tot = tot + jnp.sum(preds * mask[sl, :, None, None]) \
                        + jnp.sum(before * mask[sl, :, None, None])
                return tot

            def scan_body(acc, e):
                return acc + one(e), None

            return lax.scan(scan_body, 0.0, jnp.arange(E))[0]

        return jax.jit(run)

    def timed(fn, key):
        t0 = time.perf_counter()
        np.asarray(fn(key))          # device->host copy is the fence
        return time.perf_counter() - t0

    M = args.m
    base_key = jax.random.fold_in(jax.random.PRNGKey(17), nonce)
    cumulative = ["times", "datagen", "pack", "full"]
    prev = 0.0
    print(f"{'stage':>12s} {'ms/epoch':>9s}  (deltas over reps)")
    for stage in args.stages.split(","):
        f1, f4 = build(stage, M), build(stage, 4 * M)
        timed(f1, jax.random.fold_in(base_key, 990))
        timed(f4, jax.random.fold_in(base_key, 991))
        deltas = []
        for rep in range(args.reps):
            k = jax.random.fold_in(base_key, rep)
            t1, t4 = timed(f1, k), timed(f4, k)
            deltas.append((t4 - t1) / (3 * M))
        best = min(deltas)
        extra = ""
        if stage in cumulative:
            extra = f"   [stage-only {max(best - prev, 0.0) * 1e3:.4f} ms]"
            prev = best
        print(f"{stage:>12s} {best * 1e3:9.4f}  "
              f"({' '.join(f'{d * 1e3:.4f}' for d in deltas)}){extra}",
              flush=True)


if __name__ == "__main__":
    main()
