"""Why does the walk-train kernel's per-step cost rise from 0.044 ms
(short chains, r4a) to 0.072 ms (>=316-step chains, r5 E1) ?

Two candidate causes, separated by ONE discriminating arm:

  * DATA-ARRAY LOCALITY: the long-chain data stream is 20-103 MB of HBM
    (vs 2-8 MB for short chains) — if per-block DMA gets slower when the
    array is large, a grid-1580 run over a SMALL array re-indexed modulo
    32 (``small`` arm) should return to the burst rate.
  * SUSTAINED-EXECUTION RATE: ~114 ms of back-to-back MXU+VPU work runs
    at a lower device rate than 5 ms bursts (power/duty or pipeline
    steady-state) — then the ``small`` arm stays at 0.072 ms like the
    ``full`` arm, because only the grid length matters.

Both arms run the EXACT production kernel (ops/walk_train.py) at grid
G vs 4G and are chain-differenced as usual.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python \
      scripts/probe_walk_sustained.py [--m 395] [--reps 3] [--mod 32]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=395)
    ap.add_argument("--mod", type=int, default=32,
                    help="unique minibatches in the 'small' arm")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hidden", type=int, default=50)
    ap.add_argument("--dt-ode-step", type=float, default=0.01)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from njode_tpu import NeuralJumpODE
    from njode_tpu.ops import walk_train as wt
    from njode_tpu.ops.train_kernel import pack_minibatches
    from njode_tpu.simulation import simulate_batch
    from njode_tpu.utils.backend import ensure_backend

    devices = ensure_backend()
    log(f"platform={devices[0].platform}")
    nonce = int.from_bytes(os.urandom(4), "little")
    key0 = jax.random.fold_in(jax.random.PRNGKey(3), nonce)

    B, H, dt = args.batch, args.hidden, args.dt_ode_step
    M_cells = int(round(1.0 / dt))
    model = NeuralJumpODE(input_dim=1, hidden_dim=H, output_dim=1,
                          num_moments=2, n_hidden_layers=1,
                          activation="relu", t_max=1.0, shared_network=True,
                          dt_ode_step=dt)
    params = model.init(jax.random.PRNGKey(0))
    st = wt.init_walk_state(params, num_moments=2, hidden_dim=H)

    big = simulate_batch(jax.random.PRNGKey(0), 4 * args.m * B,
                         "black_scholes", 0.1, obs_only=True, T=1.0,
                         n_steps=100, mu=0.1, sigma=0.5, x0=1.0)
    N = int(big.times.shape[1])
    nh = wt.n_halves(H)
    RT = B // nh
    ck, _ = wt._ring_plan(RT, N, M_cells)
    kern = functools.partial(
        wt._walk_train_kernel, N=N, K=2, M=M_cells, ck=ck, dt=dt, d_h=H,
        nh=nh, act="relu", scale="identity", lr=1e-3, wd=5e-4, b1=0.9,
        b2=0.999, eps_adam=1e-8, eps_loss=1e-10, w0m=1.0, w1m=10.0,
        variance_method="direct", mxu="float32")
    WS, VS = (4, wt.LANES, wt.LANES), (wt.N_VEC, wt.LANES)
    n_ck = -(-M_cells // ck) if ck < M_cells else 1

    def make(G, n_unique):
        rows = n_unique * B
        data = pack_minibatches(big.times[:rows], big.values[:rows],
                                jnp.ones((rows,), bool), B)
        data = data.reshape(data.shape[0] // nh, nh * wt.LANES)
        mod = n_unique
        row = pl.BlockSpec((RT, nh * wt.LANES), lambda r: (r % mod, 0),
                           memory_space=pltpu.VMEM)
        loss_spec = pl.BlockSpec((1, 8, wt.LANES), lambda r: (r, 0, 0),
                                 memory_space=pltpu.VMEM)
        full = lambda s: pl.BlockSpec(s, lambda r: tuple(0 for _ in s),
                                      memory_space=pltpu.VMEM)
        call = pl.pallas_call(
            kern, grid=(G,),
            in_specs=[row, full(WS), full(VS), full(WS), full(WS),
                      full(VS), full(VS), full((8, wt.LANES))],
            out_specs=[loss_spec, full(WS), full(VS), full(WS), full(WS),
                       full(VS), full(VS), full((8, wt.LANES))],
            out_shape=[jax.ShapeDtypeStruct((G, 8, wt.LANES), jnp.float32),
                       jax.ShapeDtypeStruct(WS, jnp.float32),
                       jax.ShapeDtypeStruct(VS, jnp.float32),
                       jax.ShapeDtypeStruct(WS, jnp.float32),
                       jax.ShapeDtypeStruct(WS, jnp.float32),
                       jax.ShapeDtypeStruct(VS, jnp.float32),
                       jax.ShapeDtypeStruct(VS, jnp.float32),
                       jax.ShapeDtypeStruct((8, wt.LANES), jnp.float32)],
            scratch_shapes=[pltpu.VMEM(WS, jnp.float32),
                            pltpu.VMEM(VS, jnp.float32),
                            pltpu.VMEM(WS, jnp.float32),
                            pltpu.VMEM(WS, jnp.float32),
                            pltpu.VMEM(VS, jnp.float32),
                            pltpu.VMEM(VS, jnp.float32),
                            pltpu.VMEM(VS, jnp.float32),
                            pltpu.VMEM((8, wt.LANES), jnp.float32),
                            pltpu.VMEM((RT, wt.LANES), jnp.float32),
                            pltpu.VMEM((RT, wt.LANES), jnp.float32),
                            pltpu.VMEM((wt.LANES, wt.LANES), jnp.float32),
                            pltpu.VMEM((wt.LANES, wt.LANES), jnp.float32),
                            pltpu.VMEM((ck, RT, wt.LANES), jnp.float32),
                            pltpu.VMEM((n_ck, RT, wt.LANES), jnp.float32),
                            pltpu.VMEM((N, RT, wt.LANES), jnp.float32),
                            pltpu.VMEM((N, RT, wt.LANES), jnp.float32)])

        def run(stt, key):
            stt = tuple(x + 0.0 * jax.random.uniform(key, ()) for x in stt)
            out = call(data, *stt)
            return out[0][-1, 0, 0]

        return jax.jit(run)

    def timed(fn, key):
        t0 = time.perf_counter()
        np.asarray(fn(st, key))
        return time.perf_counter() - t0

    for name, n_unique in (("small", args.mod), ("full", args.m * 4)):
        f1 = make(args.m, min(n_unique, args.m))
        f4 = make(4 * args.m, n_unique)
        t0 = time.perf_counter()
        timed(f1, jax.random.fold_in(key0, 990))
        timed(f4, jax.random.fold_in(key0, 991))
        log(f"{name}: warmup+compile {time.perf_counter()-t0:.1f}s")
        deltas = []
        for rep in range(args.reps):
            k = jax.random.fold_in(key0, rep)
            t1, t4 = timed(f1, k), timed(f4, k)
            deltas.append((t4 - t1) / (3 * args.m))
        print(f"{name:6s} ({n_unique:5d} unique mb) step "
              f"{min(deltas)*1e3:7.3f} ms  "
              f"(deltas {[f'{d*1e3:.3f}' for d in deltas]})", flush=True)


if __name__ == "__main__":
    main()
