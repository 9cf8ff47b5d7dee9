"""Diagnostic: decompose the fused-walk-kernel training step's cost.

The r3h walk kernel made the production training step 0.166 ms at 256
rows, but loses above one row tile (0.62x at 512).  Theory: the step is
bound by the kernel's DENSE per-cell streams (in-stream 13.6 MB + arrive
13.6 MB + backward's 3 reads + ct_jump write at 256 rows x 100 cells x
128 lanes) plus the XLA-side scatter/gather that builds them.  This probe
measures (chain-M-vs-4M marginal, production shapes):

  step  : full kernel training step (apply + loss + grad + Adam)
  kgrad : value_and_grad of sum(walk_gaps_fused)  — scatter + kernel
          fwd+bwd + gather + scatter-VJP
  kfwd  : sum(walk_gaps_fused) forward only       — scatter + kernel fwd
          + gather
  kraw  : value_and_grad of sum(_walk_scan) on a PRE-BUILT stream —
          kernel fwd+bwd only (no XLA scatter/gather)
  krawf : _walk_scan forward only on a pre-built stream

step - kgrad       = jump/readout/loss/Adam share
kgrad - kraw       = XLA glue (stream scatter + output gather + VJPs)
kraw               = the kernel pair itself

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_walk_kernel_cost.py [--batch 256] [--m 32]
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=50)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--arms", type=str,
                    default="step,gstep,lfwd,kgrad,kfwd,kraw,krawf")
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
    batch = simulate_batch(jax.random.PRNGKey(0), B, "black_scholes", 0.1,
                           obs_only=True, T=1.0, n_steps=100, mu=0.1,
                           sigma=0.5, x0=1.0)
    times, values, mask = batch.times, batch.values, batch.mask
    nonce = int.from_bytes(os.urandom(4), "little")

    model = NeuralJumpODE(input_dim=1, hidden_dim=args.hidden, output_dim=1,
                          num_moments=2, n_hidden_layers=1, activation="relu",
                          variance_method="direct", t_max=1.0,
                          shared_network=True, dt_ode_step=0.01,
                          use_pallas=True, grid_walk=True)
    assert model._use_walk_kernel(n_rows=B), "walk kernel ineligible"
    tx = make_adam(1e-3, 5e-4)
    params = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)

    d_h, N = args.hidden, times.shape[1]
    M = model.max_substeps
    dt = 0.01
    g_idx = jnp.clip(jnp.round(times / dt).astype(jnp.int32), 0, M)
    h_jump = model._jump(params, values.reshape(B * N, 1), None)
    h_jump = h_jump.reshape(model.k_hidden, B, N, d_h)
    x_scaled = model._scale(values)

    from njode_tpu.ops.walk_scan import (LANES, _cells_padded, _row_tile,
                                         _walk_scan, _weight_blocks,
                                         n_halves, walk_gaps_fused)

    # pre-built stream + packed weight blocks for the kraw arms (r3j layout)
    nh = n_halves(d_h)
    H = LANES // nh
    Bp = -(-B // nh) * nh
    P = Bp // nh
    RT = _row_tile(P)
    R_p = -(-P // RT) * RT
    M_pad = _cells_padded(M)
    w1, b1 = (params["ode"]["layers"][0]["w"], params["ode"]["layers"][0]["b"])
    w2, b2 = (params["ode"]["layers"][1]["w"], params["ode"]["layers"][1]["b"])
    w1b0, w2b0 = _weight_blocks(w1, b1, w2, b2, d_h, nh, dt)
    slot_g = jnp.where(mask, g_idx, M_pad + 1)
    slot_blk = jnp.concatenate([
        h_jump[0], times[..., None], x_scaled,
        mask[..., None].astype(jnp.float32),
        jnp.zeros((B, N, H - d_h - 3), jnp.float32)], axis=-1)
    rows_p = jnp.arange(P)[:, None]
    halves = [
        (jnp.zeros((M_pad + 2, R_p, H), jnp.float32)
         .at[slot_g[h::nh], rows_p[:((Bp - h - 1) // nh) + 1]]
         .set(slot_blk[h::nh]))
        for h in range(nh)]
    stream0 = (halves[0] if nh == 1
               else jnp.concatenate(halves, axis=-1))[:M_pad]

    def one_step(p, s):
        def loss_fn(pp):
            preds, before = model.apply(pp, times, values, mask)
            return nj_ode_loss_dense(values, preds, before, mask,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])
        loss, g = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s, loss

    def walk_sum(layers, hj):
        out = walk_gaps_fused(layers, hj, x_scaled, times, mask, g_idx,
                              dt, M, model._act_key, model._scale_key)
        return jnp.sum(out)

    def raw_sum(stream, weights):
        arr, hL = _walk_scan(stream, *weights, d_h, nh, dt, M,
                             model._act_key, model._scale_key, False)
        return jnp.sum(arr) + jnp.sum(hL)

    weights0 = (w1b0, w2b0)

    def loss_fn_of(p):
        preds, before = model.apply(p, times, values, mask)
        return nj_ode_loss_dense(values, preds, before, mask,
                                 ignore_first_continuity=True,
                                 moment_weights=[1.0, 10.0])

    def make_chain(arm, n):
        if arm == "step":
            def run(key):
                p = jax.tree_util.tree_map(
                    lambda x: x + 0.0 * jax.random.uniform(key, ()), params)

                def body(c, _):
                    p, s = c
                    p, s, loss = one_step(p, s)
                    return (p, s), loss
                (_, _), losses = lax.scan(body, (p, opt_state), None,
                                          length=n)
                return losses[-1]
        elif arm == "gstep":
            # full step minus the optimizer: grad threads into params via
            # a tiny SGD-like update, so step - gstep ~= Adam tree-op cost
            def run(key):
                p = jax.tree_util.tree_map(
                    lambda x: x + 0.0 * jax.random.uniform(key, ()), params)

                def body(p, _):
                    loss, g = jax.value_and_grad(loss_fn_of)(p)
                    p = jax.tree_util.tree_map(
                        lambda a, b: a - 1e-30 * b, p, g)
                    return p, loss
                _, losses = lax.scan(body, p, None, length=n)
                return losses[-1]
        elif arm == "lfwd":
            # apply + loss forward only (no backward anywhere)
            def run(key):
                p = jax.tree_util.tree_map(
                    lambda x: x + 0.0 * jax.random.uniform(key, ()), params)

                def body(p, _):
                    v = loss_fn_of(p)
                    p = jax.tree_util.tree_map(
                        lambda a: a * (1.0 + 1e-30 * v), p)
                    return p, v
                _, losses = lax.scan(body, p, None, length=n)
                return losses[-1]
        elif arm in ("kgrad", "kfwd"):
            # kgrad threads the GRADIENT tensor itself into the carry —
            # feeding only the value lets XLA dead-code-eliminate the
            # whole backward kernel (first probe run: kraw == krawf)
            if arm == "kgrad":
                gfn = jax.grad(
                    lambda hj: walk_sum(params["ode"]["layers"], hj))

                def body(carry, _):
                    g = gfn(carry)
                    return carry + 1e-30 * g, jnp.sum(g)
            else:
                def body(carry, _):
                    v = walk_sum(params["ode"]["layers"], carry)
                    return carry * (1.0 + 1e-30 * v), v

            def run(key):
                hj = h_jump + 0.0 * jax.random.uniform(key, ())
                _, vs = lax.scan(body, hj, None, length=n)
                return vs[-1]
        else:  # kraw / krawf
            if arm == "kraw":
                gfn = jax.grad(lambda st: raw_sum(st, weights0))

                def body(carry, _):
                    g = gfn(carry)
                    return carry + 1e-30 * g, jnp.sum(g)
            else:
                def body(carry, _):
                    v = raw_sum(carry, weights0)
                    return carry * (1.0 + 1e-30 * v), v

            def run(key):
                st = stream0 + 0.0 * jax.random.uniform(key, ())
                _, vs = lax.scan(body, st, None, length=n)
                return vs[-1]
        return jax.jit(run)

    key = jax.random.fold_in(jax.random.PRNGKey(1), nonce)
    results = {}
    for arm in args.arms.split(","):
        f1, f4 = make_chain(arm, args.m), make_chain(arm, 4 * args.m)
        t0 = time.perf_counter()
        v1 = np.asarray(f1(key))
        v4 = np.asarray(f4(key))
        log(f"{arm}: warmup+compile {time.perf_counter()-t0:.1f}s "
            f"(vals {float(v1):.4g}/{float(v4):.4g})")
        deltas = []
        for rep in range(args.reps):
            k = jax.random.fold_in(key, rep + 1)
            t0 = time.perf_counter()
            np.asarray(f1(k))
            t1 = time.perf_counter()
            np.asarray(f4(k))
            t2 = time.perf_counter()
            deltas.append(((t2 - t1) - (t1 - t0)) / (3 * args.m))
        results[arm] = min(deltas)
        print(f"{arm:6s} {min(deltas)*1e3:7.3f} ms  "
              f"(deltas {[f'{d*1e3:.3f}' for d in deltas]})", flush=True)

    if {"step", "kgrad", "kraw"} <= results.keys():
        print(f"decomposition: kernel-pair {results['kraw']*1e3:.3f} ms, "
              f"glue {(results['kgrad']-results['kraw'])*1e3:.3f} ms, "
              f"jump/readout/loss/Adam "
              f"{(results['step']-results['kgrad'])*1e3:.3f} ms", flush=True)
    if {"step", "gstep"} <= results.keys():
        print(f"adam share: {(results['step']-results['gstep'])*1e3:.3f} ms",
              flush=True)
    if {"gstep", "lfwd"} <= results.keys():
        print(f"backward share (model+loss): "
              f"{(results['gstep']-results['lfwd'])*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
