"""Diagnostic (r5h): decompose the widened fused-step kernel's d_x=2 cost.

BENCH_NOTES r5a/r5g: at hidden 256 / B=4096 / N=2 the d_x=2 training step
costs 1.125 ms vs 0.258 ms for d_x=1 (~4.4x) although the kernel's matmul
FLOPs are nearly identical (extra rank-1 input features + extra readout
columns on the same (Hp, Hp) planes).  The XLA baseline blows up the same
way (MFU 32.6% -> 9.5%), so the cause may be outside the kernel.  This
probe measures (chain-M-vs-4M marginal, scaled shapes) a grid of
(d_x, d_y) x arms:

  step  : full training step (model.apply -> kernel, loss, Adam) [d_y=d_x]
  fstep : same step but with the LANE-SPACE fused loss
          (ops.fused_step.fused_step_loss — r5i candidate)  [d_y=d_x]
  pstep : packed-state training step (no per-step pack/unpack glue)
  lgrad : value_and_grad of the packed loss (kernel fwd+bwd + loss
          fwd+bwd; no Adam)                               [d_y=d_x]
  flgrad: value_and_grad of the packed LANE-SPACE loss     [d_y=d_x]
  lfwd  : packed loss forward only                        [d_y=d_x]
  adam  : tx.update + apply_updates on fixed grads (Adam alone)
  kgrad : value_and_grad of sum(fused_step_apply_packed) wrt (W, V, bo2)
          — kernel fwd+bwd + lane-unpack glue only
  kfwd  : fused_step_apply_packed forward only

  step - pstep  = pack/unpack + pytree glue
  pstep - lgrad = Adam share (cross-check vs the adam arm)
  lgrad - kgrad = loss fwd+bwd share
  kgrad - kfwd  = backward kernel share
  kfwd          = forward kernel + lane glue

Synthetic data (uniform times, N(0,1) values, full mask) — marginal cost
only; (d_x, d_y) vary independently for the kernel-only arms.

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_widened_step.py [--configs 1x1,2x2] \
      [--arms step,pstep,kgrad,kfwd] [--m 32] [--hidden 256] [--batch 4096]
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
    ap.add_argument("--configs", type=str, default="1x1,2x1,1x2,2x2",
                    help="comma list of DXxDY pairs")
    ap.add_argument("--arms", type=str, default="step,pstep,kgrad,kfwd")
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--slots", type=int, default=2)
    ap.add_argument("--layers", type=int, default=1)
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
    from njode_tpu.ops.fused_step import (fused_step_apply_packed,
                                          fused_step_loss,
                                          fused_step_loss_packed, pack_params)
    from njode_tpu.utils import make_adam
    from njode_tpu.utils.backend import ensure_backend

    devices = ensure_backend()
    log(f"platform={devices[0].platform}")

    B, N, H, L, K = args.batch, args.slots, args.hidden, args.layers, 2
    nonce = int.from_bytes(os.urandom(4), "little")
    kd = jax.random.PRNGKey(7)
    times = jnp.broadcast_to(jnp.linspace(0.1, 0.9, N), (B, N))
    mask = jnp.ones((B, N), bool)
    key = jax.random.fold_in(jax.random.PRNGKey(1), nonce)

    results = {}
    for cfg in args.configs.split(","):
        d_x, d_y = (int(v) for v in cfg.split("x"))
        values = jax.random.normal(kd, (B, N, d_x)) * 0.1 + 1.0
        # model requires output_dim == input_dim for the loss arms
        model = NeuralJumpODE(
            input_dim=d_x, hidden_dim=H, output_dim=d_x, num_moments=K,
            n_hidden_layers=L, activation="relu", variance_method="direct",
            t_max=1.0, use_pallas="step")
        params = model.init(jax.random.PRNGKey(0))
        tx = make_adam(1e-3, 5e-4)
        packed = pack_params(params, num_moments=K, hidden_dim=H,
                             input_dim=d_x, output_dim=d_y,
                             n_hidden_layers=L)

        def apply_packed(pp, dx=d_x, dy=d_y):
            return fused_step_apply_packed(
                *pp, times, values, num_moments=K, activation="relu",
                input_scaling="identity", input_dim=dx, output_dim=dy,
                n_hidden_layers=L)

        def loss_of(p, dx=d_x):
            preds, before = model.apply(p, times, values, mask)
            return nj_ode_loss_dense(values, preds, before, mask,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])

        def ploss_of(pp, dx=d_x):
            preds, before = apply_packed(pp, dx, dx)
            return nj_ode_loss_dense(values, preds, before, mask,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])

        def floss_of(p, dx=d_x):
            return fused_step_loss(
                p, times, values, mask, num_moments=K, hidden_dim=H,
                activation="relu", input_scaling="identity",
                ignore_first_continuity=True, moment_weights=[1.0, 10.0],
                input_dim=dx, output_dim=dx, n_hidden_layers=L)

        def pfloss_of(pp, dx=d_x):
            return fused_step_loss_packed(
                *pp, times, values, mask, num_moments=K,
                activation="relu", input_scaling="identity",
                ignore_first_continuity=True, moment_weights=[1.0, 10.0],
                input_dim=dx, output_dim=dx, n_hidden_layers=L)

        def make_chain(arm, n):
            if arm in ("step", "pstep", "fstep"):
                p0 = packed if arm == "pstep" else params
                lfn = {"step": loss_of, "pstep": ploss_of,
                       "fstep": floss_of}[arm]
                s0 = tx.init(p0)

                def run(k):
                    p = jax.tree_util.tree_map(
                        lambda x: x + 0.0 * jax.random.uniform(k, ()), p0)

                    def body(c, _):
                        p, s = c
                        loss, g = jax.value_and_grad(lfn)(p)
                        updates, s = tx.update(g, s, p)
                        return (optax.apply_updates(p, updates), s), loss
                    (_, _), losses = lax.scan(body, (p, s0), None, length=n)
                    return losses[-1]
            elif arm in ("lgrad", "flgrad"):
                lg = jax.value_and_grad(ploss_of if arm == "lgrad"
                                        else pfloss_of)

                def run(k):
                    pp = jax.tree_util.tree_map(
                        lambda x: x + 0.0 * jax.random.uniform(k, ()), packed)

                    def body(pp, _):
                        loss, g = lg(pp)
                        pp = jax.tree_util.tree_map(
                            lambda a, b: a + 1e-30 * b, pp, g)
                        return pp, loss
                    _, vs = lax.scan(body, pp, None, length=n)
                    return vs[-1]
            elif arm == "lfwd":
                def run(k):
                    pp = jax.tree_util.tree_map(
                        lambda x: x + 0.0 * jax.random.uniform(k, ()), packed)

                    def body(pp, _):
                        v = ploss_of(pp)
                        pp = jax.tree_util.tree_map(
                            lambda a: a * (1.0 + 1e-30 * v), pp)
                        return pp, v
                    _, vs = lax.scan(body, pp, None, length=n)
                    return vs[-1]
            elif arm == "adam":
                s0 = tx.init(packed)

                def run(k):
                    g0 = jax.tree_util.tree_map(
                        lambda x: x * 1e-6 + jax.random.uniform(k, ()) * 0.0,
                        packed)

                    def body(c, _):
                        p, s = c
                        updates, s = tx.update(g0, s, p)
                        p = optax.apply_updates(p, updates)
                        return (p, s), jnp.sum(updates[-1])
                    (_, _), vs = lax.scan(body, (packed, s0), None, length=n)
                    return vs[-1]
            elif arm == "kgrad":
                gfn = jax.grad(lambda pp: sum(
                    jnp.sum(o) for o in apply_packed(pp)))

                def run(k):
                    pp = jax.tree_util.tree_map(
                        lambda x: x + 0.0 * jax.random.uniform(k, ()), packed)

                    def body(pp, _):
                        g = gfn(pp)
                        pp = jax.tree_util.tree_map(
                            lambda a, b: a + 1e-30 * b, pp, g)
                        return pp, jnp.sum(g[0])
                    _, vs = lax.scan(body, pp, None, length=n)
                    return vs[-1]
            else:  # kfwd
                def run(k):
                    pp = jax.tree_util.tree_map(
                        lambda x: x + 0.0 * jax.random.uniform(k, ()), packed)

                    def body(pp, _):
                        v = sum(jnp.sum(o) for o in apply_packed(pp))
                        pp = jax.tree_util.tree_map(
                            lambda a: a * (1.0 + 1e-30 * v), pp)
                        return pp, v
                    _, vs = lax.scan(body, pp, None, length=n)
                    return vs[-1]
            return jax.jit(run)

        for arm in args.arms.split(","):
            if (arm in ("step", "fstep", "pstep", "lgrad", "flgrad", "lfwd")
                    and d_y != d_x):
                continue  # the loss needs output_dim == input_dim
            f1, f4 = make_chain(arm, args.m), make_chain(arm, 4 * args.m)
            t0 = time.perf_counter()
            v1 = np.asarray(f1(key))
            v4 = np.asarray(f4(key))
            log(f"{cfg} {arm}: warmup+compile {time.perf_counter()-t0:.1f}s "
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
            results[(cfg, arm)] = min(deltas)
            print(f"{cfg} {arm:6s} {min(deltas)*1e3:7.3f} ms  "
                  f"(deltas {[f'{d*1e3:.3f}' for d in deltas]})", flush=True)

    for cfg in args.configs.split(","):
        r = {a: results[(cfg, a)] for a in args.arms.split(",")
             if (cfg, a) in results}
        if {"pstep", "kgrad", "kfwd"} <= r.keys():
            line = (f"{cfg}: fwd-kernel {r['kfwd']*1e3:.3f}, "
                    f"bwd-kernel {(r['kgrad']-r['kfwd'])*1e3:.3f}, "
                    f"loss+Adam {(r['pstep']-r['kgrad'])*1e3:.3f}")
            if "step" in r:
                line += f", pack-glue {(r['step']-r['pstep'])*1e3:.3f}"
            print(line, flush=True)
        if {"step", "fstep"} <= r.keys():
            print(f"{cfg}: lane-space loss step {r['fstep']*1e3:.3f} vs "
                  f"composed {r['step']*1e3:.3f} = "
                  f"{r['step']/r['fstep']:.2f}x", flush=True)
        if {"lgrad", "flgrad"} <= r.keys():
            print(f"{cfg}: lane-space lgrad {r['flgrad']*1e3:.3f} vs "
                  f"composed {r['lgrad']*1e3:.3f} = "
                  f"{r['lgrad']/r['flgrad']:.2f}x", flush=True)
        if {"lgrad", "kgrad"} <= r.keys():
            line = f"{cfg}: loss-fwd+bwd {(r['lgrad']-r['kgrad'])*1e3:.3f}"
            if "lfwd" in r:
                line += f" (fwd alone {(r['lfwd']-r.get('kfwd', 0))*1e3:.3f})"
            if "pstep" in r:
                line += f", Adam-in-step {(r['pstep']-r['lgrad'])*1e3:.3f}"
            if "adam" in r:
                line += f", adam-arm {r['adam']*1e3:.3f}"
            print(line, flush=True)


if __name__ == "__main__":
    main()
