"""Marginal training-step A/B at the scaled config: XLA vs fused-step kernel.

Measures the scaled-sweep recipe's minibatch train step (hidden 256, K=2
separate networks, B=4096, N=2 observation slots, single-Euler gaps) with
the chain-N-vs-4N methodology from BENCH_NOTES.md: the tunneled backend
adds a ~36 ms fixed per-execute transport constant, so the only honest
per-step number is the DIFFERENCE between chaining the step M and 4M times
inside one jitted scan, divided by 3M.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_scaled_step.py \
      [--arms xla,step] [--dtypes float32,bfloat16] [--m 64] [--hidden 256]

``--hidden`` and ``--batch`` accept comma-separated lists: the full
(hidden x batch) boundary sweep then runs inside ONE process, so the
tunnel's first-execute transport cost is paid once, not per cell.

Prints one line per (arm, dtype): marginal step ms, achieved TFLOP/s from
XLA cost analysis of the single step, and MFU vs the v5e 197 TF bf16 peak.
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
    ap.add_argument("--arms", type=str, default="xla,step")
    ap.add_argument("--dtypes", type=str, default="float32,bfloat16")
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--hidden", type=str, default="256",
                    help="hidden dim, or a comma-separated sweep list")
    ap.add_argument("--batch", type=str, default="4096",
                    help="batch rows, or a comma-separated sweep list")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--shared", action="store_true",
                    help="measure the shared-network variant of the config")
    ap.add_argument("--input-dim", type=int, default=1,
                    help="d_x > 1 measures the widened kernel on "
                         "black_scholes_nd data (output_dim follows d_x)")
    ap.add_argument("--layers", type=int, default=1,
                    help="n_hidden_layers (the r5 widened kernel)")
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

    nonce = int.from_bytes(os.urandom(4), "little")

    peak_bf16 = 197e12  # v5e MXU peak (bf16); f32 runs at half

    hiddens = [int(h) for h in str(args.hidden).split(",")]
    batches = [int(b) for b in str(args.batch).split(",")]
    sweep = len(hiddens) > 1 or len(batches) > 1
    all_results = {}
    d_x = args.input_dim
    for B in batches:
      if d_x > 1:
          batch = simulate_batch(jax.random.PRNGKey(0), B,
                                 "black_scholes_nd", 0.02, dims=d_x,
                                 obs_only=True, T=1.0, n_steps=100,
                                 mu=0.1, sigma=0.5)
      else:
          batch = simulate_batch(jax.random.PRNGKey(0), B, "black_scholes",
                                 0.02, obs_only=True, T=1.0, n_steps=100,
                                 mu=0.1, sigma=0.5, x0=1.0)
      times, values, mask = batch.times, batch.values, batch.mask
      log(f"batch: times {times.shape}")
      for hidden in hiddens:
        results = {}
        all_results[(hidden, B)] = results
        if sweep:
            print(f"--- hidden {hidden} x batch {B} ---", flush=True)
        for dtype in args.dtypes.split(","):
            cdt = None if dtype == "float32" else dtype
            for arm in args.arms.split(","):
                model = NeuralJumpODE(
                    input_dim=d_x, hidden_dim=hidden, output_dim=d_x,
                    num_moments=2, n_hidden_layers=args.layers,
                    activation="relu",
                    variance_method="direct", t_max=1.0,
                    shared_network=args.shared,
                    use_pallas=("step" if arm in ("step", "packed") else False),
                    compute_dtype=cdt)
                if arm in ("step", "packed") and not model._use_fused_step(
                        times.shape[1]):
                    log(f"SKIP {arm}/{dtype}: kernel ineligible")
                    continue
                tx = make_adam(1e-3, 5e-4)
                params = model.init(jax.random.PRNGKey(0))

                if arm == "packed":
                    # train state = the kernel's padded tensors; zero per-step
                    # pytree<->padded packing glue (ops/fused_step.py)
                    from njode_tpu.ops.fused_step import (fused_step_apply_packed,
                                                          pack_params,
                                                          packed_state_safe)
                    assert packed_state_safe("relu", "identity")
                    params = pack_params(params, num_moments=2,
                                         hidden_dim=hidden,
                                         shared_network=args.shared,
                                         input_dim=d_x, output_dim=d_x,
                                         n_hidden_layers=args.layers)
                opt_state = tx.init(params)

                def one_step(p, s):
                    def loss_fn(pp):
                        if arm == "packed":
                            preds, before = fused_step_apply_packed(
                                *pp, times, values, num_moments=2,
                                activation="relu", input_scaling="identity",
                                compute_dtype=model.compute_dtype,
                                shared_network=args.shared,
                                input_dim=d_x, output_dim=d_x,
                                n_hidden_layers=args.layers)
                        else:
                            # routes the 'step' arm through the lane-space
                            # fused loss (r5i) and the 'xla' arm through the
                            # composed apply + nj_ode_loss_dense — exactly
                            # what each path runs in the Trainer/bench
                            return model.apply_loss(
                                pp, times, values, mask,
                                ignore_first_continuity=True,
                                moment_weights=[1.0, 10.0])
                        return nj_ode_loss_dense(values, preds, before, mask,
                                                 ignore_first_continuity=True,
                                                 moment_weights=[1.0, 10.0])
                    loss, g = jax.value_and_grad(loss_fn)(p)
                    updates, s = tx.update(g, s, p)
                    return optax.apply_updates(p, updates), s, loss

                def chain(n):
                    def run(p, s, key):
                        # fold the key in so the remote execution service can't
                        # memoize (program, inputs) across timing reps
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
                np.asarray(f1(params, opt_state, key))
                np.asarray(f4(params, opt_state, key))
                log(f"{arm}/{dtype}: warmup+compile {time.perf_counter()-t0:.1f}s")

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
                tflops = step_flops / step_s / 1e12 if step_flops else 0.0
                mfu = tflops * 1e12 / peak_bf16 * 100.0
                results[(arm, dtype)] = (step_s, tflops, mfu)
                print(f"{arm:5s} {dtype:8s}  step {step_s*1e3:7.3f} ms  "
                      f"{tflops:6.1f} TF/s  MFU(bf16-peak) {mfu:5.1f}%  "
                      f"(flops/step {step_flops:.3g}, deltas "
                      f"{[f'{d*1e3:.3f}' for d in deltas]})", flush=True)

    for (hidden, B), results in all_results.items():
        cell = f"h{hidden}/B{B}: " if sweep else ""
        for dtype in args.dtypes.split(","):
            a = results.get(("xla", dtype))
            for other in ("step", "packed"):
                b = results.get((other, dtype))
                if a and b:
                    print(f"{cell}speedup {dtype}: {a[0]/b[0]:.2f}x "
                          f"(xla {a[0]*1e3:.3f} ms -> {other} "
                          f"{b[0]*1e3:.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
