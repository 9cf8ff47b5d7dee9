"""Diagnostic (r5i): is the dense NJ-ODE loss's (B, N, d, K) layout the
next tiny-trailing-dim pathology?

probe_widened_step.py (r5h) measured loss fwd+bwd at 0.163 ms of the
0.313 ms 1x1 scaled training step — ~52% — on (4096, 2, 1, 2) preds
whose trailing moment dim K=2 < 8 is exactly the shape class that made
the flat Adam pathological.  Arms (chain-M-vs-4M marginal, grads wrt
preds/preds_before, synthetic data):

  cur   : nj_ode_loss_dense on (B, N, d, K) preds (the shipped layout)
  split : same math hand-written on pre-split 2-D (B, N*d) planes
          Y/Yb/W/Wb (moment slices taken OUTSIDE the grad fn)
  curT  : nj_ode_loss_dense on a (B, K, N, d) pre-transposed copy,
          sliced back inside — isolates the transpose cost

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_loss_layout.py [--m 128] [--d 1] [--slots 2]
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
    ap.add_argument("--m", type=int, default=128)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--slots", type=int, default=2)
    ap.add_argument("--d", type=int, default=1)
    ap.add_argument("--arms", type=str, default="cur,split")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from njode_tpu.models import nj_ode_loss_dense
    from njode_tpu.utils.backend import ensure_backend

    devices = ensure_backend()
    log(f"platform={devices[0].platform}")

    B, N, d, K = args.batch, args.slots, args.d, 2
    nonce = int.from_bytes(os.urandom(4), "little")
    key = jax.random.fold_in(jax.random.PRNGKey(3), nonce)
    ks = jax.random.split(key, 4)
    X = jax.random.normal(ks[0], (B, N, d)) * 0.1 + 1.0
    preds = jax.random.normal(ks[1], (B, N, d, K)) * 0.1 + 1.0
    before = jax.random.normal(ks[2], (B, N, d, K)) * 0.1 + 1.0
    mask = jnp.ones((B, N), bool)
    mask_f = mask.astype(jnp.float32)
    n_obs = jnp.maximum(jnp.sum(mask_f, axis=1), 1.0)
    w0, w1, eps = 1.0, 10.0, 1e-10

    def loss_cur(p, pb):
        return nj_ode_loss_dense(X, p, pb, mask,
                                 ignore_first_continuity=True,
                                 moment_weights=[w0, w1])

    X2 = X.reshape(B, N * d)

    def loss_split(planes):
        """Identical math on 2-D (B, N*d) planes (moment slices made
        outside the grad fn; d-sums via reshape once per term)."""
        Y, Yb, W, Wb = planes

        def obs_mean(per):                       # (B, N) -> (B,)
            return jnp.sum(per * mask_f, axis=1) / n_obs

        def dsum(a2):                            # (B, N*d) -> (B, N)
            return a2.reshape(B, N, d).sum(-1) if d > 1 else a2

        def two_term(jsq, csq):
            csq = csq.at[:, 0].set(0.0)
            per = (jnp.sqrt(jsq + eps) + jnp.sqrt(csq + eps)) ** 2
            return obs_mean(per)

        jsq = dsum((X2 - Y) ** 2)
        csq = dsum((X2 - Yb) ** 2)
        total = w0 * two_term(jsq, csq)
        V, Vb = W ** 2, Wb ** 2
        Z = (X2 - lax.stop_gradient(Y)) ** 2
        Zb = (X2 - lax.stop_gradient(Yb)) ** 2
        vj = dsum((Z - V) ** 2)
        vc = dsum((Zb - Vb) ** 2)
        total = total + w1 * two_term(vj, vc)
        return jnp.mean(total)

    planes0 = (preds[..., 0].reshape(B, N * d),
               before[..., 0].reshape(B, N * d),
               preds[..., 1].reshape(B, N * d),
               before[..., 1].reshape(B, N * d))

    # sanity: identical value
    v_cur = float(loss_cur(preds, before))
    v_spl = float(loss_split(planes0))
    log(f"values: cur {v_cur:.6f} split {v_spl:.6f}")
    assert abs(v_cur - v_spl) < 1e-4 * max(1.0, abs(v_cur))

    def make_chain(arm, n):
        if arm == "cur":
            g = jax.grad(lambda p, pb: loss_cur(p, pb), argnums=(0, 1))

            def run(k):
                p0 = preds + 0.0 * jax.random.uniform(k, ())

                def body(c, _):
                    p, pb = c
                    gp, gpb = g(p, pb)
                    return (p + 1e-30 * gp, pb + 1e-30 * gpb), jnp.sum(gp)
                (_, _), vs = lax.scan(body, (p0, before), None, length=n)
                return vs[-1]
        elif arm == "split":
            g = jax.grad(loss_split)

            def run(k):
                pl0 = tuple(a + 0.0 * jax.random.uniform(k, ())
                            for a in planes0)

                def body(pl, _):
                    gp = g(pl)
                    return tuple(a + 1e-30 * b for a, b in zip(pl, gp)), \
                        jnp.sum(gp[0])
                _, vs = lax.scan(body, pl0, None, length=n)
                return vs[-1]
        else:
            raise SystemExit(f"unknown arm {arm}")
        return jax.jit(run)

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
        print(f"{arm:6s} {min(deltas)*1e3:7.3f} ms  "
              f"(deltas {[f'{d*1e3:.3f}' for d in deltas]})", flush=True)


if __name__ == "__main__":
    main()
