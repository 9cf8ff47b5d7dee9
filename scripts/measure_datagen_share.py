"""Datagen share of the training epoch, per process family.

Answers "what would an exact observation-time sampler buy?" for the
families that lack one (Heston, and hybrid before r3): measures the
marginal cost of (a) a full training epoch with FRESH data generated
inside the program and (b) the same epoch on CACHED data, using the
chain-M-vs-4M differencing from BENCH_NOTES.md.  The difference of the
two marginals is the datagen cost sitting on the critical path of the
composed program (which can be less than standalone datagen time — XLA
overlaps independent ops).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/measure_datagen_share.py \
      [--processes heston,hybrid_ou_bs,black_scholes] [--m 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


PROCESS_PARAMS = {
    "black_scholes": dict(mu=0.1, sigma=0.5, x0=1.0),
    "ornstein_uhlenbeck": dict(theta=1.0, mu=0.5, sigma=0.3, x0=0.0),
    "heston": dict(mu=0.5, kappa=2.0, theta=0.04, xi=0.5, rho=-0.5,
                   x0=1.0, v0=0.04),
    "hybrid_ou_bs": dict(theta_ou=1.0, mu_ou=0.5, sigma_ou=0.3,
                         mu_bs=0.1, sigma_bs=0.2, x0=1.0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--processes", type=str,
                    default="heston,hybrid_ou_bs,black_scholes")
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--n-train", type=int, default=1000)
    ap.add_argument("--batch-size", type=int, default=128)
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
    from njode_tpu.simulation import simulate_batch, supports_obs_only
    from njode_tpu.utils import make_adam
    from njode_tpu.utils.backend import ensure_backend

    devices = ensure_backend()
    log(f"platform={devices[0].platform}")
    nonce = int.from_bytes(os.urandom(4), "little")

    n, bs = args.n_train, args.batch_size
    nb = -(-n // bs)
    n_pad = nb * bs

    for process in args.processes.split(","):
        P = dict(T=1.0, n_steps=100, **PROCESS_PARAMS[process])
        obs_only = supports_obs_only(process)
        model = NeuralJumpODE(input_dim=1, hidden_dim=32, output_dim=1,
                              num_moments=2, n_hidden_layers=1,
                              activation="relu", t_max=1.0)
        tx = make_adam(1e-3, 5e-4)
        params0 = model.init(jax.random.PRNGKey(0))
        opt0 = tx.init(params0)
        cached = simulate_batch(jax.random.PRNGKey(3), n, process, 0.1,
                                obs_only=obs_only, **P)
        cached = (cached.times, cached.values, cached.mask)

        def epoch(p, s, times, values, mask, k_perm):
            perm = jax.random.permutation(k_perm, n)
            idx = jnp.concatenate(
                [perm, jnp.zeros((n_pad - n,), perm.dtype)]).reshape(nb, bs)
            valid = (jnp.arange(n_pad) < n).reshape(nb, bs)

            def mb(c, x):
                p, s = c
                ids, vm = x

                def loss_fn(pp):
                    pr, pb = model.apply(pp, times[ids], values[ids],
                                         mask[ids])
                    return nj_ode_loss_dense(values[ids], pr, pb, mask[ids],
                                             ignore_first_continuity=True,
                                             moment_weights=[1.0, 10.0],
                                             traj_mask=vm)
                loss, g = jax.value_and_grad(loss_fn)(p)
                up, s = tx.update(g, s, p)
                return (optax.apply_updates(p, up), s), loss
            (p, s), losses = lax.scan(mb, (p, s), (idx, valid))
            return p, s, jnp.mean(losses)

        def chain(n_ep, fresh):
            def run(p, s, key):
                def body(c, e):
                    p, s = c
                    kd, kp = jax.random.split(jax.random.fold_in(key, e))
                    if fresh:
                        b = simulate_batch(kd, n, process, 0.1,
                                           obs_only=obs_only, **P)
                        t, v, m = b.times, b.values, b.mask
                    else:
                        t, v, m = cached
                    p, s, loss = epoch(p, s, t, v, m, kp)
                    return (p, s), loss
                (p, s), losses = lax.scan(body, (p, s),
                                          jnp.arange(n_ep))
                return losses[-1]
            return jax.jit(run)

        out = {}
        for fresh in (True, False):
            f1, f4 = chain(args.m, fresh), chain(4 * args.m, fresh)
            key = jax.random.fold_in(jax.random.PRNGKey(9), nonce)
            t0 = time.perf_counter()
            np.asarray(f1(params0, opt0, key))
            np.asarray(f4(params0, opt0, key))
            log(f"{process} fresh={fresh}: warmup "
                f"{time.perf_counter()-t0:.1f}s")
            deltas = []
            for rep in range(args.reps):
                k = jax.random.fold_in(key, rep + 1)
                t0 = time.perf_counter()
                np.asarray(f1(params0, opt0, k))
                t1 = time.perf_counter()
                np.asarray(f4(params0, opt0, k))
                t2 = time.perf_counter()
                deltas.append(((t2 - t1) - (t1 - t0)) / (3 * args.m))
            out[fresh] = min(deltas)
        share = 1.0 - out[False] / out[True]
        print(f"{process:18s} obs_only={str(obs_only):5s} "
              f"epoch fresh {out[True]*1e3:7.3f} ms | cached "
              f"{out[False]*1e3:7.3f} ms | datagen share "
              f"{share*100:5.1f}%", flush=True)


if __name__ == "__main__":
    main()
