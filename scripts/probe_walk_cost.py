"""Diagnostic: where does the XLA grid walk's per-iteration cost go?

Times (chain-M-vs-4M marginal) four variants of a 100-iteration scan at the
production shapes, forward-only and value_and_grad:

  pergap : the model's per-gap fori_loop path (baseline)
  walk   : the full grid walk (selects + streamed xs)
  nosel  : the walk WITHOUT jump selects / xs streams (pure euler scan on
           a (B, d_h) carry — the floor of any lax.scan formulation)
  nostack: nosel without emitting per-step outputs (carry-only scan)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_walk_cost.py
"""

import argparse
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--grad", action="store_true")
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
    from njode_tpu.simulation import simulate_batch
    from njode_tpu.utils.backend import ensure_backend

    devices = ensure_backend()
    log(f"platform={devices[0].platform}")

    B = args.batch
    batch = simulate_batch(jax.random.PRNGKey(0), B, "black_scholes", 0.1,
                           obs_only=True, T=1.0, n_steps=100, mu=0.1,
                           sigma=0.5, x0=1.0)
    times, values, mask = batch.times, batch.values, batch.mask
    nonce = int.from_bytes(os.urandom(4), "little")

    def build_model(walk):
        return NeuralJumpODE(input_dim=1, hidden_dim=50, output_dim=1,
                             num_moments=2, n_hidden_layers=1,
                             activation="relu", shared_network=True,
                             dt_ode_step=0.01, t_max=1.0, grid_walk=walk)

    m_gap, m_walk = build_model(False), build_model(True)
    params = m_gap.init(jax.random.PRNGKey(0))
    M = 100
    dt = jnp.float32(0.01)

    def body_fn(model):
        def f(p, t, v):
            preds, before = model.apply(p, t, v, mask)
            return jnp.sum(before ** 2) + jnp.sum(preds ** 2)
        return f

    def scan_only(emit):
        def f(p, t, v):
            h0 = jnp.zeros((1, B, 50), jnp.float32)
            x0 = v[:, 0]
            tc = jnp.zeros((B,), jnp.float32)

            def body(carry, g):
                h, t_cur = carry
                h = m_walk._euler(p, h, x0, t_cur, t_cur + dt)
                out = h if emit else None
                return (h, t_cur + dt), out
            (h, _), outs = lax.scan(body, (h0, tc), jnp.arange(M))
            r = jnp.sum(h ** 2)
            if emit:
                r = r + jnp.sum(outs ** 2)
            return r
        return f

    variants = {
        "pergap": body_fn(m_gap),
        "walk": body_fn(m_walk),
        "nosel": scan_only(True),
        "nostack": scan_only(False),
    }

    for name, f in variants.items():
        if args.grad:
            f = jax.grad(f)
            red = lambda r: jax.tree_util.tree_reduce(
                lambda a, x: a + jnp.sum(x), r, 0.0)
        else:
            red = lambda r: r

        def chain(n, f=f, red=red):
            def run(p, key):
                # each iteration perturbs the params by the previous result
                # so the body is NOT loop-invariant (XLA hoists an invariant
                # scan body out of the loop and the chain measures nothing)
                acc0 = jax.random.uniform(key, ())

                def body(acc, _):
                    pp = jax.tree_util.tree_map(lambda x: x + 1e-30 * acc, p)
                    return red(f(pp, times, values)) * 1e-30 + acc, None
                acc, _ = lax.scan(body, acc0, None, length=n)
                return acc
            return jax.jit(run)

        f1, f4 = chain(args.m), chain(4 * args.m)
        key = jax.random.fold_in(jax.random.PRNGKey(1), nonce)
        t0 = time.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(f1(params, key))[0])
        np.asarray(jax.tree_util.tree_leaves(f4(params, key))[0])
        log(f"{name}: warmup {time.perf_counter()-t0:.1f}s")
        deltas = []
        for rep in range(args.reps):
            k = jax.random.fold_in(key, rep + 1)
            t0 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(f1(params, k))[0])
            t1 = time.perf_counter()
            np.asarray(jax.tree_util.tree_leaves(f4(params, k))[0])
            t2 = time.perf_counter()
            deltas.append(((t2 - t1) - (t1 - t0)) / (3 * args.m))
        step = min(deltas)
        print(f"{name:8s} {'grad' if args.grad else 'fwd '} "
              f"{step*1e3:8.3f} ms/call  ({step*1e6/M:6.2f} us/iter)",
              flush=True)


if __name__ == "__main__":
    main()
