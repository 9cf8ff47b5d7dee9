"""Diagnostic (r5h): isolate the flat-Adam blowup at the widened config.

probe_widened_step.py measured the Adam arm at 0.81 ms/step for the 2x2
packed tree vs ~0.00 for 1x1, where the two trees differ ONLY in the
bo2 leaf shape ((2,) vs (2,2)) — W (2,4,256,256) and V (2,16,256) are
identical.  Arms (chain-M-vs-4M marginal, min of reps):

  ravel : ravel_pytree + unravel roundtrip only
  adam  : the make_adam(flat=True) update step
  adamf : same but bo2 pre-reshaped to 1-D (4,)
  adamn : make_adam(flat=False) (plain optax tree-map chain)

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_flat_adam.py [--m 64] [--reps 3]
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
    ap.add_argument("--m", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--arms", type=str, default="ravel,adam,adamf,adamn")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax import lax
    from jax.flatten_util import ravel_pytree

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from njode_tpu.utils import make_adam
    from njode_tpu.utils.backend import ensure_backend

    devices = ensure_backend()
    log(f"platform={devices[0].platform}")

    key = jax.random.PRNGKey(0)
    nonce = int.from_bytes(os.urandom(4), "little")
    key = jax.random.fold_in(key, nonce)

    def make_tree(bo2_shape):
        ks = jax.random.split(key, 3)
        return (jax.random.normal(ks[0], (2, 4, 256, 256)) * 0.02,
                jax.random.normal(ks[1], (2, 16, 256)) * 0.02,
                jax.random.normal(ks[2], bo2_shape) * 0.02)

    trees = {"1x1": make_tree((2,)), "2x2": make_tree((2, 2)),
             "2x2f": make_tree((4,)),
             # trigger-boundary shapes for the third leaf
             "mid2": make_tree((2, 2, 256)),    # second-minor dim 2
             "last2": make_tree((2, 256, 2)),   # minor dim 2
             "b21": make_tree((2, 1))}          # trivial minor

    def model_tree(d):
        from njode_tpu import NeuralJumpODE
        m = NeuralJumpODE(input_dim=d, hidden_dim=256, output_dim=d,
                          num_moments=2, n_hidden_layers=1,
                          activation="relu", variance_method="direct",
                          t_max=1.0)
        return m.init(jax.random.PRNGKey(0))

    trees["model1"] = model_tree(1)
    trees["model2"] = model_tree(2)

    def chain_ravel(tree, n):
        def run(k):
            t = jax.tree_util.tree_map(
                lambda x: x + 0.0 * jax.random.uniform(k, ()), tree)

            def body(t, _):
                v, unravel = ravel_pytree(t)
                t = unravel(v * (1.0 + 1e-30))
                return t, jnp.sum(v)
            _, vs = lax.scan(body, t, None, length=n)
            return vs[-1]
        return jax.jit(run)

    def chain_adam_r(tree, n):
        """Flat adam, but every leaf is reshaped 1-D before the ravel and
        back to its true shape after the unravel (state keeps true shapes
        in the carry — tests whether the fix can live inside make_adam)."""
        import optax as _o
        b1, b2, eps, lr, wd = 0.9, 0.999, 1e-8, 1e-3, 5e-4
        shapes = [x.shape for x in tree]
        flat1 = lambda t: [x.reshape(-1) for x in t]
        back = lambda t: tuple(x.reshape(s) for x, s in zip(t, shapes))
        sizes = [int(np.prod(s)) for s in shapes]
        offs = np.cumsum([0] + sizes)

        def rav(leaves):
            return jnp.concatenate(flat1(leaves))

        def unrav(v):
            return back([v[offs[i]:offs[i + 1]] for i in range(len(sizes))])

        s0 = (jnp.zeros((), jnp.int32),
              jax.tree_util.tree_map(jnp.zeros_like, tree),
              jax.tree_util.tree_map(jnp.zeros_like, tree))

        def run(k):
            g0 = jax.tree_util.tree_map(
                lambda x: x * 1e-6 + 0.0 * jax.random.uniform(k, ()), tree)

            def body(c, _):
                p, (count, mu_t, nu_t) = c
                g = rav(g0) + wd * rav(p)
                mu, nu = rav(mu_t), rav(nu_t)
                count = _o.safe_int32_increment(count)
                mu = (1 - b1) * g + b1 * mu
                nu = (1 - b2) * (g * g) + b2 * nu
                mu_hat = mu / (1 - b1 ** count).astype(mu.dtype)
                nu_hat = nu / (1 - b2 ** count).astype(nu.dtype)
                upd = (mu_hat / (jnp.sqrt(nu_hat) + eps)) * (-lr)
                p = _o.apply_updates(p, unrav(upd))
                return (p, (count, unrav(mu), unrav(nu))), jnp.sum(upd)
            (_, _), vs = lax.scan(body, (tree, s0), None, length=n)
            return vs[-1]
        return jax.jit(run)

    def chain_adam(tree, n, flat):
        tx = make_adam(1e-3, 5e-4, flat=flat)
        s0 = tx.init(tree)

        def run(k):
            g0 = jax.tree_util.tree_map(
                lambda x: x * 1e-6 + 0.0 * jax.random.uniform(k, ()), tree)

            def body(c, _):
                p, s = c
                updates, s = tx.update(g0, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), jnp.sum(jax.tree_util.tree_leaves(updates)[0])
            (_, _), vs = lax.scan(body, (tree, s0), None, length=n)
            return vs[-1]
        return jax.jit(run)

    ap_names = [t for t in os.environ.get(
        "PROBE_TREES", "1x1,2x2,2x2f").split(",") if t]

    jobs = []
    for name in ap_names:
        tree = trees[name]
        for arm in args.arms.split(","):
            if arm == "ravel":
                mk = lambda n, t=tree: chain_ravel(t, n)
            elif arm == "adam":
                mk = lambda n, t=tree: chain_adam(t, n, True)
            elif arm == "adamf":
                continue  # covered by the 2x2f tree + adam arm
            elif arm == "adamn":
                mk = lambda n, t=tree: chain_adam(t, n, False)
            elif arm == "adamr":
                mk = lambda n, t=tree: chain_adam_r(t, n)
            else:
                raise SystemExit(f"unknown arm {arm}")
            jobs.append((name, arm, mk))

    for name, arm, mk in jobs:
        f1, f4 = mk(args.m), mk(4 * args.m)
        t0 = time.perf_counter()
        v1 = np.asarray(f1(key))
        v4 = np.asarray(f4(key))
        log(f"{name} {arm}: warmup+compile {time.perf_counter()-t0:.1f}s "
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
        print(f"{name} {arm:6s} {min(deltas)*1e3:7.3f} ms  "
              f"(deltas {[f'{d*1e3:.3f}' for d in deltas]})", flush=True)


if __name__ == "__main__":
    main()
