"""Generative sampling example: train on OU, then sample new trajectories.

The trained NJ-ODE knows the conditional mean/variance of the process at any
horizon; `njode_tpu.sample_paths` turns that into a moment-matched
autoregressive path sampler (optionally conditioned on an observed prefix).

Run: PYTHONPATH=.. python generative_sampling.py   (or from the repo root:
     python examples/generative_sampling.py)
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/njode_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from njode_tpu.utils.backend import ensure_backend  # noqa: E402

ensure_backend()

from njode_tpu import NeuralJumpODE, sample_paths
from njode_tpu.models import nj_ode_loss_dense
from njode_tpu.simulation import simulate_batch

THETA, MU, SIGMA = 2.0, 1.0, 0.4


def main():
    # NJODE_SMOKE=1 shrinks everything so CI can execute the example cheaply
    import os
    smoke = os.environ.get("NJODE_SMOKE") == "1"
    n_batch, n_steps, n_samples = (64, 20, 256) if smoke else (512, 600, 4000)

    # ---- train briefly on OU paths (fresh data per step) ----
    model = NeuralJumpODE(input_dim=1, hidden_dim=32, output_dim=1,
                          num_moments=2, activation="tanh")
    params = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step(p, s, k):
        batch = simulate_batch(k, n_batch, "ornstein_uhlenbeck",
                               obs_fraction=0.1, theta=THETA, mu=MU,
                               sigma=SIGMA, x0=0.0)

        def loss_fn(p):
            preds, before = model.apply(p, batch.times, batch.values,
                                        batch.mask)
            return nj_ode_loss_dense(batch.values, preds, before, batch.mask,
                                     moment_weights=(1.0, 10.0))

        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    key = jax.random.PRNGKey(1)
    for i in range(n_steps):
        params, state, loss = step(params, state, jax.random.fold_in(key, i))
    print(f"trained: final loss {float(loss):.4f}")

    # ---- sample fresh trajectories from the learned dynamics ----
    grid = jnp.linspace(0.0, 1.0, 21)
    samples = sample_paths(model, params, jax.random.PRNGKey(7), n_samples,
                           grid, x0=0.0, law="gaussian")
    s = np.asarray(samples)[..., 0]
    t = np.asarray(grid)
    true_mean = MU * (1 - np.exp(-THETA * t))
    true_std = np.sqrt(SIGMA ** 2 / (2 * THETA) * (1 - np.exp(-2 * THETA * t)))
    print("   t    sample-mean  true-mean  sample-std  true-std")
    for i in range(0, 21, 4):
        print(f"  {t[i]:.2f}   {s[:, i].mean():9.4f}  {true_mean[i]:9.4f}"
              f"  {s[:, i].std():9.4f}  {true_std[i]:9.4f}")

    # ---- conditional generation: continue an observed prefix ----
    obs_t = jnp.asarray([0.0, 0.5])
    obs_v = jnp.asarray([[0.0], [2.0]])  # last obs far above the mean
    cont = sample_paths(model, params, jax.random.PRNGKey(9), n_samples,
                        jnp.linspace(0.6, 1.5, 10), x0=None,
                        law="gaussian", obs_times=obs_t, obs_values=obs_v)
    c = np.asarray(cont)[..., 0]
    print(f"conditional continuation from x=2.0: mean at t=0.6 "
          f"{c[:, 0].mean():.3f} -> t=1.5 {c[:, -1].mean():.3f} "
          f"(mean-reverting toward {MU})")


if __name__ == "__main__":
    main()
