"""Serving example: train, then filter a live stream and answer queries.

Run: PYTHONPATH=.. python serving_example.py   (or from the repo root:
     python examples/serving_example.py)
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

ensure_backend()  # degrade gracefully if the ambient TPU plugin is flaky

from njode_tpu import NeuralJumpODE, NJODEFilter, nj_ode_loss
from njode_tpu.simulation import simulate_batch
from njode_tpu.utils import make_adam


def main():
    # NJODE_SMOKE=1 shrinks everything so CI can execute the example cheaply
    import os
    smoke = os.environ.get("NJODE_SMOKE") == "1"
    n_batch, n_steps = (64, 20) if smoke else (512, 300)

    # ---- train briefly on Black-Scholes paths ----
    model = NeuralJumpODE(input_dim=1, hidden_dim=32, output_dim=1,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_adam(1e-3, 5e-4)
    opt_state = tx.init(params)
    batch = simulate_batch(jax.random.PRNGKey(1), n_batch, "black_scholes",
                           obs_fraction=0.1, mu=0.1, sigma=0.5)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pr, pb = model.apply(p, batch.times, batch.values, batch.mask)
            return nj_ode_loss(batch.times, batch.values, pr, pb,
                               ignore_first_continuity=True,
                               moment_weights=[1.0, 10.0], mask=batch.mask)
        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, u), opt_state, loss

    for i in range(n_steps):
        params, opt_state, loss = step(params, opt_state)
    print(f"trained: loss {float(loss):.4f}")

    # ---- online filtering: one stream of irregular observations ----
    # tip: for models with dt_ode_step set, construct the serving model
    # with use_pallas="auto" — on TPU the fused whole-gap kernel cuts
    # streaming predict latency 3.4x (BENCH_NOTES.md)
    f = NJODEFilter(model, params)
    state = f.init_state(n_streams=1)
    observations = [(0.00, 1.00), (0.12, 1.08), (0.31, 0.97), (0.55, 1.15)]
    for t_obs, x_obs in observations:
        state = f.update(state, jnp.asarray([t_obs]),
                         jnp.asarray([[x_obs]]))
        out = f.predict(state, jnp.asarray([t_obs + 0.1]))
        m = float(out["mean"][0, 0])
        s = float(np.sqrt(out["var"][0, 0]))
        print(f"after obs @t={t_obs:.2f} (x={x_obs:.2f}): "
              f"E[X_{t_obs + 0.1:.2f}] = {m:.4f} ± {2 * s:.4f}")

    # ---- batched queries: many streams x many times in one dispatch ----
    out = model.predict_at(params, batch.times[:4], batch.values[:4],
                           jnp.tile(jnp.linspace(0.0, 1.0, 11)[None], (4, 1)),
                           batch.mask[:4])
    print("batched query means, stream 0:",
          np.round(np.asarray(out["mean"][0, :, 0]), 3))


if __name__ == "__main__":
    main()
