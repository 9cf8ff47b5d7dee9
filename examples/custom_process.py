"""Custom-process example: register a user-defined SDE and train on it.

The process here is a Brownian bridge-free CIR-like square-root diffusion;
analytic moments use the exact CIR conditional mean and variance, so the
relative-loss metric works out of the box.

Run from the repo root: python examples/custom_process.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import math

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/njode_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from njode_tpu.utils.backend import ensure_backend  # noqa: E402

ensure_backend()  # degrade gracefully if the ambient TPU plugin is flaky

from njode_tpu import NeuralJumpODE
from njode_tpu.simulation import register_process
from njode_tpu.utils import Trainer, create_data_loaders, make_adam


def cir_paths(key, n_paths, kappa=2.0, theta=0.04, xi=0.3, T=1.0,
              n_steps=100, x0=0.04):
    """dX = kappa (theta - X) dt + xi sqrt(X) dW (full-truncation Euler)."""
    dt = T / n_steps
    times = jnp.linspace(0.0, T, n_steps + 1)
    noise = jax.random.normal(key, (n_steps, n_paths)) * math.sqrt(dt)

    def step(X, dw):
        Xp = jnp.maximum(X, 0.0)
        X_n = X + kappa * (theta - Xp) * dt + xi * jnp.sqrt(Xp) * dw
        return X_n, X_n

    X0 = jnp.full((n_paths,), x0)
    _, Xs = jax.lax.scan(step, X0, noise)
    return times, jnp.concatenate([X0[None], Xs], axis=0).T


def cir_moments(times, values, num_moments=1, variance_method="direct",
                kappa=2.0, theta=0.04, xi=0.3, **_):
    """Exact CIR conditional moments given the last observation."""
    B, N, d = values.shape
    dt = jnp.concatenate(
        [jnp.zeros((B, 1)), times[:, 1:] - times[:, :-1]], axis=1)[..., None]
    prev = jnp.concatenate([values[:, :1], values[:, :-1]], axis=1)
    first = jnp.zeros((B, N, 1)).at[:, 0].set(1.0) > 0
    e = jnp.exp(-kappa * dt)
    mean_b = jnp.where(first, values, prev * e + theta * (1.0 - e))
    var_b = (prev * (xi ** 2 / kappa) * (e - e ** 2)
             + theta * (xi ** 2 / (2 * kappa)) * (1.0 - e) ** 2)
    var_b = jnp.where(first, 0.0, var_b)
    m = [values]
    mb = [mean_b]
    if num_moments > 1:
        if variance_method == "second_moment":
            m.append(values ** 2)
            mb.append(var_b + mean_b ** 2)
        else:
            m.append(jnp.zeros_like(values))
            mb.append(var_b)
    return jnp.stack(m, -1), jnp.stack(mb, -1)


def main():
    # NJODE_SMOKE=1 shrinks everything so CI can execute the example cheaply
    import os
    smoke = os.environ.get("NJODE_SMOKE") == "1"
    n_train, n_val, n_epochs = (64, 32, 4) if smoke else (512, 128, 100)

    register_process("cir", cir_paths, moments_fn=cir_moments)

    model = NeuralJumpODE(input_dim=1, hidden_dim=32, output_dim=1,
                          num_moments=2)
    trainer = Trainer(model, make_adam(1e-3, 5e-4),
                      ignore_first_continuity=True,
                      moment_weights=[1.0, 10.0])
    train_fn, val_fn = create_data_loaders(
        process_type="cir", n_train=n_train, n_val=n_val, obs_fraction=0.1,
        cache_data=False, kappa=2.0, theta=0.04, xi=0.3, x0=0.04)
    history = trainer.train(
        train_fn, val_fn, n_epochs=n_epochs, batch_size=128,
        print_every=2 if smoke else 20,
        config={"data": {"process_type": "cir", "kappa": 2.0,
                         "theta": 0.04, "xi": 0.3}})
    print(f"final val loss {history['val_loss'][-1]:.5f}, "
          f"final relative loss {history['relative_loss'][-1]:.4f}")


if __name__ == "__main__":
    main()
