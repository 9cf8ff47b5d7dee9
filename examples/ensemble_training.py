"""Ensemble example: K seeds trained in ONE program, uncertainty bands out.

The reference measures seed variance by launching K sequential jobs; here
``train_ensemble`` vmaps the whole training run over the seed axis, so the
members' matmuls batch together on the MXU and K models cost close to one.
The trained stack then gives epistemic (seed) uncertainty around the
conditional-moment predictions for the price of one vmapped forward.

Run: python examples/ensemble_training.py   (NJODE_SMOKE=1 shrinks sizes)
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/njode_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from njode_tpu.utils.backend import ensure_backend  # noqa: E402

ensure_backend()

from njode_tpu import NeuralJumpODE  # noqa: E402
from njode_tpu.simulation import simulate_batch  # noqa: E402
from njode_tpu.simulation.moments import moments_at_obs  # noqa: E402
from njode_tpu.utils import (ensemble_mean_std, ensemble_predict,  # noqa: E402
                             train_ensemble)


def main():
    smoke = os.environ.get("NJODE_SMOKE") == "1"
    n_seeds = 4 if smoke else 8
    n_traj, n_epochs = (64, 8) if smoke else (1000, 200)
    P = dict(T=1.0, n_steps=20 if smoke else 100, mu=0.1, sigma=0.5, x0=1.0)

    model = NeuralJumpODE(input_dim=1, hidden_dim=32, output_dim=1,
                          num_moments=2)

    t0 = time.perf_counter()
    params_stack, losses = train_ensemble(
        model, "black_scholes", n_seeds=n_seeds, n_epochs=n_epochs,
        n_trajectories=n_traj, batch_size=min(128, n_traj),
        obs_fraction=0.1, **P)
    losses = np.asarray(losses)
    print(f"trained {n_seeds} members x {n_epochs} epochs in "
          f"{time.perf_counter() - t0:.1f}s (incl. compile)")
    print("final losses per member:",
          " ".join(f"{v:.4f}" for v in losses[-1]))

    # ---- epistemic uncertainty on a fresh eval batch ----
    batch = simulate_batch(jax.random.PRNGKey(99), 16, "black_scholes",
                           obs_fraction=0.1, **P)
    preds, preds_before = ensemble_predict(model, params_stack, batch.times,
                                           batch.values, batch.mask)
    mean, std = ensemble_mean_std(preds_before)   # (B, N, 1, M)

    # compare the ensemble-mean conditional mean with the analytic truth
    _, truth_before = moments_at_obs(batch.times, batch.values,
                                     "black_scholes", num_moments=2, **P)
    err = np.asarray(jnp.abs(mean[:, 1:, :, 0] - truth_before[:, 1:, :, 0]))
    band = np.asarray(std[:, 1:, :, 0])
    print(f"ensemble-mean abs error vs analytic E[X|obs]: {err.mean():.4f}")
    print(f"mean seed-uncertainty band (std over members): {band.mean():.4f}")
    frac = float(np.mean(err <= 2 * band + 1e-2))
    print(f"fraction of truths within mean +- 2 std bands: {frac:.2f}")

    # ---- population training: a learning-rate grid as ONE run ----
    # same vmapped machinery, but the members differ in optimizer
    # hyperparameters (per-member lr rides the optimizer state) and share
    # the data stream — argmin over the final losses picks the winner
    from njode_tpu.utils.ensemble import train_population
    lrs = [1e-2, 1e-3, 1e-4]
    t0 = time.perf_counter()
    _, _, hist = train_population(
        model, "black_scholes", learning_rates=lrs,
        n_epochs=max(4, n_epochs // 4), n_trajectories=n_traj,
        batch_size=min(128, n_traj), obs_fraction=0.1, **P)
    final = np.asarray(hist["train"])[-1]
    if np.all(np.isnan(final)):          # nanargmin raises on all-NaN
        print(f"lr sweep {lrs}: every member diverged (all-NaN final loss)")
    else:
        best = int(np.nanargmin(final))  # a diverged member never wins
        print(f"lr sweep {lrs} in {time.perf_counter() - t0:.1f}s -> "
              f"winner lr={lrs[best]:g} (final losses "
              f"{' '.join(f'{v:.4f}' for v in final)})")


if __name__ == "__main__":
    main()
