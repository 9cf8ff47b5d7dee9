"""Plotting utilities (reference: utils/plotting.py).

Figure-1 style trajectory plots use the ONE canonical grid rollout
``NeuralJumpODE.predict_on_grid`` — resolving the reference's semantic drift
between ``model.forward`` and the plotting re-implementation
(SURVEY.md §3.4; reference utils/plotting.py:146-256).
"""

from __future__ import annotations

import json
from typing import List, Optional

import matplotlib

matplotlib.use("Agg")  # headless-safe
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _load_history(history_path: str) -> Optional[dict]:
    """Read a run's history.json; None (with a diagnostic) if unreadable."""
    try:
        with open(history_path, "r") as f:
            return json.load(f)
    except FileNotFoundError:
        print(f"[plotting] no history at {history_path}; skipping")
    except json.JSONDecodeError as e:
        print(f"[plotting] {history_path} is not valid JSON ({e}); skipping")
    return None


def _finish(fig, save_path: Optional[str]):
    """Shared figure finalizer: tight layout, optional save, always close."""
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=300, bbox_inches="tight")
    plt.close(fig)


def plot_training_history(history_path: str, save_path: Optional[str] = None):
    """Loss curves + per-epoch wall time side by side.

    Same artifact as the reference's history plot (its utils/plotting.py:12-40)
    — log-scale train/val loss on the left, epoch seconds on the right — but
    driven off the history schema documented in utils/metrics.py.
    """
    history = _load_history(history_path)
    if history is None:
        return

    fig, (ax_loss, ax_time) = plt.subplots(1, 2, figsize=(10, 6))

    curves = [("train_loss", "Training Loss"), ("val_loss", "Validation Loss")]
    for key, label in curves:
        series = history.get(key)
        if series:
            ax_loss.plot(series, label=label, alpha=0.7)
    ax_loss.set(xlabel="Epoch", ylabel="Loss", yscale="log",
                title="Training History")
    ax_loss.legend()
    ax_loss.grid(True, alpha=0.3)

    ax_time.plot(history.get("epoch_times", []), alpha=0.7)
    ax_time.set(xlabel="Epoch", ylabel="Time (seconds)",
                title="Training Time per Epoch")
    ax_time.grid(True, alpha=0.3)

    _finish(fig, save_path)


def plot_single_trajectory_with_condexp(model, params, process_type: str,
                                        process_params: dict,
                                        obs_fraction: float = 0.1,
                                        seed: int = 123,
                                        save_path: Optional[str] = None,
                                        ensemble_params=None):
    """Figure-1 style plot (reference utils/plotting.py:43-309).

    Simulates one path, subsamples observations, overlays: true path, model
    mean (±2σ bands when variance is learned), analytic conditional
    expectation (±2σ), and the observations.

    ``ensemble_params`` (a stacked params pytree from ``train_ensemble`` /
    ``init_ensemble``): every member is rolled out on the grid; the plot
    shows the ensemble-mean prediction, each member faintly, and an
    epistemic (seed) ±2σ band alongside the aleatoric one — a capability
    with no reference analogue.  ``params`` is ignored when given.
    """
    from ..simulation.sde import (
        generate_black_scholes, generate_heston, generate_hybrid_ou_bs,
        generate_ou, sample_obs_indices)
    from ..simulation.moments import (
        condexp_black_scholes_on_grid, condexp_heston_on_grid,
        condexp_hybrid_on_grid, condexp_ou_on_grid,
        condvar_black_scholes_on_grid, condvar_heston_on_grid,
        condvar_ou_on_grid)

    if process_type == "black_scholes":
        times_full, X_full = generate_black_scholes(seed=seed, **process_params)
    elif process_type == "ornstein_uhlenbeck":
        times_full, X_full = generate_ou(seed=seed, **process_params)
    elif process_type == "heston":
        times_full, X_full, _ = generate_heston(seed=seed, **process_params)
    elif process_type == "hybrid_ou_bs":
        times_full, X_full, switch_actual = generate_hybrid_ou_bs(
            seed=seed, **process_params)
    else:
        raise ValueError(f"Unknown process type: {process_type}")

    G = times_full.shape[0]
    obs_idx = sample_obs_indices(jax.random.PRNGKey(seed), 1, G, obs_fraction)[0]
    obs_times = times_full[obs_idx]
    obs_values = X_full[obs_idx]

    # analytic conditional expectation / variance on the dense grid
    if process_type == "black_scholes":
        ce = condexp_black_scholes_on_grid(times_full, X_full, obs_times,
                                           process_params.get("mu", 0.0))
    elif process_type == "ornstein_uhlenbeck":
        ce = condexp_ou_on_grid(times_full, X_full, obs_times,
                                process_params.get("theta", 1.0),
                                process_params.get("mu", 0.0))
    elif process_type == "heston":
        ce = condexp_heston_on_grid(times_full, X_full, obs_times,
                                    process_params.get("mu", 0.0))
    else:
        ce = condexp_hybrid_on_grid(times_full, X_full, obs_times,
                                    switch_time=float(switch_actual),
                                    theta_ou=process_params.get("theta_ou", 1.0),
                                    mu_ou=process_params.get("mu_ou", 0.0),
                                    mu_bs=process_params.get("mu_bs", 0.0))

    cv = None
    if model.num_moments > 1:
        if process_type == "black_scholes":
            cv = condvar_black_scholes_on_grid(
                times_full, X_full, obs_times,
                process_params.get("mu", 0.0), process_params.get("sigma", 0.2))
        elif process_type == "ornstein_uhlenbeck":
            cv = condvar_ou_on_grid(
                times_full, X_full, obs_times,
                process_params.get("theta", 1.0), process_params.get("sigma", 0.2))
        elif process_type == "heston":
            # the Heston variance approximation uses xi (vol-of-vol), same
            # convention as the at-obs truths feeding the relative-loss
            # metric (simulation/moments.py) — the reference plot read a
            # nonexistent 'sigma' here and silently drew sigma=0.2 bands
            cv = condvar_heston_on_grid(
                times_full, X_full, obs_times,
                process_params.get("mu", 0.0),
                process_params.get("xi", 0.5))

    # model rollout on the dense grid — one canonical path for all inference
    obs_mask = jnp.zeros((1, G), bool).at[0, obs_idx].set(True)
    member_means = seed_std = None
    if ensemble_params is not None:
        outs = jax.vmap(lambda p: model.predict_on_grid(
            p, times_full, obs_mask, X_full[None, :, None]))(ensemble_params)
        member_means = np.asarray(outs["mean"][:, 0, :, 0])       # (K, G)
        model_mean = member_means.mean(axis=0)
        seed_std = member_means.std(axis=0)
        model_var = (None if outs["var"] is None
                     else np.asarray(outs["var"][:, 0, :, 0]).mean(axis=0))
    else:
        out = model.predict_on_grid(params, times_full, obs_mask,
                                    X_full[None, :, None])
        model_mean = np.asarray(out["mean"][0, :, 0])
        model_var = (None if out["var"] is None
                     else np.asarray(out["var"][0, :, 0]))

    # ---- draw ----
    t = np.asarray(times_full)
    plt.figure(figsize=(12, 8))
    plt.plot(t, np.asarray(X_full), "b-", label="True Path", linewidth=1.5)
    if member_means is not None:
        for m in member_means:
            plt.plot(t, m, color="darkorange", alpha=0.25, linewidth=0.7)
        plt.fill_between(t, model_mean - 2 * seed_std,
                         model_mean + 2 * seed_std, color="darkorange",
                         alpha=0.25,
                         label=f"Seed ±2σ ({member_means.shape[0]} members)")
        plt.plot(t, model_mean, "r-", label="Ensemble Mean", linewidth=1.5)
    else:
        plt.plot(t, model_mean, "r-", label="Model Mean", linewidth=1.5)
    plt.plot(t, np.asarray(ce), "g:", label="True Conditional Expectation",
             linewidth=2)
    plt.scatter(np.asarray(obs_times), np.asarray(obs_values), c="black",
                s=30, label="Observations", zorder=5)

    if model_var is not None:
        std = np.sqrt(np.maximum(model_var, 0))
        plt.fill_between(t, model_mean - 2 * std, model_mean + 2 * std,
                         color="red", alpha=0.2, label="Model ±2σ")
        if cv is not None:
            tstd = np.sqrt(np.maximum(np.asarray(cv), 0))
            ce_np = np.asarray(ce)
            plt.fill_between(t, ce_np - 2 * tstd, ce_np + 2 * tstd,
                             color="green", alpha=0.15, label="True ±2σ")

    plt.xlabel("Time")
    plt.ylabel("Value")
    title = (f"{process_type.replace('_', ' ').title()} Process - "
             f"Model vs True Conditional Expectation")
    if model_var is not None:
        title += " (with Variance)"
    plt.title(title)
    plt.legend()
    plt.grid(True, alpha=0.3)
    if save_path:
        plt.savefig(save_path, dpi=300, bbox_inches="tight")
    plt.close()


def plot_relative_loss(history_paths: List[str], labels: List[str],
                       save_path: Optional[str] = None):
    """Overlay relative-loss curves from several runs' history.json files.

    Same artifact as the reference's figure-2 overlay (its
    utils/plotting.py:312-349).  Runs whose history is missing, unparsable,
    or lacks the ``relative_loss`` key are reported and skipped rather than
    aborting the comparison.
    """
    fig, ax = plt.subplots(figsize=(10, 6))

    drew_any = False
    for history_path, label in zip(history_paths, labels):
        history = _load_history(history_path)
        if history is None:
            continue
        series = history.get("relative_loss")
        if series is None:
            print(f"[plotting] {history_path} has no relative_loss series; "
                  "skipping")
            continue
        ax.plot(series, label=label, linewidth=2)
        drew_any = True

    ax.set(xlabel="Epoch",
           ylabel="Relative Loss (L_model - L_true) / L_true",
           title="Relative Loss: Model vs True Conditional Expectation")
    if drew_any:
        ax.legend()
    ax.grid(True, alpha=0.3)
    _finish(fig, save_path)


def plot_relative_loss_single(history_path: str, save_path: Optional[str] = None):
    plot_relative_loss([history_path], ["Relative Loss"], save_path)
