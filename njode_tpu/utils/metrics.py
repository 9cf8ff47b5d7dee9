"""Standalone evaluation metrics.

Library-level versions of the quality metrics the Trainer tracks:

* :func:`relative_loss` — the paper's headline metric
  ``(L_model - L_true) / L_true`` against analytic conditional-moment truths
  (reference utils/training.py:219-255).
* :func:`conditional_moment_mse` — MSE of the predictive (before-jump)
  conditional mean/variance vs the closed forms; the BASELINE acceptance
  metric.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models import NeuralJumpODE, nj_ode_loss_dense
from ..simulation import TrajectoryBatch
from ..simulation.moments import moments_at_obs


def _truths(model: NeuralJumpODE, batch: TrajectoryBatch, process_type: str,
            variance_method: str, use_batch_switch_times: bool,
            **process_params):
    switch_times = (batch.switch_times if use_batch_switch_times else None)
    return moments_at_obs(batch.times, batch.values, process_type,
                          num_moments=model.num_moments,
                          variance_method=variance_method,
                          mask=batch.mask, switch_times=switch_times,
                          **process_params)


def relative_loss(model: NeuralJumpODE, params, batch: TrajectoryBatch,
                  process_type: str, moment_weights=None,
                  variance_method: str = "direct",
                  use_batch_switch_times: bool = False,
                  **process_params) -> float:
    """(L_model - L_true) / max(L_true, 1e-8) on a trajectory batch."""
    preds, preds_before = model.apply(params, batch.times, batch.values,
                                      batch.mask)
    L_model = nj_ode_loss_dense(batch.values, preds, preds_before, batch.mask,
                                moment_weights=moment_weights,
                                variance_method=variance_method)
    yt, ytb = _truths(model, batch, process_type, variance_method,
                      use_batch_switch_times, **process_params)
    L_true = nj_ode_loss_dense(batch.values, yt, ytb, batch.mask,
                               moment_weights=moment_weights,
                               variance_method=variance_method)
    return float((L_model - L_true) / jnp.maximum(L_true, 1e-8))


def conditional_moment_mse(model: NeuralJumpODE, params,
                           batch: TrajectoryBatch, process_type: str,
                           variance_method: str = "direct",
                           use_batch_switch_times: bool = False,
                           **process_params) -> dict:
    """MSE of before-jump mean/variance predictions vs analytic truths.

    Slot 0 is excluded (its truth is defined as the observation itself).
    Returns {'mean': float, 'var': Optional[float]}.
    """
    _, preds_before = model.apply(params, batch.times, batch.values,
                                  batch.mask)
    _, ytb = _truths(model, batch, process_type, variance_method,
                     use_batch_switch_times, **process_params)
    m = batch.mask[:, 1:, None].astype(preds_before.dtype)
    denom = jnp.maximum(m.sum(), 1.0)
    mse_mean = float((((preds_before[:, 1:, :, 0] - ytb[:, 1:, :, 0]) ** 2)
                      * m).sum() / denom)
    out = {"mean": mse_mean, "var": None}
    if model.num_moments > 1:
        w = preds_before[:, 1:, :, 1]
        if variance_method == "direct":
            var_pred = w ** 2
            var_true = ytb[:, 1:, :, 1]
        else:  # second_moment: compare E[X^2] directly
            var_pred = w
            var_true = ytb[:, 1:, :, 1]
        out["var"] = float((((var_pred - var_true) ** 2) * m).sum() / denom)
    return out
