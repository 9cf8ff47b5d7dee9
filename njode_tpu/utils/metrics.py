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

import weakref

import jax
import jax.numpy as jnp

from ..models import NeuralJumpODE, nj_ode_loss_dense
from ..simulation import TrajectoryBatch
from ..simulation.moments import moments_at_obs

# one compiled program per (model, metric-config) — eager evaluation would
# dispatch op-by-op, which this backend charges ~1s/compile for (CLAUDE.md).
# Keyed on the model OBJECT via weakref: an id()-keyed dict could silently
# serve a stale compiled metric to a new model that reused the id after GC.
# The cached closures hold only a WEAK reference to the model — a strong
# capture would live in the cache VALUE and pin the key alive forever
# (WeakKeyDictionary evicts only when the key becomes unreachable), so
# dead-model entries would never actually be freed.
_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _truths(model: NeuralJumpODE, batch: TrajectoryBatch, process_type: str,
            variance_method: str, use_batch_switch_times: bool,
            **process_params):
    switch_times = (batch.switch_times if use_batch_switch_times else None)
    return moments_at_obs(batch.times, batch.values, process_type,
                          num_moments=model.num_moments,
                          variance_method=variance_method,
                          mask=batch.mask, switch_times=switch_times,
                          **process_params)


def _get_jitted(kind: str, model: NeuralJumpODE, process_type: str,
                variance_method: str, use_batch_switch_times: bool,
                moment_weights, process_params: dict):
    key = (kind, process_type, variance_method,
           use_batch_switch_times,
           None if moment_weights is None else tuple(moment_weights),
           tuple(sorted((k, v) for k, v in process_params.items()
                        if isinstance(v, (int, float, bool, str)))))
    per_model = _JIT_CACHE.setdefault(model, {})
    if key in per_model:
        return per_model[key]

    model_ref = weakref.ref(model)

    def _model():
        m = model_ref()
        if m is None:  # pragma: no cover - reachable only via a stale handle
            raise RuntimeError("metric jit cache: model was garbage-collected")
        return m

    def rel_fn(params, batch):
        model = _model()
        preds, preds_before = model.apply(params, batch.times, batch.values,
                                          batch.mask)
        L_model = nj_ode_loss_dense(batch.values, preds, preds_before,
                                    batch.mask, moment_weights=moment_weights,
                                    variance_method=variance_method)
        yt, ytb = _truths(model, batch, process_type, variance_method,
                          use_batch_switch_times, **process_params)
        L_true = nj_ode_loss_dense(batch.values, yt, ytb, batch.mask,
                                   moment_weights=moment_weights,
                                   variance_method=variance_method)
        return (L_model - L_true) / jnp.maximum(L_true, 1e-8)

    def mse_fn(params, batch):
        model = _model()
        _, preds_before = model.apply(params, batch.times, batch.values,
                                      batch.mask)
        _, ytb = _truths(model, batch, process_type, variance_method,
                         use_batch_switch_times, **process_params)
        d_out = preds_before.shape[2]
        m = batch.mask[:, 1:, None].astype(preds_before.dtype)
        denom = jnp.maximum(m.sum() * d_out, 1.0)  # elements, not slots
        mse_mean = (((preds_before[:, 1:, :, 0] - ytb[:, 1:, :, 0]) ** 2)
                    * m).sum() / denom
        if model.num_moments > 1:
            w = preds_before[:, 1:, :, 1]
            var_pred = w ** 2 if variance_method == "direct" else w
            var_true = ytb[:, 1:, :, 1]
            mse_var = (((var_pred - var_true) ** 2) * m).sum() / denom
        else:
            mse_var = jnp.nan
        return mse_mean, mse_var

    fn = jax.jit(rel_fn if kind == "rel" else mse_fn)
    per_model[key] = fn
    return fn


def relative_loss(model: NeuralJumpODE, params, batch: TrajectoryBatch,
                  process_type: str, moment_weights=None,
                  variance_method: str = "direct",
                  use_batch_switch_times: bool = False,
                  **process_params) -> float:
    """(L_model - L_true) / max(L_true, 1e-8) on a trajectory batch."""
    fn = _get_jitted("rel", model, process_type, variance_method,
                     use_batch_switch_times, moment_weights, process_params)
    return float(fn(params, batch))


def conditional_moment_mse(model: NeuralJumpODE, params,
                           batch: TrajectoryBatch, process_type: str,
                           variance_method: str = "direct",
                           use_batch_switch_times: bool = False,
                           **process_params) -> dict:
    """Per-element MSE of before-jump mean/variance predictions vs analytic
    truths.  Slot 0 is excluded (its truth is defined as the observation
    itself).  Returns {'mean': float, 'var': Optional[float]}.
    """
    fn = _get_jitted("mse", model, process_type, variance_method,
                     use_batch_switch_times, None, process_params)
    mse_mean, mse_var = fn(params, batch)
    mse_var = float(mse_var)
    return {"mean": float(mse_mean),
            "var": None if mse_var != mse_var else mse_var}
