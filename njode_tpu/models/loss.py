"""Neural Jump ODE loss — masked, batched, TPU-native.

Faithful re-derivation of the reference ``nj_ode_loss``
(reference: models/jump_ode.py:235-383) over dense ``[B, N]`` arrays with an
observation mask instead of ragged Python lists:

* Mean (moment 0): per observation
  ``(sqrt(||X - Y||^2 + eps) + sqrt(||X - Y^-||^2 + eps))^2``
  (reference :309-321, eps INSIDE each sqrt).
* Variance (moment 1), two modes (reference :333-353):
  - ``direct``:        V = W^2, target Z = (X - stop_gradient(Y_mean))^2 —
    the stop_gradient reproduces the reference's ``.detach()`` (:340-341).
  - ``second_moment``: V = W raw, target Z = X^2.  NOTE: the reference's
    docstring claims a softplus is applied here but the code applies none
    (:273 vs :349-353); we follow the code.
* Moments with index >= 2 contribute nothing to the loss by default, exactly
  as in the reference (only moments 0 and 1 are ever read, :304,:330);
  ``extended_moments=True`` opts into training them against analytic
  higher-moment targets (extension — see the inline note below).
* Reduction: per-trajectory mean over *observations*, weighted sum over
  moments, then mean over trajectories (reference :321,:374,:380-383).
* ``ignore_first_continuity`` zeroes the continuity error at slot 0
  (reference :315-317,:368-370).  Padding must therefore sit at row ends so
  slot 0 is always the first real observation.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def nj_ode_loss_dense(values: Array, preds: Array, preds_before: Array,
                      mask: Optional[Array] = None,
                      ignore_first_continuity: bool = False,
                      moment_weights=None,
                      eps: float = 1e-10,
                      variance_method: str = "direct",
                      traj_mask: Optional[Array] = None,
                      extended_moments: bool = False) -> Array:
    """Dense masked NJ-ODE loss.

    Args:
      values:       (B, N, d_x) observed values X.
      preds:        (B, N, d_x, K) after-jump predictions.
      preds_before: (B, N, d_x, K) before-jump predictions.
      mask:         (B, N) bool, True at real observation slots (padding at
                    row ends). None = all valid.
      traj_mask:    (B,) bool validity of whole trajectories (for padded
                    batches); None = all valid.

    Returns: scalar loss.
    """
    X = values
    B, N = X.shape[:2]
    num_moments = preds.shape[-1]
    if mask is None:
        mask_f = jnp.ones((B, N), dtype=X.dtype)
    else:
        mask_f = mask.astype(X.dtype)
    n_obs = jnp.maximum(jnp.sum(mask_f, axis=1), 1.0)  # (B,)

    if moment_weights is not None:
        moment_weights = jnp.asarray(moment_weights, dtype=X.dtype)

    def masked_obs_mean(per_obs: Array) -> Array:
        return jnp.sum(per_obs * mask_f, axis=1) / n_obs

    def two_term(jump_sq: Array, cont_sq: Array) -> Array:
        if ignore_first_continuity:
            cont_sq = cont_sq.at[:, 0].set(0.0)
        per_obs = (jnp.sqrt(jump_sq + eps) + jnp.sqrt(cont_sq + eps)) ** 2
        return masked_obs_mean(per_obs)

    # ---- moment 0: mean ----
    Y = preds[..., 0]
    Yb = preds_before[..., 0]
    jump_sq = jnp.sum((X - Y) ** 2, axis=-1)   # (B, N)
    cont_sq = jnp.sum((X - Yb) ** 2, axis=-1)
    mean_loss = two_term(jump_sq, cont_sq)     # (B,)
    w0 = 1.0 if moment_weights is None else moment_weights[0]
    total = w0 * mean_loss

    # ---- moment 1: variance / second moment ----
    if num_moments > 1:
        W = preds[..., 1]
        Wb = preds_before[..., 1]
        if variance_method == "direct":
            V = W ** 2
            Vb = Wb ** 2
            Z = (X - jax.lax.stop_gradient(Y)) ** 2
            Zb = (X - jax.lax.stop_gradient(Yb)) ** 2
        elif variance_method == "second_moment":
            V = W
            Vb = Wb
            Z = X ** 2
            Zb = Z
        else:
            raise ValueError(f"Unknown variance_method: {variance_method}")
        var_jump_sq = jnp.sum((Z - V) ** 2, axis=-1)
        var_cont_sq = jnp.sum((Zb - Vb) ** 2, axis=-1)
        var_loss = two_term(var_jump_sq, var_cont_sq)
        w1 = 1.0 if moment_weights is None else moment_weights[1]
        total = total + w1 * var_loss

    # ---- moments >= 2: EXTENSION beyond the reference ----
    # The reference allocates networks for higher moments but never trains
    # them ("Higher moments would be added here", data_generation.py:917;
    # the loss reads only moments 0/1).  With extended_moments=True, moment
    # index m >= 2 learns the (m+1)-th conditional moment:
    #   direct:        central moment E[(X - E[X])^{m+1}] — raw W, target
    #                  Z = (X - stop_gradient(Y_mean))^{m+1};
    #   second_moment: raw moment E[X^{m+1}] — raw W, target Z = X^{m+1}.
    if extended_moments and num_moments > 2:
        for k in range(2, num_moments):
            p_k = k + 1
            Wk = preds[..., k]
            Wkb = preds_before[..., k]
            if variance_method == "direct":
                Zk = (X - jax.lax.stop_gradient(Y)) ** p_k
                Zkb = (X - jax.lax.stop_gradient(Yb)) ** p_k
            else:
                Zk = X ** p_k
                Zkb = Zk
            jk = jnp.sum((Zk - Wk) ** 2, axis=-1)
            ck = jnp.sum((Zkb - Wkb) ** 2, axis=-1)
            lk = two_term(jk, ck)
            wk = 1.0 if moment_weights is None else moment_weights[k]
            total = total + wk * lk

    if traj_mask is None:
        return jnp.mean(total)
    tm = traj_mask.astype(X.dtype)
    return jnp.sum(total * tm) / jnp.maximum(jnp.sum(tm), 1.0)


def nj_ode_loss(batch_times: Union[Array, Sequence[Array]],
                batch_values: Union[Array, Sequence[Array]],
                preds: Union[Array, Sequence[Array]],
                preds_before: Union[Array, Sequence[Array]],
                ignore_first_continuity: bool = False,
                moment_weights=None,
                eps: float = 1e-10,
                variance_method: str = "direct",
                mask: Optional[Array] = None,
                traj_mask: Optional[Array] = None,
                extended_moments: bool = False) -> Array:
    """Reference-compatible entry point (models/jump_ode.py:235-244 signature).

    Accepts either the reference's ragged lists (per-trajectory arrays) or
    dense batched arrays.  ``batch_times`` is accepted for signature parity
    but — exactly like the reference — never read.
    """
    if isinstance(batch_values, (list, tuple)):
        from .jump_ode import pad_ragged
        _, values, m = pad_ragged(batch_times, batch_values)
        N = values.shape[1]

        # Densify with jnp ops (pad + stack) so jax.grad flows through the
        # reference-style pipeline model.forward -> nj_ode_loss -> grad
        # (reference models/jump_ode.py:235 — nj_ode_loss IS its training
        # loss).  Per-trajectory lengths are static shapes, so this traces.
        def densify(seq):
            rows = []
            for p in seq:
                p = jnp.asarray(p, dtype=values.dtype)
                pad = ((0, N - p.shape[0]),) + ((0, 0),) * (p.ndim - 1)
                rows.append(jnp.pad(p, pad))
            return jnp.stack(rows)

        return nj_ode_loss_dense(values, densify(preds),
                                 densify(preds_before), m,
                                 ignore_first_continuity, moment_weights, eps,
                                 variance_method,
                                 extended_moments=extended_moments)
    return nj_ode_loss_dense(batch_values, preds, preds_before, mask,
                             ignore_first_continuity, moment_weights, eps,
                             variance_method, traj_mask,
                             extended_moments=extended_moments)
