"""Online / batch serving for trained NJ-ODE models.

No reference analogue: the reference's only inference surfaces are the
training forward and a plotting rollout.  This module packages the model for
deployment:

* :class:`NJODEFilter` — ONLINE filtering: hold a compact per-stream state
  (latest jump latent + last observation), ``update`` it on each new
  observation, ``predict`` conditional moments at any future time.  Both
  operations are O(1) in stream length (the jump resets the latent, so no
  history is needed) and jit-compiled once.
* batch queries — :meth:`NeuralJumpODE.predict_at` answers B x Q arbitrary
  (stream, time) queries as one batched program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .models import NeuralJumpODE


@dataclass
class FilterState:
    """Per-stream sufficient statistic: (latent after last jump, last obs)."""
    h: jnp.ndarray        # (K_h, B, d_h)
    x_last: jnp.ndarray   # (B, d_x)
    t_last: jnp.ndarray   # (B,)
    seen: jnp.ndarray     # (B,) bool — any observation yet?


jax.tree_util.register_pytree_node(
    FilterState,
    lambda s: ((s.h, s.x_last, s.t_last, s.seen), None),
    lambda _, c: FilterState(*c),
)


class NJODEFilter:
    """Streaming conditional-moment filter around a trained model."""

    def __init__(self, model: NeuralJumpODE, params: Any):
        self.model = model
        self.params = params
        self._update = jax.jit(self._update_impl)
        self._predict = jax.jit(self._predict_impl)

    def init_state(self, n_streams: int) -> FilterState:
        m = self.model
        return FilterState(
            h=jnp.zeros((m.k_hidden, n_streams, m.hidden_dim), m.dtype),
            x_last=jnp.zeros((n_streams, m.input_dim), m.dtype),
            t_last=jnp.zeros((n_streams,), m.dtype),
            seen=jnp.zeros((n_streams,), bool),
        )

    # ------------------------------------------------------------- online

    def _update_impl(self, params, state: FilterState, t_obs, x_obs,
                     obs_mask=None) -> FilterState:
        """Ingest one observation per stream (mask=False streams hold)."""
        m = self.model
        t_obs = jnp.broadcast_to(t_obs, state.t_last.shape).astype(m.dtype)
        x_obs = x_obs.astype(m.dtype)
        h_new = m._jump(params, x_obs)
        if obs_mask is None:
            return FilterState(h_new, x_obs, t_obs,
                               jnp.ones_like(state.seen))
        mk = obs_mask
        return FilterState(
            jnp.where(mk[None, :, None], h_new, state.h),
            jnp.where(mk[:, None], x_obs, state.x_last),
            jnp.where(mk, t_obs, state.t_last),
            state.seen | mk,
        )

    def update(self, state: FilterState, t_obs, x_obs,
               obs_mask: Optional[jnp.ndarray] = None) -> FilterState:
        return self._update(self.params, state, t_obs, x_obs, obs_mask)

    def _predict_impl(self, params, state: FilterState, t_query):
        m = self.model
        t_query = jnp.broadcast_to(t_query, state.t_last.shape).astype(m.dtype)
        h = m._integrate_gap(params, state.h, state.x_last, state.t_last,
                             t_query, inference=True)
        y = m._readout(params, h)                      # (B, d_y, K)
        y = jnp.where(state.seen[:, None, None], y, 0.0)
        return {"mean": y[..., 0], "var": m.variance_from_raw(y), "raw": y}

    def predict(self, state: FilterState, t_query):
        """Conditional moments at ``t_query`` (>= each stream's t_last)."""
        # guard: with fixed dt_ode_step, gaps beyond the static substep
        # budget would silently under-integrate (same check as apply())
        gaps = jnp.maximum(
            jnp.broadcast_to(jnp.asarray(t_query), state.t_last.shape)
            - state.t_last, 0.0)
        self.model._check_gap_budget(gaps)
        return self._predict(self.params, state, t_query)
