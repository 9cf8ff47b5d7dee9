"""Generative sampling from a trained NJ-ODE (capability beyond the reference).

The NJ-ODE is trained to output the conditional mean (and variance) of the
process at any horizon given the last observation.  That learned conditional
law supports a moment-matched autoregressive sampler (cf. "Neural Jump ODEs
as Generative Models", arXiv:2510.02757 — PAPERS.md): starting from ``x0``,
repeatedly

  1. jump-encode the current sample      h   = jump_nn(x_i)
  2. integrate the latent over the gap   h⁻  = odeint(h, t_i -> t_{i+1})
  3. read out conditional moments        (m, v) = output_nn(h⁻)
  4. draw the next sample                x_{i+1} ~ law(m, v)

Each sampled point is treated as a fresh observation, so the generated path
follows the model's own one-step-ahead predictive distributions on the grid.
The sampler is ONE ``lax.scan`` over the grid with the batch of paths as a
dense array — all samples advance together through large batched matmuls,
mirroring the training forward's TPU-first design (models/jump_ode.py).

Step laws (the NJ-ODE predicts two moments; the law completes the family):

* ``"gaussian"``:  x' ~ N(m, v) — generic choice, exact for OU.
* ``"lognormal"``: x' lognormal with mean m and variance v — exact for
  Black-Scholes / geometric dynamics, keeps samples positive.
* ``"mean"``:      deterministic conditional-mean rollout (no noise; also
  the only option for num_moments == 1 models).

The reference has no generative capability (its model is used purely for
filtering/prediction, reference models/jump_ode.py:218-233).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .models.jump_ode import NeuralJumpODE

Array = jnp.ndarray

STEP_LAWS = ("gaussian", "lognormal", "mean")


# variance extraction lives on the model (one copy of the direct /
# second_moment convention shared with predict_at / predict_on_grid /
# NJODEFilter)
def _variance_from_raw(model: NeuralJumpODE, raw: Array) -> Array:
    return model.variance_from_raw(raw)


def _draw(key: jax.Array, law: str, mean: Array, var: Array,
          dtype) -> Array:
    if law == "mean":
        return mean
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    z = jax.random.normal(key, mean.shape, dtype)
    if law == "gaussian":
        return mean + std * z
    # lognormal with matched mean/variance:
    #   sigma^2 = log(1 + v/m^2), mu = log m - sigma^2/2  (m > 0)
    m_safe = jnp.maximum(mean, 1e-12)
    s2 = jnp.log1p(var / (m_safe ** 2))
    mu = jnp.log(m_safe) - 0.5 * s2
    x = jnp.exp(mu + jnp.sqrt(s2) * z)
    # degenerate to the gaussian draw where the mean is non-positive
    return jnp.where(mean > 0, x, mean + std * z)


def sample_paths(model: NeuralJumpODE, params, key: jax.Array, n_paths: int,
                 grid_times: Array, x0, law: str = "gaussian",
                 obs_times: Optional[Array] = None,
                 obs_values: Optional[Array] = None) -> Array:
    """Sample ``n_paths`` trajectories from the model's learned dynamics.

    Args:
      model/params: a (trained) NJ-ODE; needs num_moments >= 2 for the
        stochastic laws ("mean" works with any).
      key:    PRNG key.
      n_paths: number of sampled trajectories B.
      grid_times: strictly increasing target times — (G,) shared by every
        path or (B, G) per-path.  Spacing is arbitrary (each step
        integrates its own gap, the same machinery as ``predict_at``);
        irregular times such as a ``TrajectoryBatch.times`` matrix from an
        ``obs_only`` batch work directly.
      x0: initial value(s) at ``grid_times[0]`` — scalar, (d_x,), or
        (B, d_x).  Ignored when conditioning observations are given.
      law: one of "gaussian" | "lognormal" | "mean" (see module docstring).
      obs_times/obs_values: optional conditioning prefix — (N,) sorted
        observed times (all <= grid_times[0]) and (N, d_x) values shared by
        every sample; the rollout then starts from the LAST observation and
        integrates to ``grid_times[0]`` before the first draw.

    Returns:
      samples: (B, G, d_x) with ``samples[:, 0]`` = the first draw at
      ``grid_times[0]`` (= x0/conditioned draw only under law="mean"
      starting at the same point; in general grid point 0 is already a
      one-step-ahead draw when a conditioning prefix is given, else it is
      exactly the provided x0).
    """
    if law not in STEP_LAWS:
        raise ValueError(f"Unknown step law: {law}; one of {STEP_LAWS}")
    if law != "mean" and model.num_moments < 2:
        raise ValueError(
            f"law='{law}' needs a 2-moment model (num_moments="
            f"{model.num_moments}); use law='mean'")

    grid_times = jnp.asarray(grid_times, model.dtype)
    B = n_paths
    if grid_times.ndim == 2:
        if grid_times.shape[0] != B:
            raise ValueError(f"per-path times have leading dim "
                             f"{grid_times.shape[0]}, expected n_paths={B}")
        t_grid = grid_times                                   # (B, G)
    else:
        t_grid = jnp.broadcast_to(grid_times[None], (B, grid_times.shape[0]))
    G = t_grid.shape[1]
    d_x = model.input_dim

    if obs_values is not None:
        obs_times = jnp.asarray(obs_times, model.dtype)
        obs_values = jnp.asarray(obs_values, model.dtype).reshape(-1, d_x)
        x_start = jnp.broadcast_to(obs_values[-1], (B, d_x))
        t_start = jnp.broadcast_to(obs_times[-1], (B,))
        first_is_draw = True
    else:
        x0a = jnp.asarray(x0, model.dtype)
        if x0a.ndim == 0:
            x0a = jnp.broadcast_to(x0a, (1, d_x))
        else:  # (d_x,) -> (1, d_x); (B,) with d_x == 1 or (B, d_x) -> (B, d_x)
            x0a = x0a.reshape(-1, d_x)
        x_start = jnp.broadcast_to(x0a, (B, d_x))
        t_start = t_grid[:, 0]
        first_is_draw = False

    model._check_gap_budget(
        jnp.diff(jnp.concatenate([t_start[:, None], t_grid], axis=1),
                 axis=1))

    def one_step(x_cur, t_cur, t_next, k):
        """Advance every path one grid cell: jump, integrate, read out, draw."""
        h = model._jump(params, x_cur)                     # (K_h, B, d_h)
        h = model._integrate_gap(params, h, x_cur, t_cur, t_next,
                                 inference=True)
        raw = model._readout(params, h)                    # (B, d_y, K)
        mean = raw[..., 0]
        var = (_variance_from_raw(model, raw) if model.num_moments > 1
               else jnp.zeros_like(mean))
        return _draw(k, law, mean, var, model.dtype)

    keys = jax.random.split(key, G)

    if first_is_draw:
        x_first = one_step(x_start, t_start, t_grid[:, 0], keys[0])
    else:
        x_first = x_start

    def scan_step(carry, inp):
        x_cur, t_cur = carry
        t_next, k = inp                                       # t_next: (B,)
        x_next = one_step(x_cur, t_cur, t_next, k)
        return (x_next, t_next), x_next

    (_, _), xs = lax.scan(
        scan_step,
        (x_first, t_grid[:, 0]),
        (jnp.swapaxes(t_grid[:, 1:], 0, 1), keys[1:]))
    samples = jnp.concatenate([x_first[:, None], jnp.swapaxes(xs, 0, 1)],
                              axis=1)                      # (B, G, d_x)
    return samples
