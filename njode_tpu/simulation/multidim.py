"""Multi-dimensional correlated SDE processes (capability beyond the reference).

The reference's simulators are strictly 1-D (every generator returns a scalar
path, simulation/data_generation.py:11-218, and ``create_trajectory_batch``
appends a singleton ``d_x`` axis, :289) while its model nominally accepts
``input_dim > 1`` — it just has no data to feed it.  The TPU model here fully
supports ``d_x > 1`` (all networks take ``(B, d_x)`` observations); this
module supplies the matching data side:

* ``bs_paths_nd``  — d-dimensional correlated geometric Brownian motion,
  exact log-Euler (componentwise lognormal, correlated driving Brownians via
  a Cholesky factor of the correlation matrix).
* ``ou_paths_nd``  — d-dimensional OU with componentwise mean-reversion and
  correlated driving noise, using the EXACT one-step discretization: the
  per-step noise covariance is
      C_ij = sigma_i sigma_j rho_ij (1 - e^{-(theta_i+theta_j) dt})
             / (theta_i + theta_j)
  (theta_i + theta_j -> 0 limit: sigma_i sigma_j rho_ij dt), and the linear
  recurrence is evaluated with ``lax.associative_scan`` exactly like the 1-D
  generator (sde.py) — O(log T) depth, one Cholesky per call.

Both are registered in the process registry as ``"black_scholes_nd"`` and
``"ornstein_uhlenbeck_nd"`` together with analytic conditional-moment
evaluators (componentwise closed forms — the NJ-ODE loss is componentwise,
so marginal moments are exactly what the relative-loss metric needs; driving
correlation affects cross-moments only), which makes them first-class
processes everywhere: ``simulate_batch``, the data loaders, training and the
relative-loss metric.

Conventions follow the 1-D evaluators (moments.py): after-jump truth = the
observation / variance 0; before-jump truth = closed-form propagation from
the previous observation; the first observation's before-value = itself / 0.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from .moments import _bs_mean, _bs_var, _ou_mean, _ou_var
from .sde import _affine_combine
from .registry import register_process

Array = jnp.ndarray


def _vec(x, d: int, dtype) -> Array:
    """Broadcast a scalar / tuple / list / array parameter to shape (d,)."""
    return jnp.broadcast_to(jnp.asarray(x, dtype), (d,))


def _corr_chol(corr, d: int, dtype) -> Array:
    """Cholesky factor of the driving-noise correlation matrix (identity if None)."""
    if corr is None:
        return jnp.eye(d, dtype=dtype)
    R = jnp.asarray(corr, dtype)
    if R.shape != (d, d):
        raise ValueError(f"corr must be ({d}, {d}), got {R.shape}")
    return jnp.linalg.cholesky(R)


# --------------------------------------------------------------------------
# generators
# --------------------------------------------------------------------------

def bs_paths_nd(key: jax.Array, n_paths: int, dims: int = 2, mu=0.0,
                sigma=0.2, corr=None, T: float = 1.0, n_steps: int = 100,
                x0=1.0, dtype=jnp.float32):
    """Correlated d-dimensional geometric Brownian motion.

    Exact in law on the grid: componentwise
    ``X_j(t+dt) = X_j(t) exp((mu_j - sigma_j^2/2) dt + sigma_j dW_j)`` with
    ``Corr(dW_i, dW_j) = rho_ij``.

    Args:
      dims:  d.
      mu, sigma, x0: scalar or length-d per-component parameters.
      corr:  (d, d) correlation matrix of the driving Brownians (None = iid).

    Returns: (times (n_steps+1,), X (n_paths, n_steps+1, d)).
    """
    d = int(dims)
    dt = T / n_steps
    times = jnp.linspace(0.0, T, n_steps + 1, dtype=dtype)
    mu_v = _vec(mu, d, dtype)
    sig_v = _vec(sigma, d, dtype)
    x0_v = _vec(x0, d, dtype)
    L = _corr_chol(corr, d, dtype)

    z = jax.random.normal(key, (n_paths, n_steps, d), dtype)
    dW = jnp.einsum("btd,ed->bte", z, L) * jnp.sqrt(jnp.asarray(dt, dtype))
    log_inc = (mu_v - 0.5 * sig_v ** 2) * dt + sig_v * dW
    logX = jnp.concatenate(
        [jnp.zeros((n_paths, 1, d), dtype), jnp.cumsum(log_inc, axis=1)],
        axis=1) + jnp.log(x0_v)
    return times, jnp.exp(logX)


def ou_paths_nd(key: jax.Array, n_paths: int, dims: int = 2, theta=1.0,
                mu=0.0, sigma=0.3, corr=None, T: float = 1.0,
                n_steps: int = 100, x0=0.0, dtype=jnp.float32):
    """Correlated d-dimensional Ornstein-Uhlenbeck, exact discretization.

    ``dX_j = theta_j (mu_j - X_j) dt + sigma_j dW_j`` with
    ``Corr(dW_i, dW_j) = rho_ij``.  One step is the affine map
    ``X_{k+1} = a * X_k + mu (1 - a) + eta_k`` with ``a_j = e^{-theta_j dt}``
    and ``eta ~ N(0, C)``, C as in the module docstring — exact in law,
    evaluated as a parallel prefix over affine maps (cf. sde.py ou_paths).

    Returns: (times (n_steps+1,), X (n_paths, n_steps+1, d)).
    """
    d = int(dims)
    dt = T / n_steps
    times = jnp.linspace(0.0, T, n_steps + 1, dtype=dtype)
    th = _vec(theta, d, dtype)
    mu_v = _vec(mu, d, dtype)
    sig_v = _vec(sigma, d, dtype)
    x0_v = _vec(x0, d, dtype)
    R = jnp.eye(d, dtype=dtype) if corr is None else jnp.asarray(corr, dtype)

    a = jnp.exp(-th * dt)                                     # (d,)
    b = mu_v * (1.0 - a)
    # exact one-step noise covariance (theta_i + theta_j -> 0 limit = dt)
    th_sum = th[:, None] + th[None, :]
    frac = jnp.where(th_sum > 1e-12,
                     (1.0 - jnp.exp(-th_sum * dt)) / jnp.where(th_sum > 1e-12,
                                                               th_sum, 1.0),
                     dt)
    C = sig_v[:, None] * sig_v[None, :] * R * frac            # (d, d)
    L = jnp.linalg.cholesky(C)

    z = jax.random.normal(key, (n_paths, n_steps, d), dtype)
    u = b + jnp.einsum("btd,ed->bte", z, L)                   # (B, T, d)
    A = jnp.broadcast_to(a, (n_paths, n_steps, d))

    A_c, U_c = lax.associative_scan(_affine_combine, (A, u), axis=1)
    X = jnp.concatenate(
        [jnp.broadcast_to(x0_v, (n_paths, 1, d)), A_c * x0_v + U_c], axis=1)
    return times, X


# --------------------------------------------------------------------------
# exact observation-time samplers (obs_only fast path, cf. sde.py)
# --------------------------------------------------------------------------

def bs_nd_values_at(key: jax.Array, times: Array, dims: int = 2, mu=0.0,
                    sigma=0.2, corr=None, x0=1.0,
                    dtype=jnp.float32) -> Array:
    """Exact correlated d-dim GBM samples at per-row sorted times (B, N).

    One correlated lognormal increment per inter-observation gap — the same
    law as grid-simulate-then-subsample (the grid is exact)."""
    d = int(dims)
    times = times.astype(dtype)
    dts = times[:, 1:] - times[:, :-1]                        # (B, N-1)
    mu_v = _vec(mu, d, dtype)
    sig_v = _vec(sigma, d, dtype)
    x0_v = _vec(x0, d, dtype)
    L = _corr_chol(corr, d, dtype)
    z = jax.random.normal(key, dts.shape + (d,), dtype)
    dW = jnp.einsum("bnd,ed->bne", z, L) * jnp.sqrt(dts)[..., None]
    inc = (mu_v - 0.5 * sig_v ** 2) * dts[..., None] + sig_v * dW
    logX = jnp.concatenate(
        [jnp.zeros((times.shape[0], 1, d), dtype),
         jnp.cumsum(inc, axis=1)], axis=1) + jnp.log(x0_v)
    return jnp.exp(logX)                                       # (B, N, d)


def ou_nd_values_at(key: jax.Array, times: Array, dims: int = 2, theta=1.0,
                    mu=0.0, sigma=0.3, corr=None, x0=0.0,
                    dtype=jnp.float32) -> Array:
    """Exact correlated d-dim OU samples at per-row sorted times (B, N).

    Per-gap exact AR(1) with the gap-dependent noise covariance
    ``C_ij(s) = sigma_i sigma_j rho_ij (1 - e^{-(theta_i+theta_j)s})
    / (theta_i + theta_j)`` (Brownian limit as theta -> 0); one batched
    (B, N-1, d, d) Cholesky, then the usual affine parallel prefix."""
    d = int(dims)
    times = times.astype(dtype)
    dts = times[:, 1:] - times[:, :-1]                        # (B, N-1)
    th = _vec(theta, d, dtype)
    mu_v = _vec(mu, d, dtype)
    sig_v = _vec(sigma, d, dtype)
    x0_v = _vec(x0, d, dtype)
    R = jnp.eye(d, dtype=dtype) if corr is None else jnp.asarray(corr, dtype)

    A = jnp.exp(-th * dts[..., None])                         # (B, N-1, d)
    b = mu_v * (1.0 - A)
    th_sum = th[:, None] + th[None, :]                        # (d, d)
    s = dts[..., None, None]                                  # (B, N-1, 1, 1)
    frac = jnp.where(th_sum > 1e-12,
                     (1.0 - jnp.exp(-th_sum * s))
                     / jnp.where(th_sum > 1e-12, th_sum, 1.0),
                     s)
    C = sig_v[:, None] * sig_v[None, :] * R * frac            # (B, N-1, d, d)
    # tiny diagonal jitter keeps the batched Cholesky stable at dt -> 0
    C = C + 1e-12 * jnp.eye(d, dtype=dtype)
    L = jnp.linalg.cholesky(C)
    z = jax.random.normal(key, dts.shape + (d,), dtype)
    eta = jnp.einsum("bnde,bne->bnd", L, z)
    u = b + eta

    A_c, U_c = lax.associative_scan(_affine_combine, (A, u), axis=1)
    return jnp.concatenate(
        [jnp.broadcast_to(x0_v, (times.shape[0], 1, d)),
         A_c * x0_v + U_c], axis=1)                            # (B, N, d)


# --------------------------------------------------------------------------
# analytic conditional moments (componentwise marginals)
# --------------------------------------------------------------------------

def _nd_moments(times: Array, values: Array, mean_b: Array, var_b: Array,
                num_moments: int, variance_method: str):
    """Assemble (moments, moments_before) from before-jump mean/variance.

    Same conventions as moments.py::moments_at_obs (after = observation /
    var 0; first obs before-value = itself / 0); moments >= 3 zero-fill."""
    B, N, d = values.shape
    first = jnp.zeros((B, N, 1), values.dtype).at[:, 0].set(1.0) > 0
    mean_after = values
    mean_before = jnp.where(first, values, mean_b)
    var_after = jnp.zeros_like(values)
    var_before = jnp.where(first, 0.0, var_b)

    moments = [mean_after]
    moments_before = [mean_before]
    if num_moments > 1:
        if variance_method == "direct":
            moments.append(var_after)
            moments_before.append(var_before)
        elif variance_method == "second_moment":
            moments.append(var_after + mean_after ** 2)
            moments_before.append(var_before + mean_before ** 2)
        else:
            raise ValueError(f"Unknown variance_method: {variance_method}")
    for _ in range(len(moments), num_moments):
        moments.append(jnp.zeros_like(values))
        moments_before.append(jnp.zeros_like(values))
    return jnp.stack(moments, axis=-1), jnp.stack(moments_before, axis=-1)


def bs_nd_moments(times: Array, values: Array, num_moments: int = 1,
                  variance_method: str = "direct", mu=0.0, sigma=0.2,
                  **_ignored):
    """Componentwise lognormal conditional moments for ``black_scholes_nd``."""
    d = values.shape[-1]
    dtype = values.dtype
    mu_v = _vec(mu, d, dtype)
    sig_v = _vec(sigma, d, dtype)
    B, N, _ = values.shape
    dt = jnp.concatenate(
        [jnp.zeros((B, 1), dtype), times[:, 1:] - times[:, :-1]],
        axis=1)[..., None]
    prev = jnp.concatenate([values[:, :1], values[:, :-1]], axis=1)
    mean_b = _bs_mean(prev, dt, mu_v)
    var_b = _bs_var(prev, dt, mu_v, sig_v)
    return _nd_moments(times, values, mean_b, var_b, num_moments,
                       variance_method)


def ou_nd_moments(times: Array, values: Array, num_moments: int = 1,
                  variance_method: str = "direct", theta=1.0, mu=0.0,
                  sigma=0.3, **_ignored):
    """Componentwise OU conditional moments for ``ornstein_uhlenbeck_nd``.

    Marginal conditional variance of component j is unaffected by the driving
    correlation (it only creates cross-covariance), so the 1-D closed forms
    apply per component."""
    d = values.shape[-1]
    dtype = values.dtype
    th = _vec(theta, d, dtype)
    mu_v = _vec(mu, d, dtype)
    sig_v = _vec(sigma, d, dtype)
    B, N, _ = values.shape
    dt = jnp.concatenate(
        [jnp.zeros((B, 1), dtype), times[:, 1:] - times[:, :-1]],
        axis=1)[..., None]
    prev = jnp.concatenate([values[:, :1], values[:, :-1]], axis=1)
    mean_b = _ou_mean(prev, dt, th, mu_v)
    # theta_j -> 0 limit: Brownian variance sigma_j^2 dt
    var_j = jnp.where(th > 1e-12,
                      _ou_var(dt, jnp.where(th > 1e-12, th, 1.0), sig_v),
                      sig_v ** 2 * dt)
    var_b = jnp.broadcast_to(var_j, prev.shape)
    return _nd_moments(times, values, mean_b, var_b, num_moments,
                       variance_method)


register_process("black_scholes_nd", bs_paths_nd, moments_fn=bs_nd_moments,
                 obs_values_fn=bs_nd_values_at)
register_process("ornstein_uhlenbeck_nd", ou_paths_nd,
                 moments_fn=ou_nd_moments, obs_values_fn=ou_nd_values_at)
