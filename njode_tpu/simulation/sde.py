"""On-device SDE path simulators and observation subsampling.

TPU-native re-design of the reference generators
(reference: simulation/data_generation.py:11-291).  The reference simulates
one trajectory at a time with per-step Python loops and `torch.manual_seed(i)`
per trajectory; here every generator produces a whole batch ``(B, n_steps+1)``
in one shot from a single ``jax.random`` key:

* Black-Scholes:  exact log-Euler via one cumsum (reference :30-44).
* OU:             exact discretization ``X_{k+1} = a X_k + b + c xi_k``
                  (reference :80-92) — a linear recurrence evaluated with
                  ``lax.associative_scan`` (parallel prefix over affine maps),
                  so generation is O(log T) depth instead of O(T).
* Heston:         Euler with correlated Brownians and variance clamped at
                  1e-6 pre-sqrt and post-update (reference :190-216); the
                  V-recurrence is nonlinear so it stays a ``lax.scan`` with
                  vector (B,) carries.
* hybrid OU->BS:  branchless per-step blend by ``step < switch_idx``
                  (reference :96-162), continuous at the switch.

Observation subsampling mirrors ``subsample_random_grid_points``
(reference :221-252): ``n_obs = max(2, int(obs_fraction * n_grid))`` grid
indices, endpoints always included, interior points uniform without
replacement — realised with a batched top-k over uniform scores so every
trajectory keeps a STATIC number of observations (this is what makes the
whole training step a fixed-shape program).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


# --------------------------------------------------------------------------
# batched generators (B paths at once)
# --------------------------------------------------------------------------

def _affine_combine(lhs, rhs):
    """Composition of affine maps x -> a*x + u (the associative_scan
    combine): (a2, u2) o (a1, u1) = (a2*a1, a2*u1 + u2)."""
    al, ul = lhs
    ar, ur = rhs
    return al * ar, ar * ul + ur


def bs_paths(key: jax.Array, n_paths: int, mu: float = 0.0, sigma: float = 0.2,
             T: float = 1.0, n_steps: int = 100, x0: float = 1.0,
             dtype=jnp.float32):
    """Black-Scholes log-Euler on the fixed grid. Returns (times (n+1,), X (B, n+1))."""
    dt = T / n_steps
    times = jnp.linspace(0.0, T, n_steps + 1, dtype=dtype)
    dW = jax.random.normal(key, (n_paths, n_steps), dtype) * jnp.sqrt(jnp.asarray(dt, dtype))
    log_inc = (mu - 0.5 * sigma ** 2) * dt + sigma * dW
    logX = jnp.concatenate(
        [jnp.zeros((n_paths, 1), dtype), jnp.cumsum(log_inc, axis=1)], axis=1
    ) + jnp.log(jnp.asarray(x0, dtype))
    return times, jnp.exp(logX)


def ou_paths(key: jax.Array, n_paths: int, theta: float = 1.0, mu: float = 0.0,
             sigma: float = 0.3, T: float = 1.0, n_steps: int = 100,
             x0: float = 0.0, dtype=jnp.float32):
    """OU exact discretization via parallel prefix over affine maps.

    X_{k+1} = a X_k + u_k with a = exp(-theta dt),
    u_k = mu (1 - a) + c xi_k, c = sigma sqrt((1 - exp(-2 theta dt)) / (2 theta))
    (theta = 0 falls back to sigma sqrt(dt), reference :84).
    """
    dt = T / n_steps
    times = jnp.linspace(0.0, T, n_steps + 1, dtype=dtype)
    a = math.exp(-theta * dt)
    b = mu * (1.0 - a)
    if theta > 0:
        c = sigma * math.sqrt((1.0 - math.exp(-2.0 * theta * dt)) / (2.0 * theta))
    else:
        c = sigma * math.sqrt(dt)
    u = b + c * jax.random.normal(key, (n_paths, n_steps), dtype)  # (B, T)

    A = jnp.full((n_paths, n_steps), a, dtype)
    A_c, U_c = lax.associative_scan(_affine_combine, (A, u), axis=1)
    X = jnp.concatenate(
        [jnp.full((n_paths, 1), x0, dtype), A_c * x0 + U_c], axis=1
    )
    return times, X


def heston_paths(key: jax.Array, n_paths: int, mu: float = 0.0,
                 kappa: float = 2.0, theta: float = 0.04, xi: float = 0.5,
                 rho: float = -0.5, T: float = 1.0, n_steps: int = 100,
                 x0: float = 1.0, v0: float = 0.04, dtype=jnp.float32):
    """Heston Euler with correlated Brownians; returns (times, X (B,n+1), V (B,n+1))."""
    dt = T / n_steps
    times = jnp.linspace(0.0, T, n_steps + 1, dtype=dtype)
    k1, k2 = jax.random.split(key)
    z1 = jax.random.normal(k1, (n_steps, n_paths), dtype)
    z2 = jax.random.normal(k2, (n_steps, n_paths), dtype)
    sdt = math.sqrt(dt)
    dW1 = sdt * z1
    dW2 = sdt * (rho * z1 + math.sqrt(1.0 - rho ** 2) * z2)

    # Only the variance recurrence is nonlinear (sqrt + clamp) and needs a
    # sequential scan; given V, the price step is multiplicative —
    # X_{n+1} = X_n * (1 + mu dt + sqrt(V_n) dW1) — so X is a parallel
    # cumulative product over per-step factors (O(log n) depth).
    def v_step(V, dw2):
        sV = jnp.sqrt(jnp.maximum(V, 1e-6))
        V_n = jnp.maximum(V + kappa * (theta - V) * dt + xi * sV * dw2, 1e-6)
        return V_n, V_n

    V0 = jnp.full((n_paths,), v0, dtype)
    _, Vs = lax.scan(v_step, V0, dW2)
    V_all = jnp.concatenate([V0[None], Vs], axis=0)           # (n+1, B)
    sV = jnp.sqrt(jnp.maximum(V_all[:-1], 1e-6))              # V_n at step n
    factors = 1.0 + mu * dt + sV * dW1                        # (n, B)
    X0 = jnp.full((n_paths,), x0, dtype)
    X = jnp.concatenate(
        [X0[None], x0 * jnp.cumprod(factors, axis=0)], axis=0).T
    return times, X, V_all.T


def hybrid_ou_bs_paths(key: jax.Array, n_paths: int, theta_ou: float = 1.0,
                       mu_ou: float = 0.0, sigma_ou: float = 0.3,
                       mu_bs: float = 0.0, sigma_bs: float = 0.2,
                       T: float = 1.0, n_steps: int = 100, x0: float = 1.0,
                       switch_time: Optional[float] = None, dtype=jnp.float32):
    """Hybrid OU -> BS paths; continuous at the (possibly random) switch.

    Returns (times, X (B, n+1), switch_times (B,)).  ``switch_time=None``
    draws per-path switch times Uniform(0.2 T, 0.8 T) (reference :131-132).
    """
    dt = T / n_steps
    times = jnp.linspace(0.0, T, n_steps + 1, dtype=dtype)
    k_sw, k_ou, k_bs = jax.random.split(key, 3)
    if switch_time is None:
        sw = jax.random.uniform(k_sw, (n_paths,), dtype, 0.2 * T, 0.8 * T)
    else:
        sw = jnp.full((n_paths,), switch_time, dtype)
    switch_idx = (sw / dt).astype(jnp.int32)  # int() truncation, reference :140

    a = math.exp(-theta_ou * dt)
    b = mu_ou * (1.0 - a)
    if theta_ou > 0:
        c = sigma_ou * math.sqrt((1.0 - math.exp(-2.0 * theta_ou * dt)) / (2.0 * theta_ou))
    else:
        c = sigma_ou * math.sqrt(dt)
    ou_noise = c * jax.random.normal(k_ou, (n_steps, n_paths), dtype)
    bs_drift = (mu_bs - 0.5 * sigma_bs ** 2) * dt
    bs_noise = sigma_bs * math.sqrt(dt) * jax.random.normal(k_bs, (n_steps, n_paths), dtype)

    # Every step is affine in X in BOTH regimes — OU: X*a + (b + noise);
    # BS: X*exp(drift + noise) + 0 — so the whole path is an affine
    # parallel prefix (same combine as ou_paths), O(log n) depth instead of
    # a sequential scan. The per-step regime select moves into the
    # coefficients; continuity at the switch is unchanged.
    is_ou = jnp.arange(n_steps)[:, None] < switch_idx[None, :]  # (T, B)
    A = jnp.where(is_ou, jnp.asarray(a, dtype), jnp.exp(bs_drift + bs_noise))
    U = jnp.where(is_ou, b + ou_noise, jnp.zeros((), dtype))

    A_c, U_c = lax.associative_scan(_affine_combine, (A, U), axis=0)
    X0 = jnp.full((n_paths,), x0, dtype)
    X = jnp.concatenate([X0[None], A_c * x0 + U_c], axis=0).T
    return times, X, sw


# --------------------------------------------------------------------------
# single-path reference-API wrappers (generate_* names, reference :11-218)
# --------------------------------------------------------------------------

def _key_from_seed(seed: Optional[int]) -> jax.Array:
    return jax.random.PRNGKey(0 if seed is None else seed)


def generate_black_scholes(mu: float = 0.0, sigma: float = 0.2, T: float = 1.0,
                           n_steps: int = 100, x0: float = 1.0,
                           seed: Optional[int] = None, key: Optional[jax.Array] = None):
    key = _key_from_seed(seed) if key is None else key
    times, X = bs_paths(key, 1, mu, sigma, T, n_steps, x0)
    return times, X[0]


def generate_ou(theta: float = 1.0, mu: float = 0.0, sigma: float = 0.3,
                T: float = 1.0, n_steps: int = 100, x0: float = 0.0,
                seed: Optional[int] = None, key: Optional[jax.Array] = None):
    key = _key_from_seed(seed) if key is None else key
    times, X = ou_paths(key, 1, theta, mu, sigma, T, n_steps, x0)
    return times, X[0]


def generate_heston(mu: float = 0.0, kappa: float = 2.0, theta: float = 0.04,
                    xi: float = 0.5, rho: float = -0.5, T: float = 1.0,
                    n_steps: int = 100, x0: float = 1.0, v0: float = 0.04,
                    seed: Optional[int] = None, key: Optional[jax.Array] = None):
    key = _key_from_seed(seed) if key is None else key
    times, X, V = heston_paths(key, 1, mu, kappa, theta, xi, rho, T, n_steps, x0, v0)
    return times, X[0], V[0]


def generate_hybrid_ou_bs(theta_ou: float = 1.0, mu_ou: float = 0.0,
                          sigma_ou: float = 0.3, mu_bs: float = 0.0,
                          sigma_bs: float = 0.2, T: float = 1.0,
                          n_steps: int = 100, x0: float = 1.0,
                          switch_time: Optional[float] = None,
                          seed: Optional[int] = None, key: Optional[jax.Array] = None):
    key = _key_from_seed(seed) if key is None else key
    times, X, sw = hybrid_ou_bs_paths(key, 1, theta_ou, mu_ou, sigma_ou,
                                      mu_bs, sigma_bs, T, n_steps, x0, switch_time)
    return times, X[0], float(sw[0])


# --------------------------------------------------------------------------
# observation subsampling
# --------------------------------------------------------------------------

def n_obs_for(obs_fraction: float, n_grid: int) -> int:
    """Static observation count (reference :236)."""
    return max(2, int(obs_fraction * n_grid))


def _floyd_subset(key: jax.Array, n_paths: int, m: int, k: int):
    """(B, k) uniform k-subsets of {0..m-1} by Floyd's algorithm.

    Exactly the uniform-without-replacement law (identical to
    top-k-of-iid-uniform), but O(k^2) work per row instead of the full
    m-wide sort `lax.top_k` lowers to on TPU — at the shipped k ~ 8,
    m ~ 98 this is the difference between ~17 ms and ~2 ms per 200
    fused epochs of the default recipe (BENCH_NOTES r3c)."""
    keys = jax.random.split(key, k)
    # unrolled (k is small and static): no scan carry, so XLA fuses the
    # per-step membership tests instead of a while loop +
    # dynamic-update-slice per step
    chosen = []
    for i in range(k):
        j = m - k + i
        t = jax.random.randint(keys[i], (n_paths,), 0, j + 1)
        if chosen:
            dup = jnp.any(jnp.stack(chosen, axis=1) == t[:, None], axis=1)
            t = jnp.where(dup, j, t)
        chosen.append(t)
    return jnp.stack(chosen, axis=1)


def sample_obs_indices(key: jax.Array, n_paths: int, n_grid: int,
                       obs_fraction: float = 0.1) -> jnp.ndarray:
    """(B, n_obs) sorted grid indices; 0 and n_grid-1 always included.

    Interior points are uniform-without-replacement (the law of
    ``np.random.choice(replace=False)``, reference :245): Floyd's
    algorithm for small counts (sort-free — see :func:`_floyd_subset`),
    top-k of iid uniform scores for dense samplings where one wide sort
    beats the O(k^2) membership scan.
    """
    n_obs = n_obs_for(obs_fraction, n_grid)
    n_interior = min(n_obs - 2, n_grid - 2)
    if n_interior > 0:
        if n_interior <= 16:
            top = _floyd_subset(key, n_paths, n_grid - 2, n_interior)
        else:
            scores = jax.random.uniform(key, (n_paths, n_grid - 2))
            _, top = lax.top_k(scores, n_interior)
        interior = top + 1  # shift into [1, n_grid-2]
        idx = jnp.concatenate(
            [jnp.zeros((n_paths, 1), jnp.int32),
             interior.astype(jnp.int32),
             jnp.full((n_paths, 1), n_grid - 1, jnp.int32)], axis=1)
    else:
        idx = jnp.tile(jnp.asarray([[0, n_grid - 1]], jnp.int32), (n_paths, 1))
    return jnp.sort(idx, axis=1)


def subsample_random_grid_points(times, values, obs_fraction: float = 0.1,
                                 seed: Optional[int] = None,
                                 key: Optional[jax.Array] = None):
    """Reference-API single-trajectory subsampler (reference :221-252)."""
    key = _key_from_seed(seed) if key is None else key
    n_grid = times.shape[0]
    idx = sample_obs_indices(key, 1, n_grid, obs_fraction)[0]
    return times[idx], values[idx]


# --------------------------------------------------------------------------
# exact observation-time sampling (skip the unobserved grid)
# --------------------------------------------------------------------------
#
# Training only ever consumes the subsampled observations, yet the grid
# generators simulate every grid point (n_steps+1) and discard all but
# n_obs of them.  Black-Scholes, OU and the hybrid OU->BS (both regimes
# affine, switch at a known grid boundary) have EXACT transition laws over
# an arbitrary gap, so the observed values can be sampled directly at the
# observation times — distribution-identical to grid-simulate-then-
# subsample (the grid discretizations are exact; reference
# data_generation.py:30-44, :80-92, :96-162) at 1/(n_grid/n_obs) the
# generation cost.  Measured: the scaled recipe's data generation drops
# ~25x (BENCH_NOTES.md).

OBS_ONLY_PROCESSES = ("black_scholes", "ornstein_uhlenbeck", "hybrid_ou_bs")


def supports_obs_only(process_type: str) -> bool:
    """True when the process has an exact arbitrary-gap transition law.

    Registered processes support obs_only iff they declared an
    ``obs_values_fn`` (registry.py) — a plain ``paths_fn`` override under a
    built-in name DISABLES the built-in fast path, because the registry's
    generator wins in ``simulate_batch`` and the built-in transition law no
    longer describes the data.
    """
    from .registry import get_obs_values_fn, get_paths_fn
    if get_paths_fn(process_type) is not None:
        return get_obs_values_fn(process_type) is not None
    return process_type in OBS_ONLY_PROCESSES


def bs_values_at(key: jax.Array, times: jnp.ndarray, mu: float = 0.0,
                 sigma: float = 0.2, x0: float = 1.0,
                 dtype=jnp.float32) -> jnp.ndarray:
    """Exact BS samples at per-row sorted times (B, N) with times[:, 0] == 0.

    One lognormal increment per inter-observation gap:
    ``log X_j = log X_{j-1} + (mu - sigma^2/2) dt_j + sigma sqrt(dt_j) xi_j``.
    """
    times = times.astype(dtype)
    dts = times[:, 1:] - times[:, :-1]                       # (B, N-1), > 0
    xi = jax.random.normal(key, dts.shape, dtype)
    inc = (mu - 0.5 * sigma ** 2) * dts + sigma * jnp.sqrt(dts) * xi
    logX = jnp.concatenate(
        [jnp.zeros((times.shape[0], 1), dtype), jnp.cumsum(inc, axis=1)],
        axis=1) + jnp.log(jnp.asarray(x0, dtype))
    return jnp.exp(logX)


def ou_values_at(key: jax.Array, times: jnp.ndarray, theta: float = 1.0,
                 mu: float = 0.0, sigma: float = 0.3, x0: float = 0.0,
                 dtype=jnp.float32) -> jnp.ndarray:
    """Exact OU samples at per-row sorted times (B, N) with times[:, 0] == 0.

    Per-gap exact AR(1): ``X_j = a_j X_{j-1} + mu (1 - a_j) + c_j xi_j`` with
    ``a_j = exp(-theta dt_j)``, ``c_j = sigma sqrt((1 - a_j^2) / (2 theta))``
    — the same affine parallel-prefix as :func:`ou_paths`, with per-gap
    coefficients instead of a constant one.
    """
    times = times.astype(dtype)
    dts = times[:, 1:] - times[:, :-1]                       # (B, N-1)
    if theta > 0:
        A = jnp.exp(-theta * dts)
        c = sigma * jnp.sqrt((1.0 - jnp.exp(-2.0 * theta * dts))
                             / (2.0 * theta))
    else:
        A = jnp.ones_like(dts)
        c = sigma * jnp.sqrt(dts)
    u = mu * (1.0 - A) + c * jax.random.normal(key, dts.shape, dtype)

    A_c, U_c = lax.associative_scan(_affine_combine, (A, u), axis=1)
    return jnp.concatenate(
        [jnp.full((times.shape[0], 1), x0, dtype), A_c * x0 + U_c], axis=1)


def hybrid_values_at(key: jax.Array, times: jnp.ndarray,
                     theta_ou: float = 1.0, mu_ou: float = 0.0,
                     sigma_ou: float = 0.3, mu_bs: float = 0.0,
                     sigma_bs: float = 0.2, x0: float = 1.0,
                     switch_time: Optional[float] = None,
                     T: float = 1.0, n_steps: int = 100,
                     dtype=jnp.float32):
    """Exact hybrid OU->BS samples at per-row sorted grid times (B, N).

    Both regimes are affine in X over an arbitrary gap — OU:
    ``X' = a X + mu_ou (1 - a) + c xi`` (exact transition over duration d1);
    BS: ``X' = X exp((mu_bs - sigma_bs^2/2) d2 + sigma_bs sqrt(d2) xi)`` —
    so the gap map through the switch is the composition BS∘OU, itself
    affine: one associative scan over the observation gaps samples the
    whole batch (the per-path switch time is drawn FIRST, exactly like the
    grid generator; reference data_generation.py:131-132).

    Distribution-identity with grid-simulate-then-subsample requires using
    the grid generator's *effective* switch point ``floor(sw/dt)*dt``: the
    grid path changes regime at a step boundary (the ``int()`` truncation
    at reference data_generation.py:140), and observation times are grid
    points, so each gap splits into an OU part and a BS part at a point the
    grid path also honors.

    Returns ``(values (B, N), switch_times (B,))`` — switch_times are the
    *drawn* (continuous) times, matching ``hybrid_ou_bs_paths``.
    """
    times = times.astype(dtype)
    B = times.shape[0]
    k_sw, k1, k2 = jax.random.split(key, 3)
    if switch_time is None:
        sw = jax.random.uniform(k_sw, (B,), dtype, 0.2 * T, 0.8 * T)
    else:
        sw = jnp.full((B,), switch_time, dtype)
    dt = T / n_steps
    t_eff = jnp.floor(sw / dt) * dt            # grid regime boundary

    t0, t1 = times[:, :-1], times[:, 1:]       # (B, N-1) gap endpoints
    swc = t_eff[:, None]
    d1 = jnp.clip(jnp.minimum(t1, swc) - jnp.minimum(t0, swc), 0.0)  # OU part
    d2 = jnp.clip(t1 - jnp.maximum(t0, swc), 0.0)                    # BS part

    if theta_ou > 0:
        a = jnp.exp(-theta_ou * d1)
        c = sigma_ou * jnp.sqrt((1.0 - jnp.exp(-2.0 * theta_ou * d1))
                                / (2.0 * theta_ou))
    else:
        a = jnp.ones_like(d1)
        c = sigma_ou * jnp.sqrt(d1)
    u = mu_ou * (1.0 - a) + c * jax.random.normal(k1, d1.shape, dtype)
    G = jnp.exp((mu_bs - 0.5 * sigma_bs ** 2) * d2
                + sigma_bs * jnp.sqrt(d2) * jax.random.normal(k2, d2.shape,
                                                              dtype))
    # gap map: X -> G * (a X + u)  =  (G a) X + (G u)
    A_c, U_c = lax.associative_scan(_affine_combine, (G * a, G * u), axis=1)
    X = jnp.concatenate(
        [jnp.full((B, 1), x0, dtype), A_c * x0 + U_c], axis=1)
    return X, sw


# --------------------------------------------------------------------------
# batched trajectory construction
# --------------------------------------------------------------------------

@dataclass
class TrajectoryBatch:
    """Dense observation batch — the TPU-native data representation.

    times:  (B, N) observation times (sorted, static N for a given config)
    values: (B, N, d_x) observations
    mask:   (B, N) bool (all True for same-config batches; kept for generality)
    grid_times: (G,) the dense simulation grid
    obs_idx:    (B, N) grid indices of the observations
    paths:      (B, G) full simulated paths — (B, G, d) for multi-dim
                processes (never leaves HBM)
    switch_times: (B,) hybrid switch times or None
    """
    times: jnp.ndarray
    values: jnp.ndarray
    mask: jnp.ndarray
    grid_times: jnp.ndarray
    obs_idx: jnp.ndarray
    paths: jnp.ndarray
    switch_times: Optional[jnp.ndarray] = None

    @property
    def n_trajectories(self) -> int:
        return self.times.shape[0]


jax.tree_util.register_pytree_node(
    TrajectoryBatch,
    lambda b: ((b.times, b.values, b.mask, b.grid_times, b.obs_idx, b.paths,
                b.switch_times), None),
    lambda _, c: TrajectoryBatch(*c),
)

PROCESS_TYPES = ("black_scholes", "ornstein_uhlenbeck", "heston", "hybrid_ou_bs")


def simulate_batch(key: jax.Array, n_trajectories: int, process_type: str,
                   obs_fraction: float = 0.1, obs_only: bool = False,
                   **process_kwargs) -> TrajectoryBatch:
    """Simulate B paths on-device and subsample observations. Jit-friendly.

    This is the TPU-native replacement for ``create_trajectory_batch``
    (reference :255-291): one key, one fused program, no host round-trips,
    dense static-shape output.  Heston's V and hybrid's switch time are kept
    in the batch (the reference discards them, :277,:279) but ``values``
    contains only the observed X, matching the reference.

    ``obs_only=True`` (BS/OU/hybrid, see :func:`supports_obs_only`) samples
    the values EXACTLY at the observation times and skips the unobserved
    grid: same observation times as the grid path for the same key, same
    value law, ~n_grid/n_obs cheaper.  ``batch.paths`` is None in this mode
    (use the default for plotting/dense-grid work); hybrid still returns
    its per-path ``switch_times``.  Heston has no exact obs-time sampler:
    the price at an observation time depends on the integrated variance
    over the gap, whose exact joint transition (Broadie–Kaya) needs
    Bessel-function CDF inversions — scalar, iterative, TPU-hostile — and
    would change the data law relative to the reference's Euler grid
    anyway (see BENCH_NOTES.md).
    """
    k_path, k_obs = jax.random.split(key)
    if obs_only:
        if not supports_obs_only(process_type):
            raise ValueError(
                f"obs_only sampling needs an exact transition law; "
                f"'{process_type}' is not in {OBS_ONLY_PROCESSES} (or is "
                f"overridden by a registered custom generator)")
        T = process_kwargs.get("T", 1.0)
        n_steps = process_kwargs.get("n_steps", 100)
        grid_times = jnp.linspace(0.0, T, n_steps + 1, dtype=jnp.float32)
        obs_idx = sample_obs_indices(k_obs, n_trajectories, n_steps + 1,
                                     obs_fraction)
        # times = grid_times[obs_idx] as ARITHMETIC, not a gather: XLA
        # lowers the (B, N)-from-(n_grid,) gather to a serialized kCustom
        # op that alone cost 15 ms per 200 fused default-recipe epochs —
        # 2/3 of all datagen device time (BENCH_NOTES r3c profiler trace).
        # i * (T/n) matches linspace to <= 1 ulp, and every consumer (gap
        # dt differences, the hybrid min/max regime split) is continuous
        # in times, so the data law is unchanged.
        times = obs_idx.astype(jnp.float32) * (
            jnp.float32(T) / jnp.float32(n_steps))
        kw = {k: v for k, v in process_kwargs.items()
              if k not in ("T", "n_steps")}
        switch_times = None
        from .registry import get_obs_values_fn
        custom_obs = get_obs_values_fn(process_type)
        if custom_obs is not None:
            values = custom_obs(k_path, times, **kw)
        elif process_type == "black_scholes":
            values = bs_values_at(k_path, times, **kw)
        elif process_type == "ornstein_uhlenbeck":
            values = ou_values_at(k_path, times, **kw)
        else:  # hybrid_ou_bs: the regime split needs the grid discretization
            values, switch_times = hybrid_values_at(
                k_path, times, T=T, n_steps=n_steps, **kw)
        if values.ndim == 2:
            values = values[..., None]
        mask = jnp.ones(times.shape, dtype=bool)
        return TrajectoryBatch(times, values, mask, grid_times,
                               obs_idx, None, switch_times)
    switch_times = None
    from .registry import get_paths_fn
    custom = get_paths_fn(process_type)
    if custom is not None:
        out = custom(k_path, n_trajectories, **process_kwargs)
        if len(out) == 3:
            grid_times, paths, switch_times = out
        else:
            grid_times, paths = out
    elif process_type == "black_scholes":
        grid_times, paths = bs_paths(k_path, n_trajectories, **process_kwargs)
    elif process_type == "ornstein_uhlenbeck":
        grid_times, paths = ou_paths(k_path, n_trajectories, **process_kwargs)
    elif process_type == "heston":
        grid_times, paths, _V = heston_paths(k_path, n_trajectories, **process_kwargs)
    elif process_type == "hybrid_ou_bs":
        grid_times, paths, switch_times = hybrid_ou_bs_paths(
            k_path, n_trajectories, **process_kwargs)
    else:
        raise ValueError(
            f"Unknown process type: {process_type}. Supported: {', '.join(PROCESS_TYPES)}")

    n_grid = grid_times.shape[0]
    obs_idx = sample_obs_indices(k_obs, n_trajectories, n_grid, obs_fraction)
    times = grid_times[obs_idx]                                   # (B, N)
    if paths.ndim == 3:   # multi-dimensional process: paths (B, G, d)
        values = jnp.take_along_axis(paths, obs_idx[..., None], axis=1)
    else:
        values = jnp.take_along_axis(paths, obs_idx, axis=1)[..., None]  # (B, N, 1)
    mask = jnp.ones(times.shape, dtype=bool)
    return TrajectoryBatch(times, values, mask, grid_times, obs_idx, paths,
                           switch_times)


def create_trajectory_batch(n_trajectories: int, process_type: str = "black_scholes",
                            obs_fraction: float = 0.1, seed: Optional[int] = None,
                            **process_kwargs):
    """Reference-API batch factory returning ragged lists (reference :255-291).

    Returns (batch_times: list of (n_i,), batch_values: list of (n_i, 1)).
    All rows share n_i by construction, as in the reference.  Deterministic in
    ``seed`` (default 0), analogous to the reference's seed=i-per-trajectory
    determinism quirk (reference :273-286) without replicating identical
    across-epoch batches.
    """
    key = _key_from_seed(seed)
    batch = simulate_batch(key, n_trajectories, process_type, obs_fraction,
                           **process_kwargs)
    batch_times = [batch.times[b] for b in range(n_trajectories)]
    batch_values = [batch.values[b] for b in range(n_trajectories)]
    return batch_times, batch_values
