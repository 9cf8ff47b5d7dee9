"""Custom process registry — extension point for user-defined SDEs.

The reference hardcodes its four process families in a dispatch chain
(reference data_generation.py:271-281); here third-party processes plug in
without touching framework code:

    from njode_tpu.simulation import register_process

    def my_paths(key, n_paths, **params):
        times = ...   # (G,)
        X = ...       # (n_paths, G)
        return times, X            # optionally (times, X, extra)

    register_process("my_sde", my_paths, moments_fn=my_moments)  # moments optional

`simulate_batch`, `create_trajectory_batch`, the data loaders and (when a
``moments_fn`` is given) the relative-loss machinery then accept
``process_type="my_sde"`` everywhere.
"""

from __future__ import annotations

from typing import Callable, Optional

_PATHS: dict[str, Callable] = {}
_MOMENTS: dict[str, Callable] = {}
_OBS_VALUES: dict[str, Callable] = {}


def register_process(name: str, paths_fn: Callable,
                     moments_fn: Optional[Callable] = None,
                     obs_values_fn: Optional[Callable] = None) -> None:
    """Register a path generator (and optionally analytic moments).

    paths_fn(key, n_paths, **params) -> (grid_times (G,), paths (B, G))
        or (grid_times, paths, extra) — extra is stored as
        ``TrajectoryBatch.switch_times``.
    moments_fn(times (B,N), values (B,N,d), num_moments, variance_method,
        **params) -> (moments, moments_before), both (B, N, d, K).
        When per-path extras were returned by paths_fn and the caller opts
        into them, they arrive as a ``switch_times=(B,)`` keyword — accept
        ``**kwargs`` to ignore them.
    obs_values_fn(key, times (B, N), **params) -> values (B, N) or
        (B, N, d): EXACT samples of the process at per-row sorted times
        with ``times[:, 0] == 0`` — declares that the process has an exact
        arbitrary-gap transition law, enabling
        ``simulate_batch(obs_only=True)`` (skip the unobserved grid; see
        sde.py).  Params arrive as the simulate_batch process kwargs minus
        ``T``/``n_steps``.  NOTE: the obs_only observation grid uses the
        ``T``/``n_steps`` process kwargs with the framework defaults
        (T=1.0, n_steps=100) when omitted — if your ``paths_fn`` declares
        different defaults, callers must pass ``T``/``n_steps`` explicitly
        for obs_only and grid mode to produce the same observation times.

    Re-registering a name REPLACES the whole entry: omitted ``moments_fn``
    / ``obs_values_fn`` clear any previously registered ones (a stale
    exact-sampler from the old generator would describe the wrong law).
    """
    _PATHS[name] = paths_fn
    if moments_fn is not None:
        _MOMENTS[name] = moments_fn
    else:
        _MOMENTS.pop(name, None)
    if obs_values_fn is not None:
        _OBS_VALUES[name] = obs_values_fn
    else:
        _OBS_VALUES.pop(name, None)


def get_paths_fn(name: str) -> Optional[Callable]:
    return _PATHS.get(name)


def get_moments_fn(name: str) -> Optional[Callable]:
    return _MOMENTS.get(name)


def get_obs_values_fn(name: str) -> Optional[Callable]:
    return _OBS_VALUES.get(name)


def registered_processes() -> tuple[str, ...]:
    return tuple(_PATHS)
