"""TPU-native Neural Jump ODE model.

Re-design of the reference ``NeuralJumpODE`` (reference: models/jump_ode.py:80-233)
for JAX/XLA on TPU.  The reference runs three nested *Python* loops per training
step — over trajectories (``forward``, :229), over observations
(``forward_single``, :163) and over Euler substeps (:196) — each dispatching
microsecond-scale kernels on ``(1, d_h)`` tensors.  Here the whole forward is
SCAN-FREE: the jump resets the latent state at every observation, so there is
no cross-observation recurrence, and all padded observation slots
``[B, N_obs]`` fold into a handful of large batched matmuls (see
:meth:`NeuralJumpODE.apply`):

* the batch axis ``B`` is a dense array dimension (vmap-free by construction,
  shardable over a device mesh),
* the per-moment networks are stacked on a leading ``K`` axis and vmapped
  (replaces ``nn.ModuleList``, reference :111-113),
* the Euler integration over each inter-observation gap starts from its own
  jump state and is batched over ALL gaps at once, preserving the reference
  semantics exactly:
    - ``dt_ode_step=None``: one Euler step spanning the whole gap
      (reference :188-190),
    - fixed ``dt_ode_step``: ``while t_cur + dt < t_next`` full steps plus a
      final partial step to exactly ``t_next`` (reference :196-202), realised
      as a predicated ``fori_loop`` with a static bound so shapes stay static
      under jit.

Subtle semantics preserved on purpose:

* ODEFunc time features are *substep-relative*: ``t_rel = t_last`` (substep
  start) and ``t_elapsed = t - t_last`` — NOT time since the last observation
  (reference :59-61 with call sites :129,:137).
* The prediction "before" the first observation is identically zero
  (reference :161).
* After-jump readout happens *before* the gap integration (reference
  :167-182 precede :185-212).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from .activations import (canonical_activation,
                          canonical_input_scaling,
                          get_activation, get_input_scaling)
from .mlp import (
    count_params,
    jump_nn_apply,
    jump_nn_init,
    ode_func_apply,
    ode_func_init,
    output_nn_apply,
    output_nn_init,
)

Params = dict[str, Any]


def _stack_trees(trees: Sequence[Params]) -> Params:
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def _split_opt_rng(rng: Optional[jax.Array], n: int):
    return [None] * n if rng is None else list(jax.random.split(rng, n))


def _raise_on_substep_deficit(bad, deficit, max_substeps, dt_ode_step):
    """Host side of the ``debug_checks`` runtime assert (runs via
    jax.debug.callback; raising here surfaces as a JaxRuntimeError at the
    jitted call site)."""
    if bad:
        raise ValueError(
            f"substep budget exhausted inside a jitted call: a gap still had "
            f"{float(deficit):.4g} left to integrate after max_substeps="
            f"{int(max_substeps)} full steps of dt_ode_step="
            f"{float(dt_ode_step)}; the final 'partial' step would silently "
            f"span the remainder. Construct the model with t_max covering "
            f"the largest observation gap (or pass max_substeps explicitly).")


def _raise_on_grid_misalignment(bad, worst, dt_ode_step):
    """Host side of the ``debug_checks`` grid-walk alignment assert."""
    if bad:
        raise ValueError(
            f"grid_walk=True but an observation time is off the integration "
            f"grid (worst offset {float(worst):.3g} from a multiple of "
            f"dt_ode_step={float(dt_ode_step)}) or beyond it; disable "
            "grid_walk for off-grid data or enlarge t_max.")


class NeuralJumpODE:
    """Pure-functional Neural Jump ODE.

    Constructor signature mirrors the reference model
    (reference: models/jump_ode.py:81-120).  Parameters live in an explicit
    pytree returned by :meth:`init`; all ``apply``-style methods are pure and
    jittable.

    Extra TPU-native arguments:
      t_max:   static upper bound on the time horizon, used to derive the
               static substep-loop bound when ``dt_ode_step`` is set.
      dtype:   parameter / carry dtype (default float32, like the reference).
      compute_dtype: mixed-precision matmul dtype (e.g. ``jnp.bfloat16`` or
               the string "bfloat16").  When set, the three MLPs run with
               params and inputs (including the assembled ODEFunc feature
               vector, time features included) cast to this dtype at the
               matmul boundary — halving the HBM traffic for
               weights/activations; the win appears at hidden_dim >= 256 —
               while the f32 master params, the latent Euler carry, the t
               accumulation itself and all readout outputs stay in
               ``dtype``.  None (default) = full ``dtype`` compute.
    """

    def __init__(self, input_dim: int, hidden_dim: int, output_dim: int,
                 dt_between_obs: Optional[float] = None,
                 dt_ode_step: Optional[float] = None,
                 num_moments: int = 1, n_hidden_layers: int = 1,
                 activation: str = "relu", shared_network: bool = False,
                 dropout_rate: float = 0.0, input_scaling: str = "identity",
                 variance_method: str = "direct",
                 t_max: float = 1.0, max_substeps: Optional[int] = None,
                 use_pallas=False, dtype=jnp.float32, compute_dtype=None,
                 ode_solver: str = "euler", debug_checks: bool = False,
                 grid_walk: bool = False):
        self.input_dim = input_dim
        self.hidden_dim = hidden_dim
        self.output_dim = output_dim
        self.dt_between_obs = dt_between_obs  # deprecated in the reference, kept for parity
        self.dt_ode_step = dt_ode_step
        self.num_moments = num_moments
        self.n_hidden_layers = n_hidden_layers
        self.activation = activation
        self.shared_network = shared_network
        self.dropout_rate = dropout_rate
        self.input_scaling = input_scaling
        self.variance_method = variance_method
        self.t_max = t_max
        # debug_checks=True adds a runtime assert INSIDE jitted calls that
        # the predicated substep loop actually reached every gap's target
        # time (jax.debug.callback -> ValueError surfaced as a
        # JaxRuntimeError); complements _check_substep_budget, which can
        # only see concrete (non-traced) inputs.  Off by default: the
        # callback costs a host round-trip per dispatched program.
        self.debug_checks = debug_checks
        self.dtype = dtype
        if isinstance(compute_dtype, str):
            _named = {"float32": None, "none": None,
                      "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                      "float16": jnp.float16, "fp16": jnp.float16}
            if compute_dtype.lower() not in _named:
                raise ValueError(f"Unknown compute_dtype: {compute_dtype}")
            compute_dtype = _named[compute_dtype.lower()]
        self.compute_dtype = compute_dtype

        if ode_solver not in ("euler", "heun", "rk4"):
            raise ValueError(f"Unknown ode_solver: {ode_solver!r} "
                             "(one of 'euler', 'heun', 'rk4')")
        self.ode_solver = ode_solver

        # grid_walk=True is the caller's STATIC promise that every valid
        # observation time in ``apply`` batches sits on the integration grid
        # {g * dt_ode_step} and is strictly increasing per row; ``apply``
        # then integrates all gaps with ONE time-major walk over that grid
        # (~n_slots x fewer ODEFunc evaluations than the per-gap predicated
        # substep loops, same exact-arithmetic semantics).  run_experiment
        # turns it on automatically when the data config guarantees
        # alignment (dt_ode_step divides the simulation grid spacing).
        if grid_walk and dt_ode_step is None:
            raise ValueError("grid_walk=True requires dt_ode_step (gaps "
                             "without substeps are already a single step)")
        self.grid_walk = bool(grid_walk)

        self._act = get_activation(activation)
        self._scale = get_input_scaling(input_scaling)
        # the names the above actually resolved to — kernel eligibility and
        # Pallas activation tables consume these, never the raw strings
        # (the OU CLI's 'identity' default computes ReLU via the
        # reference's silent fallback; 'none' aliases identity scaling)
        self._act_key = canonical_activation(activation)
        self._scale_key = canonical_input_scaling(input_scaling)

        if max_substeps is not None:
            self.max_substeps = max_substeps
        elif dt_ode_step is not None:
            # while-loop upper bound: a gap never exceeds t_max, so at most
            # ceil(t_max/dt) full substeps occur before the final partial step.
            self.max_substeps = int(math.ceil(t_max / dt_ode_step))
        else:
            self.max_substeps = 0

        # number of latent states carried (shared mode carries one state for
        # all moments, reference models/jump_ode.py:100-108)
        self.k_hidden = 1 if shared_network else num_moments

        # Pallas kernels (two distinct ones; measured on v5e, BENCH_NOTES.md):
        # * gap_scan — the WHOLE ``dt_ode_step`` substep loop in one kernel
        #   (ops/gap_scan.py): 2.7x lower latency for streaming/low-batch
        #   inference; at large row counts or inside the training gradient,
        #   XLA measured faster (padding waste / op overlap), so 'auto'
        #   gates on the row count and True forces it everywhere.
        # * fused Euler cell — ONE substep per pallas_call
        #   (ops/fused_cell.py): measured SLOWER than XLA fusion (per-call
        #   overhead), enabled only with use_pallas=True/'interpret'.
        # 'interpret' runs both in interpreter mode (for CPU tests);
        # False (default) disables both.
        from ..ops import (fused_cell_available, fused_step_available,
                           gap_scan_available)
        self.use_pallas = use_pallas
        # both kernels implement the (reference-exact) Euler step only
        self._fused_eligible = (ode_solver == "euler") and fused_cell_available(
            n_hidden_layers, self._act_key, dropout_rate)
        self._gap_eligible = (ode_solver == "euler") and gap_scan_available(
            n_hidden_layers, self._act_key, dropout_rate,
            self._scale_key)
        # the whole-step fused kernel (use_pallas="step"): jump -> gap Euler
        # -> readout in ONE program per row tile, activations never touch
        # HBM (ops/fused_step.py; targets the hidden>=256 MFU headroom)
        self._step_eligible = fused_step_available(
            shared_network, input_dim, output_dim, n_hidden_layers,
            self._act_key, dropout_rate, self._scale_key,
            dt_ode_step, ode_solver)

    def _pallas_on(self) -> bool:
        if self.use_pallas in ("step", "step-interpret"):
            return False  # the whole-step kernel replaces the per-gap ones
        if self.use_pallas is False or self.compute_dtype is not None:
            return False  # kernels are f32-only
        if self.use_pallas == "interpret":
            return True
        import jax as _jax
        on_tpu = _jax.default_backend() in ("tpu",)
        return on_tpu if self.use_pallas == "auto" else bool(self.use_pallas)

    def _use_fused_step(self, n_slots: int, n_rows: int = 0) -> bool:
        if self.use_pallas == "auto":
            # measured-win regime only (scripts/measure_scaled_step.py,
            # BENCH_NOTES.md r3d + r4c): MXU-bound configs — hidden >= 224
            # with a large folded row count; smaller points measured
            # neutral, erratic, or losing across rounds and stay on XLA.  Shared-network configs
            # measured SLOWER in the kernel (0.91x, BENCH_NOTES r3b) —
            # the shared mode is opt-in ('step') only.
            from ..ops.fused_step import AUTO_MIN_HIDDEN, AUTO_MIN_ROWS
            if (not self._step_eligible
                    or self.shared_network
                    or self.hidden_dim < AUTO_MIN_HIDDEN
                    or n_rows < AUTO_MIN_ROWS
                    or self.compute_dtype not in (None, jnp.bfloat16)):
                return False
            import jax as _jax
            if _jax.default_backend() != "tpu":
                return False
        elif self.use_pallas not in ("step", "step-interpret"):
            return False
        if not self._step_eligible:
            return False
        if self.compute_dtype not in (None, jnp.bfloat16):
            return False
        if self.use_pallas == "step":
            import jax as _jax
            if _jax.default_backend() != "tpu":
                return False  # Mosaic only; CPU runs fall back to XLA
        from ..ops.fused_step import fused_step_fits
        return fused_step_fits(n_slots, self.num_moments, self.input_dim,
                               self.output_dim)

    def _use_fused(self) -> bool:
        # the per-substep fused cell only wins when explicitly requested
        return (self._fused_eligible and self.use_pallas not in (False, "auto")
                and self._pallas_on())

    def _use_walk_kernel(self, n_rows: int = 0) -> bool:
        """Route ``grid_walk`` integration through the fused walk kernel
        (ops/walk_scan.py).  The XLA walk's per-cell selects/streams lower
        poorly (17-54 us/cell vs ~3 us for a plain scan, BENCH_NOTES r3g);
        in the kernel they are free VPU selects on a VMEM-resident carry.
        'auto' additionally bounds the row count: the kernel's dense
        128-lane per-cell streams scale with rows x cells and lose to the
        per-gap XLA path at large batches (measured, BENCH_NOTES r3h)."""
        from ..ops.walk_scan import auto_max_rows, walk_scan_available
        if not walk_scan_available(self.n_hidden_layers, self._act_key,
                                   self.dropout_rate, self._scale_key,
                                   self.input_dim, self.hidden_dim):
            return False
        if (self.compute_dtype is not None or self.ode_solver != "euler"
                or self.num_moments > 8):
            return False
        if self.use_pallas == "interpret":
            return True
        if (self.use_pallas == "auto"
                and n_rows > auto_max_rows(self.hidden_dim)):
            return False
        if self.use_pallas in (True, "auto", "step"):
            import jax as _jax
            return _jax.default_backend() == "tpu"
        return False

    def _use_gap_scan(self, n_rows: int, inference: bool = False) -> bool:
        if not (self._gap_eligible and self._pallas_on()):
            return False
        if self.use_pallas == "auto":
            # measured policy (BENCH_NOTES.md): the kernel wins only where
            # latency is the metric — inference at modest row counts; the
            # training step and large-R batches measured faster on XLA
            from ..ops.gap_scan import AUTO_MAX_ROWS
            return inference and n_rows <= AUTO_MAX_ROWS
        return True

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array) -> Params:
        kj, ko, kr = jax.random.split(key, 3)
        if self.shared_network:
            return {
                "jump": jump_nn_init(kj, self.input_dim, self.hidden_dim,
                                     self.n_hidden_layers, self.dtype),
                "ode": ode_func_init(ko, self.hidden_dim, self.input_dim,
                                     self.n_hidden_layers, self.dtype),
                "out": output_nn_init(kr, self.hidden_dim,
                                      self.output_dim * self.num_moments,
                                      self.n_hidden_layers, self.dtype),
            }
        jks = jax.random.split(kj, self.num_moments)
        oks = jax.random.split(ko, self.num_moments)
        rks = jax.random.split(kr, self.num_moments)
        return {
            "jump": _stack_trees([jump_nn_init(k, self.input_dim, self.hidden_dim,
                                               self.n_hidden_layers, self.dtype)
                                  for k in jks]),
            "ode": _stack_trees([ode_func_init(k, self.hidden_dim, self.input_dim,
                                               self.n_hidden_layers, self.dtype)
                                 for k in oks]),
            "out": _stack_trees([output_nn_init(k, self.hidden_dim, self.output_dim,
                                                self.n_hidden_layers, self.dtype)
                                 for k in rks]),
        }

    def n_params(self, params: Params) -> int:
        return count_params(params)

    # ------------------------------------------------------------- sub-nets

    def _mp(self, subtree):
        """Cast a param subtree to the mixed-precision compute dtype."""
        if self.compute_dtype is None:
            return subtree
        cd = self.compute_dtype
        return jax.tree_util.tree_map(lambda a: a.astype(cd), subtree)

    def _mp_in(self, x: jnp.ndarray) -> jnp.ndarray:
        return x if self.compute_dtype is None else x.astype(self.compute_dtype)

    def _mp_out(self, y: jnp.ndarray) -> jnp.ndarray:
        return y if self.compute_dtype is None else y.astype(self.dtype)

    def _jump(self, params: Params, x: jnp.ndarray,
              rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """x: (B, d_x) -> h: (K_h, B, d_h)."""
        params = {"jump": self._mp(params["jump"])}
        x = self._mp_in(x)
        if self.shared_network:
            h = jump_nn_apply(params["jump"], x, self._act, self.dropout_rate, rng)
            return self._mp_out(h)[None]
        if rng is None:
            return self._mp_out(jax.vmap(
                lambda p: jump_nn_apply(p, x, self._act, self.dropout_rate, None)
            )(params["jump"]))
        rngs = jax.random.split(rng, self.num_moments)
        return self._mp_out(jax.vmap(
            lambda p, r: jump_nn_apply(p, x, self._act, self.dropout_rate, r)
        )(params["jump"], rngs))

    def _readout(self, params: Params, h: jnp.ndarray,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """h: (K_h, B, d_h) -> y: (B, d_y, K).

        Shared mode reshapes the flat (B, d_y*K) output row-major to
        (B, d_y, K), matching the reference's ``.view(1, d_y, num_moments)``
        (reference models/jump_ode.py:170-172).
        """
        params = {"out": self._mp(params["out"])}
        h = self._mp_in(h)
        if self.shared_network:
            y = output_nn_apply(params["out"], h[0], self._act, self.dropout_rate, rng)
            B = y.shape[0]
            return self._mp_out(y).reshape(B, self.output_dim, self.num_moments)
        if rng is not None:
            rngs = jax.random.split(rng, self.num_moments)
            ys = jax.vmap(
                lambda p, hh, r: output_nn_apply(p, hh, self._act, self.dropout_rate, r)
            )(params["out"], h, rngs)
        else:
            ys = jax.vmap(
                lambda p, hh: output_nn_apply(p, hh, self._act, self.dropout_rate, None)
            )(params["out"], h)
        return jnp.transpose(self._mp_out(ys), (1, 2, 0))  # (B, d_y, K)

    def variance_from_raw(self, raw: jnp.ndarray):
        """Conditional variance from raw moment outputs (..., d_y, K).

        The single copy of the variance convention shared by ``predict_at``,
        ``predict_on_grid``, ``NJODEFilter`` and ``sample_paths``:
        ``direct``: Var = W^2; ``second_moment``: Var = E[X^2] - E[X]^2
        clipped at 0 (reference utils/plotting.py:183-200).  Returns None
        for single-moment models.
        """
        if self.num_moments < 2:
            return None
        mean = raw[..., 0]
        w = raw[..., 1]
        if self.variance_method == "direct":
            return w ** 2
        return jnp.maximum(w - mean ** 2, 0.0)

    def _ode(self, params: Params, h: jnp.ndarray, x_last: jnp.ndarray,
             t_cur: jnp.ndarray, t_new: jnp.ndarray,
             rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """Latent drift dh/dt.

        h: (K_h, B, d_h); x_last: (B, d_x); t_cur/t_new: (B,).
        Features exactly as reference ODEFunc.forward (models/jump_ode.py:52-63):
        [scale(h), scale(x_last), t_rel = t_cur, t_elapsed = t_new - t_cur].
        """
        K_h, B, _ = h.shape
        h_s = self._scale(h)
        x_s = jnp.broadcast_to(self._scale(x_last)[None], (K_h, B, self.input_dim))
        t_rel = jnp.broadcast_to(t_cur[None, :, None], (K_h, B, 1)).astype(h.dtype)
        t_el = jnp.broadcast_to((t_new - t_cur)[None, :, None], (K_h, B, 1)).astype(h.dtype)
        inp = self._mp_in(jnp.concatenate([h_s, x_s, t_rel, t_el], axis=-1))
        ode_p = self._mp(params["ode"])
        if self.shared_network:
            dh = ode_func_apply(ode_p, inp[0], self._act, self.dropout_rate, rng)
            return self._mp_out(dh)[None]
        if rng is not None:
            rngs = jax.random.split(rng, self.num_moments)
            return self._mp_out(jax.vmap(
                lambda p, ii, r: ode_func_apply(p, ii, self._act, self.dropout_rate, r)
            )(ode_p, inp, rngs))
        return self._mp_out(jax.vmap(
            lambda p, ii: ode_func_apply(p, ii, self._act, self.dropout_rate, None)
        )(ode_p, inp))

    def _euler(self, params: Params, h: jnp.ndarray, x_last: jnp.ndarray,
               t_cur: jnp.ndarray, t_new: jnp.ndarray,
               rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """One solver step from t_cur to t_new.

        ``ode_solver='euler'`` (default) is exactly the reference's step
        ``h += (t_new - t_cur) * f(...)`` (reference :122-140).  'heun' and
        'rk4' are fixed-step higher-order extensions (no reference
        analogue).  Their stages evaluate the ODEFunc with ``t_rel = stage
        time`` and ``t_elapsed = 0``: the reference feeds the step size in
        as the ``t_elapsed`` feature (reference :59-61), which makes the
        drift depend on the discretization — the well-defined underlying
        ODE (and the only one a higher-order method can converge to at its
        nominal order) is its ``t_elapsed -> 0`` limit.
        """
        if self.ode_solver == "euler" and rng is None and self._use_fused():
            from ..ops import ode_euler_fused
            return ode_euler_fused(
                h, self._scale(x_last), self._scale(h), t_cur, t_new,
                params["ode"]["layers"], self._act_key,
                interpret=(self.use_pallas == "interpret"))
        dt = (t_new - t_cur)[None, :, None]
        if self.ode_solver == "euler":
            # reference features: t_rel = t_cur, t_el = t_new - t_cur
            return h + dt * self._ode(params, h, x_last, t_cur, t_new, rng)

        def f(hh, t_stage, r):
            # t_rel = stage time, t_el = t_stage - t_stage = 0
            return self._ode(params, hh, x_last, t_stage, t_stage, r)
        rngs = _split_opt_rng(rng, 4)
        if self.ode_solver == "heun":
            k1 = f(h, t_cur, rngs[0])
            k2 = f(h + dt * k1, t_new, rngs[1])
            return h + dt * 0.5 * (k1 + k2)
        if self.ode_solver == "rk4":
            t_mid = t_cur + 0.5 * (t_new - t_cur)
            k1 = f(h, t_cur, rngs[0])
            k2 = f(h + 0.5 * dt * k1, t_mid, rngs[1])
            k3 = f(h + 0.5 * dt * k2, t_mid, rngs[2])
            k4 = f(h + dt * k3, t_new, rngs[3])
            return h + dt / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        raise ValueError(f"Unknown ode_solver: {self.ode_solver}")

    def _integrate_gap(self, params: Params, h: jnp.ndarray, x_last: jnp.ndarray,
                       t_last: jnp.ndarray, t_target: jnp.ndarray,
                       rng: Optional[jax.Array] = None,
                       inference: bool = False) -> jnp.ndarray:
        """Integrate the latent state across an inter-observation gap.

        Reproduces reference forward_single's gap handling (models/jump_ode.py:185-203):
        single step when ``dt_ode_step is None``; otherwise accumulated full
        substeps while ``t_cur + dt < t_target`` plus one final partial step.
        The accumulated ``t_cur + dt`` float updates are kept (rather than an
        arithmetic step count) so floating-point boundary behaviour matches
        the reference's while loop bit-for-bit.
        """
        if self.dt_ode_step is None:
            return self._euler(params, h, x_last, t_last, t_target, rng)

        if (rng is None and not self.debug_checks
                and self._use_gap_scan(h.shape[1], inference)):
            from ..ops import integrate_gap_fused
            return integrate_gap_fused(
                h, self._scale(x_last), t_last, t_target,
                params["ode"]["layers"], self.dt_ode_step, self.max_substeps,
                self._act_key, self._scale_key,
                interpret=(self.use_pallas == "interpret"))

        dt = jnp.asarray(self.dt_ode_step, dtype=t_last.dtype)

        def body(j, carry):
            h_c, t_cur = carry
            pred = (t_cur + dt) < t_target  # (B,)
            t_new = t_cur + dt
            r = None if rng is None else jax.random.fold_in(rng, j)
            h_step = self._euler(params, h_c, x_last, t_cur, t_new, r)
            h_c = jnp.where(pred[None, :, None], h_step, h_c)
            t_cur = jnp.where(pred, t_new, t_cur)
            return (h_c, t_cur)

        h, t_cur = lax.fori_loop(0, self.max_substeps, body, (h, t_last))
        if self.debug_checks:
            # the loop must have advanced every gap to within one dt of its
            # target; a larger remainder means the static bound was too small
            # and the 'partial' step below would under-integrate silently
            deficit = jnp.max(t_target - t_cur)
            bad = deficit > dt * (1.0 + 1e-6)
            jax.debug.callback(_raise_on_substep_deficit, bad, deficit,
                               self.max_substeps, self.dt_ode_step)
        pred2 = t_cur < t_target
        r = None if rng is None else jax.random.fold_in(rng, self.max_substeps)
        h_final = self._euler(params, h, x_last, t_cur, t_target, r)
        return jnp.where(pred2[None, :, None], h_final, h)

    def _integrate_gaps_grid(self, params: Params, h_jump: jnp.ndarray,
                             times: jnp.ndarray, values: jnp.ndarray,
                             mask: Optional[jnp.ndarray],
                             rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """All inter-observation gaps as ONE time-major walk over the static
        integration grid ``{g * dt_ode_step : g = 0..M}``.

        The per-gap form (:meth:`_integrate_gap` under ``apply``'s folded
        (B*S) rows) runs ``max_substeps`` predicated solver steps for EVERY
        gap, so a batch pays ``n_gaps * ceil(t_max/dt)`` ODEFunc
        evaluations per trajectory even though the gaps of one trajectory
        tile ``[0, t_max]`` and only need ``~t_max/dt`` total.  When every
        observation time sits ON the integration grid (always true for
        simulated data whose grid spacing is a multiple of ``dt_ode_step``),
        a grid gap of ``k*dt`` integrates as exactly ``k`` uniform solver
        steps — the reference's ``while t+dt < t_next`` full steps plus the
        final partial step collapse to that in exact arithmetic (the
        partial step has ``t_elapsed = dt``; reference
        models/jump_ode.py:196-202).  So ONE walk over the M grid cells,
        carrying (h, x_last, t_cur) for all B rows and resetting the carry
        at observation cells, computes every gap of every row
        simultaneously: same sequential depth as one predicated gap loop,
        ``n_gaps`` x less work.  Float caveat: the walk's time accumulation
        takes k full ``t += dt`` updates where the per-gap loop takes k-1
        plus a boundary-rounded partial step, so time FEATURES differ by
        ~1 ulp — outputs match the per-gap path to f32 roundoff, not
        bit-for-bit (pinned in tests/test_grid_walk.py, exactly in f64).

        h_jump: (K_h, B, N, d_h) after-jump states for all slots.
        Returns h_minus (K_h, B*S, d_h), the pre-jump state at slots 1..N-1.
        """
        dt = jnp.asarray(self.dt_ode_step, dtype=times.dtype)
        M = self.max_substeps
        B, N = times.shape
        K_h, d_h, d_x = h_jump.shape[0], self.hidden_dim, values.shape[-1]

        g_idx = jnp.round(times / dt).astype(jnp.int32)         # (B, N)
        if self.debug_checks:
            on_grid = jnp.abs(g_idx.astype(times.dtype) * dt - times)
            if mask is not None:
                on_grid = jnp.where(mask, on_grid, 0.0)
            worst = jnp.max(on_grid)
            bad = (worst > 1e-4 * jnp.maximum(dt, 1.0)) | (jnp.max(
                jnp.where(mask, g_idx, 0) if mask is not None else g_idx) > M)
            jax.debug.callback(_raise_on_grid_misalignment, bad, worst,
                               self.dt_ode_step)
        g_idx = jnp.clip(g_idx, 0, M)

        if rng is None and self._use_walk_kernel(n_rows=times.shape[0]):
            from ..ops.walk_scan import walk_gaps_fused
            return walk_gaps_fused(
                params["ode"]["layers"], h_jump, self._scale(values),
                times, mask, g_idx, self.dt_ode_step, M,
                self._act_key, self._scale_key,
                interpret=(self.use_pallas == "interpret"))

        # padded slots scatter into a dump cell the walk never visits
        slot_g = g_idx if mask is None else jnp.where(mask, g_idx, M + 1)

        # grid-major layout: cell g of row b holds that row's observation at
        # t = g*dt (if any).  Valid times are strictly increasing per row,
        # so scatter indices are unique per row (padding duplicates all land
        # in the dump cell, where last-write-wins garbage is never read).
        rows = jnp.arange(B)[:, None]
        has = (jnp.zeros((B, M + 2), bool)
               .at[rows, slot_g].set(True if mask is None else mask))
        x_grid = (jnp.zeros((B, M + 2, d_x), values.dtype)
                  .at[rows, slot_g].set(values))
        t_grid = (jnp.zeros((B, M + 2), times.dtype)
                  .at[rows, slot_g].set(times))
        jump_grid = (jnp.zeros((B, M + 2, K_h, d_h), h_jump.dtype)
                     .at[rows, slot_g].set(jnp.transpose(h_jump, (1, 2, 0, 3))))

        # walk cells 0..M-1: emit the arriving (pre-jump) state, reset the
        # carry where an observation sits at this cell, take one solver step
        xs = (jnp.moveaxis(has[:, :M], 1, 0),              # (M, B)
              jnp.moveaxis(x_grid[:, :M], 1, 0),           # (M, B, d_x)
              jnp.moveaxis(t_grid[:, :M], 1, 0),           # (M, B)
              jnp.moveaxis(jump_grid[:, :M], 1, 0),        # (M, B, K_h, d_h)
              jnp.arange(M))

        def body(carry, x):
            h, x_last, t_cur = carry
            has_g, x_g, t_g, jump_g, g = x
            h_arrive = h
            sel = has_g[None, :, None]
            h = jnp.where(sel, jnp.transpose(jump_g, (1, 0, 2)), h)
            x_last = jnp.where(has_g[:, None], x_g, x_last)
            t_cur = jnp.where(has_g, t_g, t_cur)
            r = None if rng is None else jax.random.fold_in(rng, g)
            h = self._euler(params, h, x_last, t_cur, t_cur + dt, r)
            return (h, x_last, t_cur + dt), h_arrive

        init = (jnp.zeros((K_h, B, d_h), h_jump.dtype),
                jnp.zeros((B, d_x), values.dtype),
                jnp.zeros((B,), times.dtype))
        (h_fin, _, _), h_arrives = lax.scan(body, init, xs)
        h_arrives = jnp.concatenate([h_arrives, h_fin[None]], 0)  # (M+1,...)

        # pre-jump state at slot i = the walk's arrival at that slot's cell
        h_arr = jnp.transpose(h_arrives, (2, 0, 1, 3))            # (B, M+1, K_h, d_h)
        h_minus = jnp.take_along_axis(
            h_arr, g_idx[:, 1:, None, None], axis=1)              # (B, S, K_h, d_h)
        return jnp.transpose(h_minus, (2, 0, 1, 3)).reshape(
            K_h, B * (N - 1), d_h)

    def _check_grid_alignment(self, times, mask) -> None:
        """Concrete-input guard for ``grid_walk``: every valid observation
        time must sit on the integration grid and be strictly increasing
        per row (duplicate times would share one grid cell and lose the
        reference's zero-length-gap semantics).  Traced inputs are covered
        by the ``debug_checks=True`` in-graph assert instead."""
        try:
            import jax.core
            if isinstance(times, jax.core.Tracer) or isinstance(
                    mask, jax.core.Tracer):
                return
        except Exception:
            return
        import numpy as np
        t = np.asarray(times)
        m = np.ones(t.shape, bool) if mask is None else np.asarray(mask)
        dt = self.dt_ode_step
        off = np.abs(np.round(t / dt) * dt - t)
        if float(np.max(np.where(m, off, 0.0))) > 1e-4 * max(dt, 1.0):
            raise ValueError(
                f"grid_walk=True but observation times are not multiples of "
                f"dt_ode_step={dt} (worst offset "
                f"{float(np.max(np.where(m, off, 0.0))):.3g}); disable "
                "grid_walk for off-grid data")
        both = m[:, 1:] & m[:, :-1]
        if both.any() and float(np.min(
                np.where(both, t[:, 1:] - t[:, :-1], np.inf))) < dt * 0.5:
            raise ValueError(
                "grid_walk=True requires strictly increasing observation "
                "times (one observation per grid cell); found a duplicate "
                "or sub-dt gap")
        if float(np.max(np.where(m, t, 0.0))) > (self.max_substeps + 0.5) * dt:
            raise ValueError(
                f"grid_walk: an observation time exceeds the integration "
                f"grid (max_substeps={self.max_substeps} x dt_ode_step={dt}); "
                "construct the model with a larger t_max")

    def _check_substep_budget(self, times) -> None:
        """Guard against silent under-integration: the predicated substep
        loop has a static bound derived from ``t_max``; if an observation
        gap needs more full substeps than that, the final 'partial' step
        would silently span the remainder.  Checked on concrete (non-traced)
        inputs only — jitted callers are expected to have wired ``t_max``
        from their data config (run_experiment does), or can opt into the
        in-graph runtime assert with ``debug_checks=True`` (checked on every
        dispatch, traced or not)."""
        if self.dt_ode_step is None:
            return
        try:
            import jax.core
            if isinstance(times, jax.core.Tracer):
                return
        except Exception:
            return
        import numpy as np
        t = np.asarray(times)
        if t.ndim != 2 or t.shape[1] < 2:
            return
        max_gap = float(np.max(t[:, 1:] - t[:, :-1]))
        budget = (self.max_substeps + 1) * self.dt_ode_step
        if max_gap > budget + 1e-9:
            raise ValueError(
                f"observation gap {max_gap:.4g} exceeds the Euler substep "
                f"budget (max_substeps={self.max_substeps} x dt_ode_step="
                f"{self.dt_ode_step}); construct the model with "
                f"t_max >= {max_gap:.4g} (or pass max_substeps explicitly).")

    def _check_gap_budget(self, gaps) -> None:
        """Same guard for arbitrary concrete integration gaps (serving)."""
        if self.dt_ode_step is None:
            return
        try:
            import jax.core
            if isinstance(gaps, jax.core.Tracer):
                return
        except Exception:
            return
        import numpy as np
        g = np.asarray(gaps)
        if g.size == 0:
            return
        max_gap = float(np.max(g))
        budget = (self.max_substeps + 1) * self.dt_ode_step
        if max_gap > budget + 1e-9:
            raise ValueError(
                f"integration gap {max_gap:.4g} exceeds the Euler substep "
                f"budget (max_substeps={self.max_substeps} x dt_ode_step="
                f"{self.dt_ode_step}); construct the model with "
                f"t_max >= {max_gap:.4g} (or pass max_substeps explicitly).")

    # ---------------------------------------------------------------- apply

    def apply(self, params: Params, times: jnp.ndarray, values: jnp.ndarray,
              mask: Optional[jnp.ndarray] = None,
              rng: Optional[jax.Array] = None,
              training: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Batched forward over padded observation slots.

        TPU-first formulation: the NJ-ODE jump RESETS the latent state to
        ``jump_nn(x_i)`` at every observation (reference models/jump_ode.py:
        169,176), so there is NO recurrence across observations — each
        inter-observation gap integrates independently from its own jump
        state.  The whole forward is therefore a handful of LARGE batched
        matmuls over the folded (B·N) axis (MXU-shaped), with zero sequential
        scan steps on the hot path:

          h_jump[:, i]  = jump(x_i)                 for all slots at once
          y_after[:, i] = out(h_jump[:, i])
          h_minus[:, i] = integrate(h_jump[:, i-1], x_{i-1}, t_{i-1} -> t_i)
          y_before[:,i] = out(h_minus[:, i]),  y_before[:, 0] = 0.

        Semantics (verified against the reference to ~1e-4): identical —
        the reference's sequential loop computes exactly these quantities.

        Args:
          times:  (B, N) observation times, sorted per row, padded at the END.
          values: (B, N, d_x) observations.
          mask:   (B, N) bool validity (True for real observations). Padding
                  must be at the end of each row.  None = all valid.
          rng:    dropout rng (only used when training and dropout_rate > 0).

        Returns:
          preds, preds_before: (B, N, d_y, K) — after-jump and before-jump
          moment predictions at every slot (garbage at padded slots; mask it).
        """
        self._check_substep_budget(times)
        times = times.astype(self.dtype)
        values = values.astype(self.dtype)
        B, N = times.shape
        d_x = values.shape[-1]
        use_rng = training and self.dropout_rate > 0.0 and rng is not None
        if use_rng:
            r_jump, r_out_a, r_gap, r_out_b = jax.random.split(rng, 4)
        else:
            r_jump = r_out_a = r_gap = r_out_b = None

        if not use_rng and self._use_fused_step(N, n_rows=B * max(N - 1, 1)):
            from ..ops.fused_step import fused_step_apply
            return fused_step_apply(
                params, times, values,
                num_moments=self.num_moments, hidden_dim=self.hidden_dim,
                activation=self._act_key,
                input_scaling=self._scale_key,
                compute_dtype=self.compute_dtype,
                interpret=(self.use_pallas == "step-interpret"),
                shared_network=self.shared_network,
                input_dim=self.input_dim, output_dim=self.output_dim,
                n_hidden_layers=self.n_hidden_layers)

        # ---- jump + after-jump readout at ALL slots: fold (B, N) ----
        x_flat = values.reshape(B * N, d_x)
        h_jump = self._jump(params, x_flat, r_jump)       # (K_h, B*N, d_h)
        y_after = self._readout(params, h_jump, r_out_a)  # (B*N, d_y, K)
        preds = y_after.reshape(B, N, self.output_dim, self.num_moments)

        if N == 1:
            return preds, jnp.zeros_like(preds)

        # ---- gaps: slot i-1 -> slot i, folded over (B, N-1) ----
        S = N - 1
        # grid_walk = permission to walk; under 'auto' kernels the engine
        # only takes it where the fused walk kernel carries it (measured
        # win regime) — oversized batches keep the per-gap path, never the
        # slow pure-XLA walk (BENCH_NOTES r3g/r3h)
        use_walk = self.grid_walk and self.dt_ode_step is not None
        if use_walk and self.use_pallas == "auto":
            use_walk = self._use_walk_kernel(n_rows=B)
        if use_walk:
            # one time-major walk over the integration grid computes every
            # gap at once (~S x fewer ODEFunc evals than the per-gap loops)
            self._check_grid_alignment(times, mask)
            h_minus = self._integrate_gaps_grid(
                params,
                h_jump.reshape(self.k_hidden, B, N, self.hidden_dim),
                times, values, mask, r_gap)                # (K_h, B*S, d_h)
        else:
            h0 = (h_jump.reshape(self.k_hidden, B, N, self.hidden_dim)
                  [:, :, :-1].reshape(self.k_hidden, B * S, self.hidden_dim))
            x_last = values[:, :-1].reshape(B * S, d_x)
            t_last = times[:, :-1].reshape(B * S)
            t_tgt = times[:, 1:].reshape(B * S)
            h_minus = self._integrate_gap(params, h0, x_last, t_last, t_tgt,
                                          r_gap)           # (K_h, B*S, d_h)
        y_before_tail = self._readout(params, h_minus, r_out_b)
        y_before_tail = y_before_tail.reshape(B, S, self.output_dim,
                                              self.num_moments)
        # prediction before the very first observation is zero
        # (reference models/jump_ode.py:161)
        preds_before = jnp.concatenate(
            [jnp.zeros((B, 1, self.output_dim, self.num_moments),
                       preds.dtype), y_before_tail], axis=1)
        return preds, preds_before

    def apply_loss(self, params: Params, times: jnp.ndarray,
                   values: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                   *, rng: Optional[jax.Array] = None, training: bool = False,
                   ignore_first_continuity: bool = False,
                   moment_weights=None, eps: float = 1e-10,
                   variance_method: str = "direct", traj_mask=None,
                   extended_moments: bool = False) -> jnp.ndarray:
        """Forward + NJ-ODE training loss in one dispatch.

        Semantically ``nj_ode_loss_dense(values, *self.apply(...), mask,
        ...)`` — but when the fused-step kernel carries the forward (same
        ``_use_fused_step`` predicate as :meth:`apply`) and
        ``output_dim == input_dim``, the loss is computed ENTIRELY in the
        kernel's lane space (``ops.fused_step.fused_step_loss``): moment
        planes are selected from the (B, LANES) kernel output with constant
        0/1 matmuls, so the (B, N, d, K) prediction tensor — and, in the
        backward, its cotangent — is never materialized.  Measured (r5i,
        BENCH_NOTES.md): the lane<->tensor glue it removes is 1.18x of the
        d=1 and 1.46x of the d=2 scaled training step.  Parity (value AND
        parameter gradients) is pinned in
        ``tests/test_fused_step.py::test_lane_space_loss_parity``.
        """
        use_rng = training and self.dropout_rate > 0.0 and rng is not None
        B, N = times.shape
        if (not use_rng and self.output_dim == self.input_dim
                and self._use_fused_step(N, n_rows=B * max(N - 1, 1))):
            from ..ops.fused_step import fused_step_loss
            return fused_step_loss(
                params, times, values, mask,
                num_moments=self.num_moments, hidden_dim=self.hidden_dim,
                activation=self._act_key, input_scaling=self._scale_key,
                ignore_first_continuity=ignore_first_continuity,
                moment_weights=moment_weights, eps=eps,
                variance_method=variance_method, traj_mask=traj_mask,
                extended_moments=extended_moments,
                compute_dtype=self.compute_dtype,
                interpret=(self.use_pallas == "step-interpret"),
                shared_network=self.shared_network,
                input_dim=self.input_dim, output_dim=self.output_dim,
                n_hidden_layers=self.n_hidden_layers)
        from .loss import nj_ode_loss_dense
        preds, preds_before = self.apply(params, times, values, mask,
                                         rng=rng, training=training)
        return nj_ode_loss_dense(
            values, preds, preds_before, mask,
            ignore_first_continuity=ignore_first_continuity,
            moment_weights=moment_weights, eps=eps,
            variance_method=variance_method, traj_mask=traj_mask,
            extended_moments=extended_moments)

    # ----------------------------------------------- reference ragged API

    def forward(self, params: Params, batch_times: Sequence[jnp.ndarray],
                batch_values: Sequence[jnp.ndarray],
                rng: Optional[jax.Array] = None, training: bool = False):
        """Reference-compatible ragged-list forward (models/jump_ode.py:218-233).

        Accepts lists of per-trajectory (n_i,) times and (n_i, d_x) values,
        pads to a dense batch, runs the scan once, and slices back to lists of
        (n_i, d_y, K) arrays.
        """
        times, values, mask = pad_ragged(batch_times, batch_values, self.dtype)
        preds, preds_before = self.apply(params, times, values, mask, rng, training)
        lengths = [int(t.shape[0]) for t in batch_times]
        out = [preds[b, :n] for b, n in enumerate(lengths)]
        out_before = [preds_before[b, :n] for b, n in enumerate(lengths)]
        return out, out_before

    # ----------------------------------------------------- query inference

    def predict_at(self, params: Params, obs_times: jnp.ndarray,
                   obs_values: jnp.ndarray, query_times: jnp.ndarray,
                   mask: Optional[jnp.ndarray] = None):
        """Conditional-moment predictions at arbitrary query times.

        Serving-oriented API with no reference analogue: thanks to the
        jump-reset structure, every query integrates independently from the
        state at its own last observation — all B·Q queries run as one
        batch of matmuls, no sequential rollout.

        Semantics match ``model.forward``'s between-observation integration
        (single Euler step over the gap, or fixed-``dt_ode_step`` substeps):
        the prediction at query t uses the latest observation with
        ``t_obs <= t`` (right-continuous filtration); queries before the
        first observation return 0, like the model's before-first prediction
        (reference models/jump_ode.py:161).

        Args:
          obs_times:  (B, N) sorted observation times (end-padded).
          obs_values: (B, N, d_x).
          query_times: (B, Q).
          mask: (B, N) observation validity. Padding must repeat the last
            valid time/value (as produced by ``pad_ragged``).

        Returns: dict with 'mean' (B, Q, d_y), 'var' (B, Q, d_y) or None,
          'raw' (B, Q, d_y, K).
        """
        obs_times = obs_times.astype(self.dtype)
        obs_values = obs_values.astype(self.dtype)
        query_times = query_times.astype(self.dtype)
        B, N = obs_times.shape
        Q = query_times.shape[1]
        d_x = obs_values.shape[-1]

        # latest observation index with t_obs <= t, per row
        if mask is not None:
            # exclude padded slots from the search by pushing them to +inf
            search_times = jnp.where(mask, obs_times, jnp.inf)
        else:
            search_times = obs_times
        idx = jax.vmap(
            lambda t, q: jnp.searchsorted(t, q, side="right") - 1
        )(search_times, query_times)
        idx = jnp.clip(idx, 0, N - 1)                        # (B, Q)

        x_last = jnp.take_along_axis(obs_values, idx[..., None], axis=1)
        t_last = jnp.take_along_axis(obs_times, idx, axis=1)
        self._check_gap_budget(jnp.maximum(query_times - t_last, 0.0))

        x_flat = x_last.reshape(B * Q, d_x)
        t_flat = t_last.reshape(B * Q)
        q_flat = query_times.reshape(B * Q)

        h = self._jump(params, x_flat)                        # (K_h, B*Q, d_h)
        h = self._integrate_gap(params, h, x_flat, t_flat, q_flat,
                                inference=True)
        y = self._readout(params, h)                          # (B*Q, d_y, K)
        raw = y.reshape(B, Q, self.output_dim, self.num_moments)

        # queries strictly before the first observation -> zeros
        t_first = search_times[:, :1]
        before_first = (query_times < t_first)[..., None, None]
        raw = jnp.where(before_first, 0.0, raw)
        return {"mean": raw[..., 0], "var": self.variance_from_raw(raw),
                "raw": raw}

    # -------------------------------------------------------- grid rollout

    def predict_on_grid(self, params: Params, grid_times: jnp.ndarray,
                        obs_mask: jnp.ndarray, path_values: jnp.ndarray,
                        n_sub: Optional[int] = None):
        """Dense-grid inference with the reference *plotting* semantics.

        This is the single canonical rollout used by plotting and grid eval,
        resolving the semantic drift between the reference's two inference
        paths (model.forward vs utils/plotting.py:146-256): between
        observations the latent state is advanced cell-by-cell with
        ``n_sub = max(1, int(cell_dt / dt_ode_step))`` equal Euler substeps
        (reference utils/plotting.py:164-173), at observation grid points the
        state jumps and the emission is the after-jump readout, and the
        rollout extrapolates past the last observation (reference :202-256).

        Args:
          grid_times: (G,) the dense time grid (uniform spacing assumed for
                      the static substep count).
          obs_mask:   (B, G) True where the grid point is observed.
          path_values:(B, G, d_x) path values on the grid (only read at
                      observed points).
          n_sub:      static substeps per grid cell; default derived from
                      ``dt_ode_step`` and the grid spacing.

        Returns:
          dict with 'mean' (B, G, d_y), 'var' (B, G, d_y) or None, and
          'raw' (B, G, d_y, K).
        """
        grid_times = grid_times.astype(self.dtype)
        path_values = path_values.astype(self.dtype)
        B, G = obs_mask.shape
        if n_sub is None:
            if self.dt_ode_step is None:
                n_sub = 1
            else:
                # the static substep count is derived from the FIRST cell, so
                # it is only correct on a uniform grid (the reference computes
                # per-cell substeps, utils/plotting.py:164-170) — guard
                # instead of silently under/over-substepping
                import numpy as np
                gt = np.asarray(grid_times, dtype=np.float64)
                if G > 2:
                    gaps = np.diff(gt)
                    if gaps.size and not np.allclose(
                            gaps, gaps[0], rtol=1e-4, atol=1e-9):
                        raise ValueError(
                            "predict_on_grid derives a single static substep "
                            "count from the first grid cell, which requires "
                            "uniform grid spacing; got non-uniform gaps "
                            f"(min {gaps.min():.3g}, max {gaps.max():.3g}). "
                            "Pass n_sub= explicitly (sized for the largest "
                            "cell) or use predict_at for irregular queries.")
                cell = float(gt[1] - gt[0]) if G > 1 else 0.0
                n_sub = max(1, int(cell / self.dt_ode_step))

        h0 = jnp.zeros((self.k_hidden, B, self.hidden_dim), self.dtype)
        x0 = jnp.zeros((B, self.input_dim), self.dtype)
        t0 = jnp.full((B,), grid_times[0], self.dtype)
        seen0 = jnp.zeros((B,), dtype=bool)

        xs = (grid_times, jnp.swapaxes(path_values, 0, 1), jnp.swapaxes(obs_mask, 0, 1))

        def step(carry, x):
            h, x_last, t_cur, seen = carry
            t_k, x_k, m_k = x
            t_kb = jnp.broadcast_to(t_k, (B,)).astype(self.dtype)

            # integrate one grid cell with n_sub equal substeps; fori_loop
            # keeps the trace size O(1) in n_sub (a coarse grid with fine
            # dt_ode_step can want n_sub in the hundreds)
            dt_sub = (t_kb - t_cur) / float(n_sub)

            def sub_body(j, carry):
                h_c, t_c = carry
                t_n = t_c + dt_sub
                return self._euler(params, h_c, x_last, t_c, t_n), t_n

            if n_sub == 1:  # common case: no loop machinery
                h_int, _ = sub_body(0, (h, t_cur))
            else:
                h_int, _ = lax.fori_loop(0, n_sub, sub_body, (h, t_cur))

            h_jump = self._jump(params, x_k)
            h_new = jnp.where(m_k[None, :, None], h_jump,
                              jnp.where(seen[None, :, None], h_int, h))
            x_new = jnp.where(m_k[:, None], x_k, x_last)
            seen_new = seen | m_k

            y = self._readout(params, h_new)          # (B, d_y, K)
            y = jnp.where(seen_new[:, None, None], y, jnp.zeros_like(y))
            return (h_new, x_new, t_kb, seen_new), y

        _, ys = lax.scan(step, (h0, x0, t0, seen0), xs)
        raw = jnp.moveaxis(ys, 0, 1)  # (B, G, d_y, K)
        return {"mean": raw[..., 0], "var": self.variance_from_raw(raw),
                "raw": raw}


def pad_ragged(batch_times: Sequence, batch_values: Sequence, dtype=jnp.float32):
    """Pad ragged per-trajectory (times, values) lists to dense arrays.

    Padding repeats the last valid time/value (keeps gaps non-negative so the
    masked scan stays numerically benign) and is always at the row end.
    """
    import numpy as np

    B = len(batch_times)
    lengths = [int(np.asarray(t).shape[0]) for t in batch_times]
    N = max(lengths)
    d_x = int(np.asarray(batch_values[0]).shape[-1])
    times = np.zeros((B, N), dtype=np.float32)
    values = np.zeros((B, N, d_x), dtype=np.float32)
    mask = np.zeros((B, N), dtype=bool)
    for b, (t, v, n) in enumerate(zip(batch_times, batch_values, lengths)):
        t = np.asarray(t, dtype=np.float32)
        v = np.asarray(v, dtype=np.float32).reshape(n, d_x)
        times[b, :n] = t
        values[b, :n] = v
        mask[b, :n] = True
        if n < N:
            times[b, n:] = t[-1]
            values[b, n:] = v[-1]
    return (jnp.asarray(times, dtype=dtype), jnp.asarray(values, dtype=dtype),
            jnp.asarray(mask))
