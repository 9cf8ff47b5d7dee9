"""Kernel-engagement report: which Pallas kernel carries which piece of a
run, and — when one is declined — the FIRST failing eligibility reason.

The six kernels (walk / train + its walk twin / step / gap / cell) each gate on a
measured win regime plus config eligibility; under ``--kernels auto`` an
ineligible config silently degrades to the XLA path.  This module turns
those decisions into one human-readable line so no degradation path is
silent (the Trainer prints it once per ``train()``; the decision itself
always comes from the same predicates the engine uses — the reason
strings here are diagnostic only).

Reference for the flag surface this reports on:
/root/reference/neural_jump_ode/models/jump_ode.py:36-39 (arbitrary
input_dim / n_hidden_layers are first-class there, so a user must be able
to see when a config leaves the kernel fast paths).
"""

from __future__ import annotations

from typing import Optional


def _walk_reason(model, n_rows: Optional[int]) -> str:
    """First failing eligibility reason for the fused walk kernel."""
    from .fused_cell import SUPPORTED_ACTS
    from .gap_scan import _SCALE
    from .walk_scan import HAS_PALLAS, LANES, auto_max_rows
    if not HAS_PALLAS:
        return "pallas unavailable"
    if model.dt_ode_step is None:
        return "no --dt-ode-step (gaps are single Euler steps already)"
    if not model.grid_walk:
        return "grid walk off (off-grid observation times, multi-device, " \
               "or --grid-walk off)"
    if model.n_hidden_layers != 1:
        return f"n_hidden_layers {model.n_hidden_layers} != 1"
    if model.dropout_rate != 0.0:
        return "dropout unsupported"
    if model._act_key not in SUPPORTED_ACTS:
        return f"activation {model._act_key!r} has no kernel table"
    if model._scale_key not in _SCALE:
        return f"input scaling {model._scale_key!r} has no kernel table"
    if model.input_dim != 1:
        return f"input_dim {model.input_dim} != 1"
    if model.hidden_dim + 3 > LANES:
        return f"hidden_dim {model.hidden_dim} + t/x/const lanes > {LANES}"
    if model.compute_dtype is not None:
        return "float32 only"
    if model.ode_solver != "euler":
        return f"ode_solver {model.ode_solver!r} != euler"
    if model.num_moments > 8:
        return f"num_moments {model.num_moments} > 8"
    if (model.use_pallas == "auto" and n_rows is not None
            and n_rows > auto_max_rows(model.hidden_dim)):
        return (f"batch rows {n_rows} > auto ceiling "
                f"{auto_max_rows(model.hidden_dim)} (dense per-cell streams "
                "lose above one row tile, BENCH_NOTES r3h)")
    import jax
    if jax.default_backend() != "tpu":
        return "not on TPU"
    return "not in the measured win regime"


def _step_reason(model, n_slots: Optional[int],
                 n_rows: Optional[int]) -> str:
    """First failing eligibility reason for the fused whole-step kernel."""
    from .fused_step import (AUTO_MIN_HIDDEN, AUTO_MIN_ROWS, HAS_PALLAS,
                             LANES, _slot_cols, fused_step_fits)
    if not HAS_PALLAS:
        return "pallas unavailable"
    if not model._step_eligible:
        if model.dt_ode_step is not None:
            return "--dt-ode-step set (substep gaps ride the walk kernel)"
        if model.dropout_rate != 0.0:
            return "dropout unsupported"
        if model.ode_solver != "euler":
            return f"ode_solver {model.ode_solver!r} != euler"
        return "activation/scaling has no kernel table"
    if model.use_pallas == "auto":
        if model.shared_network:
            return "shared network (measured 0.91x in-kernel, " \
                   "BENCH_NOTES r3b; opt in with --kernels step)"
        if model.hidden_dim < AUTO_MIN_HIDDEN:
            return (f"hidden_dim {model.hidden_dim} < {AUTO_MIN_HIDDEN} "
                    "(XLA measured at least as fast below, BENCH_NOTES r3d+r4c)")
        if n_rows is not None and n_rows < AUTO_MIN_ROWS:
            return (f"folded rows {n_rows} < {AUTO_MIN_ROWS} "
                    "(XLA measured at least as fast below, BENCH_NOTES r3d+r4c)")
    if model.compute_dtype is not None:
        import jax.numpy as jnp
        if model.compute_dtype is not jnp.bfloat16:
            return "compute dtype must be f32 or bf16"
    if (n_slots is not None
            and not fused_step_fits(n_slots, model.num_moments,
                                    model.input_dim, model.output_dim)):
        if n_slots * (model.input_dim + 1) > LANES:
            return (f"N*(d_x+1) = {n_slots * (model.input_dim + 1)} "
                    f"input lanes > {LANES}")
        return (f"d_y*K*(2N-1) = "
                f"{_slot_cols(n_slots, model.num_moments, model.output_dim)}"
                f" prediction columns > {LANES} output lanes")
    import jax
    if jax.default_backend() != "tpu":
        return "not on TPU"
    return "not in the measured win regime"


def kernel_report(model, *, n_rows: Optional[int] = None,
                  n_slots: Optional[int] = None,
                  train_kernel: Optional[str] = None) -> str:
    """One-line engagement report over the Pallas kernels.

    ``n_rows``/``n_slots`` are the training batch rows and observation
    slots when known.  ``train_kernel`` is the Trainer's own whole-run
    kernel resolution: 'on', 'interpret', or the first failing reason
    (the Trainer owns that decision — optimizer state is out of the
    model's sight).  Engagement decisions come from the model's actual
    predicates; the strings here only explain them.
    """
    parts = []

    # --- walk: fused grid-walk integration (ops/walk_scan.py) ---
    folded = None if n_rows is None else n_rows
    walk_on = (model.grid_walk and model.dt_ode_step is not None
               and model._use_walk_kernel(n_rows=folded or 0))
    if model.use_pallas == "auto" and n_rows is None and walk_on:
        # without a known row count the auto ceiling can't be resolved
        parts.append("walk=auto (engages up to the row ceiling)")
    elif walk_on:
        parts.append("walk=on")
    else:
        parts.append(f"walk=off ({_walk_reason(model, n_rows)})")

    # --- train: the whole-run training kernel (Trainer's decision; the
    # '(walk twin)' suffix marks the production --dt-ode-step kernel,
    # ops/walk_train.py) ---
    if train_kernel and train_kernel.split(" ", 1)[0] in ("on", "interpret"):
        suffix = " (walk twin)" if train_kernel.endswith("(walk twin)") else ""
        parts.append(f"train=on{suffix}"
                     if train_kernel.startswith("on")
                     else f"train=on (interpreter){suffix}")
    elif train_kernel:
        parts.append(f"train=off ({train_kernel})")

    # --- step: the fused whole-step kernel (ops/fused_step.py) ---
    rows_folded = (None if (n_rows is None or n_slots is None)
                   else n_rows * max(n_slots - 1, 1))
    if (n_slots is not None
            and model._use_fused_step(n_slots, n_rows=rows_folded or 0)):
        parts.append("step=on")
    else:
        parts.append(f"step=off ({_step_reason(model, n_slots, rows_folded)})")

    # --- gap: the whole-gap substep kernel (inference-only win) ---
    if model._gap_eligible and model.use_pallas == "auto":
        from .gap_scan import AUTO_MAX_ROWS
        parts.append(f"gap=inference-only (streaming, <= {AUTO_MAX_ROWS} "
                     "rows — training measured faster on XLA)")
    elif model._gap_eligible and model._pallas_on():
        parts.append("gap=on (forced)")
    else:
        parts.append("gap=off")

    # --- cell: the per-substep fused cell (opt-in) ---
    parts.append("cell=on (forced)" if model._use_fused()
                 else "cell=opt-in (measured slower than XLA fusion)")

    return "Kernels: " + "; ".join(parts)
