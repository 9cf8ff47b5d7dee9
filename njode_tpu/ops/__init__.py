"""Pallas TPU kernels + XLA fallbacks (no reference analogue: the reference
has zero native/compiled components — SURVEY.md §2 language census; the
native-performance surface of the TPU rebuild is Pallas/XLA)."""

from .fused_cell import (
    HAS_PALLAS,
    SUPPORTED_ACTS,
    fused_cell_available,
    fused_euler_cell,
    ode_euler_fused,
)
from .fused_step import (fused_step_apply, fused_step_available,
                         fused_step_loss)
from .gap_scan import gap_scan_available, integrate_gap_fused
from .train_kernel import fused_train_run, train_kernel_available

__all__ = ["HAS_PALLAS", "SUPPORTED_ACTS", "fused_cell_available",
           "fused_euler_cell", "ode_euler_fused",
           "fused_step_apply", "fused_step_available", "fused_step_loss",
           "gap_scan_available", "integrate_gap_fused",
           "fused_train_run", "train_kernel_available"]
