"""Orchestration layer (reference: neural_jump_ode/utils)."""

from .training import (
    DataLoader,
    Trainer,
    as_dense,
    create_data_loaders,
    make_adam,
    run_experiment,
)
from .checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)
from .ensemble import (
    ensemble_mean_std,
    ensemble_predict,
    init_ensemble,
    shard_ensemble,
    train_ensemble,
)
from .metrics import conditional_moment_mse, relative_loss
from .torch_compat import (
    params_from_torch_checkpoint,
    params_from_torch_state_dict,
)

# plotting is imported lazily (matplotlib optional); re-export when available
try:  # pragma: no cover - environment dependent
    from .plotting import (  # noqa: F401
        plot_relative_loss,
        plot_relative_loss_single,
        plot_single_trajectory_with_condexp,
        plot_training_history,
    )
    _HAS_PLOTTING = True
except Exception:  # matplotlib missing
    _HAS_PLOTTING = False

__all__ = [
    "DataLoader", "Trainer", "as_dense", "create_data_loaders", "make_adam",
    "run_experiment", "checkpoint_exists", "load_checkpoint",
    "save_checkpoint", "params_from_torch_checkpoint",
    "params_from_torch_state_dict", "relative_loss", "conditional_moment_mse",
    "train_ensemble", "init_ensemble", "ensemble_predict",
    "ensemble_mean_std", "shard_ensemble",
]
if _HAS_PLOTTING:
    __all__ += ["plot_relative_loss", "plot_relative_loss_single",
                "plot_single_trajectory_with_condexp", "plot_training_history"]
