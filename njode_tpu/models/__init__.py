"""Model layer: NeuralJumpODE + nj_ode_loss (reference: neural_jump_ode/models)."""

from .jump_ode import NeuralJumpODE, pad_ragged
from .loss import nj_ode_loss, nj_ode_loss_dense
from .activations import ACTIVATION_FUNCTIONS, get_activation, get_input_scaling

__all__ = [
    "NeuralJumpODE",
    "nj_ode_loss",
    "nj_ode_loss_dense",
    "pad_ragged",
    "ACTIVATION_FUNCTIONS",
    "get_activation",
    "get_input_scaling",
]
