"""Activation registry.

Mirrors the reference's ``ACTIVATION_FUNCTIONS`` mapping including the
silent ReLU fallback for unknown names (reference: models/jump_ode.py:6-13,18
— ``ACTIVATION_FUNCTIONS.get(activation.lower(), nn.ReLU)``).  The fallback
is load-bearing: the OU experiment CLI ships an ``'identity'`` default that
resolves to ReLU through it (reference: experiments/experiment_ou.py:30).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Activation = Callable[[jnp.ndarray], jnp.ndarray]

ACTIVATION_FUNCTIONS: dict[str, Activation] = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "elu": jax.nn.elu,              # alpha=1.0, same as torch.nn.ELU default
    "leaky_relu": jax.nn.leaky_relu,  # negative_slope=0.01, same as torch default
    "selu": jax.nn.selu,
}


def get_activation(name: str) -> Activation:
    """Resolve an activation by name with the reference's ReLU fallback."""
    return ACTIVATION_FUNCTIONS.get(name.lower(), jax.nn.relu)


def canonical_activation(name: str) -> str:
    """The table key :func:`get_activation` actually resolves ``name`` to
    (unknown names -> ``'relu'``, the reference's silent fallback).

    Kernel-eligibility checks and Pallas activation tables must consume
    THIS, not the raw config string — e.g. the OU CLI's ``'identity'``
    default computes ReLU, so the kernels apply ReLU too."""
    n = name.lower()
    return n if n in ACTIVATION_FUNCTIONS else "relu"


def canonical_input_scaling(name: str) -> str:
    """The scaling key :func:`get_input_scaling` resolves to
    (``'none'`` is the reference's alias for identity)."""
    n = name.lower()
    return "identity" if n in ("identity", "none") else n


# Input-scaling functions for the ODE drift network
# (reference: models/jump_ode.py:43-50).
def get_input_scaling(name: str) -> Activation:
    if name in ("identity", "none"):
        return lambda x: x
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise ValueError(
        f"Unknown input_scaling: {name}. Use 'identity', 'tanh', or 'sigmoid'."
    )
