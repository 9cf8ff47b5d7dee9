"""Parameter init + functional apply for the three NJ-ODE network topologies.

The three MLPs deliberately reproduce the reference's layer orders, which
differ from each other (this is observable through parameter counts and
dropout placement):

* JumpNN    (reference models/jump_ode.py:15-26):
    Linear(d_x, d_h), act, then n_hidden_layers x [Dropout, Linear(d_h,d_h), act]
* ODEFunc   (reference models/jump_ode.py:29-63):
    Linear(d_h+d_x+2, d_h), act, (n_hidden_layers-1) x [Dropout, Linear, act],
    Dropout, Linear(d_h, d_h)          (no final activation)
* OutputNN  (reference models/jump_ode.py:66-77):
    n_hidden_layers x [Linear(d_h,d_h), act, Dropout], Linear(d_h, d_out)

Parameters are plain pytrees: ``{"layers": [{"w": (in,out), "b": (out,)}, ...]}``.
Weights use ``x @ w`` orientation. Initialisation matches torch.nn.Linear's
default (both weight and bias ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in))), so
distributional behaviour at init matches the reference.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp

from .activations import Activation

Params = dict[str, Any]


def linear_init(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), dtype, -bound, bound),
    }


def _mlp_init(key: jax.Array, dims: Sequence[tuple[int, int]], dtype) -> Params:
    keys = jax.random.split(key, len(dims))
    return {"layers": [linear_init(k, i, o, dtype) for k, (i, o) in zip(keys, dims)]}


def jump_nn_init(key, input_dim, hidden_dim, n_hidden_layers=1, dtype=jnp.float32) -> Params:
    dims = [(input_dim, hidden_dim)] + [(hidden_dim, hidden_dim)] * n_hidden_layers
    return _mlp_init(key, dims, dtype)


def ode_func_init(key, hidden_dim, input_dim, n_hidden_layers=1, dtype=jnp.float32) -> Params:
    dims = [(hidden_dim + input_dim + 2, hidden_dim)]
    dims += [(hidden_dim, hidden_dim)] * (n_hidden_layers - 1)
    dims += [(hidden_dim, hidden_dim)]
    return _mlp_init(key, dims, dtype)


def output_nn_init(key, hidden_dim, output_dim, n_hidden_layers=1, dtype=jnp.float32) -> Params:
    dims = [(hidden_dim, hidden_dim)] * n_hidden_layers + [(hidden_dim, output_dim)]
    return _mlp_init(key, dims, dtype)


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def _dropout(x: jnp.ndarray, rate: float, rng: Optional[jax.Array]) -> jnp.ndarray:
    """Inverted dropout, matching torch.nn.Dropout train-mode semantics."""
    if rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _split_opt(rng: Optional[jax.Array], n: int):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


def jump_nn_apply(p: Params, x: jnp.ndarray, act: Activation,
                  dropout_rate: float = 0.0, rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """x: (..., d_x) -> (..., d_h). Dropout precedes every hidden Linear."""
    layers = p["layers"]
    h = act(_linear(layers[0], x))
    rngs = _split_opt(rng, len(layers) - 1)
    for lp, r in zip(layers[1:], rngs):
        h = _dropout(h, dropout_rate, r)
        h = act(_linear(lp, h))
    return h


def ode_func_apply(p: Params, inp: jnp.ndarray, act: Activation,
                   dropout_rate: float = 0.0, rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """inp: (..., d_h+d_x+2) -> dh/dt (..., d_h). Final Linear has no activation."""
    layers = p["layers"]
    h = act(_linear(layers[0], inp))
    rngs = _split_opt(rng, len(layers) - 1)
    for lp, r in zip(layers[1:-1], rngs[:-1]):
        h = _dropout(h, dropout_rate, r)
        h = act(_linear(lp, h))
    h = _dropout(h, dropout_rate, rngs[-1])
    return _linear(layers[-1], h)


def output_nn_apply(p: Params, h: jnp.ndarray, act: Activation,
                    dropout_rate: float = 0.0, rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """h: (..., d_h) -> (..., d_out). Dropout follows each hidden activation."""
    layers = p["layers"]
    rngs = _split_opt(rng, len(layers) - 1)
    for lp, r in zip(layers[:-1], rngs):
        h = _dropout(act(_linear(lp, h)), dropout_rate, r)
    return _linear(layers[-1], h)


def count_params(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
