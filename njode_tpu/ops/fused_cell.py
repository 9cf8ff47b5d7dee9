"""Pallas TPU kernel: fused NJ-ODE Euler cell.

The hot op of the forward scan is the latent Euler step
(reference models/jump_ode.py:122-140):

    inp = concat([scale(h), scale(x), t_rel, t_elapsed])   # (R, d_in)
    dh  = W2^T act(inp @ W1 + b1) + b2                     # 2-layer ODEFunc
    h'  = h + dt * dh

XLA emits this as several small HBM-roundtripping ops per scan step; the
Pallas kernel fuses feature construction, both matmuls (MXU), the activation
(VPU) and the axpy into ONE VMEM-resident program, tiled over rows.  Rows are
the folded (K·B) moment-batch axis; the feature/lane axis is zero-padded to
the 128-lane MXU width by the host-side wrapper (padding columns of W1 are
zero so results are exact).

Gradients: the op carries a ``jax.custom_vjp`` whose backward pass is plain
XLA (matmuls of the saved pre-activations) — simple, correct, and itself
MXU-friendly; the forward is where scan-step count makes fusion matter.

Applicability: n_hidden_layers == 1 (the reference default and every shipped
config — run_*.sh uses the default), dropout-free.  The model falls back to
the pure-XLA path otherwise (njode_tpu/models/jump_ode.py selects).
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import numpy as np

try:  # Pallas is TPU-only at lowering time; import is safe everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

_ACT = {
    "relu": lambda x: jnp.maximum(x, 0.0),
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "elu": jax.nn.elu,
    "leaky_relu": jax.nn.leaky_relu,
    "selu": jax.nn.selu,
}
_SELU_L = 1.0507009873554805  # jax.nn.selu's scale/alpha constants
_SELU_A = 1.6732632423543772
_ACT_GRAD = {
    "relu": lambda pre: (pre > 0).astype(pre.dtype),
    "tanh": lambda pre: 1.0 - jnp.tanh(pre) ** 2,
    "sigmoid": lambda pre: jax.nn.sigmoid(pre) * (1 - jax.nn.sigmoid(pre)),
    "elu": lambda pre: jnp.where(pre > 0, 1.0, jnp.exp(jnp.minimum(pre, 0.0))),
    "leaky_relu": lambda pre: jnp.where(pre > 0, 1.0, 0.01),
    "selu": lambda pre: jnp.where(
        pre > 0, _SELU_L,
        _SELU_L * _SELU_A * jnp.exp(jnp.minimum(pre, 0.0))),
}

SUPPORTED_ACTS = tuple(_ACT_GRAD)  # custom-vjp path needs the analytic grad

ROW_TILE = 256       # rows per grid step (multiple of 8 sublanes)
LANES = 128          # MXU lane width


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(inp_ref, h_ref, dt_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, pre_ref, *, act_name: str):
    """One row-tile: dh = act(inp@W1+b1)@W2+b2 ; out = h + dt*dh."""
    act = _ACT[act_name]
    pre = jnp.dot(inp_ref[:], w1_ref[:],
                  preferred_element_type=jnp.float32) + b1_ref[:]
    hidden = act(pre)
    dh = jnp.dot(hidden, w2_ref[:],
                 preferred_element_type=jnp.float32) + b2_ref[:]
    out_ref[:] = h_ref[:] + dt_ref[:] * dh
    pre_ref[:] = pre  # residual for the backward pass


def _pallas_forward(inp, h, dt_col, w1, b1, w2, b2, act_name: str,
                    interpret: bool):
    """inp: (R, Din_p), h/dt_col: (R, Dh_p), weights pre-padded."""
    R, Din_p = inp.shape
    Dh_p = h.shape[1]
    grid = (R // ROW_TILE,)
    row_spec = lambda d: pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    out, pre = pl.pallas_call(
        functools.partial(_kernel, act_name=act_name),
        grid=grid,
        in_specs=[
            row_spec(Din_p),           # inp
            row_spec(Dh_p),            # h
            row_spec(Dh_p),            # dt broadcast column-wise
            full((Din_p, Dh_p)),       # W1
            full((1, Dh_p)),           # b1
            full((Dh_p, Dh_p)),        # W2
            full((1, Dh_p)),           # b2
        ],
        out_specs=[row_spec(Dh_p), row_spec(Dh_p)],
        out_shape=[jax.ShapeDtypeStruct((R, Dh_p), jnp.float32),
                   jax.ShapeDtypeStruct((R, Dh_p), jnp.float32)],
        interpret=interpret,
    )(inp, h, dt_col, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
    return out, pre


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_euler_cell(inp, h, dt_col, w1, b1, w2, b2, act_name="relu",
                     interpret=False):
    """h_new = h + dt * (act(inp @ w1 + b1) @ w2 + b2), fused on TPU.

    Shapes (host-padded by the caller):
      inp (R, Din_p), h (R, Dh_p), dt_col (R, Dh_p),
      w1 (Din_p, Dh_p), b1 (Dh_p,), w2 (Dh_p, Dh_p), b2 (Dh_p,).
    R must be a multiple of ROW_TILE; Din_p/Dh_p multiples of 128.
    """
    out, _ = _pallas_forward(inp, h, dt_col, w1, b1, w2, b2, act_name,
                             interpret)
    return out


def _fwd(inp, h, dt_col, w1, b1, w2, b2, act_name, interpret):
    out, pre = _pallas_forward(inp, h, dt_col, w1, b1, w2, b2, act_name,
                               interpret)
    return out, (inp, dt_col, pre, w1, w2, b2)


def _bwd(act_name, interpret, res, g):
    """Plain-XLA backward (matmuls on saved residuals).

    out = h + dt_col * dh,  dh = act(pre) @ w2 + b2,  pre = inp @ w1 + b1.
    """
    inp, dt_col, pre, w1, w2, b2 = res
    act = _ACT[act_name]
    dact = _ACT_GRAD[act_name]
    hidden = act(pre)
    g_dh = g * dt_col                       # (R, Dh_p)
    g_hidden = g_dh @ w2.T                  # (R, Dh_p)
    g_pre = g_hidden * dact(pre)
    g_inp = g_pre @ w1.T                    # (R, Din_p)
    g_h = g
    g_w1 = inp.T @ g_pre
    g_b1 = jnp.sum(g_pre, axis=0)
    g_w2 = hidden.T @ g_dh
    g_b2 = jnp.sum(g_dh, axis=0)
    g_dt = g * (hidden @ w2 + b2[None, :])  # d out / d dt_col = dh
    return (g_inp, g_h, g_dt, g_w1, g_b1, g_w2, g_b2)


fused_euler_cell.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------
# host-side wrapper: pad to MXU tiles and run per moment network
# --------------------------------------------------------------------------

def _pad2(x, r, c):
    return jnp.pad(x, ((0, r - x.shape[0]), (0, c - x.shape[1])))


def ode_euler_fused(h, x_scaled, h_scaled, t_cur, t_new, ode_layers,
                    act_name: str, interpret: bool = False):
    """Fused Euler step for all K_h moment networks.

    Args:
      h:        (K_h, B, d_h) latent states (pre-step).
      x_scaled: (B, d_x) already input-scaled x_last.
      h_scaled: (K_h, B, d_h) already input-scaled h (ODEFunc features).
      t_cur, t_new: (B,) substep boundary times.
      ode_layers: list of 2 layer dicts; leaves have a leading K_h axis when
        K_h > 1 (stacked separate networks) or no K axis (shared).

    Returns: (K_h, B, d_h) updated latent states.
    """
    K_h, B, d_h = h.shape
    d_x = x_scaled.shape[-1]
    d_in = d_h + d_x + 2
    Din_p = _round_up(d_in, LANES)
    Dh_p = _round_up(d_h, LANES)
    R = _round_up(B, ROW_TILE)

    dt = (t_new - t_cur).astype(h.dtype)                      # (B,)
    t_rel = t_cur.astype(h.dtype)

    def layer_k(i, k):
        lw = ode_layers[i]["w"]
        lb = ode_layers[i]["b"]
        if lw.ndim == 3:  # stacked separate networks
            return lw[k], lb[k]
        return lw, lb

    outs = []
    for k in range(K_h):
        inp = jnp.concatenate(
            [h_scaled[k], x_scaled,
             t_rel[:, None], (t_new - t_cur).astype(h.dtype)[:, None]],
            axis=-1)                                          # (B, d_in)
        inp_p = _pad2(inp, R, Din_p)
        h_p = _pad2(h[k], R, Dh_p)
        dt_col = _pad2(jnp.broadcast_to(dt[:, None], (B, d_h)), R, Dh_p)
        w1, b1 = layer_k(0, k)
        w2, b2 = layer_k(1, k)
        w1_p = _pad2(w1, Din_p, Dh_p)
        b1_p = jnp.pad(b1, (0, Dh_p - d_h))
        w2_p = _pad2(w2, Dh_p, Dh_p)
        b2_p = jnp.pad(b2, (0, Dh_p - d_h))
        out = fused_euler_cell(inp_p, h_p, dt_col, w1_p, b1_p, w2_p, b2_p,
                               act_name, interpret)
        outs.append(out[:B, :d_h])
    return jnp.stack(outs, axis=0)


def fused_cell_available(n_hidden_layers: int, activation: str,
                         dropout_rate: float) -> bool:
    """The fused path covers the shipped configs: 2-layer ODEFunc
    (n_hidden_layers=1), analytic-grad activation, no dropout."""
    return (HAS_PALLAS and n_hidden_layers == 1 and dropout_rate == 0.0
            and activation in SUPPORTED_ACTS)
