"""Pallas TPU kernel: the fused whole-batch NJ-ODE training step.

Motivation (BENCH_NOTES.md "MFU / roofline"): at the scaled config (hidden
256, B=4096) the XLA training step sits at 24-30% MFU between the memory
and MXU rooves — every matmul's (R, H) activation round-trips HBM between
ops.  This kernel runs the ENTIRE per-slot computation of
``NeuralJumpODE.apply`` (reference hot loop: models/jump_ode.py:142-216) as
one Pallas program per row-tile of trajectories:

    for each observation slot s:                    (static Python loop)
        a1   = act(x_s * j1 + bj1)                  jump layer 0 (VPU rank-1)
        hj_s = act(a1 @ J2 + bj2)                   jump layer 1 (MXU)
        u_s  = act(hj_s @ O1 + bo1)                 readout layer 0 (MXU)
        ya_s = u_s @ o2            (+ bo2 in XLA)   after-jump prediction
        if s > 0:   # the gap (slot s-1 -> s), ONE Euler step (dt_ode_step=None)
            base = scale(x_{s-1})*w1x + t_{s-1}*w1t + dt*w1d + b1
            g1   = act(scale(hj_{s-1}) @ W1h + base)  ODEFunc layer 0 (MXU)
            dh   = g1 @ W2 + b2                        ODEFunc layer 1 (MXU)
            hm   = hj_{s-1} + dt * dh                  Euler update
            ub   = act(hm @ O1 + bo1)                  readout (MXU)
            yb_s = ub @ o2         (+ bo2 in XLA)      before-jump prediction

so the weights load into VMEM ONCE per tile sweep (constant block index)
and no activation ever touches HBM.  The scalar inputs (x_s, t_s — a few
bytes per trajectory) are the only per-row traffic; outputs are the
K*(2N-1) prediction scalars per row.

The backward pass is a second kernel that REMATERIALIZES each slot's
activations in VMEM from those same scalars and walks the chain in
reverse, accumulating parameter cotangents in VMEM scratch across the row
tiles (written out at the final grid step).  This works without any
cross-slot residual state because the NJ-ODE jump RESETS the latent at
every observation — slot s's backward is completely local to slot s and
its outgoing gap (the same scan-free structure the XLA path exploits).
Input cotangents are not needed (times/values are data), so the backward
emits parameter gradients only.

Mixed precision: with ``compute_dtype=bfloat16`` the matmul operands are
cast to bf16 at the MXU boundary (weights are pre-cast once on the host
side of the call), accumulating in f32 — the same convention as the
model's ``_mp`` path.

Applicability (falls back to pure XLA otherwise): input_dim ==
output_dim == 1, n_hidden_layers == 1, no dropout, ``dt_ode_step is
None`` (single Euler step per gap — the scaled-sweep and default-CLI
configs), analytic-gradient activation/scaling, and K*(2N-1) <= 128
output lanes.  Both network modes are covered: separate (K independent
networks, one output column each) and shared (ONE network whose readout
emits all K moment columns — the K ``o2`` weight vectors live in the
spare V rows and the network loop runs once).

Floating-point note: the feature-matmul split and the fused reduction
order differ from XLA's, so forward values match to ~1e-5 and gradients to
~1e-4 relative (tested in tests/test_fused_step.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

from .fused_cell import _ACT, _ACT_GRAD, SUPPORTED_ACTS, _round_up
from .gap_scan import _SCALE, _SCALE_GRAD

LANES = 128
N_VEC = 16          # padded vector-param rows per moment
(ROW_J1, ROW_BJ1, ROW_BJ2, ROW_W1X, ROW_W1T, ROW_W1D, ROW_B1, ROW_B2,
 ROW_BO1, ROW_O2) = range(10)
# matrix-param planes per moment
(MAT_J2, MAT_O1, MAT_W1H, MAT_W2) = range(4)

# row-tiles (v5e sweeps, BENCH_NOTES.md r3): with the slot-batched
# kernels 512-row forward / 256-row backward tiles measured fastest
# (min 0.228 ms vs 0.266 for 256/256 at m=128); the backward's larger
# live set (activations + both weight copies + grad accumulators) wants
# the smaller tile.  Overridable via NJODE_FUSED_STEP_RT / _RT_BWD.
import math as _math
import os as _os
ROW_TILE = int(_os.environ.get("NJODE_FUSED_STEP_RT", 512))
ROW_TILE_BWD = int(_os.environ.get("NJODE_FUSED_STEP_RT_BWD", 256))


MAX_SHARED_K = N_VEC - ROW_O2    # shared mode: K o2 rows fit after ROW_O2

# use_pallas='auto' engagement boundary (marginal train-step A/B vs XLA,
# scripts/measure_scaled_step.py, BENCH_NOTES.md r3d + the r4c boundary
# sweep): the kernel wins 1.37x at hidden 256 and 1.05x at 224 (B=4096,
# N=2, f32); hidden 192 straddles 1.0 across measurement rounds (1.07x
# r3d, 0.95x r4c — box noise), hidden <= 160 loses (0.66-0.92x), and
# B=2048 is erratic (0.43-1.29x) — auto engages only where the win is
# reproducible: hidden >= 224 with >= 4096 folded rows.
AUTO_MIN_HIDDEN = 224
AUTO_MIN_ROWS = 4096

# Packed-STATE training (optimizing the padded (W, V, bo2) tensors
# directly) additionally requires f(0) == 0 for the activation and the
# input scaling: sigmoid(0) = 0.5 makes padded activations nonzero, so the
# backward's outer products write real cotangents into padding rows —
# harmless when the pytree path slices them away, corrupting when Adam
# applies them to a padded train state.
ZERO_PRESERVING_ACTS = tuple(a for a in SUPPORTED_ACTS if a != "sigmoid")
ZERO_PRESERVING_SCALINGS = ("identity", "tanh")


def packed_state_safe(activation: str, input_scaling: str) -> bool:
    return (activation in ZERO_PRESERVING_ACTS
            and input_scaling in ZERO_PRESERVING_SCALINGS)


def fused_step_available(shared_network: bool, input_dim: int,
                         output_dim: int, n_hidden_layers: int,
                         activation: str, dropout_rate: float,
                         input_scaling: str, dt_ode_step,
                         ode_solver: str = "euler") -> bool:
    del shared_network  # both modes supported since r3
    return (HAS_PALLAS and input_dim == 1
            and output_dim == 1 and n_hidden_layers == 1
            and dropout_rate == 0.0 and dt_ode_step is None
            and ode_solver == "euler" and activation in SUPPORTED_ACTS
            and input_scaling in _SCALE)


def _slot_cols(N: int, K: int):
    """Output-lane layout: ya at k*N+s, yb (gap s-1 -> s) at K*N+k*(N-1)+s-1."""
    return K * (2 * N - 1)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(scal_ref, w_ref, v_ref, y_ref,
                *, N: int, K: int, act: str, scale: str, cdt,
                shared: bool = False):
    """Slot-BATCHED forward: every weight matrix is applied exactly once
    per (tile, moment) by concatenating all slots' rows — J2 on (N·RT),
    W1h/W2 on ((N-1)·RT), O1 on ((2N-1)·RT).  Cuts the matmul count ~2x
    at 2-3x the shape (measured: per-matmul issue overhead, not FLOPs,
    limits the unbatched variant).

    ``shared``: ONE network pass; the readout emits all K moment columns
    from the K o2 rows at ROW_O2..ROW_O2+K-1 of v_ref[0]."""
    scal = scal_ref[:]                                  # (RT, LANES) f32
    RT = scal.shape[0]
    A = _ACT[act]
    SC = _SCALE[scale]

    def mm(a, w):
        if cdt is not None:
            a = a.astype(cdt)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    y = jnp.zeros(y_ref.shape, jnp.float32)
    col_iota = lax.broadcasted_iota(jnp.int32, y_ref.shape, 1)

    def put(y, c, val):                                  # val: (RT, 1)
        return jnp.where(col_iota == c, val, y)

    S = N - 1                                            # gap count
    Hp = v_ref.shape[-1]

    def wide(col):
        """(RT, 1) scalar column -> (RT, Hp); Mosaic cannot row-concat
        1-lane vectors (offset mismatch), so scalar stacks go lane-wide
        BEFORE concatenation (one VPU broadcast each)."""
        return jnp.broadcast_to(col, (RT, Hp))

    xs = [wide(scal[:, s:s + 1]) for s in range(N)]
    ts = [wide(scal[:, N + s:N + s + 1]) for s in range(N)]

    for kn in range(1 if shared else K):
        vblk = v_ref[kn]                                 # (N_VEC, Hp)
        j1 = vblk[ROW_J1:ROW_J1 + 1]
        bj1 = vblk[ROW_BJ1:ROW_BJ1 + 1]
        bj2 = vblk[ROW_BJ2:ROW_BJ2 + 1]
        w1x = vblk[ROW_W1X:ROW_W1X + 1]
        w1t = vblk[ROW_W1T:ROW_W1T + 1]
        w1d = vblk[ROW_W1D:ROW_W1D + 1]
        b1 = vblk[ROW_B1:ROW_B1 + 1]
        b2 = vblk[ROW_B2:ROW_B2 + 1]
        bo1 = vblk[ROW_BO1:ROW_BO1 + 1]
        J2 = w_ref[kn, MAT_J2]
        O1 = w_ref[kn, MAT_O1]
        W1h = w_ref[kn, MAT_W1H]
        W2 = w_ref[kn, MAT_W2]

        A1 = A(jnp.concatenate(xs, axis=0) * j1 + bj1)   # (N·RT, Hp)
        HJ = A(mm(A1, J2) + bj2)
        if S > 0:
            HJg = HJ[:S * RT]                            # gap-start states
            XT = jnp.concatenate(xs[:S], axis=0)
            T0 = jnp.concatenate(ts[:S], axis=0)
            DT = jnp.concatenate(
                [ts[s + 1] - ts[s] for s in range(S)], axis=0)
            BASE = SC(XT) * w1x + T0 * w1t + DT * w1d + b1
            G1 = A(mm(SC(HJg), W1h) + BASE)
            DH = mm(G1, W2) + b2
            HM = HJg + DT * DH
            U = A(mm(jnp.concatenate([HJ, HM], axis=0), O1) + bo1)
        else:
            U = A(mm(HJ, O1) + bo1)
        for kk in (range(K) if shared else (kn,)):
            row = ROW_O2 + (kk if shared else 0)
            o2 = vblk[row:row + 1]
            Y = jnp.sum(U * o2, axis=1, keepdims=True)   # ((2N-1)·RT, 1)
            for s in range(N):
                y = put(y, kk * N + s, Y[s * RT:(s + 1) * RT])
            for s in range(S):
                y = put(y, K * N + kk * S + s,
                        Y[(N + s) * RT:(N + s + 1) * RT])

    y_ref[:] = y


# --------------------------------------------------------------------------
# backward kernel: rematerialize per slot, accumulate parameter cotangents
# --------------------------------------------------------------------------

def _bwd_kernel(scal_ref, w_ref, wt_ref, v_ref, gy_ref,
                dw_ref, dv_ref, dw_s, dv_s,
                *, N: int, K: int, act: str, scale: str, cdt,
                shared: bool = False):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        dw_s[:] = jnp.zeros_like(dw_s)
        dv_s[:] = jnp.zeros_like(dv_s)

    scal = scal_ref[:]
    RT = scal.shape[0]
    gy = gy_ref[:]
    A = _ACT[act]
    AG = _ACT_GRAD[act]
    SC = _SCALE[scale]
    SG = _SCALE_GRAD[scale]

    def mm(a, w):
        if cdt is not None:
            a = a.astype(cdt)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)

    def outer(a, g):                                     # a^T @ g: (Hp, Hp)
        if cdt is not None:
            a = a.astype(cdt)
            g = g.astype(cdt)
        return lax.dot_general(a, g, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def colsum(x):                                       # (rows, Hp) -> (1, Hp)
        return jnp.sum(x, axis=0, keepdims=True)

    S = N - 1
    Hp = v_ref.shape[-1]

    def wide(col):                       # see _fwd_kernel.wide
        return jnp.broadcast_to(col, (RT, Hp))

    xs = [wide(scal[:, s:s + 1]) for s in range(N)]
    ts = [wide(scal[:, N + s:N + s + 1]) for s in range(N)]

    for kn in range(1 if shared else K):
        vblk = v_ref[kn]
        j1 = vblk[ROW_J1:ROW_J1 + 1]
        bj1 = vblk[ROW_BJ1:ROW_BJ1 + 1]
        bj2 = vblk[ROW_BJ2:ROW_BJ2 + 1]
        w1x = vblk[ROW_W1X:ROW_W1X + 1]
        w1t = vblk[ROW_W1T:ROW_W1T + 1]
        w1d = vblk[ROW_W1D:ROW_W1D + 1]
        b1 = vblk[ROW_B1:ROW_B1 + 1]
        b2 = vblk[ROW_B2:ROW_B2 + 1]
        bo1 = vblk[ROW_BO1:ROW_BO1 + 1]
        J2 = w_ref[kn, MAT_J2]
        O1 = w_ref[kn, MAT_O1]
        W1h = w_ref[kn, MAT_W1H]
        W2 = w_ref[kn, MAT_W2]
        J2T = wt_ref[kn, MAT_J2]
        O1T = wt_ref[kn, MAT_O1]
        W1hT = wt_ref[kn, MAT_W1H]
        W2T = wt_ref[kn, MAT_W2]

        vrow = kn * N_VEC

        def dv_add(row, val):                            # val: (1, Hp)
            dv_s[vrow + row:vrow + row + 1, :] += val

        # ---- rematerialize (same slot-batched layout as the forward) ----
        X = jnp.concatenate(xs, axis=0)                  # (N·RT, 1)
        A1_pre = X * j1 + bj1
        A1 = A(A1_pre)
        HJ_pre = mm(A1, J2) + bj2
        HJ = A(HJ_pre)
        if S > 0:
            HJg = HJ[:S * RT]
            XT = X[:S * RT]
            T0 = jnp.concatenate(ts[:S], axis=0)
            DT = jnp.concatenate(
                [ts[s + 1] - ts[s] for s in range(S)], axis=0)
            X_sc = SC(XT)
            HJ_sc = SC(HJg)
            BASE = X_sc * w1x + T0 * w1t + DT * w1d + b1
            G1_pre = mm(HJ_sc, W1h) + BASE
            G1 = A(G1_pre)
            DH = mm(G1, W2) + b2
            HM = HJg + DT * DH
            IN_O1 = jnp.concatenate([HJ, HM], axis=0)    # ((2N-1)·RT, Hp)
        else:
            IN_O1 = HJ
        U_pre = mm(IN_O1, O1) + bo1
        U = A(U_pre)

        # ---- readout backward (all after + before outputs at once) ----
        # separate mode: ONE moment column per network; shared: the single
        # network's U feeds all K moment columns, so the o2-cotangents are
        # per-moment and the upstream dU sums GY_kk * o2_kk over moments.
        GYo2 = None
        for kk in (range(K) if shared else (kn,)):
            row = ROW_O2 + (kk if shared else 0)
            o2 = vblk[row:row + 1]
            GYk = jnp.concatenate(
                [wide(gy[:, kk * N + s:kk * N + s + 1]) for s in range(N)]
                + [wide(gy[:, K * N + kk * S + s:K * N + kk * S + s + 1])
                   for s in range(S)], axis=0)           # ((2N-1)·RT, Hp)
            dv_add(row, colsum(U * GYk))
            contrib = GYk * o2
            GYo2 = contrib if GYo2 is None else GYo2 + contrib
        dU_pre = GYo2 * AG(U_pre)
        dw_s[kn, MAT_O1] += outer(IN_O1, dU_pre)
        dv_add(ROW_BO1, colsum(dU_pre))
        dIN = mm(dU_pre, O1T)
        dHJ = dIN[:N * RT]

        if S > 0:
            dHM = dIN[N * RT:]
            dDH = DT * dHM
            dw_s[kn, MAT_W2] += outer(G1, dDH)
            dv_add(ROW_B2, colsum(dDH))
            dG1_pre = mm(dDH, W2T) * AG(G1_pre)
            dw_s[kn, MAT_W1H] += outer(HJ_sc, dG1_pre)
            dv_add(ROW_W1X, colsum(X_sc * dG1_pre))
            dv_add(ROW_W1T, colsum(T0 * dG1_pre))
            dv_add(ROW_W1D, colsum(DT * dG1_pre))
            dv_add(ROW_B1, colsum(dG1_pre))
            # HM = HJg + DT·DH: direct + through-G1 contributions land on
            # the first S row-blocks of dHJ
            dHJg = dHM + mm(dG1_pre, W1hT) * SG(HJg)
            pad = jnp.zeros((RT, dHJg.shape[1]), dHJg.dtype)
            dHJ = dHJ + jnp.concatenate([dHJg, pad], axis=0)

        # ---- jump backward (all slots at once) ----
        dHJ_pre = dHJ * AG(HJ_pre)
        dw_s[kn, MAT_J2] += outer(A1, dHJ_pre)
        dv_add(ROW_BJ2, colsum(dHJ_pre))
        dA1_pre = mm(dHJ_pre, J2T) * AG(A1_pre)
        dv_add(ROW_J1, colsum(X * dA1_pre))
        dv_add(ROW_BJ1, colsum(dA1_pre))

    @pl.when(r == n_r - 1)
    def _():
        dw_ref[:] = dw_s[:]
        dv_ref[:] = dv_s[:]


# --------------------------------------------------------------------------
# pallas_call plumbing + custom VJP
# --------------------------------------------------------------------------

def _pad_rows(x, R):
    return jnp.pad(x, ((0, R - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


@functools.lru_cache(maxsize=32)
def _make_core(N: int, K: int, Hp: int, act: str, scale: str,
               cdt_name: str, interpret: bool, shared: bool = False):
    """Build the custom-VJP core for one static configuration.

    core(scal (B, LANES), W (Kn,4,Hp,Hp), V (Kn,N_VEC,Hp)) -> y (B, LANES)
    with y's first K*(2N-1) lanes holding the predictions (bo2 excluded —
    added differentiably outside).  Kn = 1 (shared) or K (separate).
    W may be bf16 (pre-cast); V stays f32.
    """
    cdt = {"f32": None, "bf16": jnp.bfloat16}[cdt_name]
    wdt = jnp.float32 if cdt is None else cdt
    Kn = 1 if shared else K

    def row(d, rt):
        return pl.BlockSpec((rt, d), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)

    full = lambda s: pl.BlockSpec(s, lambda r: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)

    def fwd_call(scal, W, V):
        R = scal.shape[0]
        n_r = R // ROW_TILE
        return pl.pallas_call(
            functools.partial(_fwd_kernel, N=N, K=K, act=act, scale=scale,
                              cdt=cdt, shared=shared),
            grid=(n_r,),
            in_specs=[row(LANES, ROW_TILE), full((Kn, 4, Hp, Hp)),
                      full((Kn, N_VEC, Hp))],
            out_specs=row(LANES, ROW_TILE),
            out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            interpret=interpret,
        )(scal, W, V)

    def bwd_call(scal, W, WT, V, gy):
        R = scal.shape[0]
        n_r = R // ROW_TILE_BWD
        return pl.pallas_call(
            functools.partial(_bwd_kernel, N=N, K=K, act=act, scale=scale,
                              cdt=cdt, shared=shared),
            grid=(n_r,),
            in_specs=[row(LANES, ROW_TILE_BWD), full((Kn, 4, Hp, Hp)),
                      full((Kn, 4, Hp, Hp)), full((Kn, N_VEC, Hp)),
                      row(LANES, ROW_TILE_BWD)],
            out_specs=[full((Kn, 4, Hp, Hp)), full((Kn * N_VEC, Hp))],
            out_shape=[jax.ShapeDtypeStruct((Kn, 4, Hp, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((Kn * N_VEC, Hp), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((Kn, 4, Hp, Hp), jnp.float32),
                            pltpu.VMEM((Kn * N_VEC, Hp), jnp.float32)],
            interpret=interpret,
        )(scal, W, WT, V, gy)

    @jax.custom_vjp
    def core(scal, W, V):
        return fwd_call(scal, W.astype(wdt), V)

    def core_fwd(scal, W, V):
        Wc = W.astype(wdt)
        return fwd_call(scal, Wc, V), (scal, Wc, V)

    def core_bwd(res, gy):
        scal, Wc, V = res
        WT = jnp.swapaxes(Wc, -1, -2)
        dW, dVflat = bwd_call(scal, Wc, WT, V, gy)
        dV = dVflat.reshape(Kn, N_VEC, Hp)
        return jnp.zeros_like(scal), dW.astype(jnp.float32), dV

    core.defvjp(core_fwd, core_bwd)
    return core


def pack_params(params, *, num_moments: int, hidden_dim: int,
                shared_network: bool = False):
    """Model pytree -> the kernel's padded ``(W, V, bo2)`` tensors.

    W: (Kn, 4, Hp, Hp) matrix planes, V: (Kn, N_VEC, Hp) vector rows,
    bo2: (K,) readout bias (applied differentiably outside the kernel).
    Kn = 1 (shared) or K.  Zero-padded beyond the real (H, H) block; the
    kernel's forward keeps padded activations exactly zero and its
    backward produces exactly-zero cotangents there, so (W, V, bo2) can
    serve directly as a TRAIN STATE (grads/updates never contaminate the
    padding — pinned by tests/test_fused_step.py::test_packed_state_training).
    """
    K, H = num_moments, hidden_dim
    Hp = _round_up(H, LANES)
    f32 = jnp.float32

    jl = params["jump"]["layers"]
    ol = params["ode"]["layers"]
    ul = params["out"]["layers"]
    if shared_network:
        # lift the single networks to the (Kn=1,)-stacked layout
        lift = lambda t: jax.tree_util.tree_map(lambda a: a[None], t)
        jl, ol, ul = lift(jl), lift(ol), lift(ul)

    def pad_mat(w):                                      # (Kn, a, b) -> (Kn, Hp, Hp)
        return jnp.pad(w.astype(f32),
                       ((0, 0), (0, Hp - w.shape[1]), (0, Hp - w.shape[2])))

    def pad_vec(v):                                      # (Kn, d) -> (Kn, Hp)
        return jnp.pad(v.astype(f32), ((0, 0), (0, Hp - v.shape[1])))

    W = jnp.stack([pad_mat(jl[1]["w"]),                  # MAT_J2
                   pad_mat(ul[0]["w"]),                  # MAT_O1
                   pad_mat(ol[0]["w"][:, :H, :]),        # MAT_W1H
                   pad_mat(ol[1]["w"])], axis=1)         # MAT_W2
    vrows = [
        pad_vec(jl[0]["w"][:, 0, :]),                    # ROW_J1
        pad_vec(jl[0]["b"]),                             # ROW_BJ1
        pad_vec(jl[1]["b"]),                             # ROW_BJ2
        pad_vec(ol[0]["w"][:, H, :]),                    # ROW_W1X
        pad_vec(ol[0]["w"][:, H + 1, :]),                # ROW_W1T
        pad_vec(ol[0]["w"][:, H + 2, :]),                # ROW_W1D
        pad_vec(ol[0]["b"]),                             # ROW_B1
        pad_vec(ol[1]["b"]),                             # ROW_B2
        pad_vec(ul[0]["b"]),                             # ROW_BO1
    ]
    if shared_network:
        # K o2 columns -> rows ROW_O2..ROW_O2+K-1 of the single V block
        vrows += [pad_vec(ul[1]["w"][:, :, kk]) for kk in range(K)]
    else:
        vrows.append(pad_vec(ul[1]["w"][:, :, 0]))       # ROW_O2
    V = jnp.stack(vrows + [jnp.zeros_like(vrows[0])] * (N_VEC - len(vrows)),
                  axis=1)                                # (Kn, N_VEC, Hp)
    bo2 = (ul[1]["b"][0] if shared_network
           else ul[1]["b"][:, 0]).astype(f32)            # (K,)
    return W, V, bo2


def unpack_params(W, V, bo2, *, num_moments: int, hidden_dim: int,
                  input_dim: int = 1, shared_network: bool = False):
    """Inverse of :func:`pack_params` — padded tensors back to the model
    pytree (for eval / checkpointing of packed-state training)."""
    K, H = num_moments, hidden_dim
    d_x = input_dim

    def sq(t):                                           # drop the Kn axis
        return t[0] if shared_network else t

    del d_x  # input_dim == 1 is an eligibility precondition
    jl = [{"w": sq(V[:, ROW_J1, None, :H]),              # (Kn, 1, H)
           "b": sq(V[:, ROW_BJ1, :H])},
          {"w": sq(W[:, MAT_J2, :H, :H]), "b": sq(V[:, ROW_BJ2, :H])}]
    # ODEFunc layer 0 stacks [W1h; w1x; w1t; w1d] rows
    w1 = jnp.concatenate([W[:, MAT_W1H, :H, :H],
                          V[:, ROW_W1X, None, :H],
                          V[:, ROW_W1T, None, :H],
                          V[:, ROW_W1D, None, :H]], axis=1)
    ol = [{"w": sq(w1), "b": sq(V[:, ROW_B1, :H])},
          {"w": sq(W[:, MAT_W2, :H, :H]), "b": sq(V[:, ROW_B2, :H])}]
    if shared_network:
        o2 = jnp.stack([V[0, ROW_O2 + kk, :H] for kk in range(K)], axis=-1)
        ul = [{"w": W[0, MAT_O1, :H, :H], "b": V[0, ROW_BO1, :H]},
              {"w": o2, "b": bo2}]
    else:
        ul = [{"w": W[:, MAT_O1, :H, :H], "b": V[:, ROW_BO1, :H]},
              {"w": V[:, ROW_O2, :H, None], "b": bo2[:, None]}]
    return {"jump": {"layers": jl}, "ode": {"layers": ol},
            "out": {"layers": ul}}


def fused_step_apply_packed(W, V, bo2, times, values, *, num_moments: int,
                            activation: str, input_scaling: str,
                            compute_dtype=None, interpret: bool = False,
                            shared_network: bool = False):
    """Fused forward on pre-packed ``(W, V, bo2)`` tensors (see
    :func:`pack_params`).  Differentiable in (W, V, bo2); per-step cost
    excludes all pytree<->padded packing glue, so this is the form the
    packed-state trainer uses inside its step.
    """
    K = num_moments
    Hp = W.shape[-1]
    B, N = times.shape
    if 2 * N > LANES or _slot_cols(N, K) > LANES:
        raise ValueError(f"fused step kernel: N={N}, K={K} exceeds the "
                         f"{LANES}-lane packing")
    if shared_network and K > MAX_SHARED_K:
        raise ValueError(f"fused step kernel: shared mode supports at most "
                         f"{MAX_SHARED_K} moments (got {K})")
    f32 = jnp.float32
    times = times.astype(f32)
    x = values.astype(f32)[..., 0]                       # (B, N)

    scal = jnp.zeros((B, LANES), f32)
    scal = scal.at[:, :N].set(x).at[:, N:2 * N].set(times)
    # the row count must be a whole number of tiles for BOTH grids (the
    # defaults divide each other, but the env overrides need not)
    tile_lcm = _math.lcm(ROW_TILE, ROW_TILE_BWD)
    Bp = _round_up(max(B, tile_lcm), tile_lcm)
    scal = _pad_rows(scal, Bp)

    cdt_name = "f32"
    if compute_dtype is not None and compute_dtype == jnp.bfloat16:
        cdt_name = "bf16"
    core = _make_core(N, K, Hp, activation, input_scaling, cdt_name,
                      interpret, shared_network)
    y = core(scal, W, V)[:B]                             # (B, LANES)

    ya = (jnp.stack([y[:, k * N:(k + 1) * N] for k in range(K)], axis=-1)
          + bo2)                                         # (B, N, K)
    preds = ya[:, :, None, :]                            # (B, N, 1, K)
    if N == 1:
        return preds, jnp.zeros_like(preds)
    yb = (jnp.stack([y[:, K * N + k * (N - 1):K * N + (k + 1) * (N - 1)]
                     for k in range(K)], axis=-1) + bo2)  # (B, N-1, K)
    preds_before = jnp.concatenate(
        [jnp.zeros((B, 1, K), f32), yb], axis=1)[:, :, None, :]
    return preds, preds_before


def fused_step_apply(params, times, values, *, num_moments: int,
                     hidden_dim: int, activation: str, input_scaling: str,
                     compute_dtype=None, interpret: bool = False,
                     shared_network: bool = False):
    """Fused forward of ``NeuralJumpODE.apply`` (eligible configs only).

    params: the model pytree — stacked (K,) leading axes for separate
    networks, unstacked single networks for ``shared_network`` (whose
    OutputNN final layer is (H, K)).  times (B, N), values (B, N, 1).
    Returns ``(preds, preds_before)`` shaped (B, N, 1, K), semantics
    identical to the XLA path (verified in tests/test_fused_step.py).
    """
    W, V, bo2 = pack_params(params, num_moments=num_moments,
                            hidden_dim=hidden_dim,
                            shared_network=shared_network)
    return fused_step_apply_packed(
        W, V, bo2, times, values, num_moments=num_moments,
        activation=activation, input_scaling=input_scaling,
        compute_dtype=compute_dtype, interpret=interpret,
        shared_network=shared_network)
