"""Pallas TPU kernel: the ENTIRE training run in one program.

The default recipe (hidden 32, batch 128, 200 epochs x 1000 trajectories)
is dispatch-bound: its whole-run XLA program executes ~1600 sequential
minibatch steps of ~30 tiny ops each, paying fixed per-op issue latency on
(128, 32)-sized tensors (~54 us/step measured, BENCH_NOTES.md).  This
kernel is the logical extreme of the fused-step design (ops/fused_step.py):
ONE Pallas program whose grid iterates over the *minibatch steps* of the
whole run, with

* the model parameters AND the Adam optimizer state living in VMEM
  scratch across all grid steps (TPU grid iteration is sequential),
* the NJ-ODE loss gradient computed in closed form in-kernel (the loss is
  elementwise over a (RT, LANES) lane matrix whose columns are
  observation slots — the same layout the minibatch data arrives in),
* the Adam update (torch-parity chain: L2-into-grad, bias-corrected
  moments, constant lr — utils/training.py:make_adam) applied in-VMEM
  right after each network's backward walk,

so one kernel invocation trains the model for an arbitrary number of
steps and only the per-minibatch observation scalars stream from HBM.
Matches the semantics of the reference training loop
(/root/reference/neural_jump_ode/utils/training.py:219-344 — Adam over
nj_ode_loss minibatches) composed with the reference model forward
(/root/reference/neural_jump_ode/models/jump_ode.py:142-216); equivalence
to the XLA trainer is pinned step-for-step in tests/test_train_kernel.py.

Scope (mirrors fused_step eligibility, training-state-safety included):
separate networks, d_x = d_y = 1, n_hidden_layers = 1, no dropout,
``dt_ode_step is None``, euler, f(0)=0 activation/scaling
(``packed_state_safe``), full observation mask (static n_obs — the
``simulate_batch`` guarantee), direct or second_moment variance, K = 2
moments, ``ignore_first_continuity=True`` (the shipped recipes).

Data layout per minibatch row (one trajectory): lanes 0..N-1 the observed
values, lanes N..2N-1 the observation times, lane 2N the trajectory-valid
flag (0.0 rows are padding of the last minibatch; the loss weights rows
by the flag and divides by the valid count, exactly
``nj_ode_loss_dense(traj_mask=...)``).

The backward is the same slot-batched rematerializing walk as
ops/fused_step.py's `_bwd_kernel` (jump reset => slot-local backward, no
cross-slot residuals); transposed-weight matmuls use dot_general
contractions on axis 1 so no transposed copies need maintaining across
parameter updates.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

from .fused_cell import _ACT, _ACT_GRAD, _round_up
from .gap_scan import _SCALE, _SCALE_GRAD
from .fused_step import (LANES, N_VEC, MAT_J2, MAT_O1, MAT_W1H, MAT_W2,
                         ROW_J1, ROW_BJ1, ROW_BJ2, ROW_W1X, ROW_W1T,
                         ROW_W1D, ROW_B1, ROW_B2, ROW_BO1, ROW_O2,
                         _pad_rows, pack_params, packed_state_safe,
                         unpack_params)

ROW_BO2 = ROW_O2 + 1      # readout bias, stored as a uniform lane-wide row

# Dual-pack layout: for hidden_dim <= BLOCK and K == 2 moments, BOTH
# networks live block-diagonally in ONE set of (4, LANES, LANES) weight
# planes — network 0 in lanes [0, BLOCK), network 1 in [BLOCK, LANES).
# Every matmul then advances both networks at once (the off-diagonal
# weight blocks are zero, so each network's lanes only ever read its own
# block), cutting the per-step matmul count from 28 to 12 and removing
# the k=0 rematerialization forward entirely.  Gradients from the
# slot-batched outer products DO have nonzero off-diagonal blocks
# (net-0 activations x net-1 cotangents); they are masked to the block
# diagonal before Adam so the train state stays exactly block-diagonal.
BLOCK = LANES // 2


def _dual_pack_eligible(num_moments: int, hidden_dim: int) -> bool:
    return (num_moments == 2 and hidden_dim <= BLOCK
            and _os.environ.get("NJODE_TRAIN_KERNEL_DUAL", "1") != "0")


def train_kernel_available(shared_network, input_dim, output_dim,
                           n_hidden_layers, activation, dropout_rate,
                           input_scaling, dt_ode_step,
                           ode_solver="euler") -> bool:
    return (HAS_PALLAS and not shared_network and input_dim == 1
            and output_dim == 1 and n_hidden_layers == 1
            and dropout_rate == 0.0 and dt_ode_step is None
            and ode_solver == "euler"
            and packed_state_safe(activation, input_scaling))


# The minibatch is the kernel's VMEM row tile: it must be sublane-aligned
# (f32 tiles are 8 rows) and small enough that rows + params + Adam state
# fit VMEM together.  ONE definition, shared by every caller (Trainer
# checks, bench eligibility, and fused_train_run itself).
MAX_BATCH_ROWS = 256


def batch_size_ok(batch_size) -> bool:
    return (batch_size is not None and batch_size > 0
            and batch_size % 8 == 0 and batch_size <= MAX_BATCH_ROWS)


# --------------------------------------------------------------------------
# math shared by the classic and dual-pack kernels
# --------------------------------------------------------------------------

def _loss_and_cotangents(scal, validc, A0m, B0m, A1m, B1m, *, N: int,
                         eps_loss: float, w0m: float, w1m: float,
                         variance_method: str, K: int = 2, nv=None):
    """Closed-form NJ-ODE loss and its lane-matrix cotangents.

    Inputs are (RT, LANES) lane matrices (column s = observation slot s;
    A* = after-jump predictions, B* = before-jump, nets 0/1 = mean/var),
    plus the raw data block ``scal`` (values in columns [0, N)) and the
    (RT, 1) trajectory-valid column.  Returns ``(L, gA0, gB0, gA1, gB1)``
    with L the (1, 1) batch loss — the exact reduction order of
    ``nj_ode_loss_dense`` with ignore_first_continuity (slot-0 continuity
    masked) and traj-masked mean.  Shared verbatim by both kernels (and the
    walk-train kernel's per-half calls) so a loss-semantics change cannot
    diverge them.  ``K=1`` (mean-only models) drops the variance term
    exactly like ``nj_ode_loss_dense`` with num_moments == 1; A1m/B1m are
    ignored and gA1/gB1 come back None.  ``nv`` (a (1, 1) valid count)
    overrides the in-block count — the walk-train kernel's row-pair packing
    splits one minibatch across per-half calls that must share one NV.
    """
    RT = scal.shape[0]
    col_iota = lax.broadcasted_iota(jnp.int32, (RT, LANES), 1)
    lane_n = col_iota < N
    lane_cont = (col_iota < N) & (col_iota > 0)          # slot 0 continuity
    xm = jnp.where(lane_n, scal, 0.0)

    aj = jnp.where(lane_n, (xm - A0m) ** 2, 0.0)
    ac = jnp.where(lane_cont, (xm - B0m) ** 2, 0.0)
    SA = jnp.sqrt(aj + eps_loss)
    SCt = jnp.sqrt(ac + eps_loss)
    T0m = jnp.where(lane_n, (SA + SCt) ** 2, 0.0)

    # mean term: one definition for both K=1 and K=2 (a reduction-order or
    # eps fix here cannot diverge mean-only from mean+variance training)
    inv_n = 1.0 / float(N)
    L0 = jnp.sum(T0m, axis=1, keepdims=True) * inv_n     # (RT, 1)
    NV = (jnp.maximum(jnp.sum(validc, keepdims=True), 1.0)  # (1, 1)
          if nv is None else nv)
    wrow = validc / NV                                   # (RT, 1)
    gA0 = jnp.where(lane_n, wrow * (w0m * inv_n)
                    * ((SA + SCt) / SA) * 2.0 * (A0m - xm), 0.0)
    gB0 = jnp.where(lane_cont, wrow * (w0m * inv_n)
                    * ((SA + SCt) / SCt) * 2.0 * (B0m - xm), 0.0)

    if K == 1:
        L = jnp.sum(w0m * L0 * validc, keepdims=True) / NV
        return L, gA0, gB0, None, None

    if variance_method == "direct":
        V = A1m ** 2
        Vb = B1m ** 2
        Z = aj                                           # (x - sg(Y))^2
        Zb = ac
    else:                                                # second_moment
        V = A1m
        Vb = B1m
        Z = xm ** 2
        Zb = Z
    avj = jnp.where(lane_n, (Z - V) ** 2, 0.0)
    avc = jnp.where(lane_cont, (Zb - Vb) ** 2, 0.0)
    SVA = jnp.sqrt(avj + eps_loss)
    SVC = jnp.sqrt(avc + eps_loss)
    T1m = jnp.where(lane_n, (SVA + SVC) ** 2, 0.0)

    L1 = jnp.sum(T1m, axis=1, keepdims=True) * inv_n
    Ltraj = (w0m * L0 + w1m * L1) * validc
    L = jnp.sum(Ltraj, keepdims=True) / NV               # (1, 1)

    if variance_method == "direct":
        dV_dA1 = 2.0 * A1m                               # V = W^2
        dVb_dB1 = 2.0 * B1m
    else:
        dV_dA1 = 1.0
        dVb_dB1 = 1.0
    gA1 = jnp.where(lane_n, wrow * (w1m * inv_n)
                    * ((SVA + SVC) / SVA) * 2.0 * (V - Z) * dV_dA1, 0.0)
    gB1 = jnp.where(lane_cont, wrow * (w1m * inv_n)
                    * ((SVA + SVC) / SVC) * 2.0 * (Vb - Zb) * dVb_dB1, 0.0)
    return L, gA0, gB0, gA1, gB1


def _adam_math(p, m, v, g, *, c1, c2, lr, wd, b1, b2, eps_adam):
    """Torch-parity Adam math (make_adam chain: L2-into-grad, biased
    moments, bias-corrected step).  c1/c2 are the lane-wide b1^t/b2^t
    power rows.  Returns (p', m', v')."""
    g = g + wd * p
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * g * g
    m_hat = m / (1.0 - c1)
    v_hat = v / (1.0 - c2)
    return p - lr * m_hat / (jnp.sqrt(v_hat) + eps_adam), m, v


def _write_loss(loss_ref, L):
    """Broadcast the (1, 1) loss into the (1, 8, LANES) output block —
    two single-direction broadcasts (Mosaic rejects a combined one); the
    host reads [:, 0, 0]."""
    L_row = jnp.broadcast_to(L, (1, LANES))
    loss_ref[:] = jnp.broadcast_to(L_row[None], loss_ref.shape)


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _train_kernel(data_ref, w0_ref, v0_ref, mw0_ref, vw0_ref, mv0_ref,
                  vv0_ref, stat0_ref,
                  loss_ref, wout_ref, vout_ref, mwout_ref, vwout_ref,
                  mvout_ref, vvout_ref, statout_ref,
                  sW, sV, smW, svW, smV, svV, sdV, sstat,
                  *, N: int, K: int, act: str, scale: str,
                  lr: float, wd: float, b1: float, b2: float,
                  eps_adam: float, eps_loss: float,
                  w0m: float, w1m: float, variance_method: str,
                  mxu: str = "float32"):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        sW[:] = w0_ref[:]
        sV[:] = v0_ref[:]
        smW[:] = mw0_ref[:]
        svW[:] = vw0_ref[:]
        smV[:] = mv0_ref[:]
        svV[:] = vv0_ref[:]
        sstat[:] = stat0_ref[:]

    scal = data_ref[:]                                   # (RT, LANES) f32
    RT = scal.shape[0]
    Hp = v0_ref.shape[-1]
    A = _ACT[act]
    AG = _ACT_GRAD[act]
    SC = _SCALE[scale]
    SG = _SCALE_GRAD[scale]
    S = N - 1

    # mxu='bfloat16' rounds MATMUL INPUTS only (f32 accumulation via
    # preferred_element_type; weights, activations, loss, Adam state all
    # stay f32): the MXU runs bf16 operands ~4x faster than f32.
    cast = ((lambda x: x.astype(jnp.bfloat16)) if mxu == "bfloat16"
            else (lambda x: x))

    def mm(a, w):
        return jnp.dot(cast(a), cast(w),
                       preferred_element_type=jnp.float32)

    def mmT(a, w):                                       # a @ w.T, no copy
        return lax.dot_general(cast(a), cast(w), (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def outer(a, g):                                     # a.T @ g
        return lax.dot_general(cast(a), cast(g), (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def colsum(x):
        return jnp.sum(x, axis=0, keepdims=True)

    def wide(col):                                       # (RT, 1) -> (RT, Hp)
        return jnp.broadcast_to(col, (RT, Hp))

    xs = [wide(scal[:, s:s + 1]) for s in range(N)]
    ts = [wide(scal[:, N + s:N + s + 1]) for s in range(N)]
    validc = scal[:, 2 * N:2 * N + 1]                    # (RT, 1) 0/1

    # advance the bias-correction powers b1^t, b2^t for THIS step.  They
    # stay LANE-WIDE (1, Hp) rows: Mosaic cannot broadcast a (1, 1) scalar
    # into both sublanes and lanes at once, but a (1, Hp) row divides any
    # (rows, Hp) block with a sublane-only broadcast.  Requires Hp == LANES
    # (checked in fused_train_run).
    c1 = sstat[0:1, :] * b1                              # (1, LANES)
    c2 = sstat[1:2, :] * b2
    sstat[0:1, :] = c1
    sstat[1:2, :] = c2

    def fwd(k, keep):
        """Slot-batched forward of network k from the CURRENT sW/sV.

        keep=False returns only the two (RT, LANES) lane matrices
        (after-jump / before-jump predictions per slot, bo2 included);
        keep=True additionally returns the activations the backward walk
        needs (same quantities as fused_step._bwd_kernel's remat).
        """
        vblk = sV[k]
        j1 = vblk[ROW_J1:ROW_J1 + 1]
        bj1 = vblk[ROW_BJ1:ROW_BJ1 + 1]
        bj2 = vblk[ROW_BJ2:ROW_BJ2 + 1]
        w1x = vblk[ROW_W1X:ROW_W1X + 1]
        w1t = vblk[ROW_W1T:ROW_W1T + 1]
        w1d = vblk[ROW_W1D:ROW_W1D + 1]
        b1r = vblk[ROW_B1:ROW_B1 + 1]
        b2r = vblk[ROW_B2:ROW_B2 + 1]
        bo1 = vblk[ROW_BO1:ROW_BO1 + 1]
        o2 = vblk[ROW_O2:ROW_O2 + 1]
        bo2 = vblk[ROW_BO2:ROW_BO2 + 1, 0:1]             # (1, 1)
        J2 = sW[k, MAT_J2]
        O1 = sW[k, MAT_O1]
        W1h = sW[k, MAT_W1H]
        W2 = sW[k, MAT_W2]

        X = jnp.concatenate(xs, axis=0)                  # (N·RT, Hp)
        A1_pre = X * j1 + bj1
        A1 = A(A1_pre)
        HJ_pre = mm(A1, J2) + bj2
        HJ = A(HJ_pre)
        HJg = HJ[:S * RT]
        XT = X[:S * RT]
        T0 = jnp.concatenate(ts[:S], axis=0)
        DT = jnp.concatenate([ts[s + 1] - ts[s] for s in range(S)], axis=0)
        X_sc = SC(XT)
        HJ_sc = SC(HJg)
        BASE = X_sc * w1x + T0 * w1t + DT * w1d + b1r
        G1_pre = mm(HJ_sc, W1h) + BASE
        G1 = A(G1_pre)
        DH = mm(G1, W2) + b2r
        HM = HJg + DT * DH
        IN_O1 = jnp.concatenate([HJ, HM], axis=0)        # ((2N-1)·RT, Hp)
        U_pre = mm(IN_O1, O1) + bo1
        U = A(U_pre)
        Y = jnp.sum(U * o2, axis=1, keepdims=True) + bo2  # ((2N-1)·RT, 1)

        # lane matrices: column s = slot s (before-jump column 0 stays 0)
        col_iota = lax.broadcasted_iota(jnp.int32, (RT, LANES), 1)
        Am = jnp.zeros((RT, LANES), jnp.float32)
        Bm = jnp.zeros((RT, LANES), jnp.float32)
        for s in range(N):
            Am = jnp.where(col_iota == s, Y[s * RT:(s + 1) * RT], Am)
        for g in range(S):
            Bm = jnp.where(col_iota == g + 1,
                           Y[(N + g) * RT:(N + g + 1) * RT], Bm)
        if not keep:
            return Am, Bm
        return Am, Bm, dict(X=X, A1_pre=A1_pre, A1=A1, HJ_pre=HJ_pre,
                            HJ=HJ, HJg=HJg, X_sc=X_sc, HJ_sc=HJ_sc, T0=T0,
                            DT=DT, G1_pre=G1_pre, G1=G1, IN_O1=IN_O1,
                            U_pre=U_pre, U=U)

    def adam_step(p, m, v, g):
        return _adam_math(p, m, v, g, c1=c1, c2=c2, lr=lr, wd=wd,
                          b1=b1, b2=b2, eps_adam=eps_adam)

    def adam_w(k, mat, g):                               # (Hp, Hp) plane
        p, m, v = adam_step(sW[k, mat], smW[k, mat], svW[k, mat], g)
        sW[k, mat] = p
        smW[k, mat] = m
        svW[k, mat] = v

    def adam_v(k):                                       # (N_VEC, Hp) block
        p, m, v = adam_step(sV[k], smV[k], svV[k], sdV[:])
        sV[k] = p
        smV[k] = m
        svV[k] = v

    def backward_and_update(k, gA, gB, res):
        """Backward walk of network k (same chain as fused_step._bwd_kernel,
        GY assembled from the closed-form lane cotangents), then the Adam
        update of its four matrix planes and its V rows."""
        vblk = sV[k]
        o2 = vblk[ROW_O2:ROW_O2 + 1]
        J2 = sW[k, MAT_J2]
        O1 = sW[k, MAT_O1]
        W1h = sW[k, MAT_W1H]
        W2 = sW[k, MAT_W2]

        GY = jnp.concatenate(
            [wide(gA[:, s:s + 1]) for s in range(N)]
            + [wide(gB[:, g + 1:g + 2]) for g in range(S)], axis=0)

        U, U_pre, IN_O1 = res["U"], res["U_pre"], res["IN_O1"]
        dU_pre = (GY * o2) * AG(U_pre)
        do2 = colsum(U * GY)
        dO1 = outer(IN_O1, dU_pre)
        dbo1 = colsum(dU_pre)
        # bo2 adds directly to every output: its grad is the total cotangent
        # mass (GY rows are lane-wide broadcasts; column 0 is the value)
        dbo2 = jnp.sum(GY[:, 0:1], keepdims=True)        # (1, 1)
        dIN = mmT(dU_pre, O1)
        dHJ = dIN[:N * RT]

        dHM = dIN[N * RT:]
        dDH = res["DT"] * dHM
        dW2 = outer(res["G1"], dDH)
        db2 = colsum(dDH)
        dG1_pre = mmT(dDH, W2) * AG(res["G1_pre"])
        dW1h = outer(res["HJ_sc"], dG1_pre)
        dw1x = colsum(res["X_sc"] * dG1_pre)
        dw1t = colsum(res["T0"] * dG1_pre)
        dw1d = colsum(res["DT"] * dG1_pre)
        db1 = colsum(dG1_pre)
        dHJg = dHM + mmT(dG1_pre, W1h) * SG(res["HJg"])
        pad = jnp.zeros((RT, Hp), jnp.float32)
        dHJ = dHJ + jnp.concatenate([dHJg, pad], axis=0)

        dHJ_pre = dHJ * AG(res["HJ_pre"])
        dJ2 = outer(res["A1"], dHJ_pre)
        dbj2 = colsum(dHJ_pre)
        dA1_pre = mmT(dHJ_pre, J2) * AG(res["A1_pre"])
        dj1 = colsum(res["X"] * dA1_pre)
        dbj1 = colsum(dA1_pre)

        # ---- Adam: matrices in place, V rows via the per-step sdV block ----
        adam_w(k, MAT_J2, dJ2)
        adam_w(k, MAT_O1, dO1)
        adam_w(k, MAT_W1H, dW1h)
        adam_w(k, MAT_W2, dW2)

        sdV[:] = jnp.zeros_like(sdV)
        sdV[ROW_J1:ROW_J1 + 1] = dj1
        sdV[ROW_BJ1:ROW_BJ1 + 1] = dbj1
        sdV[ROW_BJ2:ROW_BJ2 + 1] = dbj2
        sdV[ROW_W1X:ROW_W1X + 1] = dw1x
        sdV[ROW_W1T:ROW_W1T + 1] = dw1t
        sdV[ROW_W1D:ROW_W1D + 1] = dw1d
        sdV[ROW_B1:ROW_B1 + 1] = db1
        sdV[ROW_B2:ROW_B2 + 1] = db2
        sdV[ROW_BO1:ROW_BO1 + 1] = dbo1
        sdV[ROW_O2:ROW_O2 + 1] = do2
        # the bo2 row is a uniform lane broadcast of the scalar (so its
        # Adam trajectory equals the scalar's)
        sdV[ROW_BO2:ROW_BO2 + 1] = jnp.broadcast_to(dbo2, (1, Hp))
        adam_v(k)

    # ---------------- forwards (current params) + closed-form loss ----------
    if K == 1:
        # mean-only models: one network, one live forward, no remat
        A0m, B0m, res0 = fwd(0, keep=True)
        L, gA0, gB0, _, _ = _loss_and_cotangents(
            scal, validc, A0m, B0m, None, None, N=N, eps_loss=eps_loss,
            w0m=w0m, w1m=w1m, variance_method=variance_method, K=1)
        _write_loss(loss_ref, L)
        backward_and_update(0, gA0, gB0, res0)
    else:
        A0m, B0m = fwd(0, keep=False)
        A1m, B1m, res1 = fwd(1, keep=True)

        L, gA0, gB0, gA1, gB1 = _loss_and_cotangents(
            scal, validc, A0m, B0m, A1m, B1m, N=N, eps_loss=eps_loss,
            w0m=w0m, w1m=w1m, variance_method=variance_method)
        _write_loss(loss_ref, L)

        # ------------- backwards + in-VMEM Adam (k=1 first: its activations
        # are live; k=0 rematerializes AFTER k=1's update — safe because the
        # update only touches k=1's planes, so k=0's remat still sees its own
        # pre-update weights.  Costs one extra k=0 forward (~1/6 of the
        # matmuls) but halves the peak activation footprint. ---------------
        backward_and_update(1, gA1, gB1, res1)
        _, _, res0 = fwd(0, keep=True)
        backward_and_update(0, gA0, gB0, res0)

    @pl.when(r == n_r - 1)
    def _():
        wout_ref[:] = sW[:]
        vout_ref[:] = sV[:]
        mwout_ref[:] = smW[:]
        vwout_ref[:] = svW[:]
        mvout_ref[:] = smV[:]
        vvout_ref[:] = svV[:]
        statout_ref[:] = sstat[:]


def _train_kernel_dual(data_ref, w0_ref, v0_ref, mw0_ref, vw0_ref, mv0_ref,
                       vv0_ref, stat0_ref,
                       loss_ref, wout_ref, vout_ref, mwout_ref, vwout_ref,
                       mvout_ref, vvout_ref, statout_ref,
                       sW, sV, smW, svW, smV, svV, sdV, sstat,
                       *, N: int, act: str, scale: str,
                       lr: float, wd: float, b1: float, b2: float,
                       eps_adam: float, eps_loss: float,
                       w0m: float, w1m: float, variance_method: str,
                       mxu: str = "float32"):
    """Dual-pack variant of :func:`_train_kernel`: K = 2 networks
    block-diagonal in one (4, LANES, LANES) weight set (see BLOCK above).
    One slot-batched forward + one backward walk trains both moments."""
    r = pl.program_id(0)
    n_r = pl.num_programs(0)

    @pl.when(r == 0)
    def _():
        sW[:] = w0_ref[:]
        sV[:] = v0_ref[:]
        smW[:] = mw0_ref[:]
        svW[:] = vw0_ref[:]
        smV[:] = mv0_ref[:]
        svV[:] = vv0_ref[:]
        sstat[:] = stat0_ref[:]

    scal = data_ref[:]                                   # (RT, LANES) f32
    RT = scal.shape[0]
    Hp = v0_ref.shape[-1]
    A = _ACT[act]
    AG = _ACT_GRAD[act]
    SC = _SCALE[scale]
    SG = _SCALE_GRAD[scale]
    S = N - 1
    inv_blk = 1.0 / float(BLOCK)

    # see the classic kernel's note: bf16 rounds matmul INPUTS only
    cast = ((lambda x: x.astype(jnp.bfloat16)) if mxu == "bfloat16"
            else (lambda x: x))

    def mm(a, w):
        return jnp.dot(cast(a), cast(w),
                       preferred_element_type=jnp.float32)

    def mmT(a, w):                                       # a @ w.T, no copy
        return lax.dot_general(cast(a), cast(w), (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def outer(a, g):                                     # a.T @ g
        return lax.dot_general(cast(a), cast(g), (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    def colsum(x):
        return jnp.sum(x, axis=0, keepdims=True)

    def wide(col):                                       # (rows, 1) -> (rows, Hp)
        return jnp.broadcast_to(col, (col.shape[0], Hp))

    def lane_lt(rows, c):                                # lanes < c mask
        return lax.broadcasted_iota(jnp.int32, (rows, Hp), 1) < c

    # block masks: m0/m1 (1, Hp) f32 rows, diag (Hp, Hp) f32 block-diagonal
    blk_row = lane_lt(1, BLOCK)
    m0 = jnp.where(blk_row, 1.0, 0.0)
    m1 = 1.0 - m0
    rlt = lax.broadcasted_iota(jnp.int32, (Hp, Hp), 0) < BLOCK
    clt = lax.broadcasted_iota(jnp.int32, (Hp, Hp), 1) < BLOCK
    diag = jnp.where(rlt == clt, 1.0, 0.0)

    xs = [wide(scal[:, s:s + 1]) for s in range(N)]
    ts = [wide(scal[:, N + s:N + s + 1]) for s in range(N)]
    validc = scal[:, 2 * N:2 * N + 1]                    # (RT, 1) 0/1

    c1 = sstat[0:1, :] * b1                              # (1, LANES)
    c2 = sstat[1:2, :] * b2
    sstat[0:1, :] = c1
    sstat[1:2, :] = c2

    # ---------------- ONE forward for both networks ----------------
    j1 = sV[ROW_J1:ROW_J1 + 1]
    bj1 = sV[ROW_BJ1:ROW_BJ1 + 1]
    bj2 = sV[ROW_BJ2:ROW_BJ2 + 1]
    w1x = sV[ROW_W1X:ROW_W1X + 1]
    w1t = sV[ROW_W1T:ROW_W1T + 1]
    w1d = sV[ROW_W1D:ROW_W1D + 1]
    b1r = sV[ROW_B1:ROW_B1 + 1]
    b2r = sV[ROW_B2:ROW_B2 + 1]
    bo1 = sV[ROW_BO1:ROW_BO1 + 1]
    o2 = sV[ROW_O2:ROW_O2 + 1]
    bo2r = sV[ROW_BO2:ROW_BO2 + 1]                       # block-uniform row
    J2 = sW[MAT_J2]
    O1 = sW[MAT_O1]
    W1h = sW[MAT_W1H]
    W2 = sW[MAT_W2]

    X = jnp.concatenate(xs, axis=0)                      # (N·RT, Hp)
    A1_pre = X * j1 + bj1
    A1 = A(A1_pre)
    HJ_pre = mm(A1, J2) + bj2
    HJ = A(HJ_pre)
    HJg = HJ[:S * RT]
    XT = X[:S * RT]
    T0 = jnp.concatenate(ts[:S], axis=0)
    DT = jnp.concatenate([ts[s + 1] - ts[s] for s in range(S)], axis=0)
    X_sc = SC(XT)
    HJ_sc = SC(HJg)
    BASE = X_sc * w1x + T0 * w1t + DT * w1d + b1r
    G1_pre = mm(HJ_sc, W1h) + BASE
    G1 = A(G1_pre)
    DH = mm(G1, W2) + b2r
    HM = HJg + DT * DH
    IN_O1 = jnp.concatenate([HJ, HM], axis=0)            # ((2N-1)·RT, Hp)
    U_pre = mm(IN_O1, O1) + bo1
    U = A(U_pre)

    # per-network readouts: masked lane reductions over each block
    # (the other block's terms are exactly zero after masking, so each
    # sum equals the classic kernel's single-network reduction)
    P = U * o2                                           # ((2N-1)·RT, Hp)
    blkP = lane_lt(P.shape[0], BLOCK)
    bo2_0 = jnp.sum(bo2r * m0, axis=1, keepdims=True) * inv_blk   # (1, 1)
    bo2_1 = jnp.sum(bo2r * m1, axis=1, keepdims=True) * inv_blk
    Y0 = jnp.sum(jnp.where(blkP, P, 0.0), axis=1, keepdims=True) + bo2_0
    Y1 = jnp.sum(jnp.where(blkP, 0.0, P), axis=1, keepdims=True) + bo2_1

    # lane matrices: column s = slot s (before-jump column 0 stays 0)
    col_iota = lax.broadcasted_iota(jnp.int32, (RT, LANES), 1)

    def lane_mats(Y):
        Am = jnp.zeros((RT, LANES), jnp.float32)
        Bm = jnp.zeros((RT, LANES), jnp.float32)
        for s in range(N):
            Am = jnp.where(col_iota == s, Y[s * RT:(s + 1) * RT], Am)
        for g in range(S):
            Bm = jnp.where(col_iota == g + 1,
                           Y[(N + g) * RT:(N + g + 1) * RT], Bm)
        return Am, Bm

    A0m, B0m = lane_mats(Y0)
    A1m, B1m = lane_mats(Y1)

    # ---------------- closed-form loss + lane cotangents ----------------
    L, gA0, gB0, gA1, gB1 = _loss_and_cotangents(
        scal, validc, A0m, B0m, A1m, B1m, N=N, eps_loss=eps_loss,
        w0m=w0m, w1m=w1m, variance_method=variance_method)
    _write_loss(loss_ref, L)

    # ---------------- ONE backward walk for both networks ----------------
    # GY row-block for slot s: net-0's cotangent broadcast over block-0
    # lanes, net-1's over block-1 lanes.
    blkRT = lane_lt(RT, BLOCK)
    GY = jnp.concatenate(
        [jnp.where(blkRT, wide(gA0[:, s:s + 1]), wide(gA1[:, s:s + 1]))
         for s in range(N)]
        + [jnp.where(blkRT, wide(gB0[:, g + 1:g + 2]),
                     wide(gB1[:, g + 1:g + 2])) for g in range(S)], axis=0)

    dU_pre = (GY * o2) * AG(U_pre)
    do2 = colsum(U * GY)
    dO1 = diag * outer(IN_O1, dU_pre)
    dbo1 = colsum(dU_pre)
    # per-network bo2 grads: each block holds BLOCK identical copies of
    # the row cotangent, so the masked lane sum / BLOCK is the scalar
    gy_row0 = jnp.sum(jnp.where(blkP, GY, 0.0), axis=1,
                      keepdims=True) * inv_blk           # (rows, 1)
    gy_row1 = jnp.sum(jnp.where(blkP, 0.0, GY), axis=1,
                      keepdims=True) * inv_blk
    dbo2_0 = jnp.sum(gy_row0, keepdims=True)             # (1, 1)
    dbo2_1 = jnp.sum(gy_row1, keepdims=True)
    dIN = mmT(dU_pre, O1)
    dHJ = dIN[:N * RT]

    dHM = dIN[N * RT:]
    dDH = DT * dHM
    dW2 = diag * outer(G1, dDH)
    db2 = colsum(dDH)
    dG1_pre = mmT(dDH, W2) * AG(G1_pre)
    dW1h = diag * outer(HJ_sc, dG1_pre)
    dw1x = colsum(X_sc * dG1_pre)
    dw1t = colsum(T0 * dG1_pre)
    dw1d = colsum(DT * dG1_pre)
    db1 = colsum(dG1_pre)
    dHJg = dHM + mmT(dG1_pre, W1h) * SG(HJg)
    pad = jnp.zeros((RT, Hp), jnp.float32)
    dHJ = dHJ + jnp.concatenate([dHJg, pad], axis=0)

    dHJ_pre = dHJ * AG(HJ_pre)
    dJ2 = diag * outer(A1, dHJ_pre)
    dbj2 = colsum(dHJ_pre)
    dA1_pre = mmT(dHJ_pre, J2) * AG(A1_pre)
    dj1 = colsum(X * dA1_pre)
    dbj1 = colsum(dA1_pre)

    # ---------------- in-VMEM Adam (matrices in place, V via sdV) --------
    def adam_step(p, m, v, g):
        return _adam_math(p, m, v, g, c1=c1, c2=c2, lr=lr, wd=wd,
                          b1=b1, b2=b2, eps_adam=eps_adam)

    for mat, g in ((MAT_J2, dJ2), (MAT_O1, dO1), (MAT_W1H, dW1h),
                   (MAT_W2, dW2)):
        p, m, v = adam_step(sW[mat], smW[mat], svW[mat], g)
        sW[mat] = p
        smW[mat] = m
        svW[mat] = v

    sdV[:] = jnp.zeros_like(sdV)
    sdV[ROW_J1:ROW_J1 + 1] = dj1
    sdV[ROW_BJ1:ROW_BJ1 + 1] = dbj1
    sdV[ROW_BJ2:ROW_BJ2 + 1] = dbj2
    sdV[ROW_W1X:ROW_W1X + 1] = dw1x
    sdV[ROW_W1T:ROW_W1T + 1] = dw1t
    sdV[ROW_W1D:ROW_W1D + 1] = dw1d
    sdV[ROW_B1:ROW_B1 + 1] = db1
    sdV[ROW_B2:ROW_B2 + 1] = db2
    sdV[ROW_BO1:ROW_BO1 + 1] = dbo1
    sdV[ROW_O2:ROW_O2 + 1] = do2
    sdV[ROW_BO2:ROW_BO2 + 1] = m0 * dbo2_0 + m1 * dbo2_1
    p, m, v = adam_step(sV[:], smV[:], svV[:], sdV[:])
    sV[:] = p
    smV[:] = m
    svV[:] = v

    @pl.when(r == n_r - 1)
    def _():
        wout_ref[:] = sW[:]
        vout_ref[:] = sV[:]
        mwout_ref[:] = smW[:]
        vwout_ref[:] = svW[:]
        mvout_ref[:] = smV[:]
        vvout_ref[:] = svV[:]
        statout_ref[:] = sstat[:]


# --------------------------------------------------------------------------
# host-side plumbing
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _make_train_core(N: int, K: int, Hp: int, RT: int, act: str, scale: str,
                     lr: float, wd: float, b1: float, b2: float,
                     eps_adam: float, eps_loss: float, w0m: float,
                     w1m: float, variance_method: str, interpret: bool,
                     mxu: str = "float32"):
    def call(data, W, V, mW, vW, mV, vV, stat):
        G = data.shape[0] // RT

        def row(d, rt):
            return pl.BlockSpec((rt, d), lambda r: (r, 0),
                                memory_space=pltpu.VMEM)

        loss_spec = pl.BlockSpec((1, 8, LANES), lambda r: (r, 0, 0),
                                 memory_space=pltpu.VMEM)
        full = lambda s: pl.BlockSpec(s, lambda r: tuple(0 for _ in s),
                                      memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(
                _train_kernel, N=N, K=K, act=act, scale=scale, lr=lr, wd=wd,
                b1=b1, b2=b2, eps_adam=eps_adam, eps_loss=eps_loss, w0m=w0m,
                w1m=w1m, variance_method=variance_method, mxu=mxu),
            grid=(G,),
            in_specs=[row(LANES, RT), full((K, 4, Hp, Hp)),
                      full((K, N_VEC, Hp)), full((K, 4, Hp, Hp)),
                      full((K, 4, Hp, Hp)), full((K, N_VEC, Hp)),
                      full((K, N_VEC, Hp)), full((8, LANES))],
            out_specs=[loss_spec, full((K, 4, Hp, Hp)),
                       full((K, N_VEC, Hp)), full((K, 4, Hp, Hp)),
                       full((K, 4, Hp, Hp)), full((K, N_VEC, Hp)),
                       full((K, N_VEC, Hp)), full((8, LANES))],
            out_shape=[jax.ShapeDtypeStruct((G, 8, LANES), jnp.float32),
                       jax.ShapeDtypeStruct((K, 4, Hp, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((K, N_VEC, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((K, 4, Hp, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((K, 4, Hp, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((K, N_VEC, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((K, N_VEC, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((8, LANES), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((K, 4, Hp, Hp), jnp.float32),
                            pltpu.VMEM((K, N_VEC, Hp), jnp.float32),
                            pltpu.VMEM((K, 4, Hp, Hp), jnp.float32),
                            pltpu.VMEM((K, 4, Hp, Hp), jnp.float32),
                            pltpu.VMEM((K, N_VEC, Hp), jnp.float32),
                            pltpu.VMEM((K, N_VEC, Hp), jnp.float32),
                            pltpu.VMEM((N_VEC, Hp), jnp.float32),
                            pltpu.VMEM((8, LANES), jnp.float32)],
            interpret=interpret,
        )(data, W, V, mW, vW, mV, vV, stat)
    return call


@functools.lru_cache(maxsize=32)
def _make_train_core_dual(N: int, Hp: int, RT: int, act: str, scale: str,
                          lr: float, wd: float, b1: float, b2: float,
                          eps_adam: float, eps_loss: float, w0m: float,
                          w1m: float, variance_method: str, interpret: bool,
                          mxu: str = "float32"):
    def call(data, W, V, mW, vW, mV, vV, stat):
        G = data.shape[0] // RT

        def row(d, rt):
            return pl.BlockSpec((rt, d), lambda r: (r, 0),
                                memory_space=pltpu.VMEM)

        loss_spec = pl.BlockSpec((1, 8, LANES), lambda r: (r, 0, 0),
                                 memory_space=pltpu.VMEM)
        full = lambda s: pl.BlockSpec(s, lambda r: tuple(0 for _ in s),
                                      memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(
                _train_kernel_dual, N=N, act=act, scale=scale, lr=lr, wd=wd,
                b1=b1, b2=b2, eps_adam=eps_adam, eps_loss=eps_loss, w0m=w0m,
                w1m=w1m, variance_method=variance_method, mxu=mxu),
            grid=(G,),
            in_specs=[row(LANES, RT), full((4, Hp, Hp)),
                      full((N_VEC, Hp)), full((4, Hp, Hp)),
                      full((4, Hp, Hp)), full((N_VEC, Hp)),
                      full((N_VEC, Hp)), full((8, LANES))],
            out_specs=[loss_spec, full((4, Hp, Hp)),
                       full((N_VEC, Hp)), full((4, Hp, Hp)),
                       full((4, Hp, Hp)), full((N_VEC, Hp)),
                       full((N_VEC, Hp)), full((8, LANES))],
            out_shape=[jax.ShapeDtypeStruct((G, 8, LANES), jnp.float32),
                       jax.ShapeDtypeStruct((4, Hp, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((N_VEC, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((4, Hp, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((4, Hp, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((N_VEC, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((N_VEC, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((8, LANES), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((4, Hp, Hp), jnp.float32),
                            pltpu.VMEM((N_VEC, Hp), jnp.float32),
                            pltpu.VMEM((4, Hp, Hp), jnp.float32),
                            pltpu.VMEM((4, Hp, Hp), jnp.float32),
                            pltpu.VMEM((N_VEC, Hp), jnp.float32),
                            pltpu.VMEM((N_VEC, Hp), jnp.float32),
                            pltpu.VMEM((N_VEC, Hp), jnp.float32),
                            pltpu.VMEM((8, LANES), jnp.float32)],
            interpret=interpret,
        )(data, W, V, mW, vW, mV, vV, stat)
    return call


def _dual_from_classic(W, V, bo2):
    """Classic per-network pack (K=2, 4, Hp, Hp)/(K=2, N_VEC, Hp)/bo2 (2,)
    -> the block-diagonal dual layout (4, Hp, Hp)/(N_VEC, Hp) with bo2
    folded block-uniform into ROW_BO2."""
    Hp = W.shape[-1]
    Wd = jnp.zeros((4, Hp, Hp), jnp.float32)
    Wd = Wd.at[:, :BLOCK, :BLOCK].set(W[0, :, :BLOCK, :BLOCK])
    Wd = Wd.at[:, BLOCK:, BLOCK:].set(W[1, :, :BLOCK, :BLOCK])
    Vd = jnp.concatenate([V[0, :, :BLOCK], V[1, :, :BLOCK]], axis=1)
    bo2row = jnp.concatenate([jnp.broadcast_to(bo2[0], (BLOCK,)),
                              jnp.broadcast_to(bo2[1], (BLOCK,))])
    return Wd, Vd.at[ROW_BO2].set(bo2row)


def _classic_from_dual(Wd, Vd):
    """Inverse of :func:`_dual_from_classic` (zero padding restored)."""
    Hp = Wd.shape[-1]
    pad_m = lambda w: jnp.pad(w, ((0, 0), (0, Hp - BLOCK), (0, Hp - BLOCK)))
    pad_v = lambda v: jnp.pad(v, ((0, 0), (0, Hp - BLOCK)))
    W = jnp.stack([pad_m(Wd[:, :BLOCK, :BLOCK]),
                   pad_m(Wd[:, BLOCK:, BLOCK:])])
    V = jnp.stack([pad_v(Vd[:, :BLOCK]), pad_v(Vd[:, BLOCK:])])
    bo2 = jnp.stack([Vd[ROW_BO2, 0], Vd[ROW_BO2, BLOCK]])
    return W, V, bo2


def init_train_state(params, *, num_moments: int, hidden_dim: int):
    """Model pytree -> the kernel's train state
    ``(W, V, mW, vW, mV, vV, stat)`` with bo2 folded into V's ROW_BO2 row
    (uniform lanes) and zeroed Adam moments; stat = [b1^t, b2^t] powers
    starting at 1 (fresh optimizer).  For hidden_dim <= BLOCK the state
    uses the block-diagonal dual-pack layout (both networks in one weight
    set — see BLOCK); consumers detect the layout by W's rank."""
    W, V, bo2 = pack_params(params, num_moments=num_moments,
                            hidden_dim=hidden_dim)
    Hp = W.shape[-1]
    if _dual_pack_eligible(num_moments, hidden_dim):
        W, V = _dual_from_classic(W, V, bo2)
    else:
        V = V.at[:, ROW_BO2, :].set(
            jnp.broadcast_to(bo2[:, None], (num_moments, Hp)))
    zW = jnp.zeros_like(W)
    zV = jnp.zeros_like(V)
    # rows 0/1 hold the Adam bias-correction powers b1^t, b2^t as
    # LANE-WIDE rows (the kernel broadcasts them sublane-wise)
    stat = jnp.zeros((8, LANES), jnp.float32).at[0, :].set(1.0).at[1, :].set(1.0)
    return W, V, zW, zW, zV, zV, stat


def train_state_params(state, *, num_moments: int, hidden_dim: int):
    """Extract the model pytree back out of a kernel train state."""
    W, V = state[0], state[1]
    if W.ndim == 3:                                      # dual-pack layout
        W, V, bo2 = _classic_from_dual(W, V)
    else:
        bo2 = V[:, ROW_BO2, 0]
    return unpack_params(W, V, bo2, num_moments=num_moments,
                         hidden_dim=hidden_dim)


def _find_adam_state(opt_state):
    """Locate the ScaleByAdamState inside an optax chain state tuple."""
    import optax
    for i, s in enumerate(opt_state):
        if isinstance(s, optax.ScaleByAdamState):
            return i, s
    raise ValueError("train kernel: optimizer state has no ScaleByAdamState "
                     "(the kernel implements exactly the make_adam chain)")


def kernel_state_from(params, opt_state, *, num_moments: int,
                      hidden_dim: int, betas=(0.9, 0.999)):
    """(params, optax opt_state) -> the kernel train state.

    The Adam moments pack through the SAME layout as the params (mu/nu are
    congruent pytrees), and the bias-correction powers b1^t, b2^t are
    rebuilt from the optax step count — so a kernel run can resume exactly
    from an XLA-trainer checkpoint and vice versa
    (tests/test_train_kernel.py::test_trainer_checkpoint_interop).
    """
    _, adam = _find_adam_state(opt_state)
    kw = dict(num_moments=num_moments, hidden_dim=hidden_dim)
    dual = _dual_pack_eligible(num_moments, hidden_dim)

    def pack_with_bo2(tree):
        W, V, bo2 = pack_params(tree, **kw)
        if dual:
            return _dual_from_classic(W, V, bo2)
        Hp = W.shape[-1]
        return W, V.at[:, ROW_BO2, :].set(
            jnp.broadcast_to(bo2[:, None], (num_moments, Hp)))

    W, V = pack_with_bo2(params)
    mW, mV = pack_with_bo2(adam.mu)
    vW, vV = pack_with_bo2(adam.nu)
    count = adam.count.astype(jnp.float32)
    stat = jnp.zeros((8, LANES), jnp.float32)
    stat = stat.at[0, :].set(jnp.power(betas[0], count))
    stat = stat.at[1, :].set(jnp.power(betas[1], count))
    return (W, V, mW, vW, mV, vV, stat)


def optax_state_into(state, n_steps: int, opt_state, *, num_moments: int,
                     hidden_dim: int):
    """Kernel train state (+ how many steps it ran) -> (params, opt_state),
    with the template ``opt_state``'s ScaleByAdamState replaced."""
    import optax
    kw = dict(num_moments=num_moments, hidden_dim=hidden_dim)
    W, V, mW, vW, mV, vV, _ = state

    def unpack_with_bo2(Wt, Vt):
        if Wt.ndim == 3:                                 # dual-pack layout
            return unpack_params(*_classic_from_dual(Wt, Vt), **kw)
        return unpack_params(Wt, Vt, Vt[:, ROW_BO2, 0], **kw)

    params = unpack_with_bo2(W, V)
    i, adam = _find_adam_state(opt_state)
    new_adam = optax.ScaleByAdamState(
        count=adam.count + jnp.asarray(n_steps, adam.count.dtype),
        mu=unpack_with_bo2(mW, mV), nu=unpack_with_bo2(vW, vV))
    opt_state = tuple(new_adam if j == i else s
                      for j, s in enumerate(opt_state))
    return params, opt_state


def pack_minibatches(times, values, valid, batch_size: int):
    """(B, N) obs times + (B, N, 1) values + (B,) valid flags, with B a
    multiple of ``batch_size``, -> the kernel's (B, LANES) row layout
    (x lanes 0..N-1, t lanes N..2N-1, valid flag lane 2N)."""
    B, N = times.shape
    if 2 * N + 1 > LANES:
        raise ValueError(f"train kernel: N={N} exceeds the lane packing")
    if B % batch_size:
        raise ValueError(f"train kernel: rows {B} not a multiple of the "
                         f"minibatch size {batch_size}")
    # ONE lane-axis concatenate, not .at[].set scatters into zeros — the
    # latter lower to per-field dynamic-update-slices that were the
    # largest ops left in the fused datagen program (BENCH_NOTES r3c)
    return jnp.concatenate(
        [values[..., 0].astype(jnp.float32),
         times.astype(jnp.float32),
         valid.astype(jnp.float32)[:, None],
         jnp.zeros((B, LANES - 2 * N - 1), jnp.float32)], axis=1)


def fused_train_run(state, data, *, n_slots: int, num_moments: int,
                    batch_size: int, activation: str = "relu",
                    input_scaling: str = "identity", lr: float = 1e-3,
                    weight_decay: float = 0.0,
                    moment_weights=(1.0, 10.0), eps: float = 1e-10,
                    variance_method: str = "direct",
                    betas=(0.9, 0.999), adam_eps: float = 1e-8,
                    interpret: bool = False, mxu_dtype: str = "float32"):
    """Run ``data.shape[0] // batch_size`` fused Adam training steps.

    state: from :func:`init_train_state` (or a previous call — resumable,
           including the Adam bias-correction powers).
    data:  (G*batch_size, LANES) minibatch rows from :func:`pack_minibatches`
           (each consecutive ``batch_size`` rows are one minibatch).
    mxu_dtype: 'bfloat16' rounds matmul INPUTS to bf16 (f32 accumulation;
           weights/loss/Adam state stay f32) — the MXU runs bf16 operands
           ~4x faster than f32. Default f32 keeps exact optax parity.
    Returns ``(new_state, losses)`` with losses shaped (G,) — the
    per-minibatch training losses, identical to the XLA trainer's.
    """
    if mxu_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"train kernel: unknown mxu_dtype {mxu_dtype!r}")
    if num_moments not in (1, 2):
        raise ValueError("train kernel: K in (1, 2) moments only (the "
                         "closed-form loss covers mean and mean+variance)")
    if state[0].shape[-1] != LANES:
        raise ValueError("train kernel: hidden_dim must pad to one lane "
                         f"tile (Hp == {LANES}); larger models use the "
                         "fused-step kernel instead")
    if not packed_state_safe(activation, input_scaling):
        raise ValueError(f"train kernel: {activation}/{input_scaling} does "
                         "not preserve zero padding")
    if not batch_size_ok(batch_size):
        raise ValueError(f"train kernel: batch_size {batch_size} must be a "
                         f"positive multiple of 8 and <= {MAX_BATCH_ROWS} "
                         "(the minibatch is the kernel's VMEM row tile)")
    if data.shape[0] % batch_size:
        raise ValueError("train kernel: data rows must be a whole number "
                         "of minibatches")
    Hp = state[0].shape[-1]
    if state[0].ndim == 3:                               # dual-pack layout
        core = _make_train_core_dual(
            n_slots, Hp, batch_size, activation, input_scaling, float(lr),
            float(weight_decay), float(betas[0]), float(betas[1]),
            float(adam_eps), float(eps), float(moment_weights[0]),
            float(moment_weights[1]), variance_method, interpret,
            mxu_dtype)
    else:
        w1m = (float(moment_weights[1]) if len(moment_weights) > 1
               else 1.0)                  # unread when num_moments == 1
        core = _make_train_core(
            n_slots, num_moments, Hp, batch_size, activation,
            input_scaling, float(lr), float(weight_decay),
            float(betas[0]), float(betas[1]),
            float(adam_eps), float(eps),
            float(moment_weights[0]),
            w1m, variance_method,
            interpret, mxu_dtype)
    out = core(data, *state)
    losses = out[0][:, 0, 0]
    return tuple(out[1:]), losses
