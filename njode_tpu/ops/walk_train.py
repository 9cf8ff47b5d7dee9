"""Pallas TPU kernel: the ENTIRE production training run in one program.

The production recipe (``--dt-ode-step 0.01 --shared-network --hidden-dim
50``) trains with the time-major grid WALK carried by the fused walk
kernel (ops/walk_scan.py), but the rest of its training step — the jump
network, both readouts, the NJ-ODE loss, Adam, and the slot->cell stream
scatter glue — stays XLA-side: measured 71% of the 0.166 ms marginal step
(BENCH_NOTES.md r3i).  This kernel is the production twin of
ops/train_kernel.py: ONE Pallas program whose grid iterates over the
minibatch steps of the whole run, with

* the model parameters AND Adam state resident in VMEM across all steps,
* the jump network and both readouts computed slot-batched in-kernel,
* the grid walk computed in-kernel with the carry in VMEM — the slot->cell
  routing that XLA lowered as a scatter + dense DMA streams becomes
  per-cell VPU selects against a VMEM-resident slot table,
* the walk backward reading per-cell post-reset states from a VMEM
  residual buffer (no HBM stream traffic at all; when the whole-run ring
  exceeds the VMEM budget — fine-dt recipes like ``--dt-ode-step 0.001``
  — the forward checkpoints the carry every ~sqrt(M) cells and the
  backward recomputes each chunk's residuals from its checkpoint, r5),
* the NJ-ODE loss gradient in closed form (the exact
  ``_loss_and_cotangents`` the whole-run kernel uses, called per row-pair
  half with a shared valid count),
* the Adam update applied in-VMEM at torch-parity parameter granularity
  (the walk's block-diagonal weight layout is a reparametrization; grads
  are routed back to the raw ``w1/b1/w2/b2`` rows before the update, so
  checkpoints interop exactly with the XLA trainer).

Matches the semantics of the reference training loop
(/root/reference/neural_jump_ode/utils/training.py:219-344) composed with
the reference model's substepped forward
(/root/reference/neural_jump_ode/models/jump_ode.py:142-216) on
grid-aligned data (where the ``while t+dt < t_next`` substep loop is
exactly ``k`` uniform steps — the documented grid-walk equivalence,
models/jump_ode.py ``_integrate_gaps_grid``).

Scope: SHARED network (the production recipes), d_x = d_y = 1,
n_hidden_layers = 1, no dropout, fixed ``dt_ode_step`` with every
observation time ON the integration grid (the caller's ``grid_walk``
promise), K in (1, 2) moments, ``ignore_first_continuity=True``, full
observation mask, f32 state (optional bf16 matmul operands).

Solvers: euler (the reference-exact step, ``t_elapsed = dt`` via the
effective const-one row ``cvec = dt*w1_tel + b1``), plus heun and rk4
(r5: the model's fixed-step higher-order extensions,
models/jump_ode.py:446-487 — stage evaluations use ``t_rel = stage
time`` and ``t_elapsed = 0``, so their cvec is ``b1`` alone and the
``w1_tel`` row receives an exactly-zero gradient).  All three share one
tableau-driven cell: euler is the one-stage identity tableau, which
emits operation-for-operation the same program as before.  The backward
recomputes each cell's stages from the post-reset residual (the ring
stores one row per cell regardless of stage count).

Row-pair packing: for hidden_dim + 3 <= 64, TWO trajectories pack into
each 128-lane vector row (per-half carry lanes ``[h, t, x, 1]``, weight
planes ``kron(I_2, block)`` — the ops/walk_scan.py layout), halving every
matmul and select in the program.  Shared-parameter gradients are the SUM
of the two halves' block gradients; the kernel symmetrizes with an exact
half-swap permutation matmul before Adam so the state stays exactly
kron-structured.
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

from .fused_cell import _ACT, _ACT_GRAD
from .gap_scan import _SCALE, _SCALE_GRAD
from .train_kernel import _adam_math, _loss_and_cotangents, _write_loss
from .walk_scan import n_halves

LANES = 128
N_VEC = 16
# V-block rows (vector params; per-half copies under row-pair packing)
(ROW_J1, ROW_BJ1, ROW_BJ2, ROW_B1, ROW_B2, ROW_BO1, ROW_O2M, ROW_O2V,
 ROW_BO2M, ROW_BO2V) = range(10)
# W planes
(MAT_J2, MAT_O1, MAT_W1, MAT_W2) = range(4)

# VMEM budget for the big per-row scratch: the per-cell residual buffer
# ((ring rows), RT, LANES) f32 — the walk backward reads post-reset states
# from it instead of streaming — PLUS the two (N, RT, LANES) slot tables
# (sHM/sCT) and the two (RT, LANES) carries.  Near the 63-slot cap the
# slot tables rival the residual buffer, so the budget counts them all:
# (ring + ckpt + 2*n_slots + 2) * RT <= _VMEM_ROWS_MAX keeps 'auto' quiet
# for configs that would pass a residual-only check and then die at Mosaic
# compile on VMEM (ADVICE r4).  14336 rows = 7 MiB of f32 lanes; params +
# Adam planes add a fixed ~2 MiB beside it.
#
# When the whole (M, RT) residual buffer does not fit, the kernel falls
# back to CHECKPOINT-RECOMPUTE (r5): the forward stores the carry every
# ``ck`` cells (ceil(M/ck) checkpoints) and keeps only a ``ck``-cell
# residual ring; the backward recomputes each chunk's residuals forward
# from its checkpoint before walking it in reverse.  VMEM rows become
# ck + ceil(M/ck) (minimized near ck = sqrt(M)), at the cost of one extra
# forward walk (+2 matmuls/cell — ~+25% of the walk's MXU floor), so any
# ``--dt-ode-step`` stays eligible (the reference accepts any dt:
# /root/reference/neural_jump_ode/models/jump_ode.py:196-202).
_VMEM_ROWS_MAX = 14336

# Explicit RK tableaux: per stage ((a_ij coefficients on earlier k's), c_i
# stage-time offset in dt units), plus the combination weights b_i.  Euler
# is the one-stage identity tableau — with it the cell emits the exact
# pre-r5 program (multiplies by 1.0 and empty a_ij rows are skipped at
# trace time).
_TABLEAU = {
    "euler": ((((), 0.0),), (1.0,)),
    "heun": ((((), 0.0), (((0, 1.0),), 1.0)), (0.5, 0.5)),
    "rk4": ((((), 0.0), (((0, 0.5),), 0.5), (((1, 0.5),), 0.5),
             (((2, 1.0),), 1.0)), (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0,
                                   1.0 / 6.0)),
}


def _ring_plan(rt: int, n_slots: int, max_substeps: int):
    """(ring_cells, n_ckpt) residual plan fitting the VMEM row budget, or
    None.  ring_cells == M means the direct (no-recompute) layout."""
    M = int(max_substeps)
    fixed = 2 * n_slots + 2
    if (M + fixed) * rt <= _VMEM_ROWS_MAX:
        return M, 0
    # chunked: minimize ck + ceil(M/ck) over a small scan around sqrt(M)
    best = None
    lo = max(1, int(M ** 0.5) - 2)
    for ck in range(lo, min(M, lo + 64)):
        rows = ck + -(-M // ck)
        if best is None or rows < best[0]:
            best = (rows, ck)
    rows, ck = best
    if (rows + fixed) * rt > _VMEM_ROWS_MAX:
        return None
    return ck, -(-M // ck)


def walk_train_available(shared_network, input_dim, output_dim,
                         n_hidden_layers, activation, dropout_rate,
                         input_scaling, dt_ode_step,
                         ode_solver="euler") -> bool:
    """Config eligibility (grid alignment is the CALLER's promise — the
    Trainer gates on its ``grid_walk`` resolution)."""
    return (HAS_PALLAS and shared_network and input_dim == 1
            and output_dim == 1 and n_hidden_layers == 1
            and dropout_rate == 0.0 and dt_ode_step is not None
            and ode_solver in _TABLEAU
            and activation in _ACT and input_scaling in _SCALE)


def walk_train_shapes_ok(hidden_dim: int, batch_size, n_slots: int,
                         max_substeps: int) -> bool:
    if batch_size is None or batch_size <= 0:
        return False
    nh = n_halves(hidden_dim)
    if hidden_dim + 3 > LANES // nh:
        return False
    if batch_size % (8 * nh) or batch_size > 256:
        return False
    rt = batch_size // nh
    return (2 * n_slots + 1 <= LANES
            and _ring_plan(rt, n_slots, max_substeps) is not None)


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _walk_train_kernel(data_ref, w0_ref, v0_ref, mw0_ref, vw0_ref, mv0_ref,
                       vv0_ref, stat0_ref,
                       loss_ref, wout_ref, vout_ref, mwout_ref, vwout_ref,
                       mvout_ref, vvout_ref, statout_ref,
                       sW, sV, smW, svW, smV, svV, sdV, sstat,
                       c_s, ga_s, dw1_s, dw2_s, cpost, ckpt, sHM, sCT,
                       *, N: int, K: int, M: int, ck: int, dt: float,
                       d_h: int, nh: int, act: str, scale: str,
                       lr: float, wd: float, b1: float, b2: float,
                       eps_adam: float, eps_loss: float,
                       w0m: float, w1m: float, variance_method: str,
                       mxu: str = "float32", solver: str = "euler"):
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

    data = data_ref[:]                                   # (RT, nh*LANES)
    RT = data.shape[0]
    H = LANES // nh
    A = _ACT[act]
    AG = _ACT_GRAD[act]
    SC = _SCALE[scale]
    SG = _SCALE_GRAD[scale]
    S = N - 1
    f32 = jnp.float32

    cast = ((lambda x: x.astype(jnp.bfloat16)) if mxu == "bfloat16"
            else (lambda x: x))

    def mm(a, w):
        return jnp.dot(cast(a), cast(w), preferred_element_type=f32)

    def mmT(a, w):                                       # a @ w.T, no copy
        return lax.dot_general(cast(a), cast(w), (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)

    def outer(a, g):                                     # a.T @ g
        return lax.dot_general(cast(a), cast(g), (((0,), (0,)), ((), ())),
                               preferred_element_type=f32)

    def colsum(x):
        return jnp.sum(x, axis=0, keepdims=True)

    def lane_iota(rows):
        return lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)

    def sub_masks(rows):
        sub = lax.rem(lane_iota(rows), H)
        return sub < d_h, sub == d_h, sub == d_h + 1, sub == d_h + 2

    is_h, lane_t, lane_x, lane_one = sub_masks(RT)

    def wide(col):                                       # (rows, 1) -> LANES
        return jnp.broadcast_to(col, (col.shape[0], LANES))

    halfs = [data[:, i * LANES:(i + 1) * LANES] for i in range(nh)]
    half_of = lane_iota(RT) // H                         # (RT, LANES)

    def half_bcast(cols):
        """Per-half (RT, 1) columns -> one (RT, LANES) block whose half k
        holds cols[k] broadcast."""
        out = wide(cols[0])
        for k in range(1, nh):
            out = jnp.where(half_of == k, wide(cols[k]), out)
        return out

    xs = [half_bcast([h[:, s:s + 1] for h in halfs]) for s in range(N)]
    ts = [half_bcast([h[:, N + s:N + s + 1] for h in halfs])
          for s in range(N)]
    valids = [h[:, 2 * N:2 * N + 1] for h in halfs]      # per-half (RT, 1)

    # ---- Adam bias-correction powers for THIS step (lane-wide rows) ----
    c1 = sstat[0:1, :] * b1
    c2 = sstat[1:2, :] * b2
    sstat[0:1, :] = c1
    sstat[1:2, :] = c2

    # ---- half-swap permutation + block masks (grad symmetrization) ----
    rr = lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    cc = lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    sub_r = lax.rem(rr, H)
    sub_c = lax.rem(cc, H)
    kron = (rr // H) == (cc // H)
    row_h = sub_r < d_h
    col_h = sub_c < d_h
    one_row = sub_r == d_h + 2
    if nh == 2:
        P = jnp.where(cc == lax.rem(rr + H, LANES), 1.0, 0.0)  # half swap

        def sym_w(g):                                    # sum both halves
            g = jnp.where(kron, g, 0.0)
            return g + jnp.dot(P, jnp.dot(g, P, preferred_element_type=f32),
                               preferred_element_type=f32)

        def sym_v(g):                                    # (1, LANES) row
            return g + jnp.dot(g, P, preferred_element_type=f32)
    else:
        sym_w = lambda g: jnp.where(kron, g, 0.0)
        sym_v = lambda g: g

    # ---- effective walk weights (cvec on the one-row: euler feeds the
    # reference's t_elapsed = dt through dt*w1_tel + b1; heun/rk4 stages
    # evaluate at t_elapsed = 0 so their cvec is b1 alone.  The bias
    # broadcast is masked to the kron diagonal — each half's const-one
    # lane must not feed the OTHER half's columns) ----
    stages, bweights = _TABLEAU[solver]
    tel = dt if solver == "euler" else 0.0
    b1row = sV[ROW_B1:ROW_B1 + 1]
    b2row = sV[ROW_B2:ROW_B2 + 1]
    cvec = jnp.broadcast_to(b1row, (LANES, LANES))
    if tel:
        cvec = tel * sW[MAT_W1] + cvec
    W1eff = jnp.where(one_row, jnp.where(kron, cvec, 0.0), sW[MAT_W1])
    W2eff = jnp.where(one_row,
                      jnp.where(kron,
                                jnp.broadcast_to(b2row, (LANES, LANES)),
                                0.0), sW[MAT_W2])

    # ---- slot-batched jump forward (all N slots at once) ----
    j1 = sV[ROW_J1:ROW_J1 + 1]
    bj1 = sV[ROW_BJ1:ROW_BJ1 + 1]
    bj2 = sV[ROW_BJ2:ROW_BJ2 + 1]
    X = jnp.concatenate(xs, axis=0)                      # (N*RT, LANES)
    A1_pre = X * j1 + bj1
    A1 = A(A1_pre)
    HJ_pre = mm(A1, sW[MAT_J2]) + bj2
    HJ = A(HJ_pre)

    # ---- slot tables + grid cells ----
    inv_dt = 1.0 / dt
    Gs = [jnp.floor(t * inv_dt + 0.5) for t in ts]       # f32 cell indices
    TAB = []
    for s in range(N):
        blk = jnp.where(is_h, HJ[s * RT:(s + 1) * RT],
                        jnp.where(lane_t, ts[s],
                                  jnp.where(lane_x, SC(xs[s]),
                                            jnp.where(lane_one, 1.0, 0.0))))
        TAB.append(blk)

    # ---- forward walk (carry resident; residuals to the cpost RING —
    # ck == M is the direct layout; ck < M is checkpoint-recompute: the
    # pre-cell carry is checkpointed every ck cells and the backward
    # refills the ring per chunk) ----
    sHM[:] = jnp.zeros_like(sHM)
    c_s[:] = jnp.where(lane_one, 1.0, 0.0)
    t_add = jnp.where(lane_t, dt, 0.0)
    chunked = ck < M
    n_ck = -(-M // ck)

    def stage_in(cp, ks, aij, ci):
        """Stage input: cp with h lanes nudged by earlier k's and the t
        lane advanced to the stage time (k's are zero off the h lanes, so
        only the explicit t-lane offset is needed)."""
        s_in = cp
        for j, a in aij:
            s_in = s_in + (dt * a) * ks[j]
        if ci:
            s_in = s_in + jnp.where(lane_t, dt * ci, 0.0)
        return s_in

    def drift(s_in):
        """ODEFunc at one stage input; k = dh/dt lives on the h lanes."""
        inp = jnp.where(is_h, SC(s_in), s_in)
        pre = mm(inp, W1eff)
        hid = jnp.where(lane_one, 1.0, A(pre))
        return inp, pre, hid, mm(hid, W2eff)

    def combine(cp, ks):
        acc = ks[0] if bweights[0] == 1.0 else bweights[0] * ks[0]
        for i in range(1, len(ks)):
            acc = acc + (ks[i] if bweights[i] == 1.0
                         else bweights[i] * ks[i])
        return cp + dt * acc + t_add

    def walk_cell(g, slot, capture_hm: bool):
        """One forward walk cell: reset-select, residual store, solver."""
        gf = g.astype(f32)
        c = c_s[:]
        cp = c
        for s in range(N):
            sel = Gs[s] == gf
            if capture_hm and s >= 1:
                sHM[s] = jnp.where(sel, c, sHM[s])
            cp = jnp.where(sel, TAB[s], cp)
        cpost[slot] = cp
        ks = []
        for aij, ci in stages:
            _, _, _, k = drift(stage_in(cp, ks, aij, ci))
            ks.append(k)
        c_s[:] = combine(cp, ks)

    def fbody(g, _):
        if chunked:
            @pl.when(lax.rem(g, ck) == 0)
            def _():
                ckpt[g // ck] = c_s[:]
        walk_cell(g, lax.rem(g, ck), True)
        return 0

    lax.fori_loop(0, M, fbody, 0)
    cfin = c_s[:]
    Mf = float(M)
    for s in range(1, N):                                # endpoint slots
        sHM[s] = jnp.where(Gs[s] == Mf, cfin, sHM[s])

    # ---- readouts (after-jump on HJ, before-jump on the collected HM) ----
    bo1 = sV[ROW_BO1:ROW_BO1 + 1]
    o2m = sV[ROW_O2M:ROW_O2M + 1]
    IN_O1 = jnp.concatenate(
        [HJ] + [sHM[s] for s in range(1, N)], axis=0)    # ((2N-1)*RT, LANES)
    U_pre = mm(IN_O1, sW[MAT_O1]) + bo1
    U = A(U_pre)
    half_rows = lane_iota(U.shape[0]) // H

    def readout(o2row, bo2row):
        Pm = U * o2row
        sc = []
        for k in range(nh):
            bo2_k = jnp.sum(jnp.where(lane_iota(1) == k * H, bo2row, 0.0),
                            keepdims=True)               # (1, 1) scalar
            sc.append(jnp.sum(jnp.where(half_rows == k, Pm, 0.0), axis=1,
                              keepdims=True) + bo2_k)
        return sc                                        # per-half (rows, 1)

    Y0 = readout(o2m, sV[ROW_BO2M:ROW_BO2M + 1])
    if K == 2:
        o2v = sV[ROW_O2V:ROW_O2V + 1]
        Y1 = readout(o2v, sV[ROW_BO2V:ROW_BO2V + 1])

    col_iota = lane_iota(RT)

    def lane_mats(Y):
        Am = jnp.zeros((RT, LANES), f32)
        Bm = jnp.zeros((RT, LANES), f32)
        for s in range(N):
            Am = jnp.where(col_iota == s, wide(Y[s * RT:(s + 1) * RT]), Am)
        for g in range(S):
            Bm = jnp.where(col_iota == g + 1,
                           wide(Y[(N + g) * RT:(N + g + 1) * RT]), Bm)
        return Am, Bm

    # ---- closed-form loss + lane cotangents, one call per half with a
    # shared valid count (the exact train-kernel reduction semantics) ----
    nv = valids[0]
    for k in range(1, nh):
        nv = nv + valids[k]
    NV = jnp.maximum(jnp.sum(nv, keepdims=True), 1.0)    # (1, 1)

    L = jnp.zeros((1, 1), f32)
    gA0s, gB0s, gA1s, gB1s = [], [], [], []
    for k in range(nh):
        A0m, B0m = lane_mats(Y0[k])
        A1m = B1m = None
        if K == 2:
            A1m, B1m = lane_mats(Y1[k])
        Lk, gA0, gB0, gA1, gB1 = _loss_and_cotangents(
            halfs[k], valids[k], A0m, B0m, A1m, B1m, N=N,
            eps_loss=eps_loss, w0m=w0m, w1m=w1m,
            variance_method=variance_method, K=K, nv=NV)
        L = L + Lk
        gA0s.append(gA0)
        gB0s.append(gB0)
        gA1s.append(gA1)
        gB1s.append(gB1)
    _write_loss(loss_ref, L)

    # ---- readout backward ----
    def gy_blocks(gAs, gBs):
        rows = []
        for s in range(N):
            rows.append(half_bcast([g[:, s:s + 1] for g in gAs]))
        for g in range(S):
            rows.append(half_bcast([gb[:, g + 1:g + 2] for gb in gBs]))
        return jnp.concatenate(rows, axis=0)             # ((2N-1)*RT, LANES)

    GYm = gy_blocks(gA0s, gB0s)
    dU_pre = GYm * o2m
    dbo2m = jnp.sum(sum(gA0s) + sum(gB0s), keepdims=True)       # (1, 1)
    do2 = [(ROW_O2M, sym_v(colsum(U * GYm))),
           (ROW_BO2M, jnp.broadcast_to(dbo2m, (1, LANES)))]
    if K == 2:
        GYv = gy_blocks(gA1s, gB1s)
        dU_pre = dU_pre + GYv * o2v
        dbo2v = jnp.sum(sum(gA1s) + sum(gB1s), keepdims=True)
        do2 += [(ROW_O2V, sym_v(colsum(U * GYv))),
                (ROW_BO2V, jnp.broadcast_to(dbo2v, (1, LANES)))]
    dU_pre = dU_pre * AG(U_pre)
    dO1 = sym_w(jnp.where(row_h & col_h, outer(IN_O1, dU_pre), 0.0))
    dbo1 = sym_v(colsum(dU_pre))
    dIN = mmT(dU_pre, sW[MAT_O1])
    dHJ = dIN[:N * RT]
    DHM = [dIN[(N + g) * RT:(N + g + 1) * RT] for g in range(S)]

    # ---- backward walk (reverse cells; residuals from cpost) ----
    sCT[:] = jnp.zeros_like(sCT)
    dw1_s[:] = jnp.zeros_like(dw1_s)
    dw2_s[:] = jnp.zeros_like(dw2_s)
    ga0 = jnp.zeros((RT, LANES), f32)
    for s in range(1, N):                                # endpoint slots
        ga0 = jnp.where((Gs[s] == Mf) & is_h, DHM[s - 1], ga0)
    ga_s[:] = ga0

    def back_cell(g, slot):
        """One backward walk cell, residual from ring slot ``slot``: the
        cell's stages are recomputed from the post-reset carry (one ring
        row per cell regardless of stage count), then reversed — each
        stage's k-cotangent collects the combination weight plus the
        downstream stages' a_ij feedbacks."""
        gf = g.astype(f32)
        cp = cpost[slot]
        res, ks = [], []
        for aij, ci in stages:
            s_in = stage_in(cp, ks, aij, ci)
            inp, pre, hid, k = drift(s_in)
            res.append((s_in, inp, pre, hid))
            ks.append(k)
        gA = ga_s[:]
        gks = [(dt * bw) * gA for bw in bweights]
        gcp = gA
        for i in reversed(range(len(stages))):
            s_in, inp, pre, hid = res[i]
            gk = gks[i]
            dw2_s[:] += outer(hid, gk)
            g_hid = mmT(gk, W2eff)
            g_pre = jnp.where(lane_one, 0.0, g_hid) * AG(pre)
            dw1_s[:] += outer(inp, g_pre)
            g_inp = mmT(g_pre, W1eff)
            g_s = jnp.where(is_h, g_inp * SG(s_in), 0.0)
            gcp = gcp + g_s
            for j, a in stages[i][0]:
                gks[j] = gks[j] + (dt * a) * g_s
        g_cp = jnp.where(is_h, gcp, 0.0)
        nxt = g_cp
        for s in range(N):
            sel = Gs[s] == gf
            sCT[s] = jnp.where(sel, g_cp, sCT[s])
            inj = DHM[s - 1] if s >= 1 else 0.0
            nxt = jnp.where(sel & is_h, inj, jnp.where(sel, 0.0, nxt))
        ga_s[:] = nxt

    if not chunked:
        def bbody(i, _):
            g = M - 1 - i
            back_cell(g, g)
            return 0

        lax.fori_loop(0, M, bbody, 0)
    else:
        # checkpoint-recompute: per chunk (reversed), refill the ring by
        # walking forward from the chunk's checkpoint, then walk backward
        def chunk_body(ci, _):
            c = n_ck - 1 - ci
            g0 = c * ck
            c_s[:] = ckpt[c]

            def refill(j, _):
                @pl.when(g0 + j < M)
                def _():
                    # sHM is complete from the original forward; a second
                    # capture would be idempotent but wasted VPU work
                    walk_cell(g0 + j, j, False)
                return 0

            lax.fori_loop(0, ck, refill, 0)

            def bstep(j, _):
                slot = ck - 1 - j
                @pl.when(g0 + slot < M)
                def _():
                    back_cell(g0 + slot, slot)
                return 0

            lax.fori_loop(0, ck, bstep, 0)
            return 0

        lax.fori_loop(0, n_ck, chunk_body, 0)

    # route the effective-walk-weight cotangents to raw param granularity
    dW1k = jnp.where(kron, dw1_s[:], 0.0)
    dW2k = jnp.where(kron, dw2_s[:], 0.0)
    db1 = sym_v(colsum(jnp.where(one_row, dW1k, 0.0)))
    db2 = sym_v(colsum(jnp.where(one_row, dW2k, 0.0)))
    # one-row (cvec) cotangent -> w1_tel at the solver's t_elapsed (dt for
    # euler; exactly 0 for heun/rk4 — their stages never see t_elapsed)
    dW1 = sym_w(jnp.where(col_h,
                          jnp.where(one_row, tel * dW1k,
                                    jnp.where(sub_r <= d_h + 2, dW1k, 0.0)),
                          0.0))
    dW2 = sym_w(jnp.where(row_h & col_h, dW2k, 0.0))

    # ---- jump backward (walk reset cotangents + readout cotangents) ----
    dHJ_tot = dHJ + jnp.concatenate([sCT[s] for s in range(N)], axis=0)
    dHJ_pre = dHJ_tot * AG(HJ_pre)
    dJ2 = sym_w(jnp.where(row_h & col_h, outer(A1, dHJ_pre), 0.0))
    dbj2 = sym_v(colsum(dHJ_pre))
    dA1_pre = mmT(dHJ_pre, sW[MAT_J2]) * AG(A1_pre)
    dj1 = sym_v(colsum(X * dA1_pre))
    dbj1 = sym_v(colsum(dA1_pre))

    # ---- in-VMEM Adam (planes in place, V rows via sdV) ----
    def adam_step(p, m, v, g):
        return _adam_math(p, m, v, g, c1=c1, c2=c2, lr=lr, wd=wd,
                          b1=b1, b2=b2, eps_adam=eps_adam)

    for mat, g in ((MAT_J2, dJ2), (MAT_O1, dO1), (MAT_W1, dW1),
                   (MAT_W2, dW2)):
        p, m, v = adam_step(sW[mat], smW[mat], svW[mat], g)
        sW[mat] = p
        smW[mat] = m
        svW[mat] = v

    sdV[:] = jnp.zeros_like(sdV)
    sdV[ROW_J1:ROW_J1 + 1] = dj1
    sdV[ROW_BJ1:ROW_BJ1 + 1] = dbj1
    sdV[ROW_BJ2:ROW_BJ2 + 1] = dbj2
    sdV[ROW_B1:ROW_B1 + 1] = db1
    sdV[ROW_B2:ROW_B2 + 1] = db2
    sdV[ROW_BO1:ROW_BO1 + 1] = dbo1
    for row, g in do2:
        sdV[row:row + 1] = g
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
# host-side param packing (shared network <-> kernel layout)
# --------------------------------------------------------------------------

def _tile_row(v, d_h: int, nh: int):
    """(d,) -> (LANES,) with per-half copies in the leading d lanes."""
    H = LANES // nh
    row = jnp.zeros((H,), jnp.float32).at[:v.shape[0]].set(
        v.astype(jnp.float32))
    return jnp.tile(row, nh)


def pack_walk_params(params, *, num_moments: int, hidden_dim: int):
    """Shared-network model pytree -> (W (4, LANES, LANES), V (16, LANES)).

    Plane row layout (per half): J2/O1/W2 carry their (d_h, d_h) blocks in
    rows/cols [0, d_h); W1 carries the ODEFunc first-layer rows REORDERED
    to the walk's carry lanes — rows [0, d_h) = the h rows, row d_h = the
    t_rel row, row d_h+1 = the x row, row d_h+2 = the RAW t_elapsed row
    (the kernel builds cvec = dt*w1_tel + b1 per step, so Adam runs at
    torch-parity granularity).  nh = 2 packs kron(I_2, block).
    """
    d_h = hidden_dim
    nh = n_halves(d_h)
    H = LANES // nh
    f32 = jnp.float32
    jl = params["jump"]["layers"]
    ol = params["ode"]["layers"]
    rl = params["out"]["layers"]

    def blk(pairs):
        B = jnp.zeros((H, H), f32)
        for rows, w in pairs:
            B = B.at[rows, :d_h].set(w.astype(f32))
        return B if nh == 1 else jnp.kron(jnp.eye(nh, dtype=f32), B)

    sl_h = slice(0, d_h)
    W = jnp.stack([
        blk([(sl_h, jl[1]["w"])]),                           # J2
        blk([(sl_h, rl[0]["w"])]),                           # O1
        blk([(sl_h, ol[0]["w"][:d_h]),                       # W1: h rows
             (d_h, ol[0]["w"][d_h + 1]),                     # t_rel row
             (d_h + 1, ol[0]["w"][d_h]),                     # x row
             (d_h + 2, ol[0]["w"][d_h + 2])]),               # raw t_el row
        blk([(sl_h, ol[1]["w"])]),                           # W2
    ])
    V = jnp.zeros((N_VEC, LANES), f32)
    V = V.at[ROW_J1].set(_tile_row(jl[0]["w"][0], d_h, nh))
    V = V.at[ROW_BJ1].set(_tile_row(jl[0]["b"], d_h, nh))
    V = V.at[ROW_BJ2].set(_tile_row(jl[1]["b"], d_h, nh))
    V = V.at[ROW_B1].set(_tile_row(ol[0]["b"], d_h, nh))
    V = V.at[ROW_B2].set(_tile_row(ol[1]["b"], d_h, nh))
    V = V.at[ROW_BO1].set(_tile_row(rl[0]["b"], d_h, nh))
    V = V.at[ROW_O2M].set(_tile_row(rl[1]["w"][:, 0], d_h, nh))
    V = V.at[ROW_BO2M].set(jnp.full((LANES,), rl[1]["b"][0], f32))
    if num_moments == 2:
        V = V.at[ROW_O2V].set(_tile_row(rl[1]["w"][:, 1], d_h, nh))
        V = V.at[ROW_BO2V].set(jnp.full((LANES,), rl[1]["b"][1], f32))
    return W, V


def unpack_walk_params(W, V, *, num_moments: int, hidden_dim: int):
    """Inverse of :func:`pack_walk_params` (reads the first half only —
    the layout keeps halves identical)."""
    d_h = hidden_dim
    K = num_moments

    def lin(w, b):
        return {"w": w, "b": b}

    o2 = [V[ROW_O2M, :d_h]]
    bo2 = [V[ROW_BO2M, 0]]
    if K == 2:
        o2.append(V[ROW_O2V, :d_h])
        bo2.append(V[ROW_BO2V, 0])
    w1 = jnp.concatenate([
        W[MAT_W1, :d_h, :d_h],                               # h rows
        W[MAT_W1, d_h + 1:d_h + 2, :d_h],                    # x row
        W[MAT_W1, d_h:d_h + 1, :d_h],                        # t_rel row
        W[MAT_W1, d_h + 2:d_h + 3, :d_h],                    # t_el row
    ], axis=0)
    return {
        "jump": {"layers": [
            lin(V[ROW_J1, :d_h][None, :], V[ROW_BJ1, :d_h]),
            lin(W[MAT_J2, :d_h, :d_h], V[ROW_BJ2, :d_h])]},
        "ode": {"layers": [
            lin(w1, V[ROW_B1, :d_h]),
            lin(W[MAT_W2, :d_h, :d_h], V[ROW_B2, :d_h])]},
        "out": {"layers": [
            lin(W[MAT_O1, :d_h, :d_h], V[ROW_BO1, :d_h]),
            lin(jnp.stack(o2, axis=1), jnp.stack(bo2))]},
    }


def init_walk_state(params, *, num_moments: int, hidden_dim: int):
    """Model pytree -> kernel train state (fresh Adam)."""
    W, V = pack_walk_params(params, num_moments=num_moments,
                            hidden_dim=hidden_dim)
    stat = (jnp.zeros((8, LANES), jnp.float32)
            .at[0, :].set(1.0).at[1, :].set(1.0))
    return W, V, jnp.zeros_like(W), jnp.zeros_like(W), jnp.zeros_like(V), \
        jnp.zeros_like(V), stat


def walk_state_from(params, opt_state, *, num_moments: int,
                    hidden_dim: int, betas=(0.9, 0.999)):
    """(params, optax opt_state) -> kernel train state (exact resume)."""
    from .train_kernel import _find_adam_state
    _, adam = _find_adam_state(opt_state)
    kw = dict(num_moments=num_moments, hidden_dim=hidden_dim)
    W, V = pack_walk_params(params, **kw)
    mW, mV = pack_walk_params(adam.mu, **kw)
    vW, vV = pack_walk_params(adam.nu, **kw)
    count = adam.count.astype(jnp.float32)
    stat = jnp.zeros((8, LANES), jnp.float32)
    stat = stat.at[0, :].set(jnp.power(betas[0], count))
    stat = stat.at[1, :].set(jnp.power(betas[1], count))
    return (W, V, mW, vW, mV, vV, stat)


def optax_state_into_walk(state, n_steps: int, opt_state, *,
                          num_moments: int, hidden_dim: int):
    """Kernel train state -> (params, opt_state with Adam state replaced)."""
    import optax
    kw = dict(num_moments=num_moments, hidden_dim=hidden_dim)
    from .train_kernel import _find_adam_state
    W, V, mW, vW, mV, vV, _ = state
    params = unpack_walk_params(W, V, **kw)
    i, adam = _find_adam_state(opt_state)
    new_adam = optax.ScaleByAdamState(
        count=adam.count + jnp.asarray(n_steps, adam.count.dtype),
        mu=unpack_walk_params(mW, mV, **kw),
        nu=unpack_walk_params(vW, vV, **kw))
    return params, tuple(new_adam if j == i else s
                         for j, s in enumerate(opt_state))


# --------------------------------------------------------------------------
# the fused run
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _make_walk_core(N: int, K: int, M: int, ck: int, RT: int, nh: int,
                    d_h: int,
                    dt: float, act: str, scale: str, lr: float, wd: float,
                    b1: float, b2: float, eps_adam: float, eps_loss: float,
                    w0m: float, w1m: float, variance_method: str,
                    interpret: bool, mxu: str, solver: str):
    n_ck = -(-M // ck) if ck < M else 1   # ckpt buffer rows (1 = unused)

    def call(data, W, V, mW, vW, mV, vV, stat):
        G = data.shape[0] // RT
        row = pl.BlockSpec((RT, nh * LANES), lambda r: (r, 0),
                           memory_space=pltpu.VMEM)
        loss_spec = pl.BlockSpec((1, 8, LANES), lambda r: (r, 0, 0),
                                 memory_space=pltpu.VMEM)
        full = lambda s: pl.BlockSpec(s, lambda r: tuple(0 for _ in s),
                                      memory_space=pltpu.VMEM)
        WS = (4, LANES, LANES)
        VS = (N_VEC, LANES)
        return pl.pallas_call(
            functools.partial(
                _walk_train_kernel, N=N, K=K, M=M, ck=ck, dt=dt, d_h=d_h,
                nh=nh,
                act=act, scale=scale, lr=lr, wd=wd, b1=b1, b2=b2,
                eps_adam=eps_adam, eps_loss=eps_loss, w0m=w0m, w1m=w1m,
                variance_method=variance_method, mxu=mxu, solver=solver),
            grid=(G,),
            in_specs=[row, full(WS), full(VS), full(WS), full(WS),
                      full(VS), full(VS), full((8, LANES))],
            out_specs=[loss_spec, full(WS), full(VS), full(WS), full(WS),
                       full(VS), full(VS), full((8, LANES))],
            out_shape=[jax.ShapeDtypeStruct((G, 8, LANES), jnp.float32),
                       jax.ShapeDtypeStruct(WS, jnp.float32),
                       jax.ShapeDtypeStruct(VS, jnp.float32),
                       jax.ShapeDtypeStruct(WS, jnp.float32),
                       jax.ShapeDtypeStruct(WS, jnp.float32),
                       jax.ShapeDtypeStruct(VS, jnp.float32),
                       jax.ShapeDtypeStruct(VS, jnp.float32),
                       jax.ShapeDtypeStruct((8, LANES), jnp.float32)],
            scratch_shapes=[pltpu.VMEM(WS, jnp.float32),
                            pltpu.VMEM(VS, jnp.float32),
                            pltpu.VMEM(WS, jnp.float32),
                            pltpu.VMEM(WS, jnp.float32),
                            pltpu.VMEM(VS, jnp.float32),
                            pltpu.VMEM(VS, jnp.float32),
                            pltpu.VMEM(VS, jnp.float32),
                            pltpu.VMEM((8, LANES), jnp.float32),
                            pltpu.VMEM((RT, LANES), jnp.float32),   # c_s
                            pltpu.VMEM((RT, LANES), jnp.float32),   # ga_s
                            pltpu.VMEM((LANES, LANES), jnp.float32),
                            pltpu.VMEM((LANES, LANES), jnp.float32),
                            pltpu.VMEM((ck, RT, LANES), jnp.float32),
                            pltpu.VMEM((n_ck, RT, LANES), jnp.float32),
                            pltpu.VMEM((N, RT, LANES), jnp.float32),
                            pltpu.VMEM((N, RT, LANES), jnp.float32)],
            interpret=interpret,
        )(data, W, V, mW, vW, mV, vV, stat)
    return call


def fused_walk_train_run(state, data, *, n_slots: int, num_moments: int,
                         batch_size: int, hidden_dim: int,
                         dt_ode_step: float, max_substeps: int,
                         activation: str = "relu",
                         input_scaling: str = "identity", lr: float = 1e-3,
                         weight_decay: float = 0.0,
                         moment_weights=(1.0, 10.0), eps: float = 1e-10,
                         variance_method: str = "direct",
                         betas=(0.9, 0.999), adam_eps: float = 1e-8,
                         interpret: bool = False,
                         mxu_dtype: str = "float32",
                         ring_cells=None, ode_solver: str = "euler"):
    """Run ``data.shape[0] // batch_size`` fused walk-train Adam steps.

    ``data``: (G*batch_size, LANES) rows from
    ``train_kernel.pack_minibatches`` — observation times must all sit on
    the ``{g * dt_ode_step}`` grid (the caller's grid_walk promise) with
    a full observation mask.  Returns ``(new_state, losses (G,))``.

    ``ring_cells``: residual-ring size override (tests); default = the
    VMEM plan (whole-run ring when it fits, checkpoint-recompute chunks
    otherwise).
    """
    if mxu_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"walk-train kernel: unknown mxu_dtype {mxu_dtype!r}")
    if ode_solver not in _TABLEAU:
        raise ValueError(f"walk-train kernel: unknown ode_solver "
                         f"{ode_solver!r} (one of {sorted(_TABLEAU)})")
    if num_moments not in (1, 2):
        raise ValueError("walk-train kernel: K in (1, 2) moments only")
    if not walk_train_shapes_ok(hidden_dim, batch_size, n_slots,
                                max_substeps):
        raise ValueError(
            f"walk-train kernel: shapes not eligible (hidden_dim "
            f"{hidden_dim} needs hidden+3 <= {LANES}/n_halves; batch_size "
            f"{batch_size} must be a multiple of {8 * n_halves(hidden_dim)} "
            f"and <= 256; 2*n_slots+1 <= {LANES}; residual ring + "
            f"checkpoints + slot tables must fit {_VMEM_ROWS_MAX} VMEM "
            f"rows — even chunked, ~2*sqrt(max_substeps)+2*n_slots+2 "
            f"per packed row)")
    if data.shape[0] % batch_size:
        raise ValueError("walk-train kernel: data rows must be a whole "
                         "number of minibatches")
    nh = n_halves(hidden_dim)
    RT = batch_size // nh
    if nh > 1:
        # row-pair packing: consecutive rows share a 128-lane vector row
        data = data.reshape(data.shape[0] // nh, nh * LANES)
    ck = (int(ring_cells) if ring_cells is not None
          else _ring_plan(RT, n_slots, max_substeps)[0])
    ck = max(1, min(ck, int(max_substeps)))
    w1m = float(moment_weights[1]) if len(moment_weights) > 1 else 1.0
    core = _make_walk_core(
        n_slots, num_moments, int(max_substeps), ck, RT, nh, hidden_dim,
        float(dt_ode_step), activation, input_scaling, float(lr),
        float(weight_decay), float(betas[0]), float(betas[1]),
        float(adam_eps), float(eps), float(moment_weights[0]), w1m,
        variance_method, interpret, mxu_dtype, ode_solver)
    out = core(data, *state)
    return tuple(out[1:]), out[0][:, 0, 0]
