"""Pallas TPU kernel: the fused whole-batch NJ-ODE training step.

Motivation (BENCH_NOTES.md "MFU / roofline"): at the scaled config (hidden
256, B=4096) the XLA training step sits at 24-30% MFU between the memory
and MXU rooves — every matmul's (R, H) activation round-trips HBM between
ops.  This kernel runs the ENTIRE per-slot computation of
``NeuralJumpODE.apply`` (reference hot loop: models/jump_ode.py:142-216) as
one Pallas program per row-tile of trajectories:

    for each observation slot s:                    (static Python loop)
        a1   = act(sum_d x_s[d] * j1[d] + bj0)      jump layer 0 (VPU rank-d_x)
        hj_s = act(a_prev @ J_l + bj_l)             jump hidden layers (MXU)
        u_s  = act(... @ O_l + bo_l)                readout hidden layers (MXU)
        ya_s[d] = sum(u_s * o2[d])  (+ bo2 in XLA)  after-jump prediction
        if s > 0:   # the gap (slot s-1 -> s), ONE Euler step (dt_ode_step=None)
            base = sum_d scale(x[d])*w1x[d] + t*w1t + dt*w1d + b1
            g    = act(scale(hj_{s-1}) @ W1h + base)  ODEFunc layer 0 (MXU)
            g    = act(g @ Wmid_l + bmid_l)           ODEFunc hidden layers (MXU)
            dh   = g @ Wlast + blast                  ODEFunc final (MXU)
            hm   = hj_{s-1} + dt * dh                 Euler update
            yb_s = readout(hm)                        before-jump prediction

so the weights load into VMEM ONCE per tile sweep (constant block index)
and no activation ever touches HBM.  The scalar inputs (x_s, t_s — a few
bytes per trajectory) are the only per-row traffic; outputs are the
d_y*K*(2N-1) prediction scalars per row.

Since round 5 the kernel covers the reference's FULL MLP flag surface
(reference models/jump_ode.py:36-39): arbitrary ``input_dim`` (each extra
input dim is one more VPU rank-1 feature riding the existing matmuls),
arbitrary ``output_dim`` (extra o2 readout rows), and arbitrary
``n_hidden_layers`` (each extra layer is one more VMEM-resident matmul in
each of the three chains).  The parameter layout is computed per config by
:class:`StepLayout`; for the original (d_x=1, d_y=1, L=1) configs it
reduces EXACTLY to the round-3 constants below, so packed train states and
the whole-run training kernel (ops/train_kernel.py) interoperate unchanged.

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

Applicability (falls back to pure XLA otherwise): no dropout,
``dt_ode_step is None`` (single Euler step per gap — the scaled-sweep and
default-CLI configs), analytic-gradient activation/scaling, euler solver,
and the lane-packing fits: N*(d_x+1) input lanes and d_y*K*(2N-1) output
lanes, both <= 128.  Both network modes are covered: separate (K
independent networks, d_y output columns each) and shared (ONE network
whose readout emits all d_y*K moment columns from spare V rows).

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
N_VEC = 16          # MINIMUM padded vector-param rows per moment (legacy)
# Legacy (d_x=1, d_y=1, L=1) row/plane indices — StepLayout reproduces them
# exactly for that config; ops/train_kernel.py builds on these directly.
(ROW_J1, ROW_BJ1, ROW_BJ2, ROW_W1X, ROW_W1T, ROW_W1D, ROW_B1, ROW_B2,
 ROW_BO1, ROW_O2) = range(10)
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


# Shared-mode K used to be capped by the spare rows of the FIXED 16-row V
# block (N_VEC - ROW_O2 = 6); the dynamic StepLayout grows the block
# instead, so the binding constraint is the output-lane packing
# d_y*K*(2N-1) <= 128 — at the minimum N=2 that is K*d_y <= 42.
MAX_SHARED_K = LANES // 3

# use_pallas='auto' engagement boundary (marginal train-step A/B vs XLA,
# scripts/measure_scaled_step.py, BENCH_NOTES.md r3d/r4c/r5f): the kernel
# wins 1.37x at hidden 256 and 1.05x at 224 (B=4096, N=2, f32); hidden
# 192 straddled 1.0 across two 3-rep rounds (1.07x r3d, 0.95x r4c) and a
# dedicated min-of-5 quiet-box pin resolved it as a 1.21x WIN (r5f:
# 0.313 -> 0.258 ms), so the boundary returns to 192; hidden <= 160
# loses (0.66-0.92x), and B=2048 is erratic (0.43-1.29x) — auto engages
# only at hidden >= 192 with >= 4096 folded rows.
AUTO_MIN_HIDDEN = 192
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


class StepLayout:
    """Parameter layout of the fused-step kernel for one static config.

    Matrix planes, in order (all padded (Hp, Hp)):
      [J_1 .. J_L]  jump hidden layers       (L planes)
      [O_0 .. O_{L-1}]  readout hidden layers (L planes)
      [W1H]         ODEFunc layer-0 hidden block (1 plane)
      [Wmid_1 .. Wmid_{L-1}]  ODEFunc hidden layers (L-1 planes)
      [Wlast]       ODEFunc final linear      (1 plane)
    Vector rows, in order (all padded (Hp,)):
      j1[0..d_x-1], bj[0..L], w1x[0..d_x-1], w1t, w1d,
      ode_b[0..L] (layer 0, mids, last), bo[0..L-1],
      o2 rows (d_y per network; shared mode: K*d_y rows in flat
      column order c = d*K + k — matching the reference's row-major
      ``.view(1, d_y, K)`` readout reshape).
    For (d_x=1, d_y=1, L=1) this reproduces the legacy ROW_*/MAT_*
    constants above exactly (asserted in tests/test_fused_step.py).
    """

    def __init__(self, n_hidden_layers: int, input_dim: int,
                 output_dim: int, num_moments: int, shared: bool):
        L, d_x, d_y, K = n_hidden_layers, input_dim, output_dim, num_moments
        self.L, self.d_x, self.d_y, self.K = L, d_x, d_y, K
        self.shared = shared
        self.Kn = 1 if shared else K
        # matrix planes
        self.mat_jump = list(range(0, L))
        self.mat_out = list(range(L, 2 * L))
        self.mat_w1h = 2 * L
        self.mat_ode_mid = list(range(2 * L + 1, 3 * L))
        self.mat_ode_last = 3 * L
        self.n_mats = 3 * L + 1
        # vector rows
        r = 0
        self.row_j1 = r; r += d_x
        self.row_bj = list(range(r, r + L + 1)); r += L + 1
        self.row_w1x = r; r += d_x
        self.row_w1t = r; r += 1
        self.row_w1d = r; r += 1
        self.row_ode_b = list(range(r, r + L + 1)); r += L + 1
        self.row_bo = list(range(r, r + L)); r += L
        self.row_o2 = r
        self.n_o2 = (K * d_y) if shared else d_y
        r += self.n_o2
        self.n_rows = r
        self.n_vec = max(N_VEC, _round_up(r, 8))

    def o2_row(self, k: int, d: int) -> int:
        """V row of the readout weight column for (moment k, output dim d)."""
        return self.row_o2 + (d * self.K + k if self.shared else d)

    def key(self):
        return (self.L, self.d_x, self.d_y, self.K, self.shared)


def fused_step_available(shared_network: bool, input_dim: int,
                         output_dim: int, n_hidden_layers: int,
                         activation: str, dropout_rate: float,
                         input_scaling: str, dt_ode_step,
                         ode_solver: str = "euler") -> bool:
    del shared_network  # both modes supported since r3
    # arbitrary input_dim / output_dim / n_hidden_layers supported since
    # r5 (the per-batch lane-packing fit is checked by fused_step_fits)
    return (HAS_PALLAS and input_dim >= 1
            and output_dim >= 1 and n_hidden_layers >= 1
            and dropout_rate == 0.0 and dt_ode_step is None
            and ode_solver == "euler" and activation in SUPPORTED_ACTS
            and input_scaling in _SCALE)


def _slot_cols(N: int, K: int, d_y: int = 1):
    """Output lanes: ya at d*C + k*N + s, yb (gap s-1 -> s) at
    d*C + K*N + k*(N-1) + s-1, with C = K*(2N-1)."""
    return d_y * K * (2 * N - 1)


def fused_step_fits(n_slots: int, num_moments: int, input_dim: int = 1,
                    output_dim: int = 1) -> bool:
    """Lane-packing fit for one batch shape: scalar inputs (x per dim + t)
    and all prediction outputs must each pack into one 128-lane row."""
    return (n_slots * (input_dim + 1) <= LANES
            and _slot_cols(n_slots, num_moments, output_dim) <= LANES)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(scal_ref, w_ref, v_ref, y_ref,
                *, N: int, lo: StepLayout, act: str, scale: str, cdt):
    """Slot-BATCHED forward: every weight matrix is applied exactly once
    per (tile, moment) by concatenating all slots' rows — the jump chain
    on (N·RT), the ODE chain on ((N-1)·RT), the readout on ((2N-1)·RT).
    Cuts the matmul count ~2x at 2-3x the shape (measured: per-matmul
    issue overhead, not FLOPs, limits the unbatched variant)."""
    scal = scal_ref[:]                                  # (RT, LANES) f32
    RT = scal.shape[0]
    A = _ACT[act]
    SC = _SCALE[scale]
    K, d_x, d_y, L = lo.K, lo.d_x, lo.d_y, lo.L

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

    # input lanes: x_{s,d} at s*d_x + d, t_s at N*d_x + s
    xs = [[wide(scal[:, s * d_x + d:s * d_x + d + 1]) for d in range(d_x)]
          for s in range(N)]
    ts = [wide(scal[:, N * d_x + s:N * d_x + s + 1]) for s in range(N)]
    C = K * (2 * N - 1)

    for kn in range(lo.Kn):
        vblk = v_ref[kn]                                 # (n_vec, Hp)

        def vrow(r):
            return vblk[r:r + 1]

        # ---- jump chain on all N slots at once ----
        Xd = [jnp.concatenate([xs[s][d] for s in range(N)], axis=0)
              for d in range(d_x)]                       # d_x x (N·RT, Hp)
        pre = jnp.broadcast_to(vrow(lo.row_bj[0]), (N * RT, Hp))
        for d in range(d_x):
            pre = pre + Xd[d] * vrow(lo.row_j1 + d)
        H = A(pre)
        for l in range(L):
            H = A(mm(H, w_ref[kn, lo.mat_jump[l]]) + vrow(lo.row_bj[l + 1]))
        HJ = H                                           # (N·RT, Hp)

        if S > 0:
            HJg = HJ[:S * RT]                            # gap-start states
            T0 = jnp.concatenate(ts[:S], axis=0)
            DT = jnp.concatenate(
                [ts[s + 1] - ts[s] for s in range(S)], axis=0)
            BASE = T0 * vrow(lo.row_w1t) + DT * vrow(lo.row_w1d) \
                + vrow(lo.row_ode_b[0])
            for d in range(d_x):
                BASE = BASE + SC(Xd[d][:S * RT]) * vrow(lo.row_w1x + d)
            G = A(mm(SC(HJg), w_ref[kn, lo.mat_w1h]) + BASE)
            for i, m in enumerate(lo.mat_ode_mid):
                G = A(mm(G, w_ref[kn, m]) + vrow(lo.row_ode_b[i + 1]))
            DH = mm(G, w_ref[kn, lo.mat_ode_last]) + vrow(lo.row_ode_b[L])
            HM = HJg + DT * DH
            U = jnp.concatenate([HJ, HM], axis=0)        # ((2N-1)·RT, Hp)
        else:
            U = HJ
        for l in range(L):
            U = A(mm(U, w_ref[kn, lo.mat_out[l]]) + vrow(lo.row_bo[l]))

        for kk in (range(K) if lo.shared else (kn,)):
            for d in range(d_y):
                o2 = vrow(lo.o2_row(kk, d))
                Y = jnp.sum(U * o2, axis=1, keepdims=True)  # ((2N-1)·RT, 1)
                for s in range(N):
                    y = put(y, d * C + kk * N + s, Y[s * RT:(s + 1) * RT])
                for s in range(S):
                    y = put(y, d * C + K * N + kk * S + s,
                            Y[(N + s) * RT:(N + s + 1) * RT])

    y_ref[:] = y


# --------------------------------------------------------------------------
# backward kernel: rematerialize per slot, accumulate parameter cotangents
# --------------------------------------------------------------------------

def _bwd_kernel(scal_ref, w_ref, wt_ref, v_ref, gy_ref,
                dw_ref, dv_ref, dw_s, dv_s,
                *, N: int, lo: StepLayout, act: str, scale: str, cdt):
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
    K, d_x, d_y, L = lo.K, lo.d_x, lo.d_y, lo.L

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

    xs = [[wide(scal[:, s * d_x + d:s * d_x + d + 1]) for d in range(d_x)]
          for s in range(N)]
    ts = [wide(scal[:, N * d_x + s:N * d_x + s + 1]) for s in range(N)]
    C = K * (2 * N - 1)

    for kn in range(lo.Kn):
        vblk = v_ref[kn]

        def vrow(r_):
            return vblk[r_:r_ + 1]

        vbase = kn * lo.n_vec

        def dv_add(row, val):                            # val: (1, Hp)
            dv_s[vbase + row:vbase + row + 1, :] += val

        # ---- rematerialize (same slot-batched layout as the forward) ----
        Xd = [jnp.concatenate([xs[s][d] for s in range(N)], axis=0)
              for d in range(d_x)]
        A_pre = [jnp.broadcast_to(vrow(lo.row_bj[0]), (N * RT, Hp))]
        for d in range(d_x):
            A_pre[0] = A_pre[0] + Xd[d] * vrow(lo.row_j1 + d)
        A_val = [A(A_pre[0])]
        for l in range(L):
            A_pre.append(mm(A_val[l], w_ref[kn, lo.mat_jump[l]])
                         + vrow(lo.row_bj[l + 1]))
            A_val.append(A(A_pre[l + 1]))
        HJ = A_val[L]
        if S > 0:
            HJg = HJ[:S * RT]
            T0 = jnp.concatenate(ts[:S], axis=0)
            DT = jnp.concatenate(
                [ts[s + 1] - ts[s] for s in range(S)], axis=0)
            X_sc = [SC(Xd[d][:S * RT]) for d in range(d_x)]
            HJ_sc = SC(HJg)
            BASE = T0 * vrow(lo.row_w1t) + DT * vrow(lo.row_w1d) \
                + vrow(lo.row_ode_b[0])
            for d in range(d_x):
                BASE = BASE + X_sc[d] * vrow(lo.row_w1x + d)
            G_pre = [mm(HJ_sc, w_ref[kn, lo.mat_w1h]) + BASE]
            G_val = [A(G_pre[0])]
            for i, m in enumerate(lo.mat_ode_mid):
                G_pre.append(mm(G_val[i], w_ref[kn, m])
                             + vrow(lo.row_ode_b[i + 1]))
                G_val.append(A(G_pre[i + 1]))
            DH = mm(G_val[L - 1], w_ref[kn, lo.mat_ode_last]) \
                + vrow(lo.row_ode_b[L])
            HM = HJg + DT * DH
            IN_O1 = jnp.concatenate([HJ, HM], axis=0)    # ((2N-1)·RT, Hp)
        else:
            IN_O1 = HJ
        U_in = [IN_O1]
        U_pre = []
        for l in range(L):
            U_pre.append(mm(U_in[l], w_ref[kn, lo.mat_out[l]])
                         + vrow(lo.row_bo[l]))
            U_in.append(A(U_pre[l]))
        U = U_in[L]

        # ---- readout backward (all after + before outputs at once) ----
        # separate mode: d_y moment columns per network; shared: the single
        # network's U feeds all K*d_y columns, so the o2-cotangents are
        # per-(moment, dim) and the upstream dU sums GY * o2 over all.
        GYo2 = None
        for kk in (range(K) if lo.shared else (kn,)):
            for d in range(d_y):
                o2 = vrow(lo.o2_row(kk, d))
                GYk = jnp.concatenate(
                    [wide(gy[:, d * C + kk * N + s:d * C + kk * N + s + 1])
                     for s in range(N)]
                    + [wide(gy[:, d * C + K * N + kk * S + s:
                               d * C + K * N + kk * S + s + 1])
                       for s in range(S)], axis=0)       # ((2N-1)·RT, Hp)
                dv_add(lo.o2_row(kk, d), colsum(U * GYk))
                contrib = GYk * o2
                GYo2 = contrib if GYo2 is None else GYo2 + contrib
        g = GYo2
        for l in range(L - 1, -1, -1):
            g_pre = g * AG(U_pre[l])
            dw_s[kn, lo.mat_out[l]] += outer(U_in[l], g_pre)
            dv_add(lo.row_bo[l], colsum(g_pre))
            g = mm(g_pre, wt_ref[kn, lo.mat_out[l]])
        dIN = g
        dHJ = dIN[:N * RT]

        if S > 0:
            dHM = dIN[N * RT:]
            dDH = DT * dHM
            dw_s[kn, lo.mat_ode_last] += outer(G_val[L - 1], dDH)
            dv_add(lo.row_ode_b[L], colsum(dDH))
            g = mm(dDH, wt_ref[kn, lo.mat_ode_last])
            for i in range(L - 2, -1, -1):               # mids, reversed
                g_pre = g * AG(G_pre[i + 1])
                dw_s[kn, lo.mat_ode_mid[i]] += outer(G_val[i], g_pre)
                dv_add(lo.row_ode_b[i + 1], colsum(g_pre))
                g = mm(g_pre, wt_ref[kn, lo.mat_ode_mid[i]])
            dG1_pre = g * AG(G_pre[0])
            dw_s[kn, lo.mat_w1h] += outer(HJ_sc, dG1_pre)
            for d in range(d_x):
                dv_add(lo.row_w1x + d, colsum(X_sc[d] * dG1_pre))
            dv_add(lo.row_w1t, colsum(T0 * dG1_pre))
            dv_add(lo.row_w1d, colsum(DT * dG1_pre))
            dv_add(lo.row_ode_b[0], colsum(dG1_pre))
            # HM = HJg + DT·DH: direct + through-G contributions land on
            # the first S row-blocks of dHJ
            dHJg = dHM + mm(dG1_pre, wt_ref[kn, lo.mat_w1h]) * SG(HJg)
            pad = jnp.zeros((RT, dHJg.shape[1]), dHJg.dtype)
            dHJ = dHJ + jnp.concatenate([dHJg, pad], axis=0)

        # ---- jump backward (all slots at once) ----
        g = dHJ
        for l in range(L - 1, -1, -1):
            g_pre = g * AG(A_pre[l + 1])
            dw_s[kn, lo.mat_jump[l]] += outer(A_val[l], g_pre)
            dv_add(lo.row_bj[l + 1], colsum(g_pre))
            g = mm(g_pre, wt_ref[kn, lo.mat_jump[l]])
        dA0_pre = g * AG(A_pre[0])
        for d in range(d_x):
            dv_add(lo.row_j1 + d, colsum(Xd[d] * dA0_pre))
        dv_add(lo.row_bj[0], colsum(dA0_pre))

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
def _make_core(N: int, lo_key, Hp: int, act: str, scale: str,
               cdt_name: str, interpret: bool):
    """Build the custom-VJP core for one static configuration.

    core(scal (B, LANES), W (Kn,n_mats,Hp,Hp), V (Kn,n_vec,Hp)) ->
    y (B, LANES) with y's first d_y*K*(2N-1) lanes holding the predictions
    (bo2 excluded — added differentiably outside).  Kn = 1 (shared) or K.
    W may be bf16 (pre-cast); V stays f32.
    """
    lo = StepLayout(lo_key[0], lo_key[1], lo_key[2], lo_key[3], lo_key[4])
    cdt = {"f32": None, "bf16": jnp.bfloat16}[cdt_name]
    wdt = jnp.float32 if cdt is None else cdt
    Kn, NM, NV = lo.Kn, lo.n_mats, lo.n_vec

    def row(d, rt):
        return pl.BlockSpec((rt, d), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)

    full = lambda s: pl.BlockSpec(s, lambda r: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)

    def fwd_call(scal, W, V):
        R = scal.shape[0]
        n_r = R // ROW_TILE
        return pl.pallas_call(
            functools.partial(_fwd_kernel, N=N, lo=lo, act=act, scale=scale,
                              cdt=cdt),
            grid=(n_r,),
            in_specs=[row(LANES, ROW_TILE), full((Kn, NM, Hp, Hp)),
                      full((Kn, NV, Hp))],
            out_specs=row(LANES, ROW_TILE),
            out_shape=jax.ShapeDtypeStruct((R, LANES), jnp.float32),
            interpret=interpret,
        )(scal, W, V)

    def bwd_call(scal, W, WT, V, gy):
        R = scal.shape[0]
        n_r = R // ROW_TILE_BWD
        return pl.pallas_call(
            functools.partial(_bwd_kernel, N=N, lo=lo, act=act, scale=scale,
                              cdt=cdt),
            grid=(n_r,),
            in_specs=[row(LANES, ROW_TILE_BWD), full((Kn, NM, Hp, Hp)),
                      full((Kn, NM, Hp, Hp)), full((Kn, NV, Hp)),
                      row(LANES, ROW_TILE_BWD)],
            out_specs=[full((Kn, NM, Hp, Hp)), full((Kn * NV, Hp))],
            out_shape=[jax.ShapeDtypeStruct((Kn, NM, Hp, Hp), jnp.float32),
                       jax.ShapeDtypeStruct((Kn * NV, Hp), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((Kn, NM, Hp, Hp), jnp.float32),
                            pltpu.VMEM((Kn * NV, Hp), jnp.float32)],
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
        dV = dVflat.reshape(lo.Kn, NV, Hp)
        return jnp.zeros_like(scal), dW.astype(jnp.float32), dV

    core.defvjp(core_fwd, core_bwd)
    return core


def pack_params(params, *, num_moments: int, hidden_dim: int,
                shared_network: bool = False, input_dim: int = 1,
                output_dim: int = 1, n_hidden_layers: int = 1):
    """Model pytree -> the kernel's padded ``(W, V, bo2)`` tensors.

    W: (Kn, n_mats, Hp, Hp) matrix planes, V: (Kn, n_vec, Hp) vector rows
    (see :class:`StepLayout`), bo2 readout bias (applied differentiably
    outside the kernel): shape (K,) when output_dim == 1 (the legacy
    layout, interop-pinned by ops/train_kernel.py) else (K, d_y).
    Zero-padded beyond the real (H, H) block; the kernel's forward keeps
    padded activations exactly zero and its backward produces exactly-zero
    cotangents there, so (W, V, bo2) can serve directly as a TRAIN STATE
    (grads/updates never contaminate the padding — pinned by
    tests/test_fused_step.py::test_packed_state_training).
    """
    K, H, d_x, d_y = num_moments, hidden_dim, input_dim, output_dim
    L = n_hidden_layers
    lo = StepLayout(L, d_x, d_y, K, shared_network)
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

    mats = [None] * lo.n_mats
    for l in range(L):
        mats[lo.mat_jump[l]] = pad_mat(jl[l + 1]["w"])
        mats[lo.mat_out[l]] = pad_mat(ul[l]["w"])
    mats[lo.mat_w1h] = pad_mat(ol[0]["w"][:, :H, :])
    for i, m in enumerate(lo.mat_ode_mid):
        mats[m] = pad_mat(ol[i + 1]["w"])
    mats[lo.mat_ode_last] = pad_mat(ol[L]["w"])
    W = jnp.stack(mats, axis=1)                          # (Kn, n_mats, Hp, Hp)

    vrows = [None] * lo.n_rows
    for d in range(d_x):
        vrows[lo.row_j1 + d] = pad_vec(jl[0]["w"][:, d, :])
        vrows[lo.row_w1x + d] = pad_vec(ol[0]["w"][:, H + d, :])
    vrows[lo.row_bj[0]] = pad_vec(jl[0]["b"])
    for l in range(L):
        vrows[lo.row_bj[l + 1]] = pad_vec(jl[l + 1]["b"])
        vrows[lo.row_bo[l]] = pad_vec(ul[l]["b"])
    vrows[lo.row_w1t] = pad_vec(ol[0]["w"][:, H + d_x, :])
    vrows[lo.row_w1d] = pad_vec(ol[0]["w"][:, H + d_x + 1, :])
    for l in range(L + 1):
        vrows[lo.row_ode_b[l]] = pad_vec(ol[l]["b"])
    if shared_network:
        # flat column c = d*K + k of the (H, d_y*K) readout -> its V row
        for c in range(K * d_y):
            vrows[lo.row_o2 + c] = pad_vec(ul[L]["w"][:, :, c])
        bo2 = ul[L]["b"][0].reshape(d_y, K).T            # (K, d_y)
    else:
        for d in range(d_y):
            vrows[lo.row_o2 + d] = pad_vec(ul[L]["w"][:, :, d])
        bo2 = ul[L]["b"]                                 # (K, d_y)
    V = jnp.stack(vrows + [jnp.zeros_like(vrows[0])] * (lo.n_vec - lo.n_rows),
                  axis=1)                                # (Kn, n_vec, Hp)
    bo2 = bo2.astype(f32)
    if d_y == 1:
        bo2 = bo2[:, 0]                                  # legacy (K,) layout
    return W, V, bo2


def unpack_params(W, V, bo2, *, num_moments: int, hidden_dim: int,
                  input_dim: int = 1, shared_network: bool = False,
                  output_dim: int = 1, n_hidden_layers: int = 1):
    """Inverse of :func:`pack_params` — padded tensors back to the model
    pytree (for eval / checkpointing of packed-state training)."""
    K, H, d_x, d_y = num_moments, hidden_dim, input_dim, output_dim
    L = n_hidden_layers
    lo = StepLayout(L, d_x, d_y, K, shared_network)

    def sq(t):                                           # drop the Kn axis
        return t[0] if shared_network else t

    j1 = jnp.stack([V[:, lo.row_j1 + d, :H] for d in range(d_x)], axis=1)
    jlays = [{"w": sq(j1), "b": sq(V[:, lo.row_bj[0], :H])}]
    for l in range(L):
        jlays.append({"w": sq(W[:, lo.mat_jump[l], :H, :H]),
                      "b": sq(V[:, lo.row_bj[l + 1], :H])})
    # ODEFunc layer 0 stacks [W1h; w1x rows; w1t; w1d]
    w1 = jnp.concatenate(
        [W[:, lo.mat_w1h, :H, :H]]
        + [V[:, lo.row_w1x + d, None, :H] for d in range(d_x)]
        + [V[:, lo.row_w1t, None, :H], V[:, lo.row_w1d, None, :H]], axis=1)
    olays = [{"w": sq(w1), "b": sq(V[:, lo.row_ode_b[0], :H])}]
    for i, m in enumerate(lo.mat_ode_mid):
        olays.append({"w": sq(W[:, m, :H, :H]),
                      "b": sq(V[:, lo.row_ode_b[i + 1], :H])})
    olays.append({"w": sq(W[:, lo.mat_ode_last, :H, :H]),
                  "b": sq(V[:, lo.row_ode_b[L], :H])})
    ulays = [{"w": sq(W[:, lo.mat_out[l], :H, :H]),
              "b": sq(V[:, lo.row_bo[l], :H])} for l in range(L)]
    bo2_kd = bo2[:, None] if bo2.ndim == 1 else bo2      # (K, d_y)
    if shared_network:
        o2 = jnp.stack([V[0, lo.row_o2 + c, :H] for c in range(K * d_y)],
                       axis=-1)                          # (H, d_y*K)
        ulays.append({"w": o2, "b": bo2_kd.T.reshape(d_y * K)})
    else:
        o2 = jnp.stack([V[:, lo.row_o2 + d, :H] for d in range(d_y)],
                       axis=-1)                          # (K, H, d_y)
        ulays.append({"w": o2, "b": bo2_kd})
    return {"jump": {"layers": jlays}, "ode": {"layers": olays},
            "out": {"layers": ulays}}


def fused_step_apply_packed(W, V, bo2, times, values, *, num_moments: int,
                            activation: str, input_scaling: str,
                            compute_dtype=None, interpret: bool = False,
                            shared_network: bool = False,
                            input_dim: int = 1, output_dim: int = 1,
                            n_hidden_layers: int = 1):
    """Fused forward on pre-packed ``(W, V, bo2)`` tensors (see
    :func:`pack_params`).  Differentiable in (W, V, bo2); per-step cost
    excludes all pytree<->padded packing glue, so this is the form the
    packed-state trainer uses inside its step.
    """
    K, d_x, d_y = num_moments, input_dim, output_dim
    L = n_hidden_layers
    lo = StepLayout(L, d_x, d_y, K, shared_network)
    Hp = W.shape[-1]
    B, N = times.shape
    if not fused_step_fits(N, K, d_x, d_y):
        raise ValueError(f"fused step kernel: N={N}, K={K}, d_x={d_x}, "
                         f"d_y={d_y} exceeds the {LANES}-lane packing")
    f32 = jnp.float32
    times = times.astype(f32)
    x = values.astype(f32)                               # (B, N, d_x)

    scal = jnp.zeros((B, LANES), f32)
    scal = (scal.at[:, :N * d_x].set(x.reshape(B, N * d_x))
            .at[:, N * d_x:N * d_x + N].set(times))
    # the row count must be a whole number of tiles for BOTH grids (the
    # defaults divide each other, but the env overrides need not)
    tile_lcm = _math.lcm(ROW_TILE, ROW_TILE_BWD)
    Bp = _round_up(max(B, tile_lcm), tile_lcm)
    scal = _pad_rows(scal, Bp)

    cdt_name = "f32"
    if compute_dtype is not None and compute_dtype == jnp.bfloat16:
        cdt_name = "bf16"
    core = _make_core(N, lo.key(), Hp, activation, input_scaling, cdt_name,
                      interpret)
    y = core(scal, W, V)[:B]                             # (B, LANES)

    bo2_kd = bo2[:, None] if bo2.ndim == 1 else bo2      # (K, d_y)
    C = K * (2 * N - 1)
    # lanes d*C + k*N + s -> (B, N, d_y, K)
    ya = jnp.stack(
        [jnp.stack([y[:, d * C + k * N:d * C + (k + 1) * N]
                    for k in range(K)], axis=-1) for d in range(d_y)],
        axis=2) + bo2_kd.T                               # (B, N, d_y, K)
    preds = ya
    if N == 1:
        return preds, jnp.zeros_like(preds)
    S = N - 1
    yb = jnp.stack(
        [jnp.stack([y[:, d * C + K * N + k * S:d * C + K * N + (k + 1) * S]
                    for k in range(K)], axis=-1) for d in range(d_y)],
        axis=2) + bo2_kd.T                               # (B, S, d_y, K)
    preds_before = jnp.concatenate(
        [jnp.zeros((B, 1, d_y, K), f32), yb], axis=1)
    return preds, preds_before


@functools.lru_cache(maxsize=None)
def _loss_lane_maps(N: int, K: int, d: int):
    """Constant 0/1 matrices mapping output lanes -> (slot, dim) columns.

    Column order matches ``values.reshape(B, N*d)``: c = s*d + dd.  One
    (LANES, N*d) selector per moment for the after-jump lanes and one for
    the before-jump lanes (slot-0 column intentionally empty — the model
    defines preds_before[:, 0] = 0).  Used by the LANE-SPACE loss: selecting
    moment planes via matmul keeps both the forward and the cotangent path
    on 2-D (rows, lanes) arrays; slicing a (B, N, d, K) tensor instead makes
    XLA materialize tiny-trailing-dim intermediates whose cotangent assembly
    costs 0.163 ms/step at the scaled config (BENCH_NOTES.md r5i).
    """
    import numpy as np
    C = K * (2 * N - 1)
    S = N - 1
    sel_a = np.zeros((K, LANES, N * d), np.float32)
    sel_b = np.zeros((K, LANES, N * d), np.float32)
    for k in range(K):
        for dd in range(d):
            for s in range(N):
                sel_a[k, dd * C + k * N + s, s * d + dd] = 1.0
            for s in range(1, N):
                sel_b[k, dd * C + K * N + k * S + (s - 1), s * d + dd] = 1.0
    # d-block reduction (B, N*d) -> (B, N) and the slot-0 bias mask
    dsum = np.zeros((N * d, N), np.float32)
    for s in range(N):
        dsum[s * d:(s + 1) * d, s] = 1.0
    slot0 = np.ones((N * d,), np.float32)
    slot0[:d] = 0.0
    return sel_a, sel_b, dsum, slot0


def fused_step_loss_packed(W, V, bo2, times, values, mask=None, *,
                           num_moments: int, activation: str,
                           input_scaling: str,
                           ignore_first_continuity: bool = False,
                           moment_weights=None, eps: float = 1e-10,
                           variance_method: str = "direct",
                           traj_mask=None, extended_moments: bool = False,
                           compute_dtype=None, interpret: bool = False,
                           shared_network: bool = False, input_dim: int = 1,
                           output_dim: int = 1, n_hidden_layers: int = 1):
    """Fused forward + NJ-ODE loss ENTIRELY in lane space.

    Semantically ``nj_ode_loss_dense(values, *fused_step_apply_packed(...),
    mask, ...)`` (same terms, same reduction order — models/loss.py:37-138),
    but the moment planes are selected from the kernel's (B, LANES) output
    with constant 0/1 matmuls and every loss intermediate stays 2-D
    (B, N*d) / (B, N).  The (B, N, d, K) prediction tensor is never
    materialized, so neither is its cotangent: the backward feeds the
    pallas VJP a (B, LANES) cotangent produced by the transposed selector
    matmuls.  Measured motivation: the composed path's cotangent assembly
    alone costs 0.163 ms of the 0.313 ms scaled training step
    (BENCH_NOTES.md r5h/r5i decomposition).
    """
    K, d = num_moments, input_dim
    if output_dim != input_dim:
        raise ValueError("fused_step_loss_packed needs output_dim == "
                         f"input_dim (got {output_dim} != {input_dim})")
    if variance_method not in ("direct", "second_moment"):
        raise ValueError(f"Unknown variance_method: {variance_method}")
    lo = StepLayout(n_hidden_layers, d, d, K, shared_network)
    Hp = W.shape[-1]
    B, N = times.shape
    if not fused_step_fits(N, K, d, d):
        raise ValueError(f"fused step kernel: N={N}, K={K}, d_x={d} "
                         f"exceeds the {LANES}-lane packing")
    f32 = jnp.float32
    times = times.astype(f32)
    x = values.astype(f32)
    X2 = x.reshape(B, N * d)                             # (B, N*d)

    scal = jnp.zeros((B, LANES), f32)
    scal = (scal.at[:, :N * d].set(X2)
            .at[:, N * d:N * d + N].set(times))
    tile_lcm = _math.lcm(ROW_TILE, ROW_TILE_BWD)
    Bp = _round_up(max(B, tile_lcm), tile_lcm)
    scal = _pad_rows(scal, Bp)

    cdt_name = "f32"
    if compute_dtype is not None and compute_dtype == jnp.bfloat16:
        cdt_name = "bf16"
    core = _make_core(N, lo.key(), Hp, activation, input_scaling, cdt_name,
                      interpret)
    y = core(scal, W, V)[:B]                             # (B, LANES)

    sel_a, sel_b, dmat, slot0 = _loss_lane_maps(N, K, d)
    sel_a, sel_b = jnp.asarray(sel_a), jnp.asarray(sel_b)
    dmat, slot0 = jnp.asarray(dmat), jnp.asarray(slot0)
    bo2_kd = bo2[:, None] if bo2.ndim == 1 else bo2      # (K, d)

    def plane(k):
        """Moment-k (after, before) planes in X2's (B, N*d) layout."""
        bias = jnp.tile(bo2_kd[k], N)                    # (N*d,)
        ya = y @ sel_a[k] + bias
        yb = y @ sel_b[k] + bias * slot0                 # slot 0 stays 0
        return ya, yb

    def dsum(a2):                                        # (B, N*d) -> (B, N)
        return a2 if d == 1 else a2 @ dmat

    if mask is None:
        mask_f = jnp.ones((B, N), f32)
    else:
        mask_f = mask.astype(f32)
    n_obs = jnp.maximum(jnp.sum(mask_f, axis=1), 1.0)

    if moment_weights is not None:
        moment_weights = jnp.asarray(moment_weights, f32)

    def masked_obs_mean(per_obs):
        return jnp.sum(per_obs * mask_f, axis=1) / n_obs

    def two_term(jump_sq, cont_sq):
        if ignore_first_continuity:
            cont_sq = cont_sq.at[:, 0].set(0.0)
        per_obs = (jnp.sqrt(jump_sq + eps) + jnp.sqrt(cont_sq + eps)) ** 2
        return masked_obs_mean(per_obs)

    # ---- moment 0: mean (models/loss.py:79-86) ----
    Y, Yb = plane(0)
    mean_loss = two_term(dsum((X2 - Y) ** 2), dsum((X2 - Yb) ** 2))
    w0 = 1.0 if moment_weights is None else moment_weights[0]
    total = w0 * mean_loss

    # ---- moment 1: variance / second moment (models/loss.py:88-108) ----
    if K > 1:
        Wp, Wpb = plane(1)
        if variance_method == "direct":
            Vv, Vvb = Wp ** 2, Wpb ** 2
            Z = (X2 - lax.stop_gradient(Y)) ** 2
            Zb = (X2 - lax.stop_gradient(Yb)) ** 2
        else:
            Vv, Vvb = Wp, Wpb
            Z = X2 ** 2
            Zb = Z
        var_loss = two_term(dsum((Z - Vv) ** 2), dsum((Zb - Vvb) ** 2))
        w1 = 1.0 if moment_weights is None else moment_weights[1]
        total = total + w1 * var_loss

    # ---- extended moments >= 2 (models/loss.py:110-133) ----
    if extended_moments and K > 2:
        for k in range(2, K):
            p_k = k + 1
            Wk, Wkb = plane(k)
            if variance_method == "direct":
                Zk = (X2 - lax.stop_gradient(Y)) ** p_k
                Zkb = (X2 - lax.stop_gradient(Yb)) ** p_k
            else:
                Zk = X2 ** p_k
                Zkb = Zk
            lk = two_term(dsum((Zk - Wk) ** 2), dsum((Zkb - Wkb) ** 2))
            wk = 1.0 if moment_weights is None else moment_weights[k]
            total = total + wk * lk

    if traj_mask is None:
        return jnp.mean(total)
    tm = traj_mask.astype(f32)
    return jnp.sum(total * tm) / jnp.maximum(jnp.sum(tm), 1.0)


def fused_step_loss(params, times, values, mask=None, *, num_moments: int,
                    hidden_dim: int, activation: str, input_scaling: str,
                    ignore_first_continuity: bool = False,
                    moment_weights=None, eps: float = 1e-10,
                    variance_method: str = "direct", traj_mask=None,
                    extended_moments: bool = False, compute_dtype=None,
                    interpret: bool = False, shared_network: bool = False,
                    input_dim: int = 1, output_dim: int = 1,
                    n_hidden_layers: int = 1):
    """Model-pytree entry for the lane-space fused loss (packs params, then
    :func:`fused_step_loss_packed`).  Differentiable in ``params``."""
    W, V, bo2 = pack_params(params, num_moments=num_moments,
                            hidden_dim=hidden_dim,
                            shared_network=shared_network,
                            input_dim=input_dim, output_dim=output_dim,
                            n_hidden_layers=n_hidden_layers)
    return fused_step_loss_packed(
        W, V, bo2, times, values, mask, num_moments=num_moments,
        activation=activation, input_scaling=input_scaling,
        ignore_first_continuity=ignore_first_continuity,
        moment_weights=moment_weights, eps=eps,
        variance_method=variance_method, traj_mask=traj_mask,
        extended_moments=extended_moments, compute_dtype=compute_dtype,
        interpret=interpret, shared_network=shared_network,
        input_dim=input_dim, output_dim=output_dim,
        n_hidden_layers=n_hidden_layers)


def fused_step_apply(params, times, values, *, num_moments: int,
                     hidden_dim: int, activation: str, input_scaling: str,
                     compute_dtype=None, interpret: bool = False,
                     shared_network: bool = False, input_dim: int = 1,
                     output_dim: int = 1, n_hidden_layers: int = 1):
    """Fused forward of ``NeuralJumpODE.apply`` (eligible configs only).

    params: the model pytree — stacked (K,) leading axes for separate
    networks, unstacked single networks for ``shared_network`` (whose
    OutputNN final layer is (H, d_y*K)).  times (B, N), values (B, N, d_x).
    Returns ``(preds, preds_before)`` shaped (B, N, d_y, K), semantics
    identical to the XLA path (verified in tests/test_fused_step.py).
    """
    W, V, bo2 = pack_params(params, num_moments=num_moments,
                            hidden_dim=hidden_dim,
                            shared_network=shared_network,
                            input_dim=input_dim, output_dim=output_dim,
                            n_hidden_layers=n_hidden_layers)
    return fused_step_apply_packed(
        W, V, bo2, times, values, num_moments=num_moments,
        activation=activation, input_scaling=input_scaling,
        compute_dtype=compute_dtype, interpret=interpret,
        shared_network=shared_network, input_dim=input_dim,
        output_dim=output_dim, n_hidden_layers=n_hidden_layers)
