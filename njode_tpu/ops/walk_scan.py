"""Pallas TPU kernel: the time-major grid WALK, fused.

The grid walk (models/jump_ode.py ``_integrate_gaps_grid``) integrates all
inter-observation gaps of a batch with ONE pass over the M integration-grid
cells, resetting the carry at observation cells — ~n_slots x fewer ODEFunc
evaluations than the per-gap predicated loops (same exact-arithmetic
semantics on an aligned grid; reference models/jump_ode.py:196-202
collapses to k uniform steps per gap there).  The XLA lowering of that scan
measured 17-54 us per CELL at the production shapes — the per-cell
selects/streamed slices dominate, where a plain euler scan runs at ~3 us
(BENCH_NOTES.md r3g).  This kernel pair runs the walk with the carry
resident in VMEM, per-cell streams ride double-buffered DMA, and the resets
are free VPU selects.

Design (mirrors ops/gap_scan.py's ring-DMA machinery):

* grid = (row_tiles,); the M cells run in an in-kernel ``fori_loop``.
* One packed per-cell IN stream (M_pad, R, Dp), assembled in differentiable
  XLA outside by scattering the observation slots to their grid cells:
  lanes [0:d_h] = after-jump state at this cell's observation (zeros when
  none), lane d_h = its time, lane d_h+1 = has-observation mask, lane
  d_h+2 = its input-scaled x (d_x == 1 only).  The slot->cell scatter's
  VJP routes the kernel's per-cell jump cotangents back to the right slots
  for the jump-network backward.
* Per cell: select the carry (h, t, x) where the cell has an observation,
  emit the ARRIVE block (pre-select h + post-select t/x packed in spare
  lanes), take one Euler step
      pre = scale(h) @ W1_h + x * w1_x + t * w1_t + cvec,
      h  += dt * (act(pre) @ W2 + b2),
  where ``cvec = dt * w1_dt + b1`` is cell-invariant (computed outside in
  differentiable XLA, like gap_scan's ``base``).
* The forward's own ARRIVE stream is the model's output (the pre-jump state
  at every slot is its cell's arrive state — gathered outside) AND the
  complete backward residual: the backward walks the cells in REVERSE,
  reconstructing each cell's post-select state from (arrive, in-stream),
  accumulating parameter cotangents in VMEM, and streaming per-cell jump
  cotangents back out.  NO checkpointing / recompute passes are needed.

Float note: like gap_scan, the feature matmul is split (x/t features are
rank-1 VPU updates), so results match the XLA walk to ~1e-5 relative per
step; the t/x carries are bit-identical.
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
CHUNK = 4          # cells per DMA (amortizes the ~0.4 us start/wait cost)
MAX_ROW_TILE = 256

# 'auto' engages the kernel walk only up to this row count (one row tile):
# its dense 128-lane per-cell streams scale with rows x cells and extra
# row tiles serialize the walk, so larger batches lose to the per-gap
# path's redundant-FLOP XLA loop (measured on v5e, BENCH_NOTES.md r3h:
# 2.3x at 256 rows, 0.62x at 512, 0.84x at 1024, 0.74x at 2048).
AUTO_MAX_ROWS = 256


def walk_scan_available(n_hidden_layers: int, activation: str,
                        dropout_rate: float, input_scaling: str,
                        input_dim: int, hidden_dim: int) -> bool:
    """Config eligibility for the fused walk kernel (the grid-walk itself
    must ALSO be valid: aligned times, checked by the model/run_experiment).
    d_x == 1 keeps x a single packed lane; hidden_dim + 3 lanes must fit."""
    return (HAS_PALLAS and n_hidden_layers == 1 and dropout_rate == 0.0
            and activation in SUPPORTED_ACTS and input_scaling in _SCALE
            and input_dim == 1 and hidden_dim + 3 <= LANES)


def _row_tile(R: int) -> int:
    if R <= MAX_ROW_TILE:
        return _round_up(R, 8)
    n_tiles = -(-R // MAX_ROW_TILE)
    return _round_up(-(-R // n_tiles), 8)


def _cells_padded(M: int) -> int:
    return _round_up(M, CHUNK)


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(stream_ref, w1h_ref, w1x_ref, w1t_ref, cvec_ref,
                w2_ref, b2_ref,
                arr_ref, hL_ref,
                h_s, t_s, x_s, in_ring, out_ring, sems,
                *, dt: float, n_cells: int, act: str, scale: str,
                rt: int, d_h: int):
    r = pl.program_id(0)
    r0 = r * rt
    h_s[:] = jnp.zeros_like(h_s)
    t_s[:] = jnp.zeros_like(t_s)
    x_s[:] = jnp.zeros_like(x_s)
    w1h = w1h_ref[:]
    w1x = w1x_ref[:]
    w1t = w1t_ref[:]
    cvec = cvec_ref[:]
    w2 = w2_ref[:]
    b2 = b2_ref[:]

    lane = lax.broadcasted_iota(jnp.int32, h_s.shape, 1)
    is_h = lane < d_h
    is_t = lane == d_h
    is_has = lane == d_h + 1
    is_x = lane == d_h + 2
    K = -(-n_cells // CHUNK)

    def in_dma(slot, k):
        return pltpu.make_async_copy(
            stream_ref.at[pl.ds(k * CHUNK, CHUNK), pl.ds(r0, rt), :],
            in_ring.at[slot], sems.at[0, slot])

    def out_dma(slot, k):
        return pltpu.make_async_copy(
            out_ring.at[slot],
            arr_ref.at[pl.ds(k * CHUNK, CHUNK), pl.ds(r0, rt), :],
            sems.at[1, slot])

    in_dma(0, 0).start()

    def body(j, _):
        k = j // CHUNK
        pos = lax.rem(j, CHUNK)
        slot = lax.rem(k, 2)

        @pl.when(pos == 0)
        def _():
            in_dma(slot, k).wait()

            @pl.when(k + 1 < K)
            def _():
                in_dma(1 - slot, k + 1).start()

        blk = in_ring[slot, pos]
        jump = jnp.where(is_h, blk, 0.0)
        t_obs = jnp.sum(jnp.where(is_t, blk, 0.0), axis=1, keepdims=True)
        has = jnp.sum(jnp.where(is_has, blk, 0.0), axis=1, keepdims=True)
        x_obs = jnp.sum(jnp.where(is_x, blk, 0.0), axis=1, keepdims=True)

        # post-select carry (the reset)
        h_post = has * jump + (1.0 - has) * h_s[:]
        t_post = has * t_obs + (1.0 - has) * t_s[:]
        x_post = has * x_obs + (1.0 - has) * x_s[:]

        # arrive block: PRE-select h, POST-select t/x in the spare lanes
        # (the backward reconstructs the cell from this block + the stream)
        @pl.when(jnp.logical_and(pos == 0, j >= 2 * CHUNK))
        def _():
            out_dma(slot, k - 2).wait()
        out_ring[slot, pos] = jnp.where(
            is_t, t_post, jnp.where(is_x, x_post, h_s[:]))

        @pl.when(pos == CHUNK - 1)
        def _():
            out_dma(slot, k).start()

        pre = jnp.dot(_SCALE[scale](h_post), w1h,
                      preferred_element_type=jnp.float32)
        pre = pre + x_post * w1x + t_post * w1t + cvec
        hid = _ACT[act](pre)
        h_s[:] = h_post + dt * (
            jnp.dot(hid, w2, preferred_element_type=jnp.float32) + b2)
        t_s[:] = t_post + dt
        x_s[:] = x_post
        return 0

    lax.fori_loop(0, n_cells, body, 0)
    if n_cells % CHUNK:
        out_dma((K - 1) % 2, K - 1).start()
    for kk in range(max(0, K - 2), K):
        out_dma(kk % 2, kk).wait()
    hL_ref[:] = h_s[:]


# --------------------------------------------------------------------------
# backward kernel: reverse walk, residual = forward arrive stream
# --------------------------------------------------------------------------

def _bwd_kernel(ghL_ref, w1h_ref, w1hT_ref, w1x_ref, w1t_ref, cvec_ref,
                w2T_ref, stream_ref, arr_ref, ctarr_ref,
                ctj_ref, gpre_sum_ref, acct_ref, accx_ref, gdh_sum_ref,
                dw1h_ref, dw2_ref,
                gh_s, gpre_s, acct_s, accx_s, gdh_s, dw1h_s, dw2_s,
                ringA, ringO, ringC, ringJ, sems,
                *, dt: float, n_cells: int, act: str, scale: str,
                rt: int, d_h: int):
    r = pl.program_id(0)
    n_r = pl.num_programs(0)
    r0 = r * rt

    gh_s[:] = ghL_ref[:]
    gpre_s[:] = jnp.zeros_like(gpre_s)
    acct_s[:] = jnp.zeros_like(acct_s)
    accx_s[:] = jnp.zeros_like(accx_s)
    gdh_s[:] = jnp.zeros_like(gdh_s)
    # the tail chunk (n_cells % CHUNK) leaves some ring positions unwritten;
    # they are DMA'd to the padded cells >= n_cells of the cotangent stream,
    # whose true cotangent is zero (an endpoint observation CAN scatter into
    # cell M < M_pad, so garbage there would corrupt its jump cotangent)
    ringJ[:] = jnp.zeros_like(ringJ)

    @pl.when(r == 0)
    def _():
        dw1h_s[:] = jnp.zeros_like(dw1h_s)
        dw2_s[:] = jnp.zeros_like(dw2_s)

    w1h = w1h_ref[:]
    w1hT = w1hT_ref[:]
    w1x = w1x_ref[:]
    w1t = w1t_ref[:]
    cvec = cvec_ref[:]
    w2T = w2T_ref[:]

    lane = lax.broadcasted_iota(jnp.int32, gh_s.shape, 1)
    is_h = lane < d_h
    is_t = lane == d_h
    is_has = lane == d_h + 1
    is_x = lane == d_h + 2
    K = -(-n_cells // CHUNK)

    def dma_in(ring, sem_i, slot, k):
        return pltpu.make_async_copy(
            [stream_ref, arr_ref, ctarr_ref][ring]
            .at[pl.ds(k * CHUNK, CHUNK), pl.ds(r0, rt), :],
            [ringA, ringO, ringC][ring].at[slot], sems.at[sem_i, slot])

    def dma_out(slot, k):
        return pltpu.make_async_copy(
            ringJ.at[slot],
            ctj_ref.at[pl.ds(k * CHUNK, CHUNK), pl.ds(r0, rt), :],
            sems.at[3, slot])

    for ring in range(3):
        dma_in(ring, ring, (K - 1) % 2, K - 1).start()

    def body(i, _):
        j = n_cells - 1 - i
        k = j // CHUNK
        pos = lax.rem(j, CHUNK)
        slot = lax.rem(k, 2)
        first_of_chunk = jnp.logical_or(pos == CHUNK - 1, i == 0)

        @pl.when(first_of_chunk)
        def _():
            for ring in range(3):
                dma_in(ring, ring, slot, k).wait()

            @pl.when(k >= 1)
            def _():
                for ring in range(3):
                    dma_in(ring, ring, 1 - slot, k - 1).start()
            # the out ring's slot was used for chunk k+2 (descending order)
            @pl.when(k + 2 < K)
            def _():
                dma_out(slot, k + 2).wait()

        blkA = ringA[slot, pos]
        blkO = ringO[slot, pos]
        ct = ringC[slot, pos]

        jump = jnp.where(is_h, blkA, 0.0)
        has = jnp.sum(jnp.where(is_has, blkA, 0.0), axis=1, keepdims=True)
        a_j = jnp.where(is_h, blkO, 0.0)
        t_j = jnp.sum(jnp.where(is_t, blkO, 0.0), axis=1, keepdims=True)
        x_j = jnp.sum(jnp.where(is_x, blkO, 0.0), axis=1, keepdims=True)

        j_h = has * jump + (1.0 - has) * a_j        # post-select state
        j_sc = _SCALE[scale](j_h)
        pre = jnp.dot(j_sc, w1h, preferred_element_type=jnp.float32)
        pre = pre + x_j * w1x + t_j * w1t + cvec
        hid = _ACT[act](pre)

        g_dh = dt * gh_s[:]
        g_hid = jnp.dot(g_dh, w2T, preferred_element_type=jnp.float32)
        g_pre = g_hid * _ACT_GRAD[act](pre)

        dw2_s[:] += lax.dot_general(
            hid, g_dh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # hid^T @ g_dh
        dw1h_s[:] += lax.dot_general(
            j_sc, g_pre, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # scale(j)^T @ g_pre
        gpre_s[:] += g_pre
        acct_s[:] += t_j * g_pre
        accx_s[:] += x_j * g_pre
        gdh_s[:] += g_dh

        g_back = jnp.dot(g_pre, w1hT, preferred_element_type=jnp.float32)
        g_j = gh_s[:] + g_back * _SCALE_GRAD[scale](j_h)

        ringJ[slot, pos] = jnp.where(is_h, has * g_j, 0.0)

        @pl.when(pos == 0)
        def _():
            dma_out(slot, k).start()

        gh_s[:] = (1.0 - has) * g_j + jnp.where(is_h, ct, 0.0)
        return 0

    lax.fori_loop(0, n_cells, body, 0)
    for kk in range(min(2, K)):
        dma_out(kk % 2, kk).wait()

    gpre_sum_ref[:] = gpre_s[:]
    acct_ref[:] = acct_s[:]
    accx_ref[:] = accx_s[:]
    gdh_sum_ref[:] = gdh_s[:]

    @pl.when(r == n_r - 1)
    def _():
        dw1h_ref[:] = dw1h_s[:]
        dw2_ref[:] = dw2_s[:]


# --------------------------------------------------------------------------
# pallas_call wrappers (padded shapes)
# --------------------------------------------------------------------------

def _forward_call(stream, w1h, w1x_row, w1t_row, cvec, w2, b2_row,
                  d_h, dt, n_cells, act, scale, interpret):
    M_pad, R, Dp = stream.shape
    RT = _row_tile(R)
    n_r = R // RT
    row = lambda d: pl.BlockSpec((RT, d), lambda r: (r, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda r: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    arr, hL = pl.pallas_call(
        functools.partial(_fwd_kernel, dt=dt, n_cells=n_cells, act=act,
                          scale=scale, rt=RT, d_h=d_h),
        grid=(n_r,),
        in_specs=[hbm, full((Dp, Dp)), full((1, Dp)), full((1, Dp)),
                  full((1, Dp)), full((Dp, Dp)), full((1, Dp))],
        out_specs=[hbm, row(Dp)],
        out_shape=[jax.ShapeDtypeStruct((M_pad, R, Dp), jnp.float32),
                   jax.ShapeDtypeStruct((R, Dp), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((RT, Dp), jnp.float32),
                        pltpu.VMEM((RT, 1), jnp.float32),
                        pltpu.VMEM((RT, 1), jnp.float32),
                        pltpu.VMEM((2, CHUNK, RT, Dp), jnp.float32),
                        pltpu.VMEM((2, CHUNK, RT, Dp), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 2))],
        interpret=interpret,
    )(stream, w1h, w1x_row, w1t_row, cvec, w2, b2_row)
    return arr, hL


def _backward_call(ghL, stream, arr, ctarr, w1h, w1x_row, w1t_row, cvec, w2,
                   d_h, dt, n_cells, act, scale, interpret):
    M_pad, R, Dp = stream.shape
    RT = _row_tile(R)
    n_r = R // RT
    row = lambda d: pl.BlockSpec((RT, d), lambda r: (r, 0),
                                 memory_space=pltpu.VMEM)
    full = lambda s: pl.BlockSpec(s, lambda r: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, dt=dt, n_cells=n_cells, act=act,
                          scale=scale, rt=RT, d_h=d_h),
        grid=(n_r,),
        in_specs=[row(Dp), full((Dp, Dp)), full((Dp, Dp)), full((1, Dp)),
                  full((1, Dp)), full((1, Dp)), full((Dp, Dp)),
                  hbm, hbm, hbm],
        out_specs=[hbm, row(Dp), row(Dp), row(Dp), row(Dp),
                   full((Dp, Dp)), full((Dp, Dp))],
        out_shape=[jax.ShapeDtypeStruct((M_pad, R, Dp), jnp.float32),  # ct_jump
                   jax.ShapeDtypeStruct((R, Dp), jnp.float32),   # g_pre_sum
                   jax.ShapeDtypeStruct((R, Dp), jnp.float32),   # acc_t
                   jax.ShapeDtypeStruct((R, Dp), jnp.float32),   # acc_x
                   jax.ShapeDtypeStruct((R, Dp), jnp.float32),   # g_dh_sum
                   jax.ShapeDtypeStruct((Dp, Dp), jnp.float32),  # dW1_h
                   jax.ShapeDtypeStruct((Dp, Dp), jnp.float32)], # dW2
        scratch_shapes=[pltpu.VMEM((RT, Dp), jnp.float32),   # gh_s
                        pltpu.VMEM((RT, Dp), jnp.float32),   # gpre_s
                        pltpu.VMEM((RT, Dp), jnp.float32),   # acct_s
                        pltpu.VMEM((RT, Dp), jnp.float32),   # accx_s
                        pltpu.VMEM((RT, Dp), jnp.float32),   # gdh_s
                        pltpu.VMEM((Dp, Dp), jnp.float32),
                        pltpu.VMEM((Dp, Dp), jnp.float32),
                        pltpu.VMEM((2, CHUNK, RT, Dp), jnp.float32),
                        pltpu.VMEM((2, CHUNK, RT, Dp), jnp.float32),
                        pltpu.VMEM((2, CHUNK, RT, Dp), jnp.float32),
                        pltpu.VMEM((2, CHUNK, RT, Dp), jnp.float32),
                        pltpu.SemaphoreType.DMA((4, 2))],
        interpret=interpret,
    )(ghL, w1h, jnp.swapaxes(w1h, 0, 1), w1x_row, w1t_row, cvec,
      jnp.swapaxes(w2, 0, 1), stream, arr, ctarr)
    return outs


# --------------------------------------------------------------------------
# custom-vjp op (padded logical arrays)
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _walk_scan(stream, w1h, w1x_row, w1t_row, cvec, w2, b2_row,
               d_h, dt, n_cells, act, scale, interpret):
    """Fused grid walk.  Returns (arrive_stream, h_final); the arrive
    stream's cell g holds the pre-reset state on arrival at t = g*dt (plus
    the post-reset t/x in spare lanes), h_final the state at t = M*dt."""
    return _forward_call(stream, w1h, w1x_row, w1t_row, cvec, w2, b2_row,
                         d_h, dt, n_cells, act, scale, interpret)


def _walk_scan_fwd(stream, w1h, w1x_row, w1t_row, cvec, w2, b2_row,
                   d_h, dt, n_cells, act, scale, interpret):
    arr, hL = _forward_call(stream, w1h, w1x_row, w1t_row, cvec, w2, b2_row,
                            d_h, dt, n_cells, act, scale, interpret)
    return (arr, hL), (stream, arr, w1h, w1x_row, w1t_row, cvec, w2)


def _walk_scan_bwd(d_h, dt, n_cells, act, scale, interpret, resids, g):
    ct_arr, ct_hL = g
    stream, arr, w1h, w1x_row, w1t_row, cvec, w2 = resids
    (ct_jump, gpre_sum, acct, accx, gdh_sum, dw1h, dw2) = _backward_call(
        ct_hL, stream, arr, ct_arr, w1h, w1x_row, w1t_row, cvec, w2,
        d_h, dt, n_cells, act, scale, interpret)
    g_w1x = jnp.sum(accx, axis=0, keepdims=True)
    g_w1t = jnp.sum(acct, axis=0, keepdims=True)
    g_cvec = jnp.sum(gpre_sum, axis=0, keepdims=True)
    g_b2 = jnp.sum(gdh_sum, axis=0, keepdims=True)
    return (ct_jump, dw1h, g_w1x, g_w1t, g_cvec, dw2, g_b2)


_walk_scan.defvjp(_walk_scan_fwd, _walk_scan_bwd)


# --------------------------------------------------------------------------
# model-facing wrapper
# --------------------------------------------------------------------------

def walk_gaps_fused(ode_layers, h_jump, x_scaled, times, mask, g_idx,
                    dt_ode_step: float, n_cells: int,
                    act_name: str, scale_name: str,
                    interpret: bool = False):
    """Fused time-major walk for all K_h moment networks.

    Semantics identical to NeuralJumpODE._integrate_gaps_grid (which is the
    exact-arithmetic equal of the per-gap loops on an aligned grid).

    Args:
      ode_layers: the 2 ODEFunc layer dicts (leading K_h axis when stacked).
      h_jump:   (K_h, B, N, d_h) after-jump states at every slot.
      x_scaled: (B, N, 1) input-scaled observations (d_x == 1).
      times:    (B, N) observation times.
      mask:     (B, N) slot validity or None.
      g_idx:    (B, N) int32 grid cell of each slot (clipped to [0, M]).
      n_cells:  M, the number of dt-cells covering [0, t_max].

    Returns: (K_h, B*(N-1), d_h) pre-jump states at slots 1..N-1.
    """
    K_h, B, N, d_h = h_jump.shape
    dt = float(dt_ode_step)
    M = int(n_cells)
    M_pad = _cells_padded(M)
    Dp = _round_up(d_h + 3, LANES)
    RT = _row_tile(B)
    R_p = -(-B // RT) * RT

    has_f = (jnp.ones((B, N), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
    # padded slots scatter into a dump cell past the kernel's M_pad window
    slot_g = jnp.where(has_f > 0, jnp.clip(g_idx, 0, M), M_pad + 1)
    rows_b = jnp.arange(B)[:, None]

    def layer_k(i, k):
        lw, lb = ode_layers[i]["w"], ode_layers[i]["b"]
        return (lw[k], lb[k]) if lw.ndim == 3 else (lw, lb)

    outs = []
    for k in range(K_h):
        w1, b1 = layer_k(0, k)
        w2, b2 = layer_k(1, k)
        w1h = jnp.pad(w1[:d_h], ((0, Dp - d_h), (0, Dp - d_h)))
        w1x_row = jnp.pad(w1[d_h], (0, Dp - d_h)).reshape(1, Dp)
        w1t_row = jnp.pad(w1[d_h + 1], (0, Dp - d_h)).reshape(1, Dp)
        # cell-invariant pre-activation part: the full-step t_elapsed = dt
        # feature and the bias (differentiable XLA; cotangents flow back
        # through this expression to w1_dt / b1 automatically)
        cvec = jnp.pad(dt * w1[d_h + 2] + b1, (0, Dp - d_h)).reshape(1, Dp)
        w2_p = jnp.pad(w2, ((0, Dp - d_h), (0, Dp - d_h)))
        b2_row = jnp.pad(b2, (0, Dp - d_h)).reshape(1, Dp)

        # packed slot blocks -> scattered to their grid cells (stream)
        slot_blk = jnp.concatenate([
            h_jump[k],                                   # lanes [0:d_h]
            times[..., None].astype(jnp.float32),        # lane d_h
            has_f[..., None],                            # lane d_h+1
            x_scaled.astype(jnp.float32),                # lane d_h+2
            jnp.zeros((B, N, Dp - d_h - 3), jnp.float32),
        ], axis=-1)
        stream = (jnp.zeros((M_pad + 2, R_p, Dp), jnp.float32)
                  .at[slot_g, rows_b].set(slot_blk)[:M_pad])

        arr, hL = _walk_scan(stream, w1h, w1x_row, w1t_row, cvec, w2_p,
                             b2_row, d_h, dt, M, act_name, scale_name,
                             interpret)
        # pre-jump state at slot i = arrival at its cell (cell M = h_final)
        arr_all = jnp.concatenate([arr[:M], hL[None]], axis=0)  # (M+1, R_p, Dp)
        idx = jnp.clip(g_idx[:, 1:], 0, M)                      # (B, S)
        picked = arr_all[idx, rows_b]                           # (B, S, Dp)
        outs.append(picked[..., :d_h].reshape(B * (N - 1), d_h))
    return jnp.stack(outs, axis=0)
