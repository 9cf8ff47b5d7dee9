"""Roofline decomposition of the whole-run WALK-train kernel step (r5).

VERDICT r4 weak-#1: the 0.044 ms production marginal step (ops/walk_train.py,
BENCH_NOTES.md r4a) had no floor analysis.  This probe derives the two
component floors ANALYTICALLY from the kernel structure — every matmul and
every per-cell VPU select chain is enumerated below, line-referenced to
ops/walk_train.py — and compares the compound floor to the measured step.

Floors (v5e, same conventions as BENCH_NOTES r3d):
  * MXU: padded-matmul FLOPs / peak (197 TF bf16, 49 TF f32 = peak/4).
  * VPU: per-cell select/elementwise op count x ceil(RT*128 / 4096) cycles
    (8x128 vector unit, 4 ALUs) at 0.94 GHz.  The walk's reset/capture/
    cotangent-routing selects are N-slot chains per cell in BOTH walk
    directions (ops/walk_train.py walk_cell / back_cell) and cannot ride
    the MXU.

Matmul inventory per minibatch step (rows x 128 x 128 each; RT = packed
rows = batch / n_halves, N = slots, M = grid cells, nh = halves):
    jump fwd        N*RT          (HJ_pre = A1 @ J2)
    walk fwd        2*M*RT        (W1eff, W2eff per cell)
    readout fwd     (2N-1)*RT     (U_pre = IN_O1 @ O1)
    readout bwd     2*(2N-1)*RT   (outer + mmT)
    walk bwd        4*M*RT        (2 outers + 2 mmTs per cell)
    jump bwd        2*N*RT        (outer + mmT)
    sym_w           8*128 if nh==2 else 0   (P @ (g @ P) x 4 planes)
    [chunked ring adds 2*M*RT recompute rows when ck < M]

Usage:
  python scripts/walk_train_roofline.py [--hidden 50] [--batch 128]
      [--n-slots 10] [--cells 100] [--measured-f32-us 44]
      [--measured-bf16-us 24] [--ck 0]
"""

from __future__ import annotations

import argparse


def n_halves(hidden_dim: int) -> int:
    return 2 if hidden_dim + 3 <= 64 else 1


def walk_train_floors(hidden: int, batch: int, n_slots: int, cells: int,
                      ck: int = 0):
    """Return (padded_gflop, f32_floor_us, bf16_floor_us, vpu_floor_us,
    rows) for one walk-train minibatch step."""
    nh = n_halves(hidden)
    rt = batch // nh
    N, M = n_slots, cells
    recompute = 2 * M * rt if (ck and ck < M) else 0
    rows = (N * rt + 2 * M * rt + (2 * N - 1) * rt + 2 * (2 * N - 1) * rt
            + 4 * M * rt + 2 * N * rt + (8 * 128 if nh == 2 else 0)
            + recompute)
    flops = 2.0 * rows * 128 * 128
    f32_us = flops / 49e12 * 1e6
    bf16_us = flops / 197e12 * 1e6
    # VPU select/elementwise chains per cell (walk_cell ~3N+6 ops,
    # back_cell ~4N+10 ops on (RT, 128) blocks), plus the recompute pass
    # repeating the forward chain when chunked.
    ops_per_cell = (3 * N + 6) + (4 * N + 10) + ((3 * N + 6) if recompute
                                                 else 0)
    cycles_per_op = -(-rt * 128 // 4096)
    vpu_us = M * ops_per_cell * cycles_per_op / 0.94e3
    return flops / 1e9, f32_us, bf16_us, vpu_us, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hidden", type=int, default=50)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n-slots", type=int, default=10)
    ap.add_argument("--cells", type=int, default=100)
    ap.add_argument("--ck", type=int, default=0,
                    help="residual ring chunk (0 = direct layout)")
    ap.add_argument("--measured-f32-us", type=float, default=None)
    ap.add_argument("--measured-bf16-us", type=float, default=None)
    args = ap.parse_args()

    gflop, f32_us, bf16_us, vpu_us, rows = walk_train_floors(
        args.hidden, args.batch, args.n_slots, args.cells, args.ck)
    nh = n_halves(args.hidden)
    print(f"config: H={args.hidden} B={args.batch} (nh={nh}, "
          f"RT={args.batch // nh}) N={args.n_slots} M={args.cells}"
          + (f" ck={args.ck}" if args.ck else ""))
    print(f"padded matmul rows/step: {rows}  ->  {gflop:.3f} GFLOP/step")
    print(f"MXU floor:  f32 {f32_us:.1f} us   bf16 {bf16_us:.1f} us")
    print(f"VPU select floor (cannot ride MXU): {vpu_us:.1f} us")
    print(f"compound floor (no overlap): f32 {f32_us + vpu_us:.1f} us   "
          f"bf16 {bf16_us + vpu_us:.1f} us")
    for name, meas, floor in (("f32", args.measured_f32_us, f32_us + vpu_us),
                              ("bf16", args.measured_bf16_us,
                               bf16_us + vpu_us)):
        if meas is not None:
            print(f"measured {name}: {meas:.1f} us = {meas / floor:.2f}x "
                  f"the compound floor")


if __name__ == "__main__":
    main()
