"""Benchmark: default Black-Scholes recipe throughput + accuracy vs analytic.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Design for the tunneled-TPU environment: every distinct XLA program costs
seconds to minutes of compile RPC, so the WHOLE benchmark train run — fresh
on-device path generation, shuffling, minibatched Adam steps, all epochs —
is a single jitted program (lax.scan over epochs of lax.scan over
minibatches).  Compile time is measured separately via AOT lower/compile and
excluded from the throughput measurement (steady-state trajectories/sec/chip,
the driver's BASELINE.json metric).

Baseline: the PyTorch reference running the identical recipe
(experiments/experiment_black_scholes.py defaults: n_train=1000,
batch_size=128, hidden 32, 2 moments, fresh data per epoch) on this host's
CPU.  Measured with the reference's own epoch timer; override with
NJODE_BASELINE_TRAJ_PER_SEC.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Reference PyTorch-CPU throughput on this machine (trajectories/sec),
# measured from /root/reference experiment_black_scholes.py epoch times
# (n_train=1000 incl. per-epoch data generation). See BENCH_NOTES.md.
DEFAULT_BASELINE_TRAJ_PER_SEC = 45.4


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="tiny run for smoke-testing the benchmark itself")
    ap.add_argument("--n-train", type=int, default=1000)
    ap.add_argument("--n-val", type=int, default=200)
    ap.add_argument("--n-epochs", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--hidden-dim", type=int, default=32)
    ap.add_argument("--obs-fraction", type=float, default=0.1)
    ap.add_argument("--n-steps", type=int, default=100,
                    help="simulation grid resolution")
    ap.add_argument("--process", type=str, default="black_scholes",
                    choices=["black_scholes", "ornstein_uhlenbeck",
                             "heston", "hybrid_ou_bs", "black_scholes_nd",
                             "ornstein_uhlenbeck_nd"],
                    help="process family to benchmark")
    ap.add_argument("--dims", type=int, default=2,
                    help="coordinate count for the _nd process families "
                         "(model input_dim = output_dim = dims)")
    ap.add_argument("--dt-ode-step", type=float, default=None,
                    help="fixed Euler substep (production scripts use 0.01)")
    ap.add_argument("--shared-network", action="store_true")
    ap.add_argument("--scaled", action="store_true",
                    help="scaled sweep config: 100k trajectories, "
                         "obs_fraction=0.02, hidden_dim=256")
    ap.add_argument("--ode-solver", type=str, default="euler",
                    choices=["euler", "heun", "rk4"],
                    help="latent-ODE integrator")
    ap.add_argument("--compute-dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="mixed-precision matmul dtype (params stay f32); "
                         "bfloat16 pays off at hidden-dim >= 256")
    ap.add_argument("--obs-only", type=str, default="auto",
                    choices=["auto", "on", "off"],
                    help="sample values exactly at the observation times "
                         "instead of simulating the whole grid (BS/OU have "
                         "exact transition laws, so the training-data "
                         "distribution is identical); auto enables it for "
                         "those processes")
    ap.add_argument("--grid-walk", type=str, default="auto",
                    choices=["auto", "on", "off"],
                    help="integrate all --dt-ode-step gaps with ONE "
                         "time-major walk over the integration grid "
                         "(~n_slots x fewer ODE evals, exact-arithmetic-"
                         "identical; needs grid-aligned times); auto = "
                         "on when the fused walk kernel carries it "
                         "(TPU, eligible config — 2.3x on the production "
                         "step, BENCH_NOTES.md r3h)")
    ap.add_argument("--pallas", action="store_true",
                    help="FORCE the Pallas kernels on (use_pallas=True) for "
                         "A/B experiments; the default pure-XLA path "
                         "measures faster for whole training programs, and "
                         "'auto' only engages kernels on inference paths "
                         "(BENCH_NOTES.md)")
    ap.add_argument("--pallas-train", action="store_true",
                    help="run the ENTIRE training loop as one Pallas "
                         "program (ops/train_kernel.py): params + Adam "
                         "state live in VMEM across all minibatch steps, "
                         "the loss gradient is computed in closed form "
                         "in-kernel; targets the dispatch-bound default "
                         "recipe")
    ap.add_argument("--pallas-step", action="store_true",
                    help="use the fused whole-step kernel "
                         "(ops/fused_step.py) for the training forward/"
                         "backward — measured 1.5x on the scaled config's "
                         "marginal step (BENCH_NOTES.md r3)")
    ap.add_argument("--no-pallas", action="store_true",
                    help="disable kernel auto-selection (--scaled defaults "
                         "to the fused-step kernel on eligible configs; "
                         "other recipes default to pure XLA)")
    ap.add_argument("--train-kernel-mxu", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="matmul operand precision inside the whole-run "
                         "training kernels (f32 accumulation); bfloat16 "
                         "measured 12.9x the composed production step "
                         "(BENCH_NOTES.md r4a)")
    ap.add_argument("--no-pallas-train", action="store_true",
                    help="veto ONLY the whole-run training kernel's auto-"
                         "engagement (keeps the walk/step kernels' auto "
                         "policy) — the composed arm for A/B runs against "
                         "--pallas-train")
    args = ap.parse_args()
    def default_to(name, value):
        """Apply a preset value only when the flag wasn't given explicitly."""
        if getattr(args, name) == ap.get_default(name):
            setattr(args, name, value)

    if args.quick:
        default_to("n_train", 128)
        default_to("n_val", 64)
        default_to("n_epochs", 10)
    if args.scaled:
        default_to("n_train", 100_000)
        default_to("n_val", 5000)
        default_to("hidden_dim", 256)
        default_to("obs_fraction", 0.02)
        default_to("batch_size", 4096)
        default_to("n_epochs", 50)
        # the shipped scaled recipe (run_scaled_sweep.sh) trains with the
        # fused-step kernel (7.50M vs 6.12M traj/s XLA-f32, BENCH_NOTES.md
        # r3); shared-network configs measured FASTER on XLA and keep it.
        # Ineligible configs fall back to XLA inside the model (no error).
        if not (args.shared_network or args.no_pallas or args.pallas):
            args.pallas_step = True

    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from njode_tpu import NeuralJumpODE
    from njode_tpu.models import nj_ode_loss_dense
    from njode_tpu.simulation import simulate_batch, supports_obs_only
    from njode_tpu.simulation.moments import moments_at_obs
    from njode_tpu.utils import make_adam

    obs_only = (args.obs_only == "on"
                or (args.obs_only == "auto" and supports_obs_only(args.process)))

    from njode_tpu.utils.backend import ensure_backend
    devices = ensure_backend()
    platform = devices[0].platform
    log(f"bench: platform={platform} devices={len(devices)}")

    # ---- recipe parameters per process family (reference CLI defaults) ----
    PROCESS_PARAMS = {
        "black_scholes": dict(mu=0.1, sigma=0.5, x0=1.0),
        "ornstein_uhlenbeck": dict(theta=1.0, mu=0.5, sigma=0.3, x0=0.0),
        "heston": dict(mu=0.5, kappa=2.0, theta=0.04, xi=0.5, rho=-0.5,
                       x0=1.0, v0=0.04),
        "hybrid_ou_bs": dict(theta_ou=1.0, mu_ou=0.5, sigma_ou=0.3,
                             mu_bs=0.1, sigma_bs=0.2, x0=1.0),
        "black_scholes_nd": dict(mu=0.1, sigma=0.5, dims=args.dims),
        "ornstein_uhlenbeck_nd": dict(theta=1.0, mu=0.5, sigma=0.3,
                                      dims=args.dims),
    }
    P = dict(T=1.0, n_steps=args.n_steps, **PROCESS_PARAMS[args.process])
    d_xy = P.get("dims", 1)   # model input_dim = output_dim per coordinate
    WEIGHTS = [1.0, 10.0]
    # kernel policy for the model: explicit force flags win; otherwise
    # 'auto' (measured-win regimes only: the fused walk kernel for aligned
    # --dt-ode-step recipes, the fused-step kernel at hidden >= 192 —
    # identical to pure XLA everywhere else)
    use_pallas = ("step" if args.pallas_step else True if args.pallas
                  else False if args.no_pallas else "auto")
    from njode_tpu.utils.training import _use_grid_walk
    grid_walk = _use_grid_walk(
        {"grid_walk": args.grid_walk, "dt_ode_step": args.dt_ode_step,
         "ode_solver": args.ode_solver, "hidden_dim": args.hidden_dim,
         "shared_network": args.shared_network,
         "compute_dtype": args.compute_dtype,
         "data": {"T": P["T"], "n_steps": args.n_steps}},
        platform=platform, single_device=True, use_pallas_cfg=use_pallas)
    model = NeuralJumpODE(input_dim=d_xy, hidden_dim=args.hidden_dim,
                          output_dim=d_xy, num_moments=2, n_hidden_layers=1,
                          activation="relu", variance_method="direct",
                          t_max=P["T"], dt_ode_step=args.dt_ode_step,
                          shared_network=args.shared_network,
                          use_pallas=use_pallas,
                          compute_dtype=args.compute_dtype,
                          ode_solver=args.ode_solver, grid_walk=grid_walk)
    tx = make_adam(1e-3, 5e-4)

    n, bs, E = args.n_train, args.batch_size, args.n_epochs
    nb = -(-n // bs)
    n_pad = nb * bs

    def epoch_body(carry, e):
        params, opt_state, key = carry
        k_data, k_perm = jax.random.split(jax.random.fold_in(key, e))
        batch = simulate_batch(k_data, n, args.process, args.obs_fraction,
                               obs_only=obs_only, **P)
        times, values, mask = batch.times, batch.values, batch.mask
        perm = jax.random.permutation(k_perm, n)
        idx = jnp.concatenate(
            [perm, jnp.zeros((n_pad - n,), perm.dtype)]).reshape(nb, bs)
        valid = (jnp.arange(n_pad) < n).reshape(nb, bs)

        def mb_step(c, x):
            p, s = c
            ids, vm = x

            def loss_fn(pp):
                # apply_loss routes eligible configs through the lane-space
                # fused loss (r5i: 1.18-1.46x the scaled training step) and
                # composes apply + nj_ode_loss_dense everywhere else
                return model.apply_loss(pp, times[ids], values[ids],
                                        mask[ids],
                                        ignore_first_continuity=True,
                                        moment_weights=WEIGHTS,
                                        traj_mask=vm)

            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s = tx.update(g, s, p)
            return (optax.apply_updates(p, updates), s), loss

        (params, opt_state), losses = lax.scan(mb_step, (params, opt_state),
                                               (idx, valid))
        return (params, opt_state, key), jnp.mean(losses)

    def train_all(params, opt_state, key):
        (params, opt_state, _), losses = lax.scan(
            epoch_body, (params, opt_state, key), jnp.arange(E))
        return params, opt_state, losses

    # the whole-run training kernel is the measured-fastest path for the
    # default-recipe shapes (BENCH_NOTES.md r3b: 2.69M vs 2.28M traj/s
    # same-run) and — via its production twin, the whole-run WALK-train
    # kernel (ops/walk_train.py, 7.0x the composed step, BENCH_NOTES.md
    # r4a) — for --dt-ode-step recipes too; default it on for eligible
    # TPU configs, exactly like --scaled defaults to the fused-step kernel.
    # ONE eligibility predicate per twin, shared between the auto-engage
    # decision and the explicit --pallas-train check (a constraint edited
    # in only one copy silently diverges them).  The bench model is fixed
    # at d_x=d_y=1, one hidden layer, relu, identity scaling, no dropout.
    from njode_tpu.ops.train_kernel import (LANES, batch_size_ok,
                                            train_kernel_available)
    from njode_tpu.ops.walk_train import (walk_train_available,
                                          walk_train_shapes_ok)
    kernel_twin = "walk" if args.dt_ode_step is not None else "run"
    M_cells = (int(round(P["T"] / args.dt_ode_step))
               if args.dt_ode_step else 0)
    if kernel_twin == "walk":
        # grid_walk carries the alignment promise the kernel integrates on
        kernel_cfg_ok = (walk_train_available(
            args.shared_network, d_xy, d_xy, 1, "relu", 0.0, "identity",
            args.dt_ode_step, args.ode_solver)
            and args.compute_dtype == "float32" and grid_walk)
    else:
        kernel_cfg_ok = (train_kernel_available(
            args.shared_network, d_xy, d_xy, 1, "relu", 0.0, "identity",
            args.dt_ode_step, args.ode_solver)
            and args.compute_dtype == "float32"
            and args.hidden_dim <= LANES and batch_size_ok(bs))

    auto_train_kernel = False
    if (platform == "tpu" and kernel_cfg_ok and not args.pallas_train
            and not args.pallas and not args.pallas_step
            and not args.no_pallas and not args.no_pallas_train):
        args.pallas_train = auto_train_kernel = True

    if args.pallas_train and platform != "tpu":
        # the kernel is Mosaic-only and bench reports real timings — the
        # interpreter would be both broken-slow and dishonest here (the
        # Trainer CLI path is where the interpreter fallback lives)
        raise SystemExit("--pallas-train: requires a real TPU backend "
                         f"(running on {platform})")

    if args.pallas_train:
        N_slots = int(simulate_batch(jax.random.PRNGKey(0), 1, args.process,
                                     args.obs_fraction, obs_only=obs_only,
                                     **P).times.shape[1])
        if kernel_twin == "walk":
            eligible = kernel_cfg_ok and walk_train_shapes_ok(
                args.hidden_dim, bs, N_slots, M_cells)
            not_eligible_msg = (
                "--pallas-train with --dt-ode-step routes to the walk-train "
                "kernel: config not eligible (needs --shared-network, "
                "grid-aligned observation times, euler/heun/rk4, "
                "f(0)=0 activation, "
                "float32, hidden_dim + 3 <= 128/halves, batch a multiple "
                "of 8*halves and <= 256 with cells*rows in the VMEM "
                "residual budget, obs slots <= 63)")
        else:
            eligible = kernel_cfg_ok and (2 * N_slots + 1 <= LANES)
            not_eligible_msg = (
                "--pallas-train: config not eligible (needs separate "
                "networks, no --dt-ode-step, euler, f(0)=0 activation, "
                "float32, hidden_dim <= 128, obs slots <= 63, "
                "batch size a multiple of 8 and <= 256)")
        if not eligible:
            if not auto_train_kernel:
                raise SystemExit(not_eligible_msg)
            args.pallas_train = False
        else:
            log(f"bench: whole-run {'walk-' if kernel_twin == 'walk' else ''}"
                f"training kernel engaged "
                f"({'auto' if auto_train_kernel else 'explicit'})")

    if args.pallas_train:
        # the whole-run training kernel (or its --dt-ode-step walk twin):
        # identical recipe (fresh data per epoch, shuffled minibatches,
        # traj-masked final minibatch, Adam 1e-3/5e-4), but every minibatch
        # step executes inside ONE Pallas program — semantics pinned vs the
        # optax loop in tests/test_train_kernel.py / tests/test_walk_train.py
        from njode_tpu.ops.train_kernel import pack_minibatches
        if kernel_twin == "walk":
            from njode_tpu.ops.walk_train import (fused_walk_train_run,
                                                  init_walk_state,
                                                  unpack_walk_params)
        else:
            from njode_tpu.ops.train_kernel import (fused_train_run,
                                                    init_train_state,
                                                    train_state_params)

        def train_all(params, opt_state, key):  # noqa: F811
            def epoch_data(e):
                k_data, _ = jax.random.split(jax.random.fold_in(key, e))
                batch = simulate_batch(k_data, n, args.process,
                                       args.obs_fraction, obs_only=obs_only,
                                       **P)
                # no shuffle permutation here: every epoch's rows are FRESH
                # iid draws, and a random permutation of iid rows is the
                # identity in distribution — the minibatch-gradient law is
                # unchanged, and dropping it removes two row-gathers per
                # epoch (the Trainer CLI path keeps the exact reference
                # shuffle stream; this is the fused whole-run recipe only)
                pad = jnp.zeros((n_pad - n, batch.times.shape[1]),
                                batch.times.dtype)
                vpad = jnp.zeros((n_pad - n,) + batch.values.shape[1:],
                                 batch.values.dtype)
                return (jnp.concatenate([batch.times, pad]),
                        jnp.concatenate([batch.values, vpad]),
                        jnp.arange(n_pad) < n)

            ts, vs, valid = jax.vmap(epoch_data)(jnp.arange(E))
            data = pack_minibatches(ts.reshape(E * n_pad, N_slots),
                                    vs.reshape(E * n_pad, N_slots, 1),
                                    valid.reshape(E * n_pad), bs)
            if kernel_twin == "walk":
                st = init_walk_state(params, num_moments=2,
                                     hidden_dim=args.hidden_dim)
                st, step_losses = fused_walk_train_run(
                    st, data, n_slots=N_slots, num_moments=2, batch_size=bs,
                    hidden_dim=args.hidden_dim,
                    dt_ode_step=args.dt_ode_step, max_substeps=M_cells,
                    lr=1e-3, weight_decay=5e-4, moment_weights=WEIGHTS,
                    mxu_dtype=args.train_kernel_mxu,
                    ode_solver=args.ode_solver)
                params = unpack_walk_params(st[0], st[1], num_moments=2,
                                            hidden_dim=args.hidden_dim)
            else:
                st = init_train_state(params, num_moments=2,
                                      hidden_dim=args.hidden_dim)
                st, step_losses = fused_train_run(
                    st, data, n_slots=N_slots, num_moments=2, batch_size=bs,
                    lr=1e-3, weight_decay=5e-4, moment_weights=WEIGHTS,
                    mxu_dtype=args.train_kernel_mxu)
                params = train_state_params(st, num_moments=2,
                                            hidden_dim=args.hidden_dim)
            return params, opt_state, step_losses.reshape(E, nb).mean(axis=1)

    params = model.init(jax.random.PRNGKey(0))
    opt_state = tx.init(params)
    # a fresh nonce per invocation: the remote execution service memoizes
    # (program, inputs) pairs across processes, so timing a previously-seen
    # input tuple measures the cache, not the device.
    nonce = int.from_bytes(os.urandom(4), "little")
    key = jax.random.fold_in(jax.random.PRNGKey(42), nonce)
    log(f"bench: data-key nonce {nonce}")

    # ---- compile (excluded from throughput) ----
    t0 = time.perf_counter()
    compiled = jax.jit(train_all).lower(params, opt_state, key).compile()
    compile_s = time.perf_counter() - t0
    log(f"bench: compile {compile_s:.1f}s")

    # ---- timed run: full recipe, fresh data every epoch, on device ----
    # NOTE: materialize losses to host inside the timed region — on the
    # tunneled axon backend block_until_ready returns before the remote
    # execute completes, so a device->host copy is the reliable fence.
    # The first execute is an UNTIMED warmup: on tunneled backends the first
    # heavy RPC of a process pays a large one-off transport/init cost that
    # has nothing to do with device throughput.
    import numpy as np
    t0 = time.perf_counter()
    _, _, w_losses = compiled(params, opt_state, jax.random.fold_in(key, 999))
    np.asarray(w_losses)
    warmup_s = time.perf_counter() - t0
    log(f"bench: warmup run {warmup_s:.1f}s")

    # best-of-3 timed runs (distinct fresh keys): residual transport jitter
    # through the tunnel is one-sided, so the min is the device time.
    times = []
    trained = None
    for rep in range(3):
        k_rep = jax.random.fold_in(key, rep)
        t0 = time.perf_counter()
        trained, _, losses = compiled(params, opt_state, k_rep)
        losses = np.asarray(losses)
        times.append(time.perf_counter() - t0)
    params = trained  # accuracy metrics evaluate the trained model
    train_s = min(times)
    log(f"bench: timed runs {[f'{t:.3f}' for t in times]}s (min taken)")
    traj_per_sec = n * E / train_s
    log(f"bench: {E} epochs x {n} traj in {train_s:.3f}s "
        f"({traj_per_sec:,.0f} traj/s), final loss "
        f"{float(losses[-1]):.4f}")

    # ---- accuracy: val MSE vs closed-form conditional moments ----
    @jax.jit
    def val_metrics(params, key):
        vb = simulate_batch(key, args.n_val, args.process, args.obs_fraction, **P)
        preds, preds_before = model.apply(params, vb.times, vb.values, vb.mask)
        # hybrid with random switch times: use the recorded per-path switch
        # times for EXACT truths (the reference can only zero-fill here,
        # making its "relative loss" metric meaningless for this process)
        yt, ytb = moments_at_obs(vb.times, vb.values, args.process,
                                 num_moments=2, variance_method="direct",
                                 switch_times=vb.switch_times,
                                 **P)
        # conditional-mean MSE on the predictive (before-jump) side,
        # excluding slot 0 where the truth is defined as the observation
        mse_mean = jnp.mean((preds_before[:, 1:, :, 0] - ytb[:, 1:, :, 0]) ** 2)
        var_pred = preds_before[:, 1:, :, 1] ** 2  # direct: V = W^2
        mse_var = jnp.mean((var_pred - ytb[:, 1:, :, 1]) ** 2)
        L_model = nj_ode_loss_dense(vb.values, preds, preds_before, vb.mask,
                                    moment_weights=WEIGHTS)
        L_true = nj_ode_loss_dense(vb.values, yt, ytb, vb.mask,
                                   moment_weights=WEIGHTS)
        return mse_mean, mse_var, (L_model - L_true) / jnp.maximum(L_true, 1e-8)

    mse_mean, mse_var, rel = val_metrics(params, jax.random.PRNGKey(7))
    mse_mean, mse_var, rel = float(mse_mean), float(mse_var), float(rel)
    log(f"bench: val MSE mean={mse_mean:.2e} var={mse_var:.2e} "
        f"relative_loss={rel:.4f}")

    # ---- MFU: logical model FLOPs through the timed region / peak ----
    # Counts matmul multiply-adds (x2) of the model's forward pass at the
    # LOGICAL shapes (no lane padding), backward = 2x forward (the standard
    # convention), Adam/datagen/loss excluded.  Peak = 197 TF (v5e bf16) —
    # the same denominator every BENCH_NOTES MFU row uses, so f32 arms read
    # as a fraction of the hardware's canonical peak, not of an f32 roof.
    H, K, d_x = args.hidden_dim, 2, d_xy
    N_s = int(simulate_batch(jax.random.PRNGKey(0), 1, args.process,
                             args.obs_fraction, obs_only=obs_only,
                             **P).times.shape[1])
    S_gaps = N_s - 1
    substeps = (int(round(P["T"] / args.dt_ode_step)) if args.dt_ode_step
                else S_gaps)
    nets = 1 if args.shared_network else K
    out_cols = K * d_xy if args.shared_network else d_xy
    fwd = nets * 2 * (
        N_s * (d_x * H + H * H)                    # jump MLP per slot
        + (2 * N_s - 1) * (H * H + H * out_cols)   # readout per prediction
        + substeps * ((H + d_x + 2) * H + H * H))  # ODEFunc per substep
    total_flops = 3 * fwd * n * E                  # fwd + bwd, all steps
    PEAK_FLOPS = 197e12
    tflops_per_s = total_flops / train_s / 1e12
    mfu = total_flops / train_s / PEAK_FLOPS
    log(f"bench: model {total_flops / 1e9:.1f} GFLOP in {train_s:.3f}s = "
        f"{tflops_per_s:.2f} TF/s, MFU {100 * mfu:.2f}% of 197 TF bf16 peak")

    baseline = float(os.environ.get("NJODE_BASELINE_TRAJ_PER_SEC",
                                    DEFAULT_BASELINE_TRAJ_PER_SEC))
    print(json.dumps({
        "metric": f"{args.process}_train_throughput",
        "value": round(traj_per_sec, 1),
        "unit": "trajectories/sec/chip",
        "vs_baseline": round(traj_per_sec / baseline, 2),
        "walltime_s": round(train_s, 3),
        "compile_s": round(compile_s, 1),
        "n_train": n, "n_epochs": E,
        "mfu": round(mfu, 5),
        "model_tflops_per_s": round(tflops_per_s, 3),
        "val_mse_mean": mse_mean,
        "val_mse_var": mse_var,
        "relative_loss": rel,
        "final_train_loss": float(losses[-1]),
        "platform": platform,
        "baseline_traj_per_sec": baseline,
    }))


if __name__ == "__main__":
    main()
