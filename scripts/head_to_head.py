"""Quality head-to-head vs the trained PyTorch reference, shared protocol.

One protocol for every process family (RESULTS.md): both trained models are
evaluated by the SAME metric code (njode_tpu.utils.metrics) on the SAME
fresh eval batch; the reference's weights are imported with
njode_tpu.utils.torch_compat.  For hybrid the truths use the exact
recorded per-path switch times (our improvement over the reference's
zero-fill, simulation/moments.py).

Usage:
  python scripts/head_to_head.py --process heston \
      --ref-ckpt /tmp/ref_h2h/heston/runs/njode_heston/model.pt \
      --tpu-ckpt runs/njode_heston/model.ckpt
Either checkpoint argument may be omitted if the standard run directory
exists.  Train the missing side first (reference CLI at /root/reference,
ours at experiments/).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

FAMILIES = {
    "black_scholes": dict(
        name="njode_black_scholes",
        params=dict(mu=0.1, sigma=0.5, x0=1.0)),
    "ornstein_uhlenbeck": dict(
        name="njode_ou",
        params=dict(theta=1.0, mu=0.5, sigma=0.3, x0=0.0)),
    "heston": dict(
        name="njode_heston",
        params=dict(mu=0.5, kappa=2.0, theta=0.04, xi=0.5, rho=-0.5,
                    x0=1.0, v0=0.04)),
    "hybrid_ou_bs": dict(
        name="njode_hybrid",
        params=dict(theta_ou=1.0, mu_ou=0.5, sigma_ou=0.3,
                    mu_bs=0.1, sigma_bs=0.2, x0=1.0)),
}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--process", required=True, choices=sorted(FAMILIES))
    ap.add_argument("--ref-ckpt", default=None,
                    help="reference model.pt (torch.save bundle)")
    ap.add_argument("--tpu-ckpt", default=None,
                    help="njode_tpu model.ckpt (msgpack or orbax dir)")
    ap.add_argument("--n-eval", type=int, default=200,
                    help="eval batch size (fresh trajectories)")
    ap.add_argument("--eval-seed", type=int, default=777)
    ap.add_argument("--hidden-dim", type=int, default=32)
    ap.add_argument("--n-hidden-layers", type=int, default=1)
    ap.add_argument("--num-moments", type=int, default=2)
    ap.add_argument("--shared-network", action="store_true")
    ap.add_argument("--variance-method", default="direct")
    ap.add_argument("--device", default="auto")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/njode_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    if args.device != "auto":
        try:
            from jax.extend.backend import clear_backends
            clear_backends()
        except Exception:
            pass
        jax.config.update("jax_platforms", args.device)

    from njode_tpu import NeuralJumpODE
    from njode_tpu.simulation import simulate_batch
    from njode_tpu.utils.checkpoint import load_params
    from njode_tpu.utils.metrics import (conditional_moment_mse,
                                         relative_loss)
    from njode_tpu.utils.torch_compat import params_from_torch_checkpoint

    fam = FAMILIES[args.process]
    ref_ckpt = args.ref_ckpt or f"/tmp/ref_h2h/{args.process}/runs/" \
                                f"{fam['name']}/model.pt"
    tpu_ckpt = args.tpu_ckpt or f"runs/{fam['name']}/model.ckpt"
    for p, label in [(ref_ckpt, "reference"), (tpu_ckpt, "njode_tpu")]:
        if not Path(p).exists():
            sys.exit(f"missing {label} checkpoint: {p} — train it first")

    model = NeuralJumpODE(
        input_dim=1, hidden_dim=args.hidden_dim, output_dim=1,
        num_moments=args.num_moments, n_hidden_layers=args.n_hidden_layers,
        shared_network=args.shared_network,
        variance_method=args.variance_method, t_max=1.0)

    ref_params = params_from_torch_checkpoint(
        ref_ckpt, args.num_moments, args.shared_network)
    tpu_params = load_params(tpu_ckpt, model.init(jax.random.PRNGKey(0)))

    batch = simulate_batch(jax.random.PRNGKey(args.eval_seed), args.n_eval,
                           args.process, obs_fraction=0.1, T=1.0,
                           n_steps=100, **fam["params"])

    is_hybrid = args.process == "hybrid_ou_bs"
    kw = dict(variance_method=args.variance_method,
              use_batch_switch_times=is_hybrid, **fam["params"])
    print(f"# {args.process}: shared eval batch "
          f"({args.n_eval} fresh trajectories, seed {args.eval_seed})"
          + (", exact per-path switch-time truths" if is_hybrid else ""))
    from njode_tpu.models import nj_ode_loss_dense

    @jax.jit
    def val_loss(params):
        preds, before = model.apply(params, batch.times, batch.values,
                                    batch.mask)
        return nj_ode_loss_dense(batch.values, preds, before, batch.mask,
                                 moment_weights=[1.0, 10.0],
                                 variance_method=args.variance_method)

    rows = {}
    for label, params in [("reference", ref_params),
                          ("njode_tpu", tpu_params)]:
        vl = float(val_loss(params))
        rel = relative_loss(model, params, batch, args.process,
                            moment_weights=[1.0, 10.0], **kw)
        mse = conditional_moment_mse(model, params, batch, args.process,
                                     **kw)
        rows[label] = (vl, rel, mse["mean"], mse["var"])
        print(f"{label:10s}  val_loss={vl:.4f}  relative_loss={rel:.4f}  "
              f"MSE_mean={mse['mean']:.3e}  MSE_var={mse['var']:.3e}")

    print("\n| metric (shared eval batch) | reference | njode_tpu |")
    print("|---|---|---|")
    names = ["val loss (weighted NJ-ODE loss)", "relative loss (L-L*)/L*",
             "MSE cond. mean (before-jump)",
             "MSE cond. variance (before-jump)"]
    fmts = ["{:.4f}", "{:.4f}", "{:.2e}", "{:.2e}"]
    for i, (n, f) in enumerate(zip(names, fmts)):
        print(f"| {n} | {f.format(rows['reference'][i])} "
              f"| {f.format(rows['njode_tpu'][i])} |")


if __name__ == "__main__":
    main()
