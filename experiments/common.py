"""Shared experiment-CLI plumbing.

The four reference CLIs are ~190-line near-copies of each other
(reference: experiments/experiment_*.py); the flag surface is preserved
flag-for-flag here once, and each experiment module only declares its
process-specific flags and defaults.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

# allow `python experiments/experiment_*.py` from a source checkout
sys.path.insert(0, str(Path(__file__).parent.parent))


def add_common_args(parser: argparse.ArgumentParser,
                    activation_default: str = "relu") -> None:
    """Architecture/training/moment/data flags shared by every experiment
    (reference experiments/experiment_black_scholes.py:23-64)."""
    # Model architecture
    parser.add_argument('--hidden-dim', type=int, default=32,
                        help='Width of the latent state h and of every MLP '
                             'hidden layer')
    parser.add_argument('--n-hidden-layers', type=int, default=1,
                        help='Hidden-layer count in each of the three MLPs')
    parser.add_argument('--activation', type=str, default=activation_default,
                        choices=['relu', 'tanh', 'sigmoid', 'elu',
                                 'leaky_relu', 'selu'],
                        help='Nonlinearity used throughout the networks')
    parser.add_argument('--dropout-rate', type=float, default=0.0,
                        help='Train-time dropout probability (0 disables)')
    parser.add_argument('--input-scaling', type=str, default='identity',
                        choices=['identity', 'tanh', 'sigmoid'],
                        help='Squashing applied to (h, x) before the drift '
                             'MLP sees them')
    parser.add_argument('--variance-method', type=str, default='direct',
                        choices=['direct', 'second_moment'],
                        help='How moment 1 parameterizes the variance: '
                             'direct squares the raw head output W; '
                             'second_moment regresses E[X^2] and derives '
                             'Var = E[X^2] - mean^2')
    parser.add_argument('--dt-ode-step', type=float, default=None,
                        help='Euler substep size inside each inter-'
                             'observation gap; omit to take one step per gap')

    # Training parameters
    parser.add_argument('--learning-rate', type=float, default=1e-3,
                        help='Adam step size')
    parser.add_argument('--weight-decay', type=float, default=5e-4,
                        help='L2 penalty folded into the gradient '
                             '(torch-Adam style, not decoupled)')
    parser.add_argument('--n-epochs', type=int, default=200,
                        help='Total training epochs')
    parser.add_argument('--batch-size', type=int, default=128,
                        help='Trajectories per minibatch')
    parser.add_argument('--no-shuffle', action='store_true',
                        help='Keep trajectory order fixed across minibatches '
                             'instead of reshuffling each epoch')
    parser.add_argument('--print-every', type=int, default=5,
                        help='Epoch interval for progress lines, relative-'
                             'loss evals and checkpoint saves')
    parser.add_argument('--device', type=str, default='auto',
                        help='Backend to run on: auto, cpu or tpu')

    # Moment learning
    parser.add_argument('--num-moments', type=int, default=2,
                        help='How many conditional moments the model predicts')
    parser.add_argument('--moment-weights', type=float, nargs='+',
                        default=[1.0, 10.0],
                        help='Per-moment coefficients in the training loss')
    parser.add_argument('--shared-network', action='store_true',
                        help='One wide network emitting all moments at once '
                             'instead of a separate network per moment')
    parser.add_argument('--extended-moments', action='store_true',
                        help='Train moments >= 2 against their analytic '
                             'targets (extension: the reference allocates '
                             'but never trains higher-moment networks)')

    # Data parameters
    parser.add_argument('--cache-data', action='store_true',
                        help='Simulate one training set up front and reuse '
                             'it every epoch; by default each epoch draws '
                             'new paths')
    parser.add_argument('--n-train', type=int, default=1000,
                        help='Training-set trajectory count')
    parser.add_argument('--n-val', type=int, default=200,
                        help='Validation-set trajectory count')
    parser.add_argument('--obs-fraction', type=float, default=0.1,
                        help='Share of grid points revealed as observations')
    parser.add_argument('--T', type=float, default=1.0,
                        help='Simulation end time')
    parser.add_argument('--n-steps', type=int, default=100,
                        help='Grid resolution: simulation steps over [0, T]')

    # TPU-native extras (no reference analogue)
    parser.add_argument('--data-parallel', type=int, default=0,
                        help='Shard trajectories over N devices (0 = single '
                             'device)')
    parser.add_argument('--model-parallel', type=int, default=1,
                        help='Size of the mesh\'s model axis (composes with '
                             '--data-parallel/--multihost): shards the '
                             'per-moment networks (mode "moments", expert '
                             'parallelism) or the hidden width (mode '
                             '"hidden", tensor parallelism) over N devices')
    parser.add_argument('--model-parallel-mode', type=str, default=None,
                        choices=['moments', 'hidden'],
                        help='What the model axis shards (default: moments '
                             'when --model-parallel > 1)')
    parser.add_argument('--multihost', action='store_true',
                        help='Initialize jax.distributed and build the data-'
                             'parallel mesh over every host\'s devices; run '
                             'the same command once per host')
    parser.add_argument('--coordinator-address', type=str, default=None,
                        help='host:port of process 0 for --multihost '
                             '(omit on TPU pods: auto-detected)')
    parser.add_argument('--num-processes', type=int, default=None,
                        help='Total process count for --multihost '
                             '(omit on TPU pods: auto-detected)')
    parser.add_argument('--process-id', type=int, default=None,
                        help='This process\'s rank for --multihost '
                             '(omit on TPU pods: auto-detected)')
    parser.add_argument('--seed', type=int, default=0,
                        help='Model-init / shuffle seed')
    parser.add_argument('--data-seed', type=int, default=0,
                        help='Data-generation seed')
    parser.add_argument('--ensemble', type=int, default=0,
                        help='Train K independently-seeded models in ONE '
                             'vmapped program (0/1 = single model). '
                             'First-class runs: per-member train/val/'
                             'relative losses, checkpoint auto-resume, '
                             'epistemic seed bands in the trajectory plot. '
                             'With --data-parallel/--multihost the seed '
                             'axis shards over the devices (K must be a '
                             'multiple of the device count)')
    parser.add_argument('--ensemble-lrs', type=str, default=None,
                        help='Comma-separated per-member learning rates: '
                             'population training — the members of the ONE '
                             'vmapped ensemble program differ in optimizer '
                             'hyperparameters, turning a learning-rate '
                             'sweep into a single run. Implies --ensemble '
                             'len(lrs) when --ensemble is unset; otherwise '
                             'the lengths must match. Members share the '
                             'data stream (isolates the lr effect); '
                             '--weight-decay applies to every member')
    parser.add_argument('--obs-only', type=str, default='auto',
                        choices=['auto', 'on', 'off'],
                        help='Sample values exactly at the observation times '
                             'instead of simulating the whole grid (same '
                             'data law, ~n_grid/n_obs cheaper generation). '
                             'auto (default) = on for processes with exact '
                             'transition laws, off otherwise; nothing in the '
                             'training path reads the dense grid')
    parser.add_argument('--grid-walk', type=str, default='auto',
                        choices=['auto', 'on', 'off'],
                        help='Integrate all --dt-ode-step gaps with one '
                             'time-major walk over the integration grid '
                             '(~n_slots x fewer ODE evaluations; exact-'
                             'arithmetic-identical to the per-gap loops; '
                             'requires every observation time to be a '
                             'multiple of --dt-ode-step). auto (default) '
                             '= on exactly when the fused walk KERNEL '
                             'carries it (real TPU, --kernels auto, '
                             'kernel-eligible config, aligned grid — '
                             'measured 2.3x on the production step; the '
                             'pure-XLA walk measured slower and is only '
                             'used under an explicit "on"); no effect '
                             'without --dt-ode-step')
    parser.add_argument('--ode-solver', type=str, default='euler',
                        choices=['euler', 'heun', 'rk4'],
                        help='Latent-ODE integrator (euler = reference '
                             'semantics; heun/rk4 = higher-order accuracy '
                             'per substep)')
    parser.add_argument('--compute-dtype', type=str, default='float32',
                        choices=['float32', 'bfloat16'],
                        help='Mixed-precision matmul dtype (params stay '
                             'float32); bfloat16 pays off at hidden-dim '
                             '>= 256')
    parser.add_argument('--checkpoint-backend', type=str, default='msgpack',
                        choices=['msgpack', 'orbax'],
                        help='Checkpoint format: single-file msgpack or an '
                             'Orbax directory (multi-host sharded params)')
    parser.add_argument('--kernels', type=str, default='auto',
                        choices=['off', 'auto', 'force', 'step', 'train'],
                        help='Pallas kernel policy: auto (default) = every '
                             'kernel in its measured-win regime — the gap '
                             'kernel for streaming inference, the whole-'
                             'run training kernel for eligible small-model '
                             'TPU configs, and the fused-step kernel for '
                             'MXU-bound configs (hidden >= 224, >= 4096 '
                             'rows) — the headline-bench fast paths; '
                             'off = pure XLA, force = all '
                             'per-gap kernels on, step = the fused whole-'
                             'step training kernel (1.5-1.8x the scaled-'
                             'config step; needs separate networks, 1 '
                             'hidden layer, no dropout, no --dt-ode-step), '
                             'train = the whole-run training kernel '
                             '(params + Adam state resident in VMEM across '
                             'every minibatch step; small models only: '
                             'hidden <= 128, batch <= 256, same model '
                             'limits as step; with --dt-ode-step it routes '
                             'to the walk-train twin — shared network, '
                             'grid-aligned data, 7x the composed '
                             'production step). auto engages whichever '
                             'twin the recipe makes eligible')
    parser.add_argument('--train-kernel-mxu', type=str, default='float32',
                        choices=['float32', 'bfloat16'],
                        help='matmul OPERAND precision inside the whole-run '
                             'training kernels (accumulation stays f32): '
                             'bfloat16 measured 12.9x the composed '
                             'production step vs 7.0x at f32 '
                             '(BENCH_NOTES.md r4a) at a small training-'
                             'noise cost; ignored on non-kernel paths')
    parser.add_argument('--debug-checks', action='store_true',
                        help='Enable in-graph runtime asserts (substep-'
                             'budget exhaustion inside jitted steps); costs '
                             'a host callback per dispatch')
    parser.add_argument('--profile-dir', type=str, default=None,
                        help='Write a jax.profiler trace of the run here')
    parser.add_argument('--no-plots', action='store_true',
                        help='Skip plot generation after training')
    parser.add_argument('--experiment-name', type=str, default=None,
                        help='Override the run directory name under runs/ '
                             '(lets sweep configs run concurrently without '
                             'colliding)')


def _resolve_obs_only(choice: str, process_type: str) -> bool:
    """'auto' -> exact observation-time sampling where a transition law
    exists (BS/OU); 'on' requires one (simulate_batch raises otherwise)."""
    if choice == "on":
        return True
    if choice == "auto":
        from njode_tpu.simulation import supports_obs_only
        return supports_obs_only(process_type)
    return False


def _parse_ensemble_lrs(args):
    """--ensemble-lrs 'a,b,c' -> [a, b, c]; implies --ensemble len(lrs)
    when unset, must match it otherwise."""
    raw = getattr(args, "ensemble_lrs", None)
    if not raw:
        return None
    try:
        lrs = [float(x) for x in raw.split(",") if x.strip()]
    except ValueError:
        raise SystemExit(f"--ensemble-lrs: could not parse {raw!r} as "
                         "comma-separated floats")
    if len(lrs) < 2:
        raise SystemExit("--ensemble-lrs needs at least 2 values (a single "
                         "lr is just --learning-rate)")
    if args.ensemble and args.ensemble != len(lrs):
        raise SystemExit(f"--ensemble {args.ensemble} does not match the "
                         f"{len(lrs)} values of --ensemble-lrs")
    args.ensemble = len(lrs)
    return lrs


def build_config(args, experiment_name: str, process_type: str,
                 data_params: dict) -> dict:
    """Assemble the nested config dict (reference experiment_*.py:79-113)."""
    ensemble_lrs = _parse_ensemble_lrs(args)       # may set args.ensemble
    return {
        "experiment_name": getattr(args, "experiment_name", None)
                           or experiment_name,
        "input_dim": 1,
        "hidden_dim": args.hidden_dim,
        "output_dim": 1,
        "n_hidden_layers": args.n_hidden_layers,
        "activation": args.activation,
        "dropout_rate": args.dropout_rate,
        "input_scaling": args.input_scaling,
        "variance_method": args.variance_method,
        "dt_ode_step": args.dt_ode_step,
        "ode_solver": args.ode_solver,
        "learning_rate": args.learning_rate,
        "weight_decay": args.weight_decay,
        "n_epochs": args.n_epochs,
        "batch_size": args.batch_size,
        "shuffle": not args.no_shuffle,
        "print_every": args.print_every,
        "device": args.device,
        "ignore_first_continuity": True,
        "num_moments": args.num_moments,
        "moment_weights": args.moment_weights,
        "shared_network": args.shared_network,
        "extended_moments": args.extended_moments,
        "data_parallel": args.data_parallel,
        "model_parallel": args.model_parallel,
        "model_parallel_mode": args.model_parallel_mode,
        "multihost": args.multihost,
        "coordinator_address": args.coordinator_address,
        "num_processes": args.num_processes,
        "process_id": args.process_id,
        "compute_dtype": args.compute_dtype,
        "checkpoint_backend": args.checkpoint_backend,
        "ensemble": args.ensemble,
        "ensemble_lrs": ensemble_lrs,
        "use_pallas": {"off": False, "auto": "auto", "force": True,
                       "step": "step", "train": "train"}[args.kernels],
        "grid_walk": args.grid_walk,
        "train_kernel_mxu": args.train_kernel_mxu,
        "debug_checks": args.debug_checks,
        "seed": args.seed,
        "data_seed": args.data_seed,
        "data": {
            "process_type": process_type,
            "n_train": args.n_train,
            "n_val": args.n_val,
            "obs_fraction": args.obs_fraction,
            "cache_data": args.cache_data,
            "obs_only": _resolve_obs_only(args.obs_only, process_type),
            "T": args.T,
            "n_steps": args.n_steps,
            **data_params,
        },
    }


def run_and_plot(config: dict, process_type: str, process_params: dict,
                 make_plots: bool = True, save_dir: str = "runs",
                 profile_dir: str = None):
    """run_experiment + the three standard plots
    (reference experiment_*.py main bodies)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/njode_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    # honor --device even though the ambient sitecustomize may have
    # force-registered a TPU platform
    device = config.get("device", "auto")
    if device != "auto":
        try:
            from jax.extend.backend import clear_backends
            clear_backends()
        except Exception:
            pass
        jax.config.update("jax_platforms", device)

    from njode_tpu.utils import run_experiment
    from njode_tpu.utils.profiling import maybe_trace

    with maybe_trace(profile_dir):
        results = run_experiment(config, save_dir=save_dir)

    save_path = Path(results["save_path"])
    try:
        if jax.process_index() != 0:
            # only process 0 wrote history.json (run_experiment gates its
            # artifact writes); worker plots would read a file that may not
            # exist yet and race on the same .png paths
            make_plots = False
    except Exception:
        pass
    if make_plots:
        from njode_tpu.models import NeuralJumpODE
        from njode_tpu.utils.checkpoint import load_params
        from njode_tpu.utils.plotting import (
            plot_relative_loss_single, plot_single_trajectory_with_condexp,
            plot_training_history)

        print("\nGenerating training history plot...")
        plot_training_history(str(save_path / "history.json"),
                              str(save_path / "training_history.png"))

        print("Generating relative loss plot...")
        try:
            plot_relative_loss_single(str(save_path / "history.json"),
                                      str(save_path / "relative_loss.png"))
        except Exception as e:
            print(f"Could not plot relative loss: {e}")

        print("Generating trajectory comparison plot...")
        model = NeuralJumpODE(
            input_dim=config["input_dim"],
            hidden_dim=config["hidden_dim"],
            output_dim=config["output_dim"],
            dt_ode_step=config.get("dt_ode_step"),
            num_moments=config.get("num_moments", 1),
            n_hidden_layers=config.get("n_hidden_layers", 1),
            activation=config.get("activation", "relu"),
            shared_network=config.get("shared_network", False),
            dropout_rate=config.get("dropout_rate", 0.0),
            input_scaling=config.get("input_scaling", "identity"),
            variance_method=config.get("variance_method", "direct"),
            t_max=config["data"].get("T", 1.0),
            ode_solver=config.get("ode_solver", "euler"),
            compute_dtype=config.get("compute_dtype"),
        )
        n_ens = int(config.get("ensemble", 0) or 0)
        if n_ens > 1:
            # stacked checkpoint: template has the leading seed axis; the
            # plot shows the ensemble mean + epistemic seed bands
            from njode_tpu.utils.ensemble import init_ensemble
            stack = load_params(str(save_path / "model.ckpt"),
                                init_ensemble(model, n_ens,
                                              seed=config.get("seed", 0)))
            plot_single_trajectory_with_condexp(
                model=model, params=None, process_type=process_type,
                process_params=process_params,
                obs_fraction=config["data"]["obs_fraction"],
                seed=42, ensemble_params=stack,
                save_path=str(save_path / "trajectory_comparison.png"))
        else:
            params = load_params(str(save_path / "model.ckpt"),
                                 model.init(jax.random.PRNGKey(0)))
            plot_single_trajectory_with_condexp(
                model=model, params=params, process_type=process_type,
                process_params=process_params,
                obs_fraction=config["data"]["obs_fraction"],
                seed=42,
                save_path=str(save_path / "trajectory_comparison.png"))

    print("\nExperiment completed successfully!")
    print(f"Results saved in: {save_path}")
    print(f"Final training loss: {results['final_train_loss']:.6f}")
    if results["final_val_loss"]:
        print(f"Final validation loss: {results['final_val_loss']:.6f}")
    return results
