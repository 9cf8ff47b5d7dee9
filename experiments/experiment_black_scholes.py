"""Black-Scholes Neural Jump ODE experiment.

Flag-for-flag port of the reference CLI
(reference: experiments/experiment_black_scholes.py) on the TPU-native stack.
"""

import argparse

from common import add_common_args, build_config, run_and_plot


def parse_args():
    parser = argparse.ArgumentParser(
        description='Black Scholes Neural Jump ODE Experiment')
    add_common_args(parser)
    # Process parameters (reference experiment_black_scholes.py:65-69)
    parser.add_argument('--mu', type=float, default=0.1,
                        help='Black Scholes drift parameter')
    parser.add_argument('--sigma', type=float, default=0.5,
                        help='Black Scholes volatility parameter')
    parser.add_argument('--x0', type=float, default=1.0, help='Initial value')
    return parser.parse_args()


def main():
    args = parse_args()
    process_params = {"mu": args.mu, "sigma": args.sigma, "x0": args.x0}
    config = build_config(args, "njode_black_scholes", "black_scholes",
                          process_params)
    run_and_plot(config, "black_scholes",
                 {**process_params, "T": args.T, "n_steps": args.n_steps},
                 make_plots=not args.no_plots, profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
