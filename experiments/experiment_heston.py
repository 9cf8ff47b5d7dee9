"""Heston stochastic-volatility Neural Jump ODE experiment.

Flag-for-flag port of the reference CLI
(reference: experiments/experiment_heston.py).  Input is 1-D (price only; the
variance process V is simulated but never observed, matching the reference).
"""

import argparse

from common import add_common_args, build_config, run_and_plot


def parse_args():
    parser = argparse.ArgumentParser(
        description='Heston Neural Jump ODE Experiment')
    add_common_args(parser)
    # Process parameters (reference experiment_heston.py:65-73)
    parser.add_argument('--mu', type=float, default=0.5,
                        help='Heston drift parameter')
    parser.add_argument('--kappa', type=float, default=2.0,
                        help='Heston mean reversion speed')
    parser.add_argument('--theta', type=float, default=0.04,
                        help='Heston long-term variance')
    parser.add_argument('--xi', type=float, default=0.5,
                        help='Heston volatility of volatility')
    parser.add_argument('--rho', type=float, default=-0.5,
                        help='Heston correlation')
    parser.add_argument('--x0', type=float, default=1.0,
                        help='Initial stock price')
    parser.add_argument('--v0', type=float, default=0.04,
                        help='Initial variance')
    return parser.parse_args()


def main():
    args = parse_args()
    process_params = {"mu": args.mu, "kappa": args.kappa, "theta": args.theta,
                      "xi": args.xi, "rho": args.rho, "x0": args.x0,
                      "v0": args.v0}
    config = build_config(args, "njode_heston", "heston", process_params)
    run_and_plot(config, "heston",
                 {**process_params, "T": args.T, "n_steps": args.n_steps},
                 make_plots=not args.no_plots, profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
