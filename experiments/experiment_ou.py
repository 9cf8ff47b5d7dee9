"""Ornstein-Uhlenbeck Neural Jump ODE experiment.

Flag-for-flag port of the reference CLI (reference: experiments/experiment_ou.py).
NOTE: the reference ships ``--activation`` default ``'identity'`` which is not
in its own choices list and silently resolves to ReLU through the activation
registry fallback (reference experiment_ou.py:30, models/jump_ode.py:18);
we keep the same default and the same fallback so behaviour is identical.
"""

import argparse

from common import add_common_args, build_config, run_and_plot


def parse_args():
    parser = argparse.ArgumentParser(
        description='Ornstein-Uhlenbeck Neural Jump ODE Experiment')
    add_common_args(parser, activation_default='identity')
    # Process parameters (reference experiment_ou.py:65-70)
    parser.add_argument('--theta', type=float, default=1.0,
                        help='OU mean reversion speed')
    parser.add_argument('--mu', type=float, default=0.5,
                        help='OU long-term mean')
    parser.add_argument('--sigma', type=float, default=0.3,
                        help='OU volatility')
    parser.add_argument('--x0', type=float, default=0.0, help='Initial value')
    return parser.parse_args()


def main():
    args = parse_args()
    process_params = {"theta": args.theta, "mu": args.mu, "sigma": args.sigma,
                      "x0": args.x0}
    config = build_config(args, "njode_ou", "ornstein_uhlenbeck",
                          process_params)
    run_and_plot(config, "ornstein_uhlenbeck",
                 {**process_params, "T": args.T, "n_steps": args.n_steps},
                 make_plots=not args.no_plots, profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
