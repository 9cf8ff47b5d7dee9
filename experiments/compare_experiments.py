"""Compare relative-loss curves across completed experiments.

Port of the reference comparison CLI (reference:
experiments/compare_experiments.py) with its experiment-name bug fixed: the
reference looks for ``njode_ornstein_uhlenbeck`` while the OU CLI writes
``njode_ou`` (reference compare_experiments.py:26 vs experiment_ou.py:81),
so OU runs were never found.  We scan the names the CLIs actually write.
"""

import argparse
import json
from pathlib import Path

from common import *  # noqa: F401,F403 — sets sys.path for njode_tpu

EXPERIMENTS = [
    ("njode_black_scholes", "Black-Scholes"),
    ("njode_ou", "Ornstein-Uhlenbeck"),
    ("njode_heston", "Heston"),
    ("njode_hybrid", "Hybrid OU-BS"),
]


def main():
    parser = argparse.ArgumentParser(
        description='Compare Neural Jump ODE experiments')
    parser.add_argument('--runs-dir', type=str, default='runs',
                        help='Directory containing experiment runs')
    parser.add_argument('--output', type=str,
                        default='runs/comparison_relative_loss.png',
                        help='Output plot path')
    args = parser.parse_args()

    runs = Path(args.runs_dir)
    history_paths, labels = [], []
    for name, label in EXPERIMENTS:
        hp = runs / name / "history.json"
        if hp.exists():
            history_paths.append(str(hp))
            labels.append(label)
        else:
            print(f"(skipping {label}: no {hp})")

    if not history_paths:
        print(f"No completed experiments found under {runs}/")
        return

    from njode_tpu.utils.plotting import plot_relative_loss
    plot_relative_loss(history_paths, labels, save_path=args.output)
    print(f"Comparison plot saved to {args.output}")

    print("\nFinal relative losses:")
    for hp, label in zip(history_paths, labels):
        with open(hp) as f:
            history = json.load(f)
        rl = history.get("relative_loss", [])
        if rl:
            print(f"  {label:20s} {rl[-1]: .4f}")
        else:
            print(f"  {label:20s} (no relative loss recorded)")


if __name__ == "__main__":
    main()
