"""Regenerate docs/CLI.md from the experiment CLIs' --help output.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/gen_cli_docs.py
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLIS = ["experiment_black_scholes.py", "experiment_ou.py",
        "experiment_heston.py", "experiment_hybrid.py",
        "compare_experiments.py"]


def main():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["COLUMNS"] = "80"
    out = ["# CLI reference (generated from --help)", ""]
    for cli in CLIS:
        help_text = subprocess.run(
            [sys.executable, os.path.join(REPO, "experiments", cli),
             "--help"], capture_output=True, text=True, env=env,
            check=True).stdout.rstrip()
        out += [f"## {cli}", "", "```", help_text, "```", ""]
    path = os.path.join(REPO, "docs", "CLI.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
