"""Plot ELBO / predictive-LL trajectories vs cumulative time from runner
JSON outputs (parity purpose: reference ``examples/plot*.py`` /
``QEM_paper_plots`` consume experiment pickles).

    python examples/plot_results.py results/*.json -o results/summary.png
"""
import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+")
    ap.add_argument("-o", "--out", default="results.png")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    for f in args.files:
        with open(f) as fh:
            r = json.load(fh)
        t = np.cumsum(r["iter_times"])
        label = f"{r['model']}/{r['method']} K={r['K']}"
        if "predictive_ll" in r:
            label += f" (pll {sum(r['predictive_ll'].values()):.0f})"
        ax.plot(t, r["elbos"], label=label)
    ax.set_xlabel("cumulative time (s)")
    ax.set_ylabel("ELBO")
    ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
