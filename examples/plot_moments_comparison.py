"""Figure: MP (QEM-trained) posterior-mean agreement with the in-framework
gold samplers (HMC / NUTS / SMC) per canonical model and latent.

Reads ``results/moments_vs_{hmc,nuts,smc}_<model>.json`` (written by
``examples/runner_moments.py``) and renders one horizontal bar chart of
log10 moment-MSE — smaller bars = closer agreement.  Writes
``results/moments_comparison.png``.

Colors: slots 1-3 of the skill-validated categorical palette (documented
all-pairs CVD-safe in light mode); identity also carried by the legend and
row labels, never color alone.
"""
import glob
import json
import os
import re

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

_RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results")

# fixed categorical assignment (never cycled): sampler -> palette slot
COLORS = {"hmc": "#2a78d6", "nuts": "#eb6834", "smc": "#1baf7a"}
TEXT, MUTED = "#1a1a19", "#7a796f"


def load():
    rows = []
    for path in sorted(glob.glob(os.path.join(_RESULTS, "moments_vs_*.json"))):
        m = re.match(r"moments_vs_(\w+?)_(\w+)\.json", os.path.basename(path))
        if not m:
            continue
        sampler, model = m.group(1), m.group(2)
        d = json.load(open(path))
        mses = d.get("moment_mse") or {
            # covid cross-check schema (scripts/moments_vs_hmc_covid.py)
            name: v["mse"] for name, v in d.get("variables", {}).items()}
        for latent, mse in mses.items():
            rows.append((model, latent, sampler, mse,
                         d.get("hmc_time_s") or d.get("gold_time_s"),
                         d.get("mp_time_s")))
    return rows


def main():
    rows = load()
    if not rows:
        print("no results found"); return
    labels = sorted({(r[0], r[1]) for r in rows})
    samplers = [s for s in ("hmc", "nuts", "smc")
                if any(r[2] == s for r in rows)]
    y = np.arange(len(labels), dtype=float)
    h = 0.8 / max(len(samplers), 1)

    fig, ax = plt.subplots(figsize=(7.5, 0.42 * len(labels) + 1.6))
    for si, s in enumerate(samplers):
        vals, ys = [], []
        for li, (model, latent) in enumerate(labels):
            for r in rows:
                if (r[0], r[1], r[2]) == (model, latent, s):
                    vals.append(max(r[3], 1e-6))
                    ys.append(y[li] + (si - (len(samplers) - 1) / 2) * h)
        ax.barh(ys, np.log10(vals) - (-6), left=-6, height=h * 0.92,
                color=COLORS[s], label=s.upper(), zorder=3)

    ax.set_yticks(y)
    ax.set_yticklabels([f"{m} · {l}" for m, l in labels], fontsize=8,
                       color=TEXT)
    ax.invert_yaxis()
    ax.set_xlabel("log10 moment MSE  (MP posterior mean vs gold sampler; "
                  "left = closer)", fontsize=8, color=TEXT)
    ax.set_xlim(-6, 2)
    ax.grid(axis="x", color="#e6e4dd", lw=0.7, zorder=0)
    for spine in ("top", "right", "left"):
        ax.spines[spine].set_visible(False)
    ax.spines["bottom"].set_color(MUTED)
    ax.tick_params(colors=MUTED, labelsize=8)
    ax.legend(frameon=False, fontsize=8, loc="lower right")
    ax.set_title("MP (QEM, K=30) vs in-framework gold samplers — "
                 "posterior-mean agreement", fontsize=9, color=TEXT, pad=10)
    fig.tight_layout()
    out = os.path.join(_RESULTS, "moments_comparison.png")
    fig.savefig(out, dpi=150)
    print("wrote", out)


if __name__ == "__main__":
    main()
