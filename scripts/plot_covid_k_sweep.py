"""Figure for the covid finite-K bias sweep (VERDICT r5 #5).

Reads results/covid_k_sweep.json (factorised-Q MP vs the NUTS gold at
K in {10,30,100,300}) and, when present, results/covid_corrq_probe.json
(full-covariance-Q arms on the same posterior), and draws MP-vs-NUTS
z_median vs K on a log-x: the overall trend decays with K while the
CM_alpha / Mobility_alpha coefficient block stays pinned under the
factorised Q — the corr-Q arm is the structured-proposal attempt on that
block.  Writes results/covid_k_sweep.png.
"""
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Validated reference palette (first three categorical slots pass all-pairs
# in light mode); chrome inks from the same system.
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
MUTED = "#898781"
GRID = "#e1e0d9"
BASE = "#c3c2b7"
C_OVERALL = "#2a78d6"   # slot 1 blue
C_CM = "#eb6834"        # slot 2 orange
C_MOB = "#1baf7a"       # slot 3 aqua


def _series(by_K, picker):
    ks = sorted((int(k) for k in by_K), key=int)
    return ks, [picker(by_K[str(k)]) for k in ks]


def main():
    with open(os.path.join(ROOT, "results", "covid_k_sweep.json")) as f:
        sweep = json.load(f)
    corrq = None
    cq_path = os.path.join(ROOT, "results", "covid_corrq_probe.json")
    if os.path.exists(cq_path):
        with open(cq_path) as f:
            corrq = json.load(f)

    fig, ax = plt.subplots(figsize=(6.4, 4.2), dpi=150)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    series = [
        ("overall", C_OVERALL, lambda r: r["overall"]["z_median"]),
        ("CM_alpha", C_CM, lambda r: r["variables"]["CM_alpha"]["z_median"]),
        ("Mobility_alpha", C_MOB,
         lambda r: r["variables"]["Mobility_alpha"]["z_median"]),
    ]
    offsets = {"overall": (6, 4), "CM_alpha": (6, 8),
               "Mobility_alpha": (6, -10)}
    for label, color, pick in series:
        ks, zs = _series(sweep["by_K"], pick)
        ax.plot(ks, zs, color=color, lw=2, marker="o", ms=7,
                label=f"{label} (factorised Q)")
        ax.annotate(label, (ks[-1], zs[-1]), textcoords="offset points",
                    xytext=offsets[label], fontsize=8, color=INK)

    if corrq and corrq.get("arms"):
        for label, color, var in (("overall", C_OVERALL, None),
                                  ("CM_alpha", C_CM, "CM_alpha"),
                                  ("Mobility_alpha", C_MOB,
                                   "Mobility_alpha")):
            ks, zs = [], []
            for arm, rec in sorted(corrq["arms"].items(),
                                   key=lambda kv: int(kv[0].split("K")[-1])):
                k = int(arm.split("K")[-1])
                z = (rec["overall"]["z_median"] if var is None
                     else rec["variables"][var]["z_median"])
                ks.append(k)
                zs.append(z)
            ax.plot(ks, zs, color=color, lw=2, ls="--", marker="o", ms=6,
                    mfc=SURFACE, label=f"{label} (corr Q)")

    ax.axhline(5.0, color=BASE, lw=1)
    ax.annotate("z = 5", (sweep["Ks"][0], 5.0), textcoords="offset points",
                xytext=(0, 4), fontsize=8, color=MUTED)

    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("K (importance samples per latent group)", color=INK)
    ax.set_ylabel("MP-vs-NUTS |z| median", color=INK)
    ax.set_title("Reduced covid: finite-K MP bias vs the NUTS gold",
                 color=INK, fontsize=11)
    ax.grid(True, which="major", color=GRID, lw=0.6)
    ax.tick_params(colors=MUTED)
    for s in ax.spines.values():
        s.set_color(BASE)
    ax.legend(fontsize=7.5, framealpha=0.0, loc="lower left",
              labelcolor=INK)
    fig.tight_layout()
    out = os.path.join(ROOT, "results", "covid_k_sweep.png")
    fig.savefig(out, facecolor=SURFACE)
    print("->", out)


if __name__ == "__main__":
    main()
