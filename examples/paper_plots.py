"""Paper-figure plotting (parity: reference
``examples/QEM_paper_plots/QEM_paper_plot.py`` / ``QEM_paper_repram_plot.py``
/ ``examples/moments_paper_plots/moments_paper_plots.py``, which consume
experiment pickles; here the inputs are the JSON artifacts written by
``examples/runner.py`` and ``examples/runner_moments.py``).

Two figures:

    # training trajectories: models x {ELBO, predictive LL} vs iteration/time
    python examples/paper_plots.py qem results/*.json -o qem_paper.png
    # add --compare-reparams to overlay <model> vs <model>_reparam
    # (reference QEM_paper_repram_plot.py)

    # moment-accuracy vs K (MP vs global importance sampling)
    python examples/paper_plots.py moments results_IS_*.json -o moments.png

Runs that share (model, method, K, lr) but differ in seed are aggregated to
mean +/- stderr bands (the reference's multi-run error bars,
``QEM_paper_plot.py:80-111``).  Colour follows the method family (fixed
assignment, ColorBrewer Dark2); global/non-MP baselines additionally carry a
dashed linestyle so identity never rides on colour alone.
"""
import argparse
import json
import sys
from collections import defaultdict

import numpy as np

METHOD_STYLE = {
    # method -> (label, colour, linestyle)
    "qem":        ("QEM",        "#e7298a", "-"),
    "rws":        ("MP RWS",     "#1b9e77", "-"),
    "vi":         ("MP VI",      "#d95f02", "-"),
    "global_qem": ("Global QEM", "#7570b3", "--"),
    "global_rws": ("Global RWS", "#1b9e77", "--"),
    "global_vi":  ("IWAE",       "#d95f02", "--"),
    "nuts":       ("NUTS",       "#000000", ":"),
    "hmc":        ("HMC",        "#666666", ":"),
}


def smooth(x, window):
    """Trailing running mean (reference ``QEM_paper_plot.py:33-47``)."""
    x = np.asarray(x, float)
    if window <= 1:
        return x
    out = np.empty_like(x)
    out[0] = x[0]
    for i in range(1, len(x)):
        out[i] = x[max(i - window, 0):i].mean()
    return out


def _load(files):
    runs = []
    for f in files:
        with open(f) as fh:
            runs.append(json.load(fh))
    return runs


def _aggregate(runs, best_lr=False):
    """Group runner JSONs by (model, method, K, lr); stack seeds.  With
    ``best_lr``, keep per (model, method, K) only the lr with the best
    mean final ELBO (reference ``QEM_paper_plots/preprocess.py`` selection)."""
    groups = defaultdict(list)
    for r in runs:
        groups[(r["model"], r["method"], r["K"], r.get("lr"))].append(r)
    if not best_lr:
        return groups
    best = {}
    for (m, meth, K, lr), rs in groups.items():
        score = np.mean([r["elbos"][-1] for r in rs])
        key = (m, meth, K)
        if key not in best or score > best[key][0]:
            best[key] = (score, lr)
    return {k: rs for k, rs in groups.items()
            if best[(k[0], k[1], k[2])][1] == k[3]}


def _band(ax, xs, ys_list, label, colour, ls, window):
    n = min(len(y) for y in ys_list)
    Y = np.stack([smooth(y[:n], window) for y in ys_list])
    xs = np.asarray(xs[:n], float)
    m = Y.mean(0)
    ax.plot(xs, m, color=colour, ls=ls, lw=1.5, label=label)
    if len(ys_list) > 1:
        se = Y.std(0, ddof=1) / np.sqrt(len(ys_list))
        ax.fill_between(xs, m - se, m + se, color=colour, alpha=0.15, lw=0)


def plot_qem(files, out, x_time=False, window=1, compare_reparams=False,
             best_lr=False):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    groups = _aggregate(_load(files), best_lr=best_lr)
    models = sorted({m for (m, *_rest) in groups})
    if compare_reparams:
        models = sorted({m.replace("_reparam", "") for m in models})
    have_pll = any("p_lls" in r for rs in groups.values() for r in rs)
    nrows = 2 if have_pll else 1

    fig, axes = plt.subplots(nrows, len(models),
                             figsize=(3.2 * len(models), 2.6 * nrows),
                             squeeze=False)
    for col, model in enumerate(models):
        ax_e, ax_p = axes[0][col], (axes[1][col] if have_pll else None)
        for (m, method, K, lr), rs in sorted(groups.items()):
            base = m.replace("_reparam", "")
            if (m != model and not (compare_reparams and base == model)):
                continue
            label, colour, ls = METHOD_STYLE.get(
                method, (method, "#888888", "-"))
            if compare_reparams and m.endswith("_reparam"):
                ls, label = ":", label + " (reparam)"
            label = f"{label} K={K}"
            xs = (np.cumsum(rs[0]["iter_times"]) if x_time
                  else np.arange(len(rs[0]["elbos"])))
            _band(ax_e, xs, [r["elbos"] for r in rs], label, colour, ls, window)
            if ax_p is not None and all("p_lls" in r for r in rs):
                pxs = (xs[rs[0]["predll_iters"]] if x_time
                       else np.asarray(rs[0]["predll_iters"]))
                _band(ax_p, pxs, [r["p_lls"] for r in rs], label, colour, ls, 1)
        ax_e.set_title(model)
        ax_e.set_ylabel("ELBO" if col == 0 else "")
        bottom = ax_p if ax_p is not None else ax_e
        bottom.set_xlabel("cumulative time (s)" if x_time else "iteration")
        if ax_p is not None and col == 0:
            ax_p.set_ylabel("predictive LL")
        if col == 0:
            ax_e.legend(fontsize=6, frameon=False)
    fig.tight_layout()
    fig.savefig(out, dpi=180)
    print("wrote", out)


def plot_moments(files, out):
    """Moment-accuracy (MSE vs analytic/NUTS truth) against K (reference
    ``moments_paper_plots.py:47-116``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = _load(files)
    fig, axes = plt.subplots(1, len(runs), figsize=(3.4 * len(runs), 2.8),
                             squeeze=False)
    for ax, r in zip(axes[0], runs):
        sweep = r.get("sweep") or {}
        Ks = sorted(int(k) for k in sweep)
        for key, (label, colour, ls) in [
                ("mp_moment_mse", ("MP IS", "#e7298a", "-")),
                ("global_is_moment_mse", ("Global IS", "#7570b3", "--"))]:
            ys = [sweep[str(K)][key] for K in Ks if key in sweep[str(K)]]
            if ys:
                ax.plot(Ks[:len(ys)], ys, color=colour, ls=ls, marker="o",
                        ms=4, lw=1.5, label=label)
        ax.set_xscale("log")
        ax.set_yscale("log")
        ax.set_xlabel("K")
        ax.set_ylabel("moment MSE")
        ax.set_title(r.get("model", "?"))
        ax.legend(fontsize=7, frameon=False)
    fig.tight_layout()
    fig.savefig(out, dpi=180)
    print("wrote", out)


def plot_is_sweep(files, out, metric="var_mse_total"):
    """MP vs global-IS moment MSE against K from the round-5
    ``runner_moments_IS`` records (reference figure:
    ``moments_paper_plots.plot_IS_per_K_one_model``).  Failed Ks (OOM —
    the reference removes these via ``remove_failed_Ks``) are skipped."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    runs = _load(files)
    fig, axes = plt.subplots(1, len(runs), figsize=(3.6 * len(runs), 2.9),
                             squeeze=False)
    for ax, r in zip(axes[0], runs):
        for tag, (label, colour, ls) in [
                ("mp", ("MP IS", "#e7298a", "-")),
                ("global_is", ("Global IS", "#7570b3", "--"))]:
            rows = [(int(k), v[metric]) for k, v in r.get(tag, {}).items()
                    if metric in v]
            rows.sort()
            if rows:
                ax.plot([k for k, _ in rows], [y for _, y in rows],
                        color=colour, ls=ls, marker="o", ms=4, lw=1.5,
                        label=label)
        ax.set_xscale("log")
        ax.set_yscale("log")
        ax.set_xlabel("K")
        ax.set_ylabel("moment MSE (across-run variance)"
                      if metric == "var_mse_total" else metric)
        ax.set_title(r.get("model", "?"))
        ax.legend(fontsize=7, frameon=False)
    fig.tight_layout()
    fig.savefig(out, dpi=180)
    print("wrote", out)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    q = sub.add_parser("qem", help="training-trajectory figure")
    q.add_argument("files", nargs="+")
    q.add_argument("-o", "--out", default="qem_paper.png")
    q.add_argument("--time", action="store_true", help="x axis = cumulative time")
    q.add_argument("--window", type=int, default=1, help="smoothing window")
    q.add_argument("--compare-reparams", action="store_true")
    q.add_argument("--best-lr", action="store_true",
                   help="keep only the best lr per (model, method, K)")
    m = sub.add_parser("moments", help="moment-MSE vs K figure")
    m.add_argument("files", nargs="+")
    m.add_argument("-o", "--out", default="moments_paper.png")
    i = sub.add_parser("is-sweep", help="MP vs global-IS MSE-vs-K figure")
    i.add_argument("files", nargs="+")
    i.add_argument("-o", "--out", default="moments_is_sweep.png")
    i.add_argument("--metric", default="var_mse_total")
    args = ap.parse_args(argv)

    if args.cmd == "qem":
        plot_qem(args.files, args.out, x_time=args.time, window=args.window,
                 compare_reparams=args.compare_reparams, best_lr=args.best_lr)
    elif args.cmd == "is-sweep":
        plot_is_sweep(args.files, args.out, metric=args.metric)
    else:
        plot_moments(args.files, args.out)


if __name__ == "__main__":
    main()
