"""Bound covid's finite-K MP proposal bias (VERDICT r5 #5) and complete the
independent-sampler hedge (#8).

Round 4 recorded large MP-vs-NUTS z-scores on reduced covid's regression
coefficients (CM_alpha z_median ~16, Mobility_alpha ~22) with a converged
NUTS gold, attributed to finite-K proposal bias but with no evidence the
bias decays with K.  This sweep:

1. runs the NUTS gold once (same reduced covid + realistic counts as
   ``results/moments_vs_hmc_covid.json``),
2. runs the independent SMC implementation on the SAME posterior (different
   code path, different failure modes) and records SMC-vs-NUTS agreement —
   the covid entry of the moments_vs_smc_* set,
3. fits MP QEM at K in {10, 30, 100, 300} and records the per-variable
   z-score trend vs the NUTS gold.

Writes results/covid_k_sweep.json and results/moments_vs_smc_covid.json.
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "models"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np

from moments_vs_hmc_covid import build_problem


class _Gold:
    """Shim so cached gold draws present the same `.data` face as live ones."""

    def __init__(self, data):
        self.data = data


def load_or_run_gold(problem, draws, warmup, chains, seed, max_depth):
    """NUTS gold for the reduced-covid posterior, cached on disk.

    The gold costs ~an hour of 2-core CPU; the K-sweep and the corr-Q probe
    share the identical posterior (same build_problem args/seed), so the
    second consumer must not pay for it twice.
    """
    npz = os.path.join(ROOT, "results", "covid_nuts_gold.npz")
    meta = os.path.join(ROOT, "results", "covid_nuts_gold_meta.json")
    key = {"draws": draws, "warmup": warmup, "chains": chains, "seed": seed,
           "max_depth": max_depth}
    if os.path.exists(npz) and os.path.exists(meta):
        with open(meta) as f:
            m = json.load(f)
        if all(m.get(k) == v for k, v in key.items()):
            z = np.load(npz)
            print("NUTS gold: loaded cache", npz, flush=True)
            return {k: _Gold(z[k]) for k in z.files}, m["diag"], 0.0
    from alan_tpu.nuts import run_nuts
    t0 = time.time()
    gold, diag = run_nuts(problem.P, dict(problem._data), num_samples=draws,
                          num_warmup=warmup, num_chains=chains,
                          key=jax.random.key(seed + 1), max_depth=max_depth)
    nuts_time = time.time() - t0
    np.savez(npz, **{k: np.asarray(h.data) for k, h in gold.items()})
    jdiag = {k: (float(v) if np.ndim(v) == 0 else np.asarray(v).tolist())
             for k, v in diag.items()}
    with open(meta, "w") as f:
        json.dump(dict(key, diag=jdiag, nuts_time_s=nuts_time), f, indent=1)
    return gold, jdiag, nuts_time


def _moment_table(marg, gold, mean):
    """{var: (mp, gold_mean, stderr)} aligned arrays."""
    from alan_tpu.dims import as_dt, dims_of
    out = {}
    for name, h in gold.items():
        try:
            mp_mom = marg._moments(name, mean)
        except Exception:
            continue
        arr = np.asarray(h.data)                       # (draw, chain, ...)
        gm = arr.mean(axis=(0, 1))
        chain_means = arr.mean(axis=0)
        stderr = chain_means.std(axis=0, ddof=1) / np.sqrt(arr.shape[1])
        stderr = np.maximum(stderr, 0.02 * np.maximum(np.abs(gm), 0.05))
        mp = np.asarray(as_dt(mp_mom).with_dims_front(
            tuple(dims_of(mp_mom))).data)
        if gm.shape != mp.shape:
            continue
        out[name] = (mp, gm, stderr)
    return out


def run(nRs=16, nDs=25, Ks=(10, 30, 100, 300), iters=150, draws=500,
        warmup=500, chains=4, seed=0, max_depth=8, smc_particles=2048,
        skip_smc=False):
    from alan_tpu import train, mean
    from alan_tpu.smc import run_smc

    problem = build_problem(nRs, nDs, seed)
    data_flat = dict(problem._data)

    gold, diag, nuts_time = load_or_run_gold(problem, draws, warmup, chains,
                                             seed, max_depth)

    # --- SMC on the same posterior: independent code path (#8) ----------
    if skip_smc:   # moments_vs_smc_covid.json already recorded
        return _mp_sweep(f"covid nRs={nRs} nDs={nDs} (REDUCED, same posterior "
                         f"as moments_vs_hmc_covid.json)",
                         gold, diag, nRs, nDs, Ks, iters, seed)
    t0 = time.time()
    smc_samples, smc_info = run_smc(problem.P, data_flat,
                                    num_particles=smc_particles,
                                    key=jax.random.key(seed + 5))
    smc_time = time.time() - t0
    smc_rec = {"model": f"covid nRs={nRs} nDs={nDs} (REDUCED, same posterior "
                        f"as moments_vs_hmc_covid.json)",
               "sampler": "smc", "num_particles": smc_particles,
               "smc_time_s": smc_time, "nuts_time_s": nuts_time,
               "smc_diag": {"log_Z": float(smc_info["log_Z"]),
                            "stages": int(smc_info["stages"])},
               "smc_vs_nuts": {}}
    zs = []
    for name, h in gold.items():
        if name not in smc_samples:
            continue
        arr = np.asarray(h.data)
        gm = arr.mean(axis=(0, 1))
        chain_means = arr.mean(axis=0)
        stderr = chain_means.std(axis=0, ddof=1) / np.sqrt(arr.shape[1])
        stderr = np.maximum(stderr, 0.02 * np.maximum(np.abs(gm), 0.05))
        sm = np.asarray(smc_samples[name].data).mean(axis=0)
        if sm.shape != gm.shape:
            continue
        z = np.abs(sm - gm) / stderr
        zs.append(z.ravel())
        smc_rec["smc_vs_nuts"][name] = {
            "mse": float(np.mean((sm - gm) ** 2)),
            "z_median": float(np.median(z)), "z_max": float(z.max()),
            "frac_z_lt_5": float(np.mean(z < 5.0))}
    if zs:
        allz = np.concatenate(zs)
        smc_rec["overall"] = {"n_coords": int(allz.size),
                              "z_median": float(np.median(allz)),
                              "frac_z_lt_5": float(np.mean(allz < 5.0))}
    with open(os.path.join(ROOT, "results", "moments_vs_smc_covid.json"),
              "w") as f:
        json.dump(smc_rec, f, indent=1)
    print("SMC-vs-NUTS:", json.dumps(smc_rec.get("overall")), flush=True)

    return _mp_sweep(smc_rec["model"], gold, diag, nRs, nDs, Ks, iters, seed)


def _mp_sweep(model_label, gold, diag, nRs, nDs, Ks, iters, seed):
    # --- MP K-sweep vs the NUTS gold (#5) -------------------------------
    from alan_tpu import train, mean
    sweep = {"model": model_label, "Ks": list(Ks), "iters": iters,
             "nuts_diag": {k: (float(v) if np.ndim(v) == 0 else
                               np.asarray(v).tolist()[:8])
                           for k, v in diag.items()},
             "by_K": {}}
    out_path = os.path.join(ROOT, "results", "covid_k_sweep.json")
    if os.path.exists(out_path):     # merge: single-K reruns keep prior arms
        with open(out_path) as f:
            prior = json.load(f)
        sweep["by_K"].update(prior.get("by_K", {}))
        sweep["Ks"] = sorted({*prior.get("Ks", []), *Ks})
    from alan_tpu import Split, no_checkpoint
    for K in Ks:
        problem_k = build_problem(nRs, nDs, seed)        # fresh params
        # K=300's nRs-broadcast cross-K factor is ~35 GB unsplit (OOM on one
        # v5e chip); Split along the region plate keeps each chunk in HBM.
        strat = Split("nRs", 2) if K >= 300 else no_checkpoint
        t0 = time.time()
        train.fit(problem_k, method="qem", K=K, iters=iters, lr="0.1/t@100",
                  computation_strategy=strat)
        s = problem_k.sample(K=K, reparam=False, key=jax.random.key(seed + 2))
        marg = s.marginals(computation_strategy=strat)
        mp_time = time.time() - t0
        tab = _moment_table(marg, gold, mean)
        rec = {"mp_time_s": mp_time, "variables": {}}
        allz = []
        for name, (mp, gm, stderr) in tab.items():
            z = np.abs(mp - gm) / stderr
            allz.append(z.ravel())
            rec["variables"][name] = {
                "mse": float(np.mean((mp - gm) ** 2)),
                "z_median": float(np.median(z)), "z_max": float(z.max()),
                "frac_z_lt_5": float(np.mean(z < 5.0))}
        if allz:
            az = np.concatenate(allz)
            rec["overall"] = {"z_median": float(np.median(az)),
                              "z_p90": float(np.percentile(az, 90)),
                              "frac_z_lt_5": float(np.mean(az < 5.0))}
        sweep["by_K"][str(K)] = rec
        print(f"K={K}:", json.dumps(rec["overall"]),
              {v: round(rec["variables"][v]["z_median"], 1)
               for v in ("CM_alpha", "Mobility_alpha")
               if v in rec["variables"]}, flush=True)
        with open(os.path.join(ROOT, "results", "covid_k_sweep.json"),
                  "w") as f:               # incremental save: each K is
            json.dump(sweep, f, indent=1)  # hours of 2-core CPU work
    return sweep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--nRs", type=int, default=16)
    ap.add_argument("--nDs", type=int, default=25)
    ap.add_argument("--Ks", type=int, nargs="+", default=[10, 30, 100, 300])
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--draws", type=int, default=500)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-smc", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        ROOT, "results", "covid_k_sweep.json"))
    a = ap.parse_args()
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    r = run(a.nRs, a.nDs, tuple(a.Ks), a.iters, a.draws, seed=a.seed,
            skip_smc=a.skip_smc)
    with open(a.out, "w") as f:
        json.dump(r, f, indent=1)
    print(json.dumps(r.get("by_K", {}).get(str(a.Ks[-1]), {}).get("overall"),
                     indent=1))


if __name__ == "__main__":
    main()
