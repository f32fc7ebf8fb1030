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
        warmup=500, chains=4, seed=0, max_depth=8, smc_particles=2048):
    from alan_tpu import train, mean
    from alan_tpu.nuts import run_nuts
    from alan_tpu.smc import run_smc

    problem = build_problem(nRs, nDs, seed)
    data_flat = dict(problem._data)

    t0 = time.time()
    gold, diag = run_nuts(problem.P, data_flat, num_samples=draws,
                          num_warmup=warmup, num_chains=chains,
                          key=jax.random.key(seed + 1), max_depth=max_depth)
    nuts_time = time.time() - t0

    # --- SMC on the same posterior: independent code path (#8) ----------
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

    # --- MP K-sweep vs the NUTS gold (#5) -------------------------------
    sweep = {"model": smc_rec["model"], "Ks": list(Ks), "iters": iters,
             "nuts_diag": {k: (float(v) if np.ndim(v) == 0 else
                               np.asarray(v).tolist()[:8])
                           for k, v in diag.items()},
             "by_K": {}}
    for K in Ks:
        problem_k = build_problem(nRs, nDs, seed)        # fresh params
        t0 = time.time()
        train.fit(problem_k, method="qem", K=K, iters=iters, lr="0.1/t@100")
        s = problem_k.sample(K=K, reparam=False, key=jax.random.key(seed + 2))
        marg = s.marginals()
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
    ap.add_argument("--out", default=os.path.join(
        ROOT, "results", "covid_k_sweep.json"))
    a = ap.parse_args()
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    r = run(a.nRs, a.nDs, tuple(a.Ks), a.iters, a.draws, seed=a.seed)
    with open(a.out, "w") as f:
        json.dump(r, f, indent=1)
    print(json.dumps(r.get("by_K", {}).get(str(a.Ks[-1]), {}).get("overall"),
                     indent=1))


if __name__ == "__main__":
    main()
