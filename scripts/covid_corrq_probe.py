"""Structured-Q attempt on covid's pinned regression-coefficient bias
(VERDICT r5 #5, second half): the K-sweep (results/covid_k_sweep.json)
shows overall MP-vs-NUTS z decaying with K (14.7 -> 3.0 over K=10..100)
while CM_alpha / Mobility_alpha stay pinned ~50 at every K — a structural
factorised-Q limitation.  This probe fits the ``corr_Q=True`` variant
(full-covariance MVN proposal over the CM_alpha block, identical
posterior) against the same NUTS gold, next to a factorised control on
the same data/seed/iters.  Writes results/covid_corrq_probe.json.
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "models"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from covid_k_sweep import _moment_table, load_or_run_gold
from moments_vs_hmc_covid import build_problem


def build_corrq(nRs, nDs, seed=0):
    import covid
    import jax.numpy as jnp
    from alan_tpu import named
    ps, _, _, _, cov, _ = covid.load_data_covariates(
        key=jax.random.key(seed), nRs=nRs, nDs=nDs)
    nT = ps["nDs"]
    rng = np.random.default_rng(seed + 17)
    li = (np.log(1000.0)
          + np.cumsum(rng.normal(0.05, 0.15, size=(nRs, nT)), axis=1))
    r = np.exp(rng.normal(0.0, 1.0, size=(nRs, 1)))
    lam = rng.gamma(shape=r, scale=np.exp(li) / r)
    y = rng.poisson(lam).astype(np.float32)
    data = {"obs": named(jnp.asarray(y), "nRs", "nDs")}
    return covid.generate_problem(ps, data, cov, "qem", corr_Q=True)


def run(nRs=16, nDs=25, Ks=(30, 100), iters=150, draws=500, warmup=500,
        chains=4, seed=0, max_depth=8):
    from alan_tpu import train, mean

    gold_problem = build_problem(nRs, nDs, seed)
    gold, diag, nuts_time = load_or_run_gold(
        gold_problem, draws, warmup, chains, seed, max_depth)

    out = {"model": f"covid nRs={nRs} nDs={nDs} (REDUCED)",
           "iters": iters, "nuts_time_s": nuts_time,
           "factorised_control_note": (
               "factorised-Q z-scores at the same seed/data/iters are in "
               "results/covid_k_sweep.json (same build_problem); this "
               "probe runs only the corr_Q arms"),
           "arms": {}}
    path = os.path.join(ROOT, "results", "covid_corrq_probe.json")
    for arm, builder in (("corr_Q", lambda: build_corrq(nRs, nDs, seed)),):
        for K in Ks:
            p = builder()
            t0 = time.time()
            train.fit(p, method="qem", K=K, iters=iters, lr="0.1/t@100")
            s = p.sample(K=K, reparam=False, key=jax.random.key(seed + 2))
            marg = s.marginals()
            mp_time = time.time() - t0
            tab = _moment_table(marg, gold, mean)
            rec = {"mp_time_s": mp_time, "variables": {}}
            allz = []
            for name, (mp, gm, stderr) in tab.items():
                z = np.abs(mp - gm) / stderr
                allz.append(z.ravel())
                rec["variables"][name] = {
                    "z_median": float(np.median(z)),
                    "z_max": float(z.max()),
                    "mse": float(np.mean((mp - gm) ** 2))}
            if allz:
                az = np.concatenate(allz)
                rec["overall"] = {"z_median": float(np.median(az)),
                                  "frac_z_lt_5": float(np.mean(az < 5.0))}
            out["arms"][f"{arm}_K{K}"] = rec
            print(f"{arm} K={K}:", json.dumps(rec["overall"]),
                  {v: round(rec["variables"][v]["z_median"], 1)
                   for v in ("CM_alpha", "Mobility_alpha", "RegionR")
                   if v in rec["variables"]}, flush=True)
            with open(path, "w") as fh:        # incremental save
                json.dump(out, fh, indent=1)
    return out


if __name__ == "__main__":
    r = run()
    path = os.path.join(ROOT, "results", "covid_corrq_probe.json")
    with open(path, "w") as fh:
        json.dump(r, fh, indent=1)
    print("->", path)
