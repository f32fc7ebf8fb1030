"""SMC particle-count trend for the covid independent-sampler hedge.

``results/moments_vs_smc_covid.json`` records SMC-vs-NUTS disagreement at
2048 particles on the 382-dim reduced-covid posterior (overall z_median
~32).  On its own that number cannot distinguish "the NUTS gold is wrong"
from "2048 particles is far too few for 382 dims".  This probe runs the
same SMC (identical posterior, cached NUTS gold) at a sweep of particle
counts and records the z-vs-particles direction: a decaying trend means
SMC is converging TOWARD the NUTS gold, which is the hedge the record is
for (reference analog: the third-party-sampler cross-checks in
examples/runner_moments_HMC.py:10-14).

Merges a ``particle_trend`` field into results/moments_vs_smc_covid.json.
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

from covid_k_sweep import load_or_run_gold
from moments_vs_hmc_covid import build_problem


def zstats(samples, gold):
    zs, per_var = [], {}
    for name, h in gold.items():
        if name not in samples:
            continue
        arr = np.asarray(h.data)
        gm = arr.mean(axis=(0, 1))
        chain_means = arr.mean(axis=0)
        stderr = chain_means.std(axis=0, ddof=1) / np.sqrt(arr.shape[1])
        stderr = np.maximum(stderr, 0.02 * np.maximum(np.abs(gm), 0.05))
        sm = np.asarray(samples[name].data).mean(axis=0)
        if sm.shape != gm.shape:
            continue
        z = np.abs(sm - gm) / stderr
        zs.append(z.ravel())
        per_var[name] = {"z_median": float(np.median(z)),
                         "frac_z_lt_5": float(np.mean(z < 5.0))}
    allz = np.concatenate(zs)
    return {"n_coords": int(allz.size), "z_median": float(np.median(allz)),
            "frac_z_lt_5": float(np.mean(allz < 5.0)),
            "variables": per_var}


def run(nRs=16, nDs=25, particle_counts=(256, 1024, 4096), seed=0,
        draws=500, warmup=500, chains=4, max_depth=8):
    from alan_tpu.smc import run_smc

    problem = build_problem(nRs, nDs, seed)
    data_flat = dict(problem._data)
    gold, _, _ = load_or_run_gold(problem, draws, warmup, chains, seed,
                                  max_depth)

    path = os.path.join(ROOT, "results", "moments_vs_smc_covid.json")
    with open(path) as f:
        rec = json.load(f)
    trend = rec.setdefault("particle_trend", {})
    # NOTE: the main record's 2048-particle z was computed against an
    # earlier NUTS-gold realization (pre-caching); the trend recomputes
    # every count against the one cached gold so z values are comparable.

    for n in particle_counts:
        if str(n) in trend:
            print(f"particles={n}: cached", flush=True)
            continue
        t0 = time.time()
        samples, info = run_smc(problem.P, data_flat, num_particles=n,
                                key=jax.random.key(seed + 5))
        dt = time.time() - t0
        st = zstats(samples, gold)
        st["log_Z"] = float(info["log_Z"])
        st["stages"] = int(info["stages"])
        st["smc_time_s"] = dt
        trend[str(n)] = st
        print(f"particles={n}: z_median={st['z_median']:.2f} "
              f"frac<5={st['frac_z_lt_5']:.3f} logZ={st['log_Z']:.1f} "
              f"({dt:.0f}s)", flush=True)
        with open(path, "w") as f:          # incremental save per count
            json.dump(rec, f, indent=1)

    ordered = sorted(trend, key=int)
    rec["particle_trend_note"] = (
        "SMC-vs-NUTS overall z by particle count (same posterior, same "
        "cached NUTS gold, key seed+5): "
        + ", ".join(f"{n}: {trend[n]['z_median']:.1f}" for n in ordered))
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(rec["particle_trend_note"])
    return rec


if __name__ == "__main__":
    counts = tuple(int(a) for a in sys.argv[1:]) or (256, 1024, 4096)
    run(particle_counts=counts)
