"""Importance-sampling moment-accuracy sweep over K (parity: reference
``examples/config/moments_IS_conf.yaml`` + ``moments_paper_plots``: moment
MSE vs K for pure IS (non-MP, one global K) and for the MP estimator).

    python examples/runner_moments_IS.py --model radon --Ks 10 100 1000 30000
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "models"))

import jax
import numpy as np


def run(model_name, Ks, runs=4, seed=0, hmc_samples=1000, out=None):
    from alan_tpu import mean
    from alan_tpu.nuts import run_nuts
    from alan_tpu.dims import as_dt

    model = __import__(model_name)
    problem, *_ = model.load_and_generate_problem(
        key=jax.random.key(seed), Q_param_type="qem")

    # gold-standard moments from NUTS
    gold, diag = run_nuts(problem.P, dict(problem._data),
                          num_samples=hmc_samples, num_warmup=hmc_samples,
                          num_chains=4, key=jax.random.key(seed + 1))
    gold_means = {k: np.asarray(v.data).mean(axis=(0, 1)) for k, v in gold.items()}

    def mse_against_gold(get_moment):
        errs = []
        for name, g in gold_means.items():
            try:
                m = np.asarray(as_dt(get_moment(name)).data)
            except Exception:
                continue
            if m.shape != g.shape:
                continue
            errs.append(float(np.mean((m - g) ** 2)))
        return float(np.mean(errs)) if errs else None

    result = {"model": model_name, "nuts_diag": diag, "sweep": {}}
    for K in Ks:
        mp_mses, is_mses = [], []
        for r in range(runs):
            key = jax.random.fold_in(jax.random.key(seed + 2), K * 1000 + r)
            s = problem.sample(K=K, reparam=False, key=key)
            marg = s.marginals()
            mp_mses.append(mse_against_gold(lambda n: marg._moments(n, mean)))
            snon = problem.sample_nonmp(K=K, key=jax.random.fold_in(key, 1))
            is_mses.append(mse_against_gold(lambda n: snon._moments(n, mean)))
        result["sweep"][str(K)] = {
            "mp_moment_mse": float(np.mean([x for x in mp_mses if x is not None])),
            "global_is_moment_mse": float(np.mean([x for x in is_mses if x is not None])),
        }
        print(K, result["sweep"][str(K)], flush=True)

    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, help="jax platform override (e.g. cpu)")
    ap.add_argument("--model", required=True)
    ap.add_argument("--Ks", nargs="+", type=int, default=[10, 30, 100, 1000])
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    r = run(a.model, a.Ks, a.runs, a.seed, out=a.out)
    print(json.dumps(r, indent=1, default=str))


if __name__ == "__main__":
    main()
