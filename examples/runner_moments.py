"""Moment-accuracy comparison harness: MP inference vs in-framework HMC.

Parity purpose: reference ``examples/runner_moments_HMC.py`` /
``runner_moments_blackjax.py`` compare MP moments against external NUTS
baselines.  Here the gold standard is the framework's own HMC
(``alan_tpu.mcmc``), so the whole comparison runs on-device:

    python examples/runner_moments.py --model movielens --K 30
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


def run(model_name, K=30, iters=50, hmc_samples=500, hmc_warmup=500, seed=0,
        out=None, sampler="hmc"):
    from alan_tpu import train, mean
    from alan_tpu.mcmc import run_hmc
    from alan_tpu.nuts import run_nuts
    from alan_tpu.dims import as_dt, dims_of

    from alan_tpu.smc import run_smc

    model = __import__(model_name)
    problem, all_data, all_covariates, all_platesizes = \
        model.load_and_generate_problem(key=jax.random.key(seed), Q_param_type="qem")

    # "ground truth" posterior means from HMC/NUTS/SMC on P
    data_flat = {k: v for k, v in problem._data.items()}
    t0 = time.time()
    if sampler == "smc":
        smc_samples, info = run_smc(problem.P, data_flat,
                                    num_particles=max(hmc_samples, 256),
                                    key=jax.random.key(seed + 1))
        # normalise to the (draw, chain, ...) layout the MSE loop expects
        from alan_tpu.dims import DT as _DT
        hmc = {k: _DT(v.data[:, None], ("draw", "chain") + v.dims[1:])
               for k, v in smc_samples.items()}
        diag = {"log_Z": float(info["log_Z"]), "stages": int(info["stages"])}
    else:
        run_sampler = {"hmc": run_hmc, "nuts": run_nuts}[sampler]
        hmc, diag = run_sampler(problem.P, data_flat, num_samples=hmc_samples,
                                num_warmup=hmc_warmup, num_chains=4,
                                key=jax.random.key(seed + 1))
    hmc_time = time.time() - t0

    # train MP posterior with QEM, then compute moments
    t0 = time.time()
    train.fit(problem, method="qem", K=K, iters=iters, lr=0.1)
    s = problem.sample(K=K, reparam=False)
    marg = s.marginals()
    mp_time = time.time() - t0

    result = {"model": model_name, "K": K, "iters": iters,
              "hmc_time_s": hmc_time, "mp_time_s": mp_time,
              "hmc_diag": diag, "moment_mse": {}}
    for name, h in hmc.items():
        try:
            mp_mom = marg._moments(name, mean)
        except Exception:
            continue
        hm = np.asarray(h.data).mean(axis=(0, 1))  # over draw, chain
        mp = np.asarray(as_dt(mp_mom).with_dims_front(
            tuple(d for d in dims_of(mp_mom))).data)
        if hm.shape != mp.shape:
            continue
        result["moment_mse"][name] = float(np.mean((hm - mp) ** 2))

    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, help="jax platform override (e.g. cpu)")
    ap.add_argument("--model", required=True)
    ap.add_argument("--K", type=int, default=30)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--hmc-samples", type=int, default=500)
    ap.add_argument("--sampler", default="hmc", choices=["hmc", "nuts", "smc"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    r = run(a.model, a.K, a.iters, a.hmc_samples, seed=a.seed, out=a.out,
            sampler=a.sampler)
    print(json.dumps(r, indent=1, default=str))


if __name__ == "__main__":
    main()
