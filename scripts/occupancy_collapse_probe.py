"""Root-cause probe for occupancy's QEM variance collapse (VERDICT r5 #6).

The latent-recovery test caps occupancy's calibrated-coverage bar at 0.70
(vs 0.85 everywhere else) because coverage DECREASES with training
(77% @60 iters -> 61% @150 at fixed lr): Q's posterior stds tighten faster
than the means converge.  Round 3's delayed Robbins-Monro averaging
(``lr="0.1/t@N"``) fixed exactly this drift on movielens but was never
tried here.  This probe measures, per config:

* coverage (fraction of continuous latent coords within 5 posterior sd of
  the generating value — the test's metric),
* the median posterior sd (the collapse observable),
* and an RWS run at matched compute on the same model/data (different
  estimator, same factorised Q): if RWS holds coverage where fixed-lr QEM
  loses it, the cause is QEM's moment-matching update, not the Q family.

Writes results/occupancy_collapse_probe.json.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "models"))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from alan_tpu import train, mean, mean2
from alan_tpu.dims import as_dt, dims_of, slice_dim

SKIP = ("z",)          # discrete Bernoulli state: residual/sd meaningless


def load(qtype, seed=0):
    import occupancy
    return occupancy.load_and_generate_problem(
        key=jax.random.key(seed), Q_param_type=qtype,
        return_fake_latents=True)


def coverage(problem, latents, K, key):
    s = problem.sample(K, reparam=False, key=key)
    marg = s.marginals()
    n_total, n_cover, sds = 0, 0, []
    per_var = {}
    for vn, true in latents.items():
        if vn in SKIP:
            continue
        true = as_dt(true)
        for d in dims_of(true):
            train_size = problem.all_platedims[d]
            if true.dim_size(d) > train_size:
                true = slice_dim(true, d, 0, train_size)
        m1 = as_dt(marg._moments((vn,), mean))
        m2 = as_dt(marg._moments((vn,), mean2))
        post_var = m2 - m1 * m1
        t = np.asarray(true.with_dims_front(m1.dims).order(*m1.dims).data)
        mu = np.asarray(m1.order(*m1.dims).data)
        sd = np.sqrt(np.clip(np.asarray(post_var.order(*m1.dims).data),
                             1e-12, None))
        z = np.abs((t - mu) / sd)
        per_var[vn] = float(np.mean(z < 5.0))
        sds.append(sd.ravel())
        n_total += z.size
        n_cover += int(np.sum(z < 5.0))
    return (n_cover / n_total, per_var,
            float(np.median(np.concatenate(sds))))


def run_config(name, method, qtype, K, iters, lr, seed=0):
    problem, _, _, _, latents = load(qtype, seed)
    elbos = train.fit(problem, method=method, K=K, iters=iters, lr=lr,
                      key=jax.random.key(1))
    elbos = np.asarray(jax.block_until_ready(
        jax.numpy.stack(list(elbos))))
    cov, per_var, med_sd = coverage(problem, latents, K,
                                    jax.random.key(2))
    rec = {"method": method, "K": K, "iters": iters, "lr": str(lr),
           "coverage": round(cov, 4), "median_post_sd": med_sd,
           "elbo_end": float(np.mean(elbos[-10:])), "per_var": per_var}
    print(name, json.dumps({k: rec[k] for k in
                            ("coverage", "median_post_sd", "elbo_end")}),
          flush=True)
    return rec


def main():
    out = {}
    # 1) reproduce the decay at fixed lr
    out["qem_fixed_it60"] = run_config("qem_fixed_it60", "qem", "qem",
                                       15, 60, 0.03)
    out["qem_fixed_it150"] = run_config("qem_fixed_it150", "qem", "qem",
                                        15, 150, 0.03)
    # 2) delayed Robbins-Monro averaging (the movielens drift fix)
    out["qem_sched_it150"] = run_config("qem_sched_it150", "qem", "qem",
                                        15, 150, "0.03/t@60")
    out["qem_sched_it300"] = run_config("qem_sched_it300", "qem", "qem",
                                        15, 300, "0.03/t@60")
    # 3) bigger K under the schedule (collapse is a low-K property)
    out["qem_K30_sched_it150"] = run_config("qem_K30_sched_it150", "qem",
                                            "qem", 30, 150, "0.1/t@60")
    # 4) RWS at matched compute: same Q family, gradient estimator instead
    #    of moment matching
    out["rws_it150"] = run_config("rws_it150", "rws", "opt", 15, 150, 0.01)
    out["rws_it300"] = run_config("rws_it300", "rws", "opt", 15, 300, 0.01)

    path = os.path.join(ROOT, "results", "occupancy_collapse_probe.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
