"""Full-size covid QEM quality evidence (VERDICT r3 #6): train the FULL
92-region x 109-train-day model under the delayed-averaging QEM schedule
and record quality trajectories.

Data: REALISTIC synthetic counts from a KNOWN generating log-infected
trajectory (driftless 0.15-nats/day random walk around log(1000), NegBin
counts via gamma-Poisson with known per-region dispersion; zero drift
keeps the truth within a few sigma of the model/Q initialisation so the
record measures the ENGINE, not the cold-start distance — with a
0.05/day drift the truth ends ~5 nats from init and K=30 importance
weights degenerate before QEM can bootstrap, reproducing the round-3
pathological-data failure).  A raw prior
rollout is pathological here — the transition adds Expected_Log_Rs ≈ 1
nat/day so counts explode to e^30, importance weights fully degenerate,
and a first attempt measured ELBO bouncing with ~1% latent recovery; the
round-3 CI test documented the same (tests/test_latent_recovery.py covid
note).  With sane counts the posterior over log_infected is identified and
recovery is a real test of the timeseries engine.

Recorded per seed (each seed draws its own dataset):
* ELBO + extended-data predictive-LL trajectories (segments of 50 steps),
* per-segment moment drift (max relative change of the QEM means),
* recovery of the generating log_infected trajectory (standardized
  residuals in posterior-std units) and of psi (known dispersion),
* cross-seed: per-seed recovery stats (datasets differ, so coordinate-wise
  moment comparison across seeds is undefined).

Writes results/covid_full_qem_quality.json.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "models"))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

K = 30
SEG = 50
N_SEGS = 12
LR = "0.1/t@100"


def _flat(sQ):
    return np.concatenate([np.ravel(np.asarray(v.data))
                           for _, v in sorted(sQ["qem_means"].items())])


def _unwrap(state):
    if len(state) == 2 and not hasattr(state[1], "keys"):
        state, _ = state                    # schedule: ((sP, sQ), t)
    return state


def run_seed(seed):
    import covid
    from alan_tpu import train
    from alan_tpu.predict import predictive_ll_fn
    from alan_tpu.dims import as_dt

    with jax.default_device(jax.devices("cpu")[0]):
        out = covid.load_data_covariates(key=jax.random.key(seed))
        ps, all_ps, _, _, cov, all_cov = out
        # realistic synthetic counts with KNOWN generating latents
        from alan_tpu import named
        nRs_, nDs_all = all_ps["nRs"], all_ps["nDs"]
        nDs_tr = ps["nDs"]
        rng = np.random.default_rng(seed + 17)
        li = (np.log(1000.0)
              + np.cumsum(rng.normal(0.0, 0.15, size=(nRs_, nDs_all)),
                          axis=1))
        psi_true = rng.normal(0.0, 1.0, size=(nRs_,))
        r = np.exp(psi_true)[:, None]
        lam = rng.gamma(shape=r, scale=np.exp(li) / r)
        y = rng.poisson(lam).astype(np.float32)
        all_data = {"obs": named(jnp.asarray(y), "nRs", "nDs")}
        data = {"obs": named(jnp.asarray(y[:, :nDs_tr]), "nRs", "nDs")}
        lat = {"log_infected": named(
                   jnp.asarray(li[:, :nDs_tr].T, jnp.float32), "nDs", "nRs"),
               "psi": named(jnp.asarray(psi_true, jnp.float32), "nRs")}
        problem = covid.generate_problem(ps, data, cov, "qem")

    step, state = train.qem(problem, K, lr=LR)
    run = train.scan_steps(step, SEG)
    pll_f = predictive_ll_fn(problem, K=K, N=50,
                             extended_platesizes=dict(all_ps))

    rec = {"segments": []}
    prev = None
    key = jax.random.key(seed + 100)
    for s in range(N_SEGS):
        state, elbos = run(state, jax.random.fold_in(key, s))
        sP, sQ = _unwrap(state)
        flat = _flat(sQ)
        drift = (float(np.max(np.abs(flat - prev)
                              / np.maximum(np.abs(prev), 1e-3)))
                 if prev is not None else None)
        prev = flat
        pll = pll_f(sP, sQ, all_cov, all_data,
                    jax.random.fold_in(jax.random.key(seed + 200), s))
        rec["segments"].append({
            "iters": (s + 1) * SEG,
            "elbo": float(np.asarray(elbos[-1])),
            "predictive_ll": float(sum(float(v) for v in pll.values())),
            "moment_max_rel_drift": drift,
        })
        print(f"seed {seed} seg {s}: {json.dumps(rec['segments'][-1])}",
              flush=True)

    # latent recovery: standardized residuals on the continuous latents
    sP, sQ = _unwrap(state)
    means = sQ["qem_means"]
    resid = {}
    for name, true in lat.items():
        mk, m2k = f"{name}_mean", f"{name}_mean2"
        if mk not in means or m2k not in means:
            continue
        m = as_dt(means[mk])
        m2 = as_dt(means[m2k])
        t = as_dt(true)
        # align truth onto the moment's dims; extended plates are trimmed
        # to the train sizes
        try:
            t_arr = t.with_dims_front(m.dims)
        except Exception:
            continue
        ta = np.asarray(t_arr.data)
        ma = np.asarray(m.data)
        va = np.asarray(m2.data) - ma ** 2
        if ta.shape != ma.shape:
            sl = tuple(slice(0, d) for d in ma.shape)
            if all(ts >= ds for ts, ds in zip(ta.shape, ma.shape)):
                ta = ta[sl]
            else:
                continue
        std = np.sqrt(np.maximum(va, 1e-12))
        z = (ma - ta) / std
        resid[name] = {"frac_within_5std": float(np.mean(np.abs(z) < 5)),
                       "z_median_abs": float(np.median(np.abs(z))),
                       "n": int(z.size)}
    rec["latent_recovery"] = resid
    allz = [v["frac_within_5std"] * v["n"] for v in resid.values()]
    alln = [v["n"] for v in resid.values()]
    rec["latent_recovery_overall_frac_within_5std"] = (
        float(sum(allz) / sum(alln)) if alln else None)
    rec["final_flat_means"] = flat.tolist()
    return rec


def main():
    out = {"model": "covid full 92x109 (realistic synthetic counts + known generating log_infected/psi)",
           "K": K, "lr": LR, "iters_total": SEG * N_SEGS}
    flats = {}
    for seed in (0, 1, 2):
        rec = run_seed(seed)
        flats[seed] = np.asarray(rec.pop("final_flat_means"))
        out[f"seed{seed}"] = rec
    a, b = flats[0], flats[1]
    # each seed draws its own dataset, so coordinate-wise moment agreement
    # across seeds is undefined; the scale agreement of the moment vectors
    # is still a coarse stability signal
    out["cross_seed_norm_rel_diff"] = float(
        np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9))
    path = os.path.join(ROOT, "results", "covid_full_qem_quality.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
