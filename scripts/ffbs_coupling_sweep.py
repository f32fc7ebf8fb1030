"""Quantify the conditional-FFBS approximation error vs coupling strength
(VERDICT r3 #8): obs = ts1 + c*ts2 for c in {0.1..1.0}, comparing the exact
joint smoother and the linear-cost conditional pass against the ANALYTIC
Kalman posterior mean.

The conditional pass (``reduce_ks._ffbs_conditional``) smooths each chain
conditioned on a single sampled trajectory of the other, which biases
moments when chains are strongly coupled through the likelihood; the sweep
measures that bias so the routing threshold ``ALAN_TPU_FFBS_JOINT_MAX``
(default 4096) and the accuracy bound in ``tests/test_ts_decomp.py`` rest
on data rather than hand-set floors.  Reference analog of the machinery
being improved on: ``/root/reference/src/alan/reduce_Ks.py:104-232``.

Writes results/ffbs_coupling_sweep.json.
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from alan_tpu import Normal, Timeseries, Plate, BoundPlate, Data, Problem, mean, named

T = 6
A1, A2 = 0.9, 0.5
init_scale = 1.0
ts_noise_scale = 0.4
obs_noise_scale = 1.0


def _ar1_cov(A):
    cov = np.zeros((T, T))
    diag_var = init_scale ** 2
    for i in range(T):
        diag_var = diag_var * A ** 2 + ts_noise_scale ** 2
        future = diag_var * A ** np.arange(T - i)
        cov[i, i:] = future
        cov[i:, i] = future
    return cov


def build(c, seed=21):
    """(problem, analytic posterior means for ts1/ts2) at coupling c."""
    P = Plate(
        init1=Normal(0, init_scale),
        init2=Normal(0, init_scale),
        T=Plate(
            ts1=Timeseries("init1",
                           Normal(lambda prev: A1 * prev, ts_noise_scale)),
            ts2=Timeseries("init2",
                           Normal(lambda prev: A2 * prev, ts_noise_scale)),
            obs=Normal(lambda ts1, ts2: ts1 + c * ts2, obs_noise_scale),
        ),
    )
    Q = Plate(
        init1=Normal(0, 1), init2=Normal(0, 1),
        T=Plate(ts1=Normal(0, 1), ts2=Normal(0, 1), obs=Data()),
    )
    C1, C2 = _ar1_cov(A1), _ar1_cov(A2)
    S = C1 + c * c * C2 + obs_noise_scale ** 2 * np.eye(T)
    rng = np.random.default_rng(seed)
    y = np.linalg.cholesky(S) @ rng.standard_normal(T)
    Sinv_y = np.linalg.solve(S, y)
    post1 = C1 @ Sinv_y
    post2 = c * (C2 @ Sinv_y)
    ps = {"T": T}
    problem = Problem(BoundPlate(P, ps), BoundPlate(Q, ps),
                      {"obs": named(jnp.asarray(y, jnp.float32), "T")})
    return problem, post1, post2


def estimate(problem, route_joint, K=16, N=4000, reps=8, key0=0):
    """Mean importance-sample estimates of (ts1, ts2) over ``reps`` keys.
    ``route_joint``: force the exact joint smoother (cap high) or the
    conditional pass (cap 1)."""
    os.environ["ALAN_TPU_FFBS_JOINT_MAX"] = "100000" if route_joint else "1"
    try:
        ests = []
        for r in range(reps):
            k = jax.random.fold_in(jax.random.key(key0), r)
            s = problem.sample(K=K, reparam=False, key=k)
            isamp = s.importance_sample(N, key=jax.random.fold_in(k, 999))
            e1 = np.asarray(isamp._moments("ts1", mean).data)
            e2 = np.asarray(isamp._moments("ts2", mean).data)
            ests.append(np.stack([e1, e2]))
        ests = np.stack(ests)                     # (reps, 2, T)
    finally:
        del os.environ["ALAN_TPU_FFBS_JOINT_MAX"]
    return ests.mean(0), ests.std(0, ddof=1) / np.sqrt(ests.shape[0])


def main():
    out = {"T": T, "A1": A1, "A2": A2, "K": 16, "N": 4000, "reps": 8,
           "couplings": {}}
    for c in (0.1, 0.25, 0.5, 0.75, 1.0):
        problem, post1, post2 = build(c)
        truth = np.stack([post1, post2])
        res = {}
        for tag, joint in (("joint", True), ("conditional", False)):
            est, se = estimate(problem, joint)
            bias = est - truth
            res[tag] = {
                "max_abs_bias": float(np.max(np.abs(bias))),
                "mean_abs_bias": float(np.mean(np.abs(bias))),
                "max_stderr": float(np.max(se)),
                "max_bias_over_stderr": float(np.max(np.abs(bias) /
                                                     np.maximum(se, 1e-9))),
            }
        out["couplings"][str(c)] = res
        print(f"c={c}: joint bias {res['joint']['max_abs_bias']:.4f} "
              f"(z={res['joint']['max_bias_over_stderr']:.1f}), "
              f"conditional bias {res['conditional']['max_abs_bias']:.4f} "
              f"(z={res['conditional']['max_bias_over_stderr']:.1f})",
              flush=True)
    path = os.path.join(ROOT, "results", "ffbs_coupling_sweep.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
