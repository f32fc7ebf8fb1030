"""Training-quality tests: the fused steps actually converge Q to the
analytic posterior on a conjugate model."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alan_tpu import (Normal, Plate, BoundPlate, Problem, Data, QEMParam,
                      OptParam, named, train)

prior_mean, prior_scale = 2.0, 2.0
like_scale = 3.0
N = 10


def _problem(qtype):
    rng = np.random.default_rng(42)
    data_np = 1.5 + rng.standard_normal(N).astype(np.float32)
    prior_prec = 1 / prior_scale**2
    like_prec = 1 / like_scale**2
    post_prec = prior_prec + N * like_prec
    post_mean = (prior_prec * prior_mean + like_prec * data_np.sum()) / post_prec

    P = Plate(
        a=Normal(prior_mean, prior_scale),
        T=Plate(d=Normal('a', like_scale)),
    )
    if qtype == "qem":
        Q = Plate(
            a=Normal(QEMParam(0.), QEMParam(4.)),
            T=Plate(d=Data()),
        )
    else:
        Q = Plate(
            a=Normal(OptParam(0.), OptParam(jnp.log(4.), transformation=jnp.exp)),
            T=Plate(d=Data()),
        )
    Pb = BoundPlate(P, {'T': N})
    Qb = BoundPlate(Q, {'T': N}, )
    prob = Problem(Pb, Qb, {'d': named(jnp.asarray(data_np), 'T')})
    return prob, post_mean, 1 / np.sqrt(post_prec)


def test_qem_converges_to_posterior():
    prob, post_mean, post_sd = _problem("qem")
    train.fit(prob, method="qem", K=100, iters=150, lr=0.3)
    q = prob.Q.qem_params()
    assert abs(float(q["a_loc"].data) - post_mean) < 0.1
    assert abs(float(q["a_scale"].data) - post_sd) < 0.12


def test_vi_converges_to_posterior():
    # K=1 MP-ELBO == classic ELBO, whose optimum on a conjugate model is the
    # exact posterior.  (At larger K the MP bound tightens toward log Z and
    # Q-gradients weaken — the IWAE SNR effect — so Q needn't match the
    # posterior; that regime is covered by the elbo-improvement check.)
    prob, post_mean, post_sd = _problem("opt")
    train.fit(prob, method="vi", K=1, iters=1500, lr=0.05)
    q = prob.Q.opt_params()
    assert abs(float(q["a_loc"].data) - post_mean) < 0.2
    assert abs(float(q["a_scale"].data) - post_sd) < 0.2


def test_rws_converges_to_posterior():
    # wake-phase Q update: importance-weighted logQ ascent pulls Q onto the
    # posterior even at K=30
    prob, post_mean, post_sd = _problem("opt")
    train.fit(prob, method="rws", K=30, iters=400, lr=0.05)
    q = prob.Q.opt_params()
    assert abs(float(q["a_loc"].data) - post_mean) < 0.2
    assert abs(float(q["a_scale"].data) - post_sd) < 0.2


def test_qem_lr_schedule_converges_and_stabilises():
    """QEM lr schedules: '1/t' and delayed '<lr0>/t@<T0>' run through the
    step/fit/scan_steps machinery (state carries the iteration counter) and
    converge Q to the conjugate posterior.  Delayed averaging is the
    fixed-lr drift fix (measured full-size: fixed 0.1 bottoms at 6.3% rel
    moment error then wanders to 31% by iter 1500; '0.1/t@200' holds the
    floor — docs/performance.md)."""
    prob, post_mean, post_sd = _problem("qem")
    step, state = train.qem(prob, 30, lr="0.1/t@50")
    # state is ((sP, sQ), t)
    (sPQ, t0) = state
    assert float(t0) == 0.0
    state, _ = step(state, jax.random.key(0))
    assert float(state[1]) == 1.0

    run = train.scan_steps(step, 200)
    state, elbos = run(state, jax.random.key(1))
    assert np.all(np.isfinite(np.asarray(elbos)))
    q = state[0][1]["qem_params"]
    assert abs(float(q["a_loc"].data) - post_mean) < 0.2
    assert abs(float(q["a_scale"].data) - post_sd) < 0.2

    # fit() unwraps the schedule state when writing back
    prob2, post_mean2, post_sd2 = _problem("qem")
    train.fit(prob2, method="qem", K=30, iters=150, lr="1/t",
              fuse_iters=True)
    q2 = prob2.Q.qem_params()
    assert abs(float(q2["a_loc"].data) - post_mean2) < 0.3

    with pytest.raises(ValueError, match="schedule"):
        train.qem(prob, 4, lr="bogus/t")


def test_jitted_predictive_pipeline_matches_eager():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                    "examples", "models"))
    import movielens
    from alan_tpu.predict import predictive_ll_fn
    platesizes, all_ps, data, all_data, cov, all_cov = \
        movielens.load_data_covariates(key=jax.random.key(0), M=16, N=2)
    problem = movielens.generate_problem(platesizes, data, cov, "qem")
    f = predictive_ll_fn(problem, K=5, N=50, extended_platesizes=all_ps)
    out = f(problem.P.state(), problem.Q.state(), all_cov, all_data,
            jax.random.key(3))
    assert np.isfinite(float(out["obs"]))
    # same seed -> deterministic
    out2 = f(problem.P.state(), problem.Q.state(), all_cov, all_data,
             jax.random.key(3))
    assert float(out["obs"]) == float(out2["obs"])


def test_jitted_importance_sample_fn():
    """`predict.importance_sample_fn` compiles the full reverse-replay
    pipeline; draws carry the N dim and their moments sit near the exact
    marginals oracle."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                    "examples", "models"))
    import movielens
    from alan_tpu.predict import importance_sample_fn
    from alan_tpu.dims import as_dt, dims_of, logmeanexp_dims
    platesizes, all_ps, data, all_data, cov, all_cov = \
        movielens.load_data_covariates(key=jax.random.key(0), M=16, N=2)
    problem = movielens.generate_problem(platesizes, data, cov, "qem")
    N = 1000
    f = importance_sample_fn(problem, K=10, N=N)
    draws = f(problem.P.state(), problem.Q.state(), jax.random.key(3))
    assert set(draws) == {"mu_z", "psi_z", "z"}
    for k, v in draws.items():
        v = as_dt(v)
        assert "N" in dims_of(v), k
        assert v.dim_size("N") == N
        assert np.all(np.isfinite(np.asarray(v.data))), k
    # deterministic under the same key
    draws2 = f(problem.P.state(), problem.Q.state(), jax.random.key(3))
    assert np.array_equal(np.asarray(as_dt(draws["z"]).data),
                          np.asarray(as_dt(draws2["z"]).data))
    # jitted == eager on the SAME keys: replicate f's internal key split
    # and run the object-API path
    from alan_tpu.sample import Sample
    from alan_tpu.sampler import PermutationSampler
    from alan_tpu.split import no_checkpoint
    k1, k2 = jax.random.split(jax.random.key(3))
    tree, gv2K = problem.Q._sample(10, False, PermutationSampler,
                                   problem.all_platedims, k1,
                                   state=problem.Q.state())
    s_eager = Sample(problem, tree, gv2K, PermutationSampler, False,
                     states=(problem.P.state(), problem.Q.state()))
    eager = s_eager.importance_sample(N, no_checkpoint, key=k2).dump()
    for k in draws:
        a = as_dt(draws[k]); b = as_dt(eager[k])
        np.testing.assert_allclose(
            np.asarray(a.data), np.asarray(b.with_dims_front(a.dims).data),
            rtol=1e-5, atol=1e-5, err_msg=k)


def test_qem_multivariate_normal():
    """QEM with a MultivariateNormal proposal (MVN conversions path)."""
    from alan_tpu import MultivariateNormal, Data, Plate, BoundPlate, Problem
    import jax.numpy as jnp
    F = 2
    rng = np.random.default_rng(3)
    prior_cov = jnp.eye(F) * 2.0
    like_cov = jnp.eye(F)
    d = jnp.asarray(rng.standard_normal(F), jnp.float32)
    P = Plate(
        a=MultivariateNormal(jnp.zeros(F), prior_cov),
        d=MultivariateNormal('a', like_cov),
    )
    Q = Plate(
        a=MultivariateNormal(QEMParam(jnp.zeros(F)),
                             QEMParam(jnp.eye(F) * 3.0)),
        d=Data(),
    )
    prob = Problem(BoundPlate(P, {}), BoundPlate(Q, {}), {'d': d})
    train.fit(prob, method="qem", K=300, iters=80, lr=0.4)
    q = prob.Q.qem_params()
    post_cov = np.linalg.inv(np.linalg.inv(np.asarray(prior_cov))
                             + np.linalg.inv(np.asarray(like_cov)))
    post_mean = post_cov @ np.linalg.inv(np.asarray(like_cov)) @ np.asarray(d)
    assert np.allclose(np.asarray(q['a_loc'].data), post_mean, atol=0.25)
    assert np.allclose(np.asarray(q['a_covariance_matrix'].data), post_cov,
                       atol=0.4)


def test_qem_gamma_conjugate():
    """QEM with a Gamma proposal on a Gamma-Poisson conjugate model (Minka
    generalised-Newton mean2conv path)."""
    from alan_tpu import Gamma, Poisson, Data, Plate, BoundPlate, Problem
    import jax.numpy as jnp
    a0, b0 = 3.0, 1.0
    counts = np.array([2., 4., 3., 5., 1., 2., 6., 3., 2., 4.], np.float32)
    N = len(counts)
    P = Plate(
        rate=Gamma(a0, b0),
        T=Plate(obs=Poisson('rate')),
    )
    Q = Plate(
        rate=Gamma(QEMParam(2.0), QEMParam(1.0)),
        T=Plate(obs=Data()),
    )
    prob = Problem(BoundPlate(P, {'T': N}), BoundPlate(Q, {'T': N}),
                   {'obs': named(jnp.asarray(counts), 'T')})
    train.fit(prob, method="qem", K=300, iters=100, lr=0.4)
    q = prob.Q.qem_params()
    post_a, post_b = a0 + counts.sum(), b0 + N
    post_mean = post_a / post_b
    est_mean = float(q['rate_concentration'].data) / float(q['rate_rate'].data)
    assert abs(est_mean - post_mean) < 0.2, (est_mean, post_mean)


def test_qem_beta_conjugate():
    """QEM with a Beta proposal on Beta-Bernoulli (Dirichlet fixed-point +
    Newton mean2conv path)."""
    from alan_tpu import Beta, Bernoulli, Data, Plate, BoundPlate, Problem
    import jax.numpy as jnp
    flips = np.array([1., 1., 0., 1., 1., 1., 0., 1., 1., 1.], np.float32)
    N = len(flips)
    P = Plate(p=Beta(2., 1.), T=Plate(coin=Bernoulli('p')))
    Q = Plate(p=Beta(QEMParam(1.), QEMParam(1.)), T=Plate(coin=Data()))
    prob = Problem(BoundPlate(P, {'T': N}), BoundPlate(Q, {'T': N}),
                   {'coin': named(jnp.asarray(flips), 'T')})
    train.fit(prob, method="qem", K=300, iters=100, lr=0.4)
    q = prob.Q.qem_params()
    c1, c0 = float(q['p_concentration1'].data), float(q['p_concentration0'].data)
    post_mean = (2 + flips.sum()) / (3 + N)
    assert abs(c1 / (c1 + c0) - post_mean) < 0.07, (c1, c0, post_mean)


def test_global_methods_run():
    for method in ("global_vi", "global_rws", "global_qem"):
        prob, pm, psd = _problem("qem" if method == "global_qem" else "opt")
        elbos = train.fit(prob, method=method, K=50, iters=5, lr=0.05)
        assert np.all(np.isfinite(np.asarray(elbos))), method


def test_step_state_signature_stable():
    """The state returned by one step must have identical avals (incl.
    weak_type) to the factory's initial state — a mismatch silently
    recompiles the whole program on the SECOND call (observed: covid RWS at
    1-3 s/step mean over short runs vs 2 ms steady-state, from weak-typed
    Adam moments)."""
    def sig(tree):
        return jax.tree.map(lambda x: (jnp.shape(x), jnp.result_type(x),
                                       getattr(x, "weak_type", None)), tree)

    for qtype, factory in [("opt", train.vi), ("opt", train.rws),
                           ("qem", train.qem), ("opt", train.global_vi),
                           ("opt", train.global_rws), ("qem", train.global_qem)]:
        problem, _, _ = _problem(qtype)
        step, state0 = factory(problem, 3, lr=0.01)
        state1, _ = step(state0, jax.random.key(0))
        f0 = jax.tree_util.tree_flatten_with_path(sig(state0))[0]
        f1 = jax.tree_util.tree_flatten_with_path(sig(state1))[0]
        diffs = [(jax.tree_util.keystr(p0), v0, v1)
                 for (p0, v0), (_, v1) in zip(f0, f1) if v0 != v1]
        assert not diffs, (factory.__name__, diffs[:5])


@pytest.mark.parametrize("method", ["qem", "vi", "rws"])
def test_scan_steps_matches_eager_loop(method):
    # fuse_iters runs the whole loop as one lax.scan program; the key
    # schedule (fold_in(key, i)) matches the eager loop, so the per-step
    # ELBO trajectories must agree.
    prob, _, _ = _problem("qem" if method == "qem" else "opt")
    e_eager = train.fit(prob, method=method, K=7, iters=5,
                        key=jax.random.key(3))
    prob2, _, _ = _problem("qem" if method == "qem" else "opt")
    e_scan = train.fit(prob2, method=method, K=7, iters=5,
                       key=jax.random.key(3), fuse_iters=True)
    np.testing.assert_allclose(np.asarray(e_eager), np.asarray(e_scan),
                               rtol=2e-5, atol=2e-5)


def test_vmap_runs_matches_per_run_scan():
    # each row of vmap_runs equals an independent scanned run with the
    # corresponding folded key
    prob, _, _ = _problem("qem")
    step, state0 = train.qem(prob, K=7, lr=0.2)
    key = jax.random.key(11)
    states, elbos = train.vmap_runs(step, n_steps=4, n_runs=3)(state0, key)
    assert elbos.shape == (3, 4)
    run = train.scan_steps(step, 4)
    for r in range(3):
        _, e = run(state0, jax.random.fold_in(key, r))
        np.testing.assert_allclose(np.asarray(elbos[r]), np.asarray(e),
                                   rtol=2e-5, atol=2e-5)
    # distinct keys => distinct trajectories
    assert not np.allclose(np.asarray(elbos[0]), np.asarray(elbos[1]))
