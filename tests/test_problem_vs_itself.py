"""Invariance / consistency test suite
(parity: reference ``tests/test_problem_vs_itself.py``)."""
import importlib
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alan_tpu import (samplers, PermutationSampler, CategoricalSampler,
                      checkpoint, no_checkpoint)
from alan_tpu.dims import DT, as_dt, dims_of, expand_to, unify_dims
from alan_tpu.marginals import Marginals
from alan_tpu.moments import var_from_raw_moment, RawMoment

tp_names = [
    "model_model1",
    "model_bernoulli_no_plate",
    "model_linear_gaussian",
    "model_linear_gaussian_two_params",
    "model_linear_gaussian_two_params_corr_Q",
    "model_linear_gaussian_two_params_corr_Q_reversed",
    "model_linear_gaussian_two_params_dangling",
    "model_linear_gaussian_latents",
    "model_linear_gaussian_latents_dangling",
    "model_linear_gaussian_latents_batch",
    "model_linear_multivariate_gaussian",
    "model_linear_multivariate_gaussian_batch",
    "model_linear_multivariate_gaussian_param",
    "model_timeseries",
    "model_double_timeseries",
    "model_indep_timeseries",
]

tps = {name: importlib.import_module(name).tp for name in tp_names}

reparams = [True, False]
compstrats = [checkpoint, no_checkpoint]

tp_samplers = list(itertools.product(tp_names, samplers))
tp_reparam_samplers = list(itertools.product(tp_names, reparams, samplers))
tp_compstrats = list(itertools.product(tp_names, compstrats))

_key_counter = [0]


def fresh_key():
    _key_counter[0] += 1
    return jax.random.fold_in(jax.random.key(42), _key_counter[0])


def _aligned(a, b):
    """Order two dimmed tensors identically and return raw arrays."""
    a, b = as_dt(a), as_dt(b)
    assert set(dims_of(a)) == set(dims_of(b)), (dims_of(a), dims_of(b))
    return a.order(*a.dims).data, b.with_dims_front(a.dims).order(*a.dims).data


def allclose_dt(a, b, rtol=1e-4, atol=1e-5):
    x, y = _aligned(a, b)
    return np.allclose(np.asarray(x), np.asarray(y), rtol=rtol, atol=atol)


def moment_stderr(marginals, varnames, moment):
    assert isinstance(marginals, Marginals)
    assert isinstance(moment, RawMoment)
    min_ess = marginals.min_ess()
    marginal_moment = marginals._moments(varnames, moment)
    est_var = marginals._moments(varnames, var_from_raw_moment(moment))
    stderr = (est_var / float(min_ess)).sqrt()
    return marginal_moment, stderr


def combine_stderrs(s1, s2):
    return (s1 ** 2 + s2 ** 2).sqrt()


def assert_within(value, lower, upper):
    v, lo = _aligned(value, lower)
    _, hi = _aligned(value, upper)
    assert np.all(np.asarray(v) < np.asarray(hi)), (v, hi)
    assert np.all(np.asarray(lo) < np.asarray(v)), (lo, v)


@pytest.mark.parametrize("tp_name,reparam,sampler", tp_reparam_samplers)
def test_moments_sample_marginal(tp_name, reparam, sampler):
    """`marginal.moments` == `sample.moments` exactly."""
    tp = tps[tp_name]
    sample = tp.problem.sample(K=3, reparam=reparam, sampler=sampler, key=fresh_key())
    marginals = sample.marginals()
    for varnames, moment in tp.moments:
        sm = sample._moments(varnames, moment)
        mm = marginals._moments(varnames, moment)
        assert allclose_dt(sm, mm)


@pytest.mark.parametrize("tp_name,reparam,sampler", tp_reparam_samplers)
def test_moments_importance_sample(tp_name, reparam, sampler):
    """`importance_sample.moments` ≈ `marginal.moments` within 6·stderr."""
    tp = tps[tp_name]
    sample = tp.problem.sample(K=tp.moment_K, reparam=reparam, sampler=sampler,
                               key=fresh_key())
    marginals = sample.marginals()
    importance_sample = sample.importance_sample(tp.importance_N, key=fresh_key())

    for varnames, m in tp.moments:
        marginal_moment = marginals._moments(varnames, m)
        is_moment = importance_sample._moments(varnames, m)
        est_var = marginals._moments(varnames, var_from_raw_moment(m))
        stderr = (est_var / tp.importance_N).sqrt()
        assert_within(is_moment, marginal_moment - 6 * stderr,
                      marginal_moment + 6 * stderr)


@pytest.mark.parametrize("tp_name,reparam,sampler", tp_reparam_samplers)
def test_moments_ground_truth(tp_name, reparam, sampler):
    """`marginal.moments` ≈ analytic ground truth within 7·stderr."""
    tp = tps[tp_name]
    sample = tp.problem.sample(K=tp.moment_K, reparam=False, sampler=sampler,
                               key=fresh_key())
    marginals = sample.marginals()
    for (varnames, m), true_moment in tp.known_moments.items():
        marginal_moment, stderr = moment_stderr(marginals, varnames, m)
        true_dt = as_dt(true_moment)
        # broadcast plain scalars/arrays over the moment's dims
        if dims_of(true_dt) != dims_of(marginal_moment):
            assert set(dims_of(true_dt)).issubset(dims_of(marginal_moment))
            arr = expand_to(true_dt, marginal_moment.dims)
            true_dt = DT(jnp.broadcast_to(
                arr, marginal_moment.order(*marginal_moment.dims).data.shape
                if False else arr.shape), marginal_moment.dims)
        assert_within(true_dt, marginal_moment - 7 * stderr,
                      marginal_moment + 7 * stderr)


@pytest.mark.parametrize("tp_name,sampler", tp_samplers)
def test_elbo_ground_truth(tp_name, sampler):
    """ELBO brackets the analytic log-evidence (Gaussian-ELBO correction)."""
    tp = tps[tp_name]
    if tp.known_elbo is None:
        return
    N_elbos = tp.elbo_iters
    elbos = []
    for _ in range(N_elbos):
        s = tp.problem.sample(K=tp.elbo_K, reparam=False, sampler=sampler,
                              key=fresh_key())
        elbos.append(float(s.elbo_nograd()))
    e = np.array(elbos)
    sample_mean, sample_var = e.mean(), e.var(ddof=1)
    stderr_in_mean = np.sqrt(sample_var / N_elbos)
    max_mean = sample_mean + 6 * stderr_in_mean
    min_mean = sample_mean - 6 * stderr_in_mean
    stderr_in_var = np.sqrt(2 * sample_var**2 / N_elbos)
    max_var = sample_var + 6 * stderr_in_var

    max_elbo = max_mean + max_var / 2
    min_elbo = min_mean
    assert tp.known_elbo < max_elbo
    assert min_elbo < tp.known_elbo
    elbo_gap = tp.elbo_gap_cat if sampler is CategoricalSampler else tp.elbo_gap_perm
    assert max_elbo - min_elbo < elbo_gap


@pytest.mark.parametrize("tp_name,reparam,sampler", tp_reparam_samplers)
def test_moments_vs_moments(tp_name, reparam, sampler):
    """moments agree across samplers/reparam choices."""
    tp = tps[tp_name]
    problem = tp.problem
    base = problem.sample(K=tp.moment_K, reparam=False,
                          sampler=PermutationSampler, key=fresh_key()).marginals()
    test = problem.sample(K=tp.moment_K, reparam=reparam, sampler=sampler,
                          key=fresh_key()).marginals()
    for varnames, moment in tp.moments:
        bm, bs = moment_stderr(base, varnames, moment)
        tm, ts = moment_stderr(test, varnames, moment)
        diff = bm - tm
        stderr = combine_stderrs(bs, ts)
        assert_within(diff, -6 * stderr, 6 * stderr)


@pytest.mark.parametrize("tp_name,computation_strategy", tp_compstrats)
def test_compstrat_elbo_vi(tp_name, computation_strategy):
    tp = tps[tp_name]
    sample = tp.problem.sample(K=3, reparam=True, sampler=PermutationSampler,
                               key=fresh_key())
    base = sample.elbo_vi(computation_strategy=no_checkpoint)
    test = sample.elbo_vi(computation_strategy=computation_strategy)
    assert np.isclose(float(base), float(test), rtol=1e-5, atol=1e-6)
    # Split must be exact too
    split = sample.elbo_vi(computation_strategy=tp.computation_strategy)
    assert np.isclose(float(base), float(split), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("tp_name,compstrat", tp_compstrats)
def test_compstrat_elbo_rws(tp_name, compstrat):
    tp = tps[tp_name]
    sample = tp.problem.sample(K=3, reparam=False, sampler=PermutationSampler,
                               key=fresh_key())
    base = sample.elbo_rws(computation_strategy=tp.computation_strategy)
    test = sample.elbo_rws(computation_strategy=compstrat)
    assert np.isclose(float(base), float(test), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("tp_name,compstrat", tp_compstrats)
def test_compstrat_moments(tp_name, compstrat):
    tp = tps[tp_name]
    sample = tp.problem.sample(K=3, reparam=False, sampler=PermutationSampler,
                               key=fresh_key())
    base = sample.marginals(computation_strategy=tp.computation_strategy)
    test = sample.marginals(computation_strategy=compstrat)
    for varnames, moment in tp.moments:
        bm = base._moments(varnames, moment)
        tm = test._moments(varnames, moment)
        assert allclose_dt(bm, tm)


@pytest.mark.parametrize(
    "tp_name,reparam,sampler,compstrat",
    itertools.product(tp_names, reparams, samplers, [*compstrats, None]))
def test_smoke_all_configs(tp_name, reparam, sampler, compstrat):
    """Nothing crashes on any configuration (reference's device test; the
    device axis is covered by running on the virtual 8-device CPU mesh)."""
    tp = tps[tp_name]
    if compstrat is None:
        compstrat = tp.computation_strategy
    problem = tp.problem
    sample = problem.sample(K=3, reparam=reparam, sampler=sampler, key=fresh_key())
    sample.moments(tp.moments, computation_strategy=compstrat)
    marginals = sample.marginals(computation_strategy=compstrat)
    marginals.moments(tp.moments)
    importance_sample = sample.importance_sample(N=4, key=fresh_key())
    importance_sample.moments(tp.moments)
