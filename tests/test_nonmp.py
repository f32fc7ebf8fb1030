"""Non-MP (global single-K) baseline tests: elbo finite, moments sane, and
consistency with the MP path at large K (reference exercises non-MP via the
``global_*`` runner methods, ``basic_runner.py:14-15``)."""
import importlib

import jax
import numpy as np
import pytest

from alan_tpu import mean
from alan_tpu.dims import as_dt

MODELS = ["model_linear_gaussian", "model_bernoulli_no_plate",
          "model_linear_gaussian_latents"]


@pytest.mark.parametrize("name", MODELS)
def test_nonmp_elbo_and_moments(name):
    tp = importlib.import_module(name).tp
    problem = tp.problem
    s = problem.sample_nonmp(K=1000, key=jax.random.key(0))
    elbo = float(s.elbo_nograd())
    assert np.isfinite(elbo)
    if tp.known_elbo is not None:
        # IWAE bound is below the evidence but should be in the ballpark
        assert elbo < tp.known_elbo + 1.0
        assert elbo > tp.known_elbo - 50.0

    for varnames, m in tp.moments:
        mom = s._moments(varnames, m)
        assert np.all(np.isfinite(np.asarray(as_dt(mom).data)))


@pytest.mark.parametrize("name", ["model_linear_gaussian"])
def test_nonmp_importance_sample(name):
    tp = importlib.import_module(name).tp
    problem = tp.problem
    s = problem.sample_nonmp(K=3000, key=jax.random.key(1))
    isamp = s.importance_sample(N=500, key=jax.random.key(2))
    mom = isamp._moments('a', mean)
    true = tp.known_moments[('a', mean)]
    assert abs(float(as_dt(mom).data) - float(true)) < 0.5


def test_joint_marginals_and_cov():
    """Joint marginals over grouped K-dims + covariance moments
    (reference Sample.marginals(joints=...) path)."""
    import jax.numpy as jnp
    from alan_tpu import Normal, Plate, BoundPlate, Problem, Data, named, cov_x
    from alan_tpu.moments import RawMoment
    import model_linear_gaussian_two_params as m2

    tp = m2.tp
    sample = tp.problem.sample(K=100, reparam=False, key=jax.random.key(7))
    marg = sample.marginals(joints=[("a", "b")])
    assert frozenset(["a", "b"]) in marg.weights
    # E[a*b] from the joint marginal
    prod = RawMoment(lambda a, b: a * b)
    eab = marg._moments(("a", "b"), prod)
    ea = marg._moments("a", as_dt_mean())
    eb = marg._moments("b", as_dt_mean())
    cov = float(eab.data) - float(ea.data) * float(eb.data)
    assert np.isfinite(cov)


def as_dt_mean():
    from alan_tpu import mean
    return mean


def test_nonmp_streaming_matches_global_softmax():
    """The chunked online-logsumexp combine must equal one global softmax
    over the same chunked proposals (float-reassociation tolerance), and
    its elbo must match the concatenated logsumexp."""
    import jax.numpy as jnp
    from alan_tpu.dims import dims_of
    from alan_tpu.sample_nonmp import nonmp_moments_streaming
    from alan_tpu.utils import flatten_dict

    tp = importlib.import_module("model_linear_gaussian_latents").tp
    problem = tp.problem
    chunk, n_chunks = 64, 4
    key = jax.random.key(7)
    moms = [(vns, m) for vns, m in tp.moments]
    stream_moms, stream_elbo = nonmp_moments_streaming(
        problem, chunk * n_chunks, chunk, moms, key)

    # manual reference: same per-chunk keys, one global softmax
    keys = jax.random.split(key, n_chunks)
    os_, fs = [], {i: [] for i in range(len(moms))}
    for k in keys:
        s = problem.sample_nonmp(chunk, reparam=False, key=k)
        lpq = s.logpq(s.detached_sample)
        os_.append(np.asarray(lpq.order(s.Kdim).data))
        flat = flatten_dict(s.detached_sample)
        for i, (vns, m) in enumerate(moms):
            f = as_dt(m.f(*[flat[vn] for vn in vns]))
            # order(K) makes K the TRAILING positional axis; lead with it
            fs[i].append(np.moveaxis(np.asarray(f.order(s.Kdim).data),
                                     -1, 0))
    o = np.concatenate(os_)
    w = np.exp(o - o.max())
    w /= w.sum()
    assert np.isclose(float(stream_elbo),
                      float(np.log(np.exp(o - o.max()).sum()) + o.max()
                            - np.log(o.size)), atol=1e-4)
    for i, sm in enumerate(stream_moms):
        f = np.concatenate(fs[i])                     # (K_total, ...)
        ref = np.tensordot(w, f, axes=(0, 0))
        got = np.asarray(sm.order(*dims_of(sm)).data)
        assert np.allclose(got, ref, rtol=1e-4, atol=1e-5), (i, got, ref)
