"""Non-massively-parallel baseline: one global K-dim (IWAE-style)
(parity: reference ``src/alan/SampleNonMP.py``)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .dims import (DT, as_dt, dims_of, dt_index, logsumexp_dims, sum_dims,
                   rename_dim, detach)
from .ir.plate import Plate, update_scope, flatten_tree
from .ir.dist import Dist
from .ir.data import Data
from .ir.timeseries import Timeseries
from .moments import torchdim_moments_mixin, named_moments_mixin
from .split import no_checkpoint
from .importance import ImportanceSample
from .sample import index_into_sample
from .utils import detach_tree, flatten_dict


class SampleNonMP:
    def __init__(self, problem, sample, groupvarname2Kdim, reparam):
        self.problem = problem
        self.reparam = reparam
        self.Kdim = "K"
        self._states = (None, None)

        sample = _unify_dims(sample, self.Kdim, set(problem.all_platedims))

        if reparam:
            self.reparam_sample = sample
        self.detached_sample = detach_tree(sample)

    def logpq(self, sample):
        result = non_mp_log_prob(
            name=None,
            P=self.problem.P.plate,
            Q=self.problem.Q.plate,
            sample=sample,
            inputs_params=self.problem.inputs_params(*self._states),
            data=self.problem.data,
            scope={},
            active_platedims=[],
            all_platedims=self.problem.all_platedims,
            Kdim=self.Kdim)
        assert dims_of(result) == (self.Kdim,)
        return result

    def _elbo(self, sample):
        lpq = self.logpq(sample)
        K = lpq.dim_size(self.Kdim)
        return logsumexp_dims(lpq, (self.Kdim,)).data - math.log(K)

    def elbo_vi(self):
        if not self.reparam:
            raise Exception("VI ELBO needs a reparameterised sample")
        return self._elbo(self.reparam_sample)

    def elbo_rws(self):
        return self._elbo(self.detached_sample)

    def elbo_nograd(self):
        return jax.lax.stop_gradient(self._elbo(self.detached_sample))

    def _importance_sample_idxs(self, N, key=None):
        N_dim = "N"
        if key is None:
            key = jax.random.key(3000)
        lps = self.logpq(self.detached_sample)
        o = lps.order(self.Kdim)
        idx = jax.random.categorical(key, o.data, shape=(N,))
        return DT(idx, (N_dim,)), N_dim

    def importance_sample(self, N: int, key=None):
        indices, N_dim = self._importance_sample_idxs(N, key)
        samples = _index_into_non_mp_sample(self.detached_sample, indices, self.Kdim)
        return ImportanceSample(self.problem, samples, N_dim)

    def _moments_uniform_input(self, moms, computation_strategy=None):
        assert isinstance(moms, list)
        lpq = self.logpq(self.detached_sample)
        weights = (lpq - logsumexp_dims(lpq, (self.Kdim,))).exp()
        flat_sample = flatten_dict(self.detached_sample)
        result = []
        for varnames, m in moms:
            args = tuple(flat_sample[vn] for vn in varnames)
            result.append(m.from_marginals(args, weights, self.problem.all_platedims))
        return result

    _moments = torchdim_moments_mixin
    moments = named_moments_mixin

    def update_qem_params(self, lr: float):
        self.problem.P._update_qem_params(lr, self, computation_strategy=no_checkpoint)
        self.problem.Q._update_qem_params(lr, self, computation_strategy=no_checkpoint)


def _unify_dims(sample, Kdim, platenames):
    result = {}
    for k, v in sample.items():
        if isinstance(v, dict):
            result[k] = _unify_dims(v, Kdim, platenames)
        else:
            v = as_dt(v)
            v_Kdims = [d for d in dims_of(v) if d not in platenames]
            assert len(v_Kdims) == 1
            result[k] = rename_dim(v, v_Kdims[0], Kdim)
    return result


def nonmp_moments_streaming(problem, K_total: int, chunk: int, moms,
                            key, reparam: bool = False):
    """Global-IS ``RawMoment`` estimates at K far beyond device memory.

    The reference's moments-paper sweep (``old_scripts/runner_moments_IS.py``
    + ``config/moments_IS_conf.yaml``, Ks up to 10^7) simply OOMs global IS
    at large K and drops those points from the plot.  TPU-native fix: a
    ``lax.scan`` over ``K_total // chunk`` proposal chunks with an online-
    logsumexp combine — weights and weighted moment sums are accumulated
    under a running max, so memory is O(chunk) while the estimate equals
    the single global softmax over the same chunked proposals up to float
    reassociation (pinned by tests/test_nonmp.py); statistically it is
    exactly a K_total-sample global-IS estimate.

    ``moms``: list of ``(varnames, RawMoment)``.  Returns
    ``(moment DT list, elbo)`` where elbo = logsumexp(lpq) − log K_total.
    """
    from .moments import uniformise_moment_args
    moms = uniformise_moment_args((moms,))
    n_chunks, rem = divmod(K_total, chunk)
    assert rem == 0 and n_chunks >= 1, (K_total, chunk)

    def chunk_stats(k):
        s = problem.sample_nonmp(chunk, reparam=reparam, key=k)
        lpq = s.logpq(s.detached_sample)
        o = lpq.order(s.Kdim).data                          # (chunk,)
        m = jnp.max(o)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        w = DT(jnp.exp(o - m), (s.Kdim,))
        flat_sample = flatten_dict(s.detached_sample)
        sums = []
        for varnames, mom in moms:
            args = tuple(flat_sample[vn] for vn in varnames)
            sums.append(mom.from_marginals(args, w,
                                           problem.all_platedims))
        z = jnp.sum(jnp.exp(o - m))
        return m, z, sums

    def body(carry, k):
        M, Z, S = carry
        mc, zc, sc = chunk_stats(k)
        Mn = jnp.maximum(M, mc)
        a, b = jnp.exp(M - Mn), jnp.exp(mc - Mn)
        Z = Z * a + zc * b
        S = [DT(s.data * a + x.data * b, s.dims) for s, x in zip(S, sc)]
        return (Mn, Z, S), None

    keys = jax.random.split(key, n_chunks)
    m0, z0, s0 = chunk_stats(keys[0])
    if n_chunks > 1:
        (m0, z0, s0), _ = jax.lax.scan(body, (m0, z0, s0), keys[1:])
    tiny = jnp.finfo(jnp.float32).tiny
    moments = [DT(s.data / (z0 + tiny), s.dims) for s in s0]
    elbo = jnp.log(z0 + tiny) + m0 - math.log(K_total)
    return moments, elbo


def non_mp_log_prob(name, P, Q, sample, inputs_params, data, scope,
                    active_platedims, all_platedims, Kdim):
    """Flat traversal computing Σ (logP − logQ) with one global K
    (reference ``SampleNonMP.py:140-211``)."""
    if name is not None:
        active_platedims = [*active_platedims, name]

    scope = update_scope(scope, inputs_params)
    scope = update_scope(scope, sample)

    lpqs = []
    for k, distQ in Q.flat_prog.items():
        distP = P.flat_prog[k]
        assert not isinstance(distP, Timeseries), \
            "timeseries aren't supported on the non-MP path"
        if isinstance(distQ, Plate):
            lpq = non_mp_log_prob(
                name=k, P=distP, Q=distQ, sample=sample[k],
                inputs_params=inputs_params.get(k) or {},
                data=data[k], scope=scope,
                active_platedims=active_platedims,
                all_platedims=all_platedims, Kdim=Kdim)
            assert set(dims_of(lpq)) == {Kdim}
        elif isinstance(distQ, Data):
            assert isinstance(distP, Dist)
            lpq, _ = distP.log_prob(data[k], scope, None, Kdim)
            lpq = sum_dims(lpq, tuple(active_platedims), ignore_extra_dims=True)
        else:
            assert isinstance(distQ, Dist)
            lp, _ = distP.log_prob(sample[k], scope, None, Kdim)
            lq, _ = distQ.log_prob(sample[k], scope, None, Kdim)
            lp = sum_dims(lp, tuple(active_platedims), ignore_extra_dims=True)
            lq = sum_dims(lq, tuple(active_platedims), ignore_extra_dims=True)
            lpq = lp - lq
        lpqs.append(lpq)

    total = lpqs[0]
    for x in lpqs[1:]:
        total = total + x
    assert set(dims_of(total)) == {Kdim}
    return total


def _index_into_non_mp_sample(sample, indices, Kdim):
    result = {}
    for k, v in sample.items():
        if isinstance(v, dict):
            result[k] = _index_into_non_mp_sample(v, indices, Kdim)
        else:
            result[k] = dt_index(v, Kdim, indices)
    return result
