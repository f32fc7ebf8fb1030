"""The K-contraction engine (parity: reference ``src/alan/reduce_Ks.py``).

Summing the K^n combinations of per-latent particles factorises into a
tensor-network contraction over the named K-dims.  We plan the contraction
once per program structure with ``opt_einsum.contract_path`` (shapes only —
pure trace-time work, exactly as the reference does at
``reduce_Ks.py:255-298``) and execute each path step as a fused
``logsumexp(sum of factors)`` over that step's K-dims.  Under ``jit`` the
whole plan compiles to a static chain of XLA reductions; the two-factor K×K
steps lower to log-space matmuls (see ``alan_tpu.ops``).

``sample_Ks`` replays the reduction list *backwards* to draw joint posterior
indices over the K-dims (reference ``reduce_Ks.py:35-83``), using
``jax.random.categorical`` (Gumbel-max) on the conditional log-weights
instead of torch.multinomial on exponentiated weights — same distribution,
log-space-stable, and jit-friendly.
"""
from __future__ import annotations

import opt_einsum
import jax
import jax.numpy as jnp

from .dims import (DT, as_dt, dims_of, logsumexp_dims, unify_dims,
                   check_unique_dims, dt_index)


import math
import os

_USE_MATMUL_CONTRACT = os.environ.get("ALAN_TPU_NO_MATMUL_CONTRACT") != "1"
# Contracted-dim size above which a pairwise step is reformulated as a
# log-space matmul (with the batch block collapsed to one axis — many small
# batch dims are a TPU compile-time pathology).  The reformulation pays on
# the MXU; on CPU/GPU-less hosts the broadcast-add + logsumexp path is
# faster, so the default gate depends on the backend.
_MATMUL_MIN_K_ENV = os.environ.get("ALAN_TPU_MATMUL_MIN_K")
_MATMUL_MIN_K = None


def _matmul_min_k():
    global _MATMUL_MIN_K
    if _MATMUL_MIN_K is None:
        if _MATMUL_MIN_K_ENV is not None:
            _MATMUL_MIN_K = int(_MATMUL_MIN_K_ENV)
        else:
            try:
                platform = jax.devices()[0].platform
            except Exception:
                platform = "cpu"
            _MATMUL_MIN_K = 8 if platform == "tpu" else 1 << 30
    return _MATMUL_MIN_K


def logsumexp_sum(Ks_to_sum, *lps) -> DT:
    """One contraction step: logsumexp over ``Ks_to_sum`` of the sum of
    factors (reference ``reduce_Ks.py:249-251``).  Pairwise steps with a
    large contracted dimension are reformulated as log-space batched matmuls
    so they ride the MXU (``alan_tpu.ops.contraction``)."""
    lazy_idx = [i for i, lp in enumerate(lps)
                if getattr(lp, "__lazy_dt__", False)]
    if lazy_idx:
        # lazy factored log-prob (ops/lowrank.LowRankDT): fuse the cross-K
        # product into the contraction so it never exists in HBM; fall back
        # to the dense form when the step doesn't fit the fused shape.
        if len(lazy_idx) == 1:
            lz = lps[lazy_idx[0]]
            out = lz.contract(tuple(k for k in Ks_to_sum if k in
                                    set().union(*[set(dims_of(lp))
                                                  for lp in lps])),
                              [lp for i, lp in enumerate(lps)
                               if i != lazy_idx[0]])
            if out is not None:
                return out
        lps = tuple(lp.materialize() if getattr(lp, "__lazy_dt__", False)
                    else lp for lp in lps)
    if _USE_MATMUL_CONTRACT and len(lps) >= 2:
        dts = [as_dt(lp) for lp in lps]
        if len(dts) > 2:
            # stage an n-factor step for the pairwise MXU path: the two
            # largest factors anchor the matmul sides; every other factor is
            # absorbed (broadcast-added) into the anchor whose dim-union
            # grows least.  Exact: DT addition aligns by name, so
            # logsumexp(a' + b') == logsumexp(sum of all factors).  (Both
            # planners emit pairwise steps, so this only fires for direct
            # multi-factor calls; reference ``reduce_Ks.py:249-251`` takes
            # arbitrary factor lists.)
            order = sorted(range(len(dts)), key=lambda i: dts[i].data.size)
            ia, ib = order[-1], order[-2]
            a, b = dts[ia], dts[ib]
            for i in order[:-2]:
                c = dts[i]

                def _union_size(x, y):
                    sizes = {**x.dimsizes(), **y.dimsizes()}
                    return math.prod(sizes.values()) * math.prod(
                        jnp.broadcast_shapes(x.pos_shape, y.pos_shape))

                if _union_size(a, c) <= _union_size(b, c):
                    a = a + c
                else:
                    b = b + c
            dts = [a, b]
        a, b = dts
        shared = [k for k in Ks_to_sum if k in a.dims and k in b.dims]
        k_size = math.prod(a.dim_size(k) for k in shared) if shared else 0
        if k_size >= _matmul_min_k():
            from .ops.contraction import pairwise_logsumexp_contract
            return pairwise_logsumexp_contract(a, b, tuple(Ks_to_sum))
        lps = dts
    total = lps[0]
    for lp in lps[1:]:
        total = total + lp
    from .perf import count_flops, counting_active
    if counting_active():
        # broadcast-add fallback: (n-1) adds over the joint space, then a
        # ~4-op/element logsumexp (max/sub/exp/add) over the reduced dims
        count_flops(elementwise=(len(lps) + 3.0) * as_dt(total).data.size)
    return logsumexp_dims(total, tuple(Ks_to_sum), ignore_extra_dims=True)


def _plan(lps, Ks_to_sum):
    """Contraction path over the factor shapes — trace-time only.  Uses the
    native bitmask-DP planner (``csrc/pathopt.cpp`` via
    ``alan_tpu.ops.pathopt``) with an opt_einsum fallback; plans are memoised
    per program structure."""
    from .ops.pathopt import plan_path
    all_dims = unify_dims(lps)
    factor_dims = []
    sizes = {}
    for lp in lps:
        lp = as_dt(lp)
        assert lp.pos_ndim == 0, "contraction factors must have no positional axes"
        factor_dims.append(lp.dims)
        sizes.update(lp.dimsizes())
    out_dims = tuple(d for d in all_dims if d not in set(Ks_to_sum))
    return plan_path(tuple(factor_dims), tuple(sorted(sizes.items())), out_dims)


def collect_lps(lps, Ks_to_sum):
    """Execute the contraction; also return, per step, the factor lists and
    the K-dims eliminated there (needed for reverse-replay posterior
    sampling; reference ``reduce_Ks.py:255-298``)."""
    check_unique_dims(tuple(Ks_to_sum))
    lps = [as_dt(lp) for lp in lps]
    set_Ks = set(Ks_to_sum)

    if len(lps) == 1:
        path = [(0,)]
    else:
        path = _plan(lps, Ks_to_sum)

    all_reduced_lps = [[*lps]]
    Ks_per_step = []

    for lp_idxs in path:
        lps_to_reduce = tuple(lps[i] for i in lp_idxs)
        lps = [lps[i] for i in range(len(lps)) if i not in lp_idxs]

        # eliminate the Ks that appear only in this step's factors
        remaining_dims = set(unify_dims(lps))
        step_Ks = tuple(set_Ks.difference(remaining_dims)
                        .intersection(unify_dims(lps_to_reduce)))
        Ks_per_step.append(step_Ks)

        lps.append(logsumexp_sum(step_Ks, *lps_to_reduce))
        all_reduced_lps.append([*lps])

    all_reduced_lps = all_reduced_lps[:-1]
    assert len(lps) == 1
    result = lps[0]

    # drop steps that eliminated no K-dims
    keep = [i for i, Ks in enumerate(Ks_per_step) if Ks != ()]
    all_reduced_lps = [all_reduced_lps[i] for i in keep]
    Ks_per_step = [Ks_per_step[i] for i in keep]
    return result, all_reduced_lps, Ks_per_step


def reduce_Ks(lps, Ks_to_sum) -> DT:
    """Sum over ``Ks_to_sum``, returning a single factor
    (reference ``reduce_Ks.py:236-244``)."""
    result, _, _ = collect_lps(lps, Ks_to_sum)
    return result


def sample_Ks(lps, Ks_to_sum, N_dim: str, num_samples: int, keygen,
              indices: dict | None = None) -> dict:
    """Draw ``num_samples`` joint posterior K-indices by replaying the
    contraction in reverse (reference ``reduce_Ks.py:35-83``).

    Returns a dict K-dim-name -> integer DT carrying ``N_dim`` (plus plate
    dims).  ``indices`` carries indices already sampled for other K-dims.
    """
    check_unique_dims(tuple(Ks_to_sum))
    assert set(unify_dims(lps)).issuperset(Ks_to_sum)

    _, lps_for_sampling, Ks_per_step = collect_lps(lps, Ks_to_sum)

    indices = dict(indices or {})
    for step_lps, kdims in zip(lps_for_sampling[::-1], Ks_per_step[::-1]):
        # reverse replay indexes into the factors: lazy factored log-probs
        # (ops/lowrank.LowRankDT) must be dense here
        step_lps = [lp.materialize() if getattr(lp, "__lazy_dt__", False)
                    else lp for lp in step_lps]
        lp = step_lps[0]
        for x in step_lps[1:]:
            lp = lp + x

        # condition on already-sampled K-dims
        for dim in [d for d in dims_of(lp) if d in indices]:
            lp = dt_index(lp, dim, indices[dim])

        o = lp.order(*kdims)                       # dims rest, pos (k1,k2,...)
        flat = o.data.reshape(o.data.shape[:len(o.dims)] + (-1,))
        if N_dim in o.dims:
            # one categorical draw per (N, plates...) cell
            idx = jax.random.categorical(keygen(), flat, axis=-1)
            idx_dt = DT(idx, o.dims)
        else:
            idx = jax.random.categorical(keygen(), flat, axis=-1,
                                         shape=(num_samples,) + flat.shape[:-1])
            idx_dt = DT(idx, (N_dim,) + o.dims)

        sizes = tuple(lp.dim_size(k) for k in kdims)
        unravelled = jnp.unravel_index(idx_dt.data, sizes)
        for kdim, u in zip(kdims, unravelled):
            indices[kdim] = DT(u, idx_dt.dims)
    return indices


def _index_dim_int(x, dim, i: int):
    """Pick index i along a named dim (drops the dim)."""
    o = as_dt(x).order(dim)
    return DT(jax.lax.index_in_dim(o.data, i, axis=len(o.dims), keepdims=False),
              o.dims)


def _categorical_over(lp, kdim, N_dim, num_samples, key):
    """One categorical draw over `kdim` per remaining cell (adds N_dim if
    absent)."""
    o = lp.order(kdim)
    logits = jnp.moveaxis(o.data, len(o.dims), -1)  # (*rest, K)
    if N_dim in o.dims:
        idx = jax.random.categorical(key, logits, axis=-1)
        return DT(idx, o.dims)
    idx = jax.random.categorical(key, logits, axis=-1,
                                 shape=(num_samples,) + logits.shape[:-1])
    return DT(idx, (N_dim,) + o.dims)


def sample_Ks_timeseries(lps, ts_Ks, ts_init_Ks, N_dim, num_samples, T_dim,
                         indices, keygen):
    """Joint posterior indices for timeseries K-dims via exact
    forward-filter / backward-sample over the particle index chain.

    Functional equivalent of reference ``reduce_Ks.py:85-232`` (which
    implements Briers-style smoothing), generalised: ALL the plate's
    timeseries K-groups are smoothed *jointly* over the flattened product
    state space [T, ΠKi, ΠK] — the same joint chain the ELBO contracts
    (reference ``logpq.py:133-146``) — and the sampled joint index is
    unravelled back into per-group indices.  (The reference loops per group,
    conditioning each chain on marginals of the others; the joint chain is
    exact for any number of ungrouped timeseries in one plate.)  Forward
    alphas by log-matvec, backward ancestral sampling with
    ``jax.random.categorical``.
    """
    from .dims import expand_to
    check_unique_dims(tuple(ts_Ks))
    assert len(ts_Ks) == len(ts_init_Ks) >= 1
    indices = dict(indices)
    set_ts = set(ts_Ks)
    set_init = set(ts_init_Ks)

    # factors relevant to the chains: those carrying any timeseries K-dim
    sel = [lp.materialize() if getattr(lp, "__lazy_dt__", False) else lp
           for lp in lps if set(dims_of(lp)) & set_ts]
    lp = sel[0]
    for x in sel[1:]:
        lp = lp + x
    for d in (T_dim, *ts_Ks, *ts_init_Ks):
        assert d in dims_of(lp), d
    for ki in ts_init_Ks:
        assert ki in indices

    # condition on already-sampled ancestor Ks (except the inits, which
    # enter through alpha_0); these carry N, so `rest` includes N.
    for dim in [d for d in dims_of(lp)
                if d in indices and d not in set_init]:
        lp = dt_index(lp, dim, indices[dim])
    # marginalise the plate's yet-unsampled non-timeseries K-dims — plain
    # logsumexp, exactly as the ELBO contraction does (each factor already
    # carries its group's -log K correction).
    other_Ks = tuple(d for d in dims_of(lp) if d.startswith("K_")
                     and d not in set_ts and d not in set_init
                     and d not in indices)
    if other_Ks:
        lp = logsumexp_dims(lp, other_Ks, ignore_extra_dims=True)
    if N_dim not in dims_of(lp):
        # no N-dimmed ancestors: tile over the N draws explicitly
        lp = lp + DT(jnp.zeros((num_samples,)), (N_dim,))

    # canonical raw layout: M[t, *rest, ΠKi, ΠK]
    o = lp.order(T_dim, *ts_init_Ks, *ts_Ks)
    rest = o.dims                                   # includes N_dim
    nrem = len(rest)
    n = len(ts_Ks)
    shp = o.data.shape
    ki_sizes = shp[nrem + 1: nrem + 1 + n]
    k_sizes = shp[nrem + 1 + n:]
    M = o.data.reshape(shp[:nrem + 1]
                       + (math.prod(ki_sizes), math.prod(k_sizes)))
    M = jnp.moveaxis(M, nrem, 0)                    # (T, *rest, ΠKi, ΠK)
    T = M.shape[0]

    # joint init index: ravel the per-group init indices (row-major, same
    # axis order as the flatten above)
    init_idx = 0
    for sz, ki in zip(ki_sizes, ts_init_Ks):
        init_idx = init_idx * sz + expand_to(as_dt(indices[ki]), rest)
    init_idx = jnp.broadcast_to(init_idx, M.shape[1:-2])

    # forward filter: alpha_t[*rest, k]
    alpha0 = jnp.take_along_axis(M[0], init_idx[..., None, None],
                                 axis=-2)[..., 0, :]

    def fwd(alpha, M_t):
        nxt = jax.scipy.special.logsumexp(alpha[..., :, None] + M_t, axis=-2)
        return nxt, nxt

    _, alphas_rest = jax.lax.scan(fwd, alpha0, M[1:])
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)  # (T,*rest,K)

    # backward ancestral sampling
    k_last = jax.random.categorical(keygen(), alphas[T - 1], axis=-1)

    def bwd(k_next, inp):
        alpha_t, M_next, key = inp
        sel_ = jnp.take_along_axis(M_next, k_next[..., None, None],
                                   axis=-1)[..., 0]   # (*rest, Ki)
        k_t = jax.random.categorical(key, alpha_t + sel_, axis=-1)
        return k_t, k_t

    keys = jax.random.split(keygen(), max(T - 1, 1))
    if T > 1:
        _, ks_rev = jax.lax.scan(bwd, k_last,
                                 (alphas[:-1][::-1], M[1:][::-1], keys))
        ks = jnp.concatenate([ks_rev[::-1], k_last[None]], axis=0)
    else:
        ks = k_last[None]

    # unravel the joint index back into per-group indices
    unravelled = jnp.unravel_index(ks, k_sizes)
    for kdim, u in zip(ts_Ks, unravelled):
        indices[kdim] = DT(u, (T_dim,) + rest)
    return indices
