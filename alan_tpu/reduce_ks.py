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

from .dims import (DT, as_dt, bind, dims_of, logsumexp_dims, unify_dims,
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


def _matmul_min_mn():
    """Minimum size of EACH free side (m, n) for the matmul reformulation;
    below this the step degenerates to a batched matvec (see gate comment
    in logsumexp_sum)."""
    return int(os.environ.get("ALAN_TPU_MATMUL_MIN_MN", "8"))


def _matvec_min_mk():
    """Minimum per-batch matrix size m·k for which a matvec-shaped step
    (min(m,n) below _matmul_min_mn) still routes to the MXU (see gate
    comment in logsumexp_sum)."""
    return int(os.environ.get("ALAN_TPU_MATVEC_MIN_MK", "65536"))


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
        # The matmul reformulation needs the step to actually fill MXU
        # passes.  Two admissible shapes: (a) both free sides non-trivial
        # (a real [m,k]@[k,n] batched matmul — routing bus_breakdown's
        # m=n=K steps to the MXU wins 1.32x on the END-TO-END QEM step,
        # median-slope measured, results/mxu_contract_bench.json); (b) a
        # matvec (n≈1) whose per-batch matrix m·k is large enough that each
        # pass still streams real work (grouped movielens' [K_g,K_z]@[K_z,1]
        # at K≥300).  A tiny matvec with a huge batch count — occupancy's
        # hot K_z step, [30,30]@[30,1] x432k — runs the 128-lane tiles
        # near-empty; the shape gate keeps it on the VPU broadcast-add path
        # (both routes now coincide there: speedup 1.002x in the record).
        set_ks = set(Ks_to_sum)
        m_size = math.prod([a.dim_size(d) for d in a.dims
                            if d not in b.dims and d not in set_ks] or [1])
        n_size = math.prod([b.dim_size(d) for d in b.dims
                            if d not in a.dims and d not in set_ks] or [1])
        viable = (min(m_size, n_size) >= _matmul_min_mn()
                  or max(m_size, n_size) * k_size >= _matvec_min_mk())
        if k_size >= _matmul_min_k() and viable:
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


def factor_components(factor_dims, elim):
    """Partition factors into connected components linked by shared dims in
    ``elim`` (union-find).  Returns a list of ``(factor_idxs, comp_dims)``
    with ``factor_idxs`` sorted and components ordered by smallest factor
    index (deterministic, so PRNG-key consumption order is stable under
    jit).  ``comp_dims`` is the set of elim dims present in the component.

    Two factors must be reduced together iff they share an eliminated dim
    (directly or transitively): eliminations over disjoint dim sets commute,
    so each component contracts independently and the results add in
    log-space.  This is what lets n independent timeseries in one plate cost
    n·O(T·K²) instead of the joint O(T·K^{2n}) chain
    (cf. reference ``logpq.py:133-146``, which always builds the joint).
    """
    elim = set(elim)
    parent = list(range(len(factor_dims)))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(i, j):
        ri, rj = find(i), find(j)
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)

    dim2first = {}
    for i, ds in enumerate(factor_dims):
        for d in ds:
            if d in elim:
                if d in dim2first:
                    union(i, dim2first[d])
                else:
                    dim2first[d] = i

    comps = {}
    for i in range(len(factor_dims)):
        comps.setdefault(find(i), []).append(i)
    out = []
    for root in sorted(comps):
        idxs = sorted(comps[root])
        cdims = set()
        for i in idxs:
            cdims |= set(factor_dims[i]) & elim
        out.append((idxs, cdims))
    return out


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


def _ffbs_joint_max():
    """Largest joint chain-state size ΠK for which a coupled component of
    timeseries K-groups is smoothed exactly over the flattened product space;
    beyond this the linear-cost conditional pass takes over."""
    return int(os.environ.get("ALAN_TPU_FFBS_JOINT_MAX", "4096"))


#: routing trace for tests: list of ("joint"|"conditional", (ts_Ks...)) per
#: component, reset at every sample_Ks_timeseries call.
_ffbs_routes: list = []


def sample_Ks_timeseries(lps, ts_Ks, ts_init_Ks, N_dim, num_samples, T_dim,
                         indices, keygen):
    """Posterior indices for timeseries K-dims via forward-filter /
    backward-sample over the particle index chain.

    Functional equivalent of reference ``reduce_Ks.py:85-232`` (Briers-style
    smoothing), redesigned in three ways:

    1. **Component decomposition (exact).**  The plate's timeseries K-groups
       are partitioned into connected components of the factor graph: two
       groups are coupled iff some factor chain links their K-dims (directly,
       or transitively through a not-yet-sampled non-timeseries K-dim).
       Independent chains smooth separately — n independent timeseries cost
       n·O(T·K²), not the O(T·K^{2n}) joint.  This also makes the
       marginalisation of unsampled non-ts K-dims exact: every factor
       carrying such a dim is pulled into the component before the logsumexp
       (the reference — and our earlier joint path — dropped factors without
       ts K-dims from that marginalisation).
    2. **Exact joint smoothing per component** over the flattened product
       space [T, ΠKi, ΠK] when ΠK ≤ ``ALAN_TPU_FFBS_JOINT_MAX`` — the same
       joint chain the ELBO contracts.
    3. **Linear-cost conditional pass** (``_ffbs_conditional``) for coupled
       components whose joint state is too large — per-group ancestral FFBS,
       conditioning on already-sampled groups' trajectories and collapsing
       not-yet-sampled groups per step (approximate, like the reference's
       per-group loop at ``reduce_Ks.py:104-232``, but ancestral and O(T)
       instead of marginal-per-t and O(T²)).
    """
    check_unique_dims(tuple(ts_Ks))
    assert len(ts_Ks) == len(ts_init_Ks) >= 1
    indices = dict(indices)
    set_ts = set(ts_Ks)
    set_init = set(ts_init_Ks)

    lps = [lp.materialize() if getattr(lp, "__lazy_dt__", False) else lp
           for lp in lps]
    # dims that couple factors: the ts K-dims themselves plus any K-dim not
    # yet sampled at this plate (it will be marginalised inside the FFBS, so
    # all factors carrying it must enter the same component)
    elim = set(set_ts)
    for lp in lps:
        for d in dims_of(lp):
            if d.startswith("K_") and d not in indices and d not in set_init:
                elim.add(d)

    _ffbs_routes.clear()
    fdims = [tuple(dims_of(lp)) for lp in lps]
    for fidxs, cdims in factor_components(fdims, elim):
        c_ts = [k for k in ts_Ks if k in cdims]
        if not c_ts:
            continue  # pure non-ts component: sample_Ks handles it later
        c_inits = [ts_init_Ks[ts_Ks.index(k)] for k in c_ts]
        clps = [lps[i] for i in fidxs]
        sizes = {}
        for l in clps:
            sizes.update(as_dt(l).dimsizes())
        joint = math.prod(sizes[k] for k in c_ts)
        shared_init = len(set(c_inits)) < len(c_inits)
        if len(c_ts) == 1 or joint <= _ffbs_joint_max() or shared_init:
            _ffbs_routes.append(("joint", tuple(c_ts)))
            indices = _ffbs_joint(clps, c_ts, c_inits, N_dim, num_samples,
                                  T_dim, indices, keygen)
        else:
            _ffbs_routes.append(("conditional", tuple(c_ts)))
            indices = _ffbs_conditional(clps, c_ts, c_inits, N_dim,
                                        num_samples, T_dim, indices, keygen)
    return indices


def _ffbs_joint(sel, ts_Ks, ts_init_Ks, N_dim, num_samples, T_dim,
                indices, keygen):
    """Exact joint FFBS for one coupled component: smooth its K-groups over
    the flattened product state space [T, ΠKi, ΠK], then unravel the sampled
    joint index back into per-group indices.  Forward alphas by log-matvec,
    backward ancestral sampling with ``jax.random.categorical``."""
    indices = dict(indices)
    set_ts = set(ts_Ks)
    set_init = set(ts_init_Ks)

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
    # Canonical raw layout: M[t, *rest_M, ΠKi, ΠK].  The N importance-sample
    # dim is deliberately KEPT OUT of M: the operator is the same for every
    # posterior draw — only the filter state alpha is N-dependent (through
    # the conditioned init particle) — so tiling N into M would materialise
    # an [N, T, ΠKi, ΠK] tensor (tens of GB at N=3000, K=30 coupled) for no
    # information.
    o = lp.order(T_dim, *ts_init_Ks, *ts_Ks)
    rest_M = o.dims
    nrem = len(rest_M)
    n = len(ts_Ks)
    shp = o.data.shape
    ki_sizes = shp[nrem + 1: nrem + 1 + n]
    k_sizes = shp[nrem + 1 + n:]
    M = o.data.reshape(shp[:nrem + 1]
                       + (math.prod(ki_sizes), math.prod(k_sizes)))
    M = jnp.moveaxis(M, nrem, 0)                    # (T, *rest_M, ΠKi, ΠK)
    T = M.shape[0]

    # joint init index: ravel the per-group init indices (row-major, same
    # axis order as the flatten above); DT arithmetic aligns by dim name
    init_dt = None
    for sz, ki in zip(ki_sizes, ts_init_Ks):
        idx = as_dt(indices[ki])
        init_dt = idx if init_dt is None else init_dt * sz + idx
    if N_dim not in dims_of(init_dt):
        # no N-dimmed init (cannot normally happen — the root group always
        # samples with an explicit N axis): tile the state over the N draws
        init_dt = init_dt + DT(jnp.zeros((num_samples,), jnp.int32), (N_dim,))

    # alpha dims: (extra..., rest_M...) with rest_M as the SUFFIX so raw
    # arrays broadcast right-aligned against M's batch block
    M0 = bind(DT(M[0], rest_M), "*Ki")
    a0 = dt_index(M0, "*Ki", init_dt)               # dims ⊇ rest_M ∪ N, pos (K,)
    extra = tuple(d for d in a0.dims if d not in rest_M)
    a0 = a0.with_dims_front(extra + tuple(rest_M))
    arest = a0.dims
    alpha0 = a0.data                                # (*extra, *rest_M, K)

    def _log_matvec(alpha, M_t):
        # logsumexp_i alpha[..., i] + M_t[..., i, j] without materialising
        # the (N, ΠKi, ΠK) intermediate: max-shifted exp + einsum (the
        # batched matmul rides the MXU on TPU)
        a_max = jnp.max(alpha, axis=-1, keepdims=True)
        a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
        m_max = jnp.max(M_t, axis=-2, keepdims=True)
        m_max = jnp.where(jnp.isfinite(m_max), m_max, 0.0)
        prod = jnp.einsum("...i,...ij->...j", jnp.exp(alpha - a_max),
                          jnp.exp(M_t - m_max))
        return jnp.log(prod) + a_max + jnp.squeeze(m_max, -2)

    def fwd(alpha, M_t):
        nxt = _log_matvec(alpha, M_t)
        return nxt, nxt

    _, alphas_rest = jax.lax.scan(fwd, alpha0, M[1:])
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)
    # (T, *extra, *rest_M, ΠK)

    # backward ancestral sampling
    k_last = jax.random.categorical(keygen(), alphas[T - 1], axis=-1)

    n_extra = len(extra)

    def bwd(k_next, inp):
        alpha_t, M_next, key = inp
        M_b = M_next.reshape((1,) * n_extra + M_next.shape)
        sel_ = jnp.take_along_axis(M_b, k_next[..., None, None],
                                   axis=-1)[..., 0]   # (*extra, *rest_M, Ki)
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
        indices[kdim] = DT(u, (T_dim,) + arest)
    return indices


def _lagged_traj(traj, init_idx, T_dim):
    """Shift a T-dimmed index trajectory one step along T: entry t is
    ``traj[t-1]``; entry 0 is the parent init-particle index."""
    traj = as_dt(traj)
    init_idx = as_dt(init_idx)
    o = traj.order(T_dim)                       # (*rest_named, T)
    rest = o.dims
    extra = [d for d in init_idx.dims if d not in rest]
    assert not extra, f"init index carries dims {extra} absent from trajectory"
    from .dims import expand_to
    init = jnp.broadcast_to(expand_to(init_idx, rest), o.data.shape[:-1])
    lag = jnp.concatenate([init[..., None].astype(o.data.dtype),
                           o.data[..., :-1]], axis=-1)
    return DT(jnp.moveaxis(lag, -1, 0), (T_dim,) + rest)


def _collapse_chain(f, kdj, kij, init_idx, T_dim):
    """Collapse an unsampled timeseries chain's state dims from one factor,
    per time step (the conditional-pass approximation: the chain is
    integrated out as if independent across steps).  The lagged dim ``kij``
    at t=0 indexes the parent init particle — which IS already sampled — so
    it is conditioned there rather than collapsed."""
    from .dims import slice_dim, concat_dim
    f = as_dt(f)
    if kdj in f.dims:
        f = logsumexp_dims(f, (kdj,), ignore_extra_dims=True)
    if kij is not None and kij in f.dims:
        if T_dim in f.dims and init_idx is not None:
            T = f.dim_size(T_dim)
            f0 = dt_index(slice_dim(f, T_dim, 0, 1), kij, init_idx)
            fr = logsumexp_dims(slice_dim(f, T_dim, 1, T), (kij,))
            for d in dims_of(f0):
                if d not in dims_of(fr):
                    fr = fr + DT(jnp.zeros((f0.dim_size(d),), fr.dtype), (d,))
            f = concat_dim([f0, fr], T_dim)
        elif init_idx is not None:
            # no T axis: the dim can only mean direct init dependence
            f = dt_index(f, kij, init_idx)
        else:
            f = logsumexp_dims(f, (kij,), ignore_extra_dims=True)
    return f


def _ffbs_conditional(clps, ts_Ks, ts_init_Ks, N_dim, num_samples, T_dim,
                      indices, keygen):
    """Linear-cost per-group smoothing for a coupled component whose joint
    chain state would be too large (reference analog:
    ``reduce_Ks.py:104-232``, which is marginal-per-t and O(T²); this one is
    ancestral and O(T)).

    Groups are sampled sequentially: group i's chain is smoothed exactly
    after (a) conditioning every factor on the trajectories of groups
    sampled before it (with the lagged dim indexed by the shifted
    trajectory), and (b) collapsing the not-yet-sampled groups' chain dims
    per step — the approximation: their temporal consistency is ignored, as
    in the reference's per-group loop.  Unsampled non-timeseries K-dims are
    collapsed per factor (the exact treatment lives in the joint path).
    """
    indices = dict(indices)
    groups = list(zip(ts_Ks, ts_init_Ks))
    for kd, ki in groups:
        fs = []
        for f in clps:
            f = as_dt(f)
            for kdj, kij in groups:
                if kdj == kd:
                    continue
                if kdj in indices:
                    # sampled earlier: condition on the trajectory exactly
                    if kdj in f.dims:
                        f = dt_index(f, kdj, indices[kdj])
                    if kij in f.dims and kij != ki:
                        f = dt_index(f, kij, _lagged_traj(
                            indices[kdj], indices[kij], T_dim))
                elif kdj in f.dims or (kij in f.dims and kij != ki):
                    f = _collapse_chain(f, kdj, kij if kij != ki else None,
                                        indices.get(kij), T_dim)
            coll = tuple(d for d in dims_of(f) if d.startswith("K_")
                         and d not in indices and d != kd)
            if coll:
                f = logsumexp_dims(f, coll, ignore_extra_dims=True)
            fs.append(f)
        indices = _ffbs_joint(fs, [kd], [ki], N_dim, num_samples, T_dim,
                              indices, keygen)
    return indices
