"""The log P/Q evaluator — heart of the framework.

Parity: reference ``src/alan/logpq.py``.  A trace-time recursive walk over the
(P, Q) plate trees gathers per-group log-factors
``log P - reduce_logQ(log Q) - log K`` (each carrying its K-dims and plate
dims), contracts the K-dims with the opt_einsum-planned log-space engine
(``alan_tpu.reduce_ks``), sums plates, and chains timeseries factors with
log-space matmuls.  Everything happens on dimmed tensors with static shapes:
under ``jit`` the recursion disappears and one XLA program remains.
"""
from __future__ import annotations

import math
from typing import Optional

import jax

from .dims import DT, as_dt, bind, dims_of, sum_dims, unify_dims
from .ir.plate import Plate, update_scope
from .ir.dist import Dist, datagroup
from .ir.data import Data
from .ir.timeseries import Timeseries
from .reduce_ks import reduce_Ks
from .split import Split, checkpoint, no_checkpoint
from .ops import chain_logmmexp
from .utils import tree_values


def logPQ_plate(name: Optional[str], P: Plate, Q: Plate, sample: dict,
                inputs_params: dict, data: dict, extra_log_factors: dict,
                scope: dict, active_platedims: list, all_platedims: dict,
                groupvarname2Kdim: dict, varname2groupvarname: dict,
                sampler, computation_strategy):
    """Evaluate a plate, possibly in Split chunks with a running accumulator
    (reference ``logpq.py:15-60``)."""
    siedas = computation_strategy.split_args(
        name=name, sample=sample, inputs_params=inputs_params,
        extra_log_factors=extra_log_factors, data=data,
        all_platedims=all_platedims)

    if len(siedas) > 1 and any(isinstance(v, Timeseries)
                               for v in P.flat_prog.values()):
        # Reference forbids this too (``Timeseries.py:59``): the T dim is a
        # Markov chain, so chunking it changes the lagged-sample alignment.
        raise ValueError(
            f"You can't Split along plate '{name}' because it contains a "
            f"Timeseries: splitting the T dimension is unsupported "
            f"(Split a different plate, or rely on the chunked-scan/remat "
            f"memory controls instead).")

    use_remat = computation_strategy is checkpoint

    statics = dict(
        name=name, P=P, Q=Q, scope=scope,
        active_platedims=active_platedims,
        groupvarname2Kdim=groupvarname2Kdim,
        varname2groupvarname=varname2groupvarname,
        sampler=sampler, computation_strategy=computation_strategy)

    if len(siedas) > 2 and _equal_chunks(siedas, name):
        # All full-size chunks ride one lax.scan (program size O(1) in the
        # number of chunks); a remainder chunk is handled separately.
        full, remainder = _group_chunks(siedas, name)
        lpq = _scan_chunks(full, statics)
        for sieda in remainder:
            lpq = _logPQ_plate_maybe_remat(use_remat, prev_lpq=lpq,
                                           **statics, **sieda)
        return lpq, (), (), ()

    lpq = None
    for sieda in siedas:
        lpq = _logPQ_plate_maybe_remat(use_remat, prev_lpq=lpq,
                                       **statics, **sieda)
    assert lpq is not None
    return lpq, (), (), ()


def _equal_chunks(siedas, name):
    if name is None:
        return False
    sizes = [s["all_platedims"].get(name) for s in siedas]
    # any timeseries in the plate forbids Split anyway (checked upstream)
    return len(set(sizes[:-1])) == 1 and sizes[0] is not None


def _group_chunks(siedas, name):
    size0 = siedas[0]["all_platedims"][name]
    full = [s for s in siedas if s["all_platedims"][name] == size0]
    rem = [s for s in siedas if s["all_platedims"][name] != size0]
    return full, rem


def _scan_chunks(siedas, statics):
    """Stack the per-chunk trees on a leading scan axis and accumulate the
    plate-summed lp over chunks with one lax.scan."""
    import jax.numpy as jnp
    from jax import tree_util

    def _strip(tree):
        # DT -> raw data; remember dims structure separately
        if isinstance(tree, dict):
            return {k: _strip(v) for k, v in tree.items()}
        if isinstance(tree, DT):
            return tree.data
        return tree

    def _dims_tree(tree):
        if isinstance(tree, dict):
            return {k: _dims_tree(v) for k, v in tree.items()}
        if isinstance(tree, DT):
            return tree.dims
        return None

    def _rebuild(data_tree, dims_tree):
        if isinstance(data_tree, dict):
            return {k: _rebuild(v, dims_tree[k]) for k, v in data_tree.items()}
        if dims_tree is not None:
            return DT(data_tree, dims_tree)
        return data_tree

    keys = ("sample", "inputs_params", "extra_log_factors", "data")
    dims_trees = {k: _dims_tree(siedas[0][k]) for k in keys}
    stacked = {}
    for k in keys:
        chunks = [_strip(s[k]) for s in siedas]
        stacked[k] = tree_util.tree_map(lambda *xs: jnp.stack(xs, 0), *chunks)
    platedims = siedas[0]["all_platedims"]

    # run chunk 0 outside the scan to get the carry structure
    first = {k: _rebuild(tree_util.tree_map(lambda x: x[0], stacked[k]),
                         dims_trees[k]) for k in keys}
    lp0 = _logPQ_plate(**statics, **first, all_platedims=platedims,
                       prev_lpq=None)
    rest = {k: tree_util.tree_map(lambda x: x[1:], stacked[k]) for k in keys}

    def scan_body(carry, xs):
        trees = {k: _rebuild(xs[k], dims_trees[k]) for k in keys}
        lp = _logPQ_plate(**statics, **trees, all_platedims=platedims,
                          prev_lpq=None)
        # chunk lps share dims; keep the carry layout stable
        out = DT(carry.data + lp.with_dims_front(carry.dims).data, carry.dims)
        return out, None

    lpq, _ = jax.lax.scan(scan_body, lp0, rest)
    return lpq


def _logPQ_plate_maybe_remat(use_remat, *, name, P, Q, sample, inputs_params,
                             data, extra_log_factors, scope, active_platedims,
                             all_platedims, groupvarname2Kdim,
                             varname2groupvarname, sampler,
                             computation_strategy, prev_lpq):
    if not use_remat:
        return _logPQ_plate(
            name=name, P=P, Q=Q, sample=sample, inputs_params=inputs_params,
            data=data, extra_log_factors=extra_log_factors, scope=scope,
            active_platedims=active_platedims, all_platedims=all_platedims,
            groupvarname2Kdim=groupvarname2Kdim,
            varname2groupvarname=varname2groupvarname, sampler=sampler,
            computation_strategy=computation_strategy, prev_lpq=prev_lpq)

    # jax.checkpoint over the dynamic pytree args; statics are closed over.
    def body(sample_, inputs_params_, data_, elfs_, scope_, prev_lpq_):
        return _logPQ_plate(
            name=name, P=P, Q=Q, sample=sample_, inputs_params=inputs_params_,
            data=data_, extra_log_factors=elfs_, scope=scope_,
            active_platedims=active_platedims, all_platedims=all_platedims,
            groupvarname2Kdim=groupvarname2Kdim,
            varname2groupvarname=varname2groupvarname, sampler=sampler,
            computation_strategy=computation_strategy, prev_lpq=prev_lpq_)

    return jax.checkpoint(body)(sample, inputs_params, data,
                                extra_log_factors, scope, prev_lpq)


def _logPQ_plate(*, name, P, Q, sample, inputs_params, data,
                 extra_log_factors, scope, active_platedims, all_platedims,
                 groupvarname2Kdim, varname2groupvarname, sampler,
                 computation_strategy, prev_lpq):
    """(reference ``logpq.py:68-155``)"""
    assert isinstance(P, Plate) and isinstance(Q, Plate)
    assert isinstance(sample, dict) and isinstance(data, dict)

    if name is not None:
        active_platedims = [*active_platedims, name]

    scope = update_scope(scope, inputs_params)
    scope = update_scope(scope, sample)

    lps, all_Ks, K_currs, K_inits = lp_getter(
        name=name, P=P, Q=Q, sample=sample, inputs_params=inputs_params,
        data=data, extra_log_factors=extra_log_factors, scope=scope,
        active_platedims=active_platedims, all_platedims=all_platedims,
        groupvarname2Kdim=groupvarname2Kdim,
        varname2groupvarname=varname2groupvarname, sampler=sampler,
        computation_strategy=computation_strategy)

    assert len(K_currs) == len(K_inits)

    if name is not None and len(K_inits) > 0:
        assert prev_lpq is None
        return _reduce_timeseries_plate(lps, all_Ks, K_currs, K_inits, name,
                                        all_platedims)

    # Sum out non-timeseries Ks.
    lp = reduce_Ks(lps, all_Ks)

    if name is not None:
        lp = sum_dims(lp, (name,), ignore_extra_dims=True)
        if prev_lpq is not None:
            assert set(dims_of(lp)) == set(dims_of(prev_lpq))
            lp = lp + prev_lpq
    return lp


def _reduce_timeseries_plate(lps, all_Ks, K_currs, K_inits, name,
                             all_platedims):
    """Contract a timeseries plate's factors.

    The factors are partitioned into connected components linked by shared
    eliminated K-dims (``reduce_ks.factor_components``): independent
    timeseries chains contract separately at n·O(T·K²) instead of the joint
    O(T·K^{2n}), exactly — eliminations over disjoint dim sets commute and
    the per-component results add in log-space.  Components genuinely
    coupled (e.g. an observation reading two chains) still contract the
    joint [T, ΠKi, ΠK] operator, as the reference always does
    (``logpq.py:131-146``).  ``ALAN_TPU_TS_JOINT=1`` forces the one-component
    joint path (for equality testing)."""
    import os
    import jax.numpy as jnp
    from .reduce_ks import factor_components

    lps = [as_dt(lp) for lp in lps]
    T_size = all_platedims[name]

    if os.environ.get("ALAN_TPU_TS_JOINT") == "1":
        comps = [(list(range(len(lps))),
                  set(all_Ks) | set(K_currs))]
    else:
        comps = factor_components([tuple(dims_of(lp)) for lp in lps],
                                  set(all_Ks) | set(K_currs))

    total = None
    for fidxs, cdims in comps:
        clps = [lps[i] for i in fidxs]
        c_nonts = [k for k in all_Ks if k in cdims]
        c_groups = [g for g, kc in enumerate(K_currs) if kc in cdims]
        if c_nonts:
            r = reduce_Ks(clps, c_nonts)
        else:
            r = clps[0]
            for x in clps[1:]:
                r = r + x
        if c_groups:
            r = _chain_ts(r, name, [K_inits[g] for g in c_groups],
                          [K_currs[g] for g in c_groups])
        else:
            if name in dims_of(r):
                r = sum_dims(r, (name,))
            else:
                # a factor with no plate dim rides the old combined path
                # broadcast over T and is summed T times — keep that
                r = r * float(T_size)
        total = r if total is None else total + r
    return total


def _chain_ts(lp, name, K_inits, K_currs):
    """Chain one component's timeseries groups jointly: flatten the Kinit
    dims into one axis and the Kcurr dims into another, chain the
    [T, ΠKi, ΠK] operator with log-matmuls over T, logsumexp the final
    state, and unflatten back to the separate Kinit dims (reference
    ``logpq.py:131-146``)."""
    import jax.numpy as jnp
    o = lp.order(name, *K_inits, *K_currs)      # (*hi, T, Ki..., K...)
    n = len(K_inits)
    nrem = len(o.dims)
    shp = o.data.shape
    T_size = shp[nrem]
    ki_sizes = shp[nrem + 1: nrem + 1 + n]
    k_sizes = shp[nrem + 1 + n:]
    joint = o.data.reshape(
        shp[:nrem] + (T_size, math.prod(ki_sizes), math.prod(k_sizes)))
    joint = _constrain_chain_operand(joint, o.dims, name)
    chained = _chain(joint, name)               # (*hi, ΠKi, ΠK)
    maxv = jax.lax.stop_gradient(jnp.max(chained, axis=-1))
    summed = jnp.log(jnp.sum(
        jnp.exp(chained - maxv[..., None]), axis=-1))
    out = (summed + maxv).reshape(shp[:nrem] + tuple(ki_sizes))
    return bind(DT(out, o.dims), *K_inits)


def _constrain_chain_operand(joint, hi_dims, platename):
    """Pin the chain operator's sharding before the log-matmul tree: plate
    (hi) dims keep their planned mesh axes, the T dim keeps its sequence
    axis if T-sharded, and the Ki/K axes are REPLICATED.

    Without this, ``with_all_K`` leaves the K×K operators k-sharded and
    GSPMD inserts an all-gather + all-reduce at *every* level of the
    balanced tree product (covid K=30 on a {k:2,p:4} mesh: ~300 MB of
    collectives per step, found by the round-5 all-models audit).  Gathering
    the operator ONCE at the boundary costs ~9 MB; the tree then contracts
    collective-free on the plate shards.  (TP-sharding a chain only pays at
    K×K sizes far beyond MP's K≈30 regime.)"""
    from .parallel.mesh import active_plan
    plan = active_plan()
    if plan is None:
        return joint
    import jax
    from jax.sharding import NamedSharding, PartitionSpec
    sizes = dict(zip(plan.mesh.axis_names, plan.mesh.devices.shape))
    parts = []
    for i, d in enumerate(hi_dims):
        a = plan._axis_for(d)
        parts.append(a if a is not None
                     and joint.shape[i] % sizes[a] == 0 else None)
    t_axis = plan._axis_for(platename)
    if t_axis is not None and joint.shape[len(hi_dims)] % sizes[t_axis] != 0:
        t_axis = None
    spec = PartitionSpec(*parts, t_axis, None, None)
    return jax.lax.with_sharding_constraint(
        joint, NamedSharding(plan.mesh, spec))


def _chain(ms, platename):
    """Chain-contract ``ms[..., T, Ki, K]`` over T.  When the active
    ``MeshPlan`` maps the timeseries plate dim to a mesh axis, route to the
    T-sharded implementation (local chains + all_gather of the K×K boundary
    operators over ICI); otherwise the single-chip balanced tree."""
    from .parallel.mesh import active_plan
    plan = active_plan()
    if plan is not None:
        axis = plan._axis_for(platename)
        if axis is not None:
            T = ms.shape[-3]
            n = plan.axis_size(axis)
            if T % n == 0:
                from .parallel.seq import chain_logmmexp_sharded
                return chain_logmmexp_sharded(ms, plan.mesh, axis)
            plan._undividable(platename, T, axis, n)
    return chain_logmmexp(ms)


def logPQ_gdt(*, name, P, Q, sample, inputs_params, data, extra_log_factors,
              scope, active_platedims, all_platedims, groupvarname2Kdim,
              varname2groupvarname, sampler, computation_strategy):
    """Per-group factor: ``Σ logP − reduce_logQ(Σ logQ) − log K``
    (reference ``logpq.py:157-254``)."""
    assert isinstance(sample, dict)
    assert inputs_params is None and extra_log_factors is None
    prog_P, prog_Q = P, Q
    assert set(prog_P.keys()) == set(prog_Q.keys())

    # Data variable: factor is logP(data).
    if datagroup(prog_Q):
        assert len(prog_Q) == 1
        k = next(iter(prog_Q))
        assert isinstance(prog_Q[k], Data)
        assert sample[k] is None
        lp, _ = prog_P[k].log_prob(data[k], scope, None, None)
        return lp, (), (), ()

    Kdim = groupvarname2Kdim[name]
    total_logP = 0.0
    total_logQ = 0.0

    T_dim = active_platedims[-1] if len(active_platedims) >= 1 else None

    Kinits = []
    K = None
    for k in prog_P:
        dist_P, dist_Q, sample_k = prog_P[k], prog_Q[k], sample[k]
        assert isinstance(dist_P, (Dist, Timeseries))
        assert isinstance(dist_Q, (Dist, Timeseries))
        assert sample_k is not None
        assert data[k] is None
        K = as_dt(sample_k).dim_size(Kdim)

        lp, Kinit_p = dist_P.log_prob(sample_k, scope, T_dim, Kdim)
        lq, Kinit_q = dist_Q.log_prob(sample_k, scope, T_dim, Kdim)
        if Kinit_q is not None:
            assert Kinit_p == Kinit_q
        if Kinit_p is not None:
            Kinits.append(Kinit_p)

        total_logP = total_logP + lp
        total_logQ = total_logQ + lq

    total_logQ = sampler.reduce_logQ(total_logQ, active_platedims, Kdim)
    lp = total_logP - total_logQ - math.log(K)

    if len(Kinits) >= 1:
        Kinit0 = Kinits[0]
        for ki in Kinits[1:]:
            assert ki == Kinit0
        return lp, (), (Kdim,), (Kinit0,)
    return lp, (Kdim,), (), ()


def lp_getter(*, name, P, Q, sample, inputs_params, data, extra_log_factors,
              scope, active_platedims, all_platedims, groupvarname2Kdim,
              varname2groupvarname, sampler, computation_strategy):
    """Traverse Q (by P's structure) collecting per-child log factors
    (reference ``logpq.py:257-332``)."""
    assert isinstance(P, Plate) and isinstance(Q, Plate)
    assert set(P.flat_prog.keys()) == set(Q.flat_prog.keys())

    lps = list(tree_values(extra_log_factors).values())
    Knon_timeseries, Ktimeseries, Kinits = [], [], []

    for childname, childQ in Q.grouped_prog.items():
        if isinstance(childQ, dict):
            childP = {vn: P.flat_prog[vn] for vn in childQ}
            method = logPQ_gdt
            kwargs = dict(
                sample=Q.grouped_get(sample, childname),
                data=Q.grouped_get(data, childname),
                inputs_params=None,
                extra_log_factors=None)
        else:
            assert isinstance(childQ, Plate)
            childP = P.flat_prog[childname]
            assert isinstance(childP, Plate)
            method = logPQ_plate
            kwargs = dict(
                sample=Q.grouped_get(sample, childname),
                data=Q.grouped_get(data, childname),
                inputs_params=inputs_params.get(childname) or {},
                extra_log_factors=extra_log_factors.get(childname) or {})

        lp, _Knt, _Kt, _Ki = method(
            name=childname, P=childP, Q=childQ, scope=scope,
            active_platedims=active_platedims, all_platedims=all_platedims,
            groupvarname2Kdim=groupvarname2Kdim,
            varname2groupvarname=varname2groupvarname, sampler=sampler,
            computation_strategy=computation_strategy, **kwargs)

        lps.append(lp)
        Knon_timeseries.extend(_Knt)
        Ktimeseries.extend(_Kt)
        Kinits.extend(_Ki)

    return lps, Knon_timeseries, Ktimeseries, Kinits
