"""Cross-K log-densities as MXU contractions.

In MP inference a latent's P-factor evaluates the child's K samples against
*all* K parent-conditioned densities: ``lp[K_child, K_parent, plates]``
(reference semantics: ``logpq.py:211-235`` evaluating ``dist.log_prob`` on a
cross-K scope).  Evaluated elementwise that is O(K^2 * plate * event) VPU
work — the dominant cost of a training step at large K.

Exponential-family densities factorise over (sufficient statistic of x) x
(natural parameter):

    lp = sum_pos[ Σ_r u_r(x) * v_r(θ) ]  +  sum_pos[ c(θ) ]  +  sum_pos[ h(x) ]

so the cross product is an inner product over (positional axes x R terms)
between an x-side matrix and a parameter-side matrix — a batched matmul the
MXU executes at ~2 FLOPs per element of the *factored* operands instead of
~6 VPU ops per element of the K^2 cross.  The x-free / θ-free remainders
broadcast.  Factored forms:

    Normal     u=[x'^2, x']           v=[-1/(2s^2), m'/s^2]      (centered)
    LogNormal  Normal on log x        h(x) = -log x
    Exponential u=[x]                 v=[-rate]                  (exact)
    Gamma/Chi2 u=[log x, x]           v=[conc-1, -rate]          (exact)
    Beta       u=[log x, log1p(-x)]   v=[c1-1, c0-1]             (exact)

For the Normal the square is expanded around a stop-gradient center c (the
mean of x over its private K-dims), which keeps f32 cancellation error at
~ulp * ((x-c)/s)^2 nats — only material for (sample, parent) pairs whose
density is already astronomically small relative to the max, which the
max-shifted K-contraction ignores.  The other forms are exact algebra (for
positive-support families the samples are a.s. > 0, so the log features are
finite).  Gradients are exact (same algebra, autodiffed).

Measured on a v5e (grouped movielens QEM step): K=1000 20.1ms -> 13.5ms,
K=30 headline 0.52ms -> 0.27ms (docs/performance.md).

``ALAN_TPU_NO_LOWRANK_LOGPROB=1`` disables the path; ``ALAN_TPU_LOWRANK_MIN``
tunes the work threshold (cross-product elements, default 2^21).
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import jax.scipy.special as jsp

from ..dims import (DT, as_dt, unify_dims, expand_to, dimsizes_of,
                    elementwise)

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)

#: families with a registered factored form (Chi2 canonicalizes to Gamma
#: params and inherits its log_prob, so it shares the Gamma form)
LOWRANK_FAMILIES = ("Normal", "LogNormal", "Exponential", "Gamma", "Chi2",
                    "Beta")


def _threshold() -> int:
    # Default calibrated on a v5e with fetch-based timing: ungrouped
    # movielens K=30 (work 1.5e8) is dispatch-bound and loses from the
    # extra assembly ops (0.48 -> 1.30 ms); grouped K=300 (work 4.9e8)
    # wins 1.65x.  2^28 ~ 2.7e8 splits the two.
    return int(os.environ.get("ALAN_TPU_LOWRANK_MIN", str(1 << 28)))


def lowrank_lazy_preferred(x, params) -> bool:
    """Route to the *lazy* factored form (``LowRankDT`` + the fused Pallas
    contraction) instead of the dense matmul.

    Measured on a v5e (grouped movielens QEM step, end-to-end, round-2
    kernel: bf16x3 score matmuls + dimension_semantics pipelining — see
    docs/performance.md):

        K= 300 (cross 2.7e7): dense 0.94 ms, lazy 2.65 ms  -> dense
        K= 500 (cross 7.5e7): dense 3.49 ms, lazy 3.08 ms  -> LAZY
        K= 700 (cross 1.5e8): dense 6.88 ms, lazy 5.74 ms  -> LAZY
        K=1000 (cross 3.0e8): dense 12.0 ms, lazy 10.7 ms  -> LAZY

    Below the crossover the step is dispatch/MXU-bound and XLA's single
    GEMM wins; above it the dense path's O(K²·plate) HBM traffic dominates
    and the flash-style fusion wins — plus the *capacity* win: the K²·plate
    tensor never exists, so K keeps scaling past the dense OOM wall
    (K=3000 grouped movielens ⇒ a 10.8 GB cross product).  Default
    threshold 2^26 ≈ 6.7e7 cross-product elements (just under the measured
    K=500 win).  ``ALAN_TPU_LAZY_LOWRANK=1`` forces it everywhere;
    ``ALAN_TPU_NO_LAZY_LOWRANK=1`` kills it; ``ALAN_TPU_LAZY_LOWRANK_MIN``
    tunes the threshold."""
    if os.environ.get("ALAN_TPU_NO_LAZY_LOWRANK") == "1":
        return False
    if (os.environ.get("ALAN_TPU_LAZY_LOWRANK") == "1"
            or os.environ.get("ALAN_TPU_LAZY_LOWRANK_INTERPRET") == "1"):
        return True
    x = as_dt(x)
    pvals = [as_dt(v) for v in params.values()]
    sizes = dimsizes_of(x, *pvals)
    # elements of the cross tensor the dense path would materialise
    cross = math.prod(sizes.values())
    return cross >= int(os.environ.get("ALAN_TPU_LAZY_LOWRANK_MIN",
                                       str(1 << 26)))


def lowrank_applicable(family_name, x, params, arg_dims) -> bool:
    """Route to the factored path when the sample and the parameters carry
    disjoint named dims (a genuine cross product) big enough to matter, and
    the factored operands stay bounded."""
    if family_name not in LOWRANK_FAMILIES:
        return False
    if os.environ.get("ALAN_TPU_NO_LOWRANK_LOGPROB") == "1":
        return False
    x = as_dt(x)
    p_only = [d for d in arg_dims if d not in x.dims]
    x_only = [d for d in x.dims if d not in arg_dims]
    if not p_only or not x_only:
        return False
    pvals = [as_dt(v) for v in params.values()]
    sizes = dimsizes_of(x, *pvals)
    pos = jnp.broadcast_shapes(x.pos_shape, *[v.pos_shape for v in pvals])
    F = math.prod(pos)
    work = math.prod(sizes.values()) * F
    # The factored operands materialise prod(side dims) * F floats; with
    # several disjoint param K-dims (ungrouped models) the V side would be a
    # K^n cross — cap both operands (default ~256MB f32;
    # ALAN_TPU_LOWRANK_OPERAND_CAP overrides — covid's timeseries factor
    # has u_elems 7.6e7 and benefits from 2^27).
    cap = int(os.environ.get("ALAN_TPU_LOWRANK_OPERAND_CAP", str(1 << 26)))
    u_elems = math.prod(sizes[d] for d in sizes if d not in p_only) * F
    v_elems = math.prod(sizes[d] for d in p_only) * F
    if u_elems > cap or v_elems > cap:
        return False
    return work >= _threshold()


def _normal_terms(y, loc, scale, x_only):
    """Centered quadratic expansion shared by Normal and LogNormal."""
    yo = y.with_dims_front(list(x_only))
    c0 = DT(jax.lax.stop_gradient(
        jnp.mean(yo.data, axis=tuple(range(len(x_only))))),
        yo.dims[len(x_only):])
    yc = y - c0
    locc = loc - c0
    inv = 1.0 / (scale * scale)
    u = [yc * yc, yc]
    v = [inv * (-0.5), locc * inv]
    c_p = locc * locc * inv * (-0.5) - scale.log() - _HALF_LOG_2PI
    return u, v, c_p


def _factored(family_name, x, params, x_only):
    """-> (u_feats, v_coefs, c_param, c_x); see module docstring."""
    if family_name == "Normal":
        u, v, c_p = _normal_terms(x, params["loc"], params["scale"], x_only)
        return u, v, c_p, None
    if family_name == "LogNormal":
        lx = x.log()
        u, v, c_p = _normal_terms(lx, params["loc"], params["scale"], x_only)
        return u, v, c_p, -lx
    if family_name == "Exponential":
        rate = as_dt(params["rate"])
        return [x], [-rate], rate.log(), None
    if family_name in ("Gamma", "Chi2"):
        a, b = as_dt(params["concentration"]), as_dt(params["rate"])
        c_p = a * b.log() - elementwise(jsp.gammaln, a)
        return [x.log(), x], [a - 1.0, -b], c_p, None
    if family_name == "Beta":
        a, b = as_dt(params["concentration1"]), as_dt(params["concentration0"])
        c_p = (elementwise(jsp.gammaln, a + b) - elementwise(jsp.gammaln, a)
               - elementwise(jsp.gammaln, b))
        l1mx = elementwise(jnp.log1p, -x)
        return [x.log(), l1mx], [a - 1.0, b - 1.0], c_p, None
    raise KeyError(family_name)


def _as_smf(t: DT, shared, row_dims, sizes, pos):
    """Raw array (prod(shared), prod(row_dims), prod(pos)) with named dims
    expanded/broadcast to (shared..., row_dims...) and positional axes
    broadcast to ``pos``."""
    tgt = tuple(shared) + tuple(row_dims)
    a = expand_to(t, tgt)                       # (*sizes_or_1, *own_pos)
    own_pos = a.shape[len(tgt):]
    if len(own_pos) < len(pos):
        a = a.reshape(a.shape[:len(tgt)] + (1,) * (len(pos) - len(own_pos))
                      + own_pos)
    full = tuple(sizes[d] for d in tgt) + tuple(pos)
    a = jnp.broadcast_to(a, full)
    S = math.prod(sizes[d] for d in shared) if shared else 1
    R = math.prod(sizes[d] for d in row_dims) if row_dims else 1
    return a.reshape(S, R, -1)


def _dot_precision():
    """MXU precision for the factored log-density dots.

    HIGHEST (default) = bf16x6 passes — full f32-equivalent accuracy at a
    6x pass-count ceiling penalty on the MXU.  ``ALAN_TPU_LOWRANK_PRECISION
    = high`` selects bf16x3 (~2x the dot throughput, ~1e-6 relative error
    on these log-density magnitudes), ``default`` selects single-pass bf16
    (fastest, ~1e-3 — for throughput experiments only).
    """
    import os
    name = os.environ.get("ALAN_TPU_LOWRANK_PRECISION", "highest").upper()
    return getattr(jax.lax.Precision, name)


def _shard_major(shared):
    """Order shared (batch) dims with mesh-mapped dims first: downstream
    the shared block is reshape-merged into one flat batch axis, and GSPMD
    can only keep the merged axis sharded when the sharded dim is majormost
    (a minor-position sharded dim forces a full all-gather of the operand —
    measured 85 MB/step on T-sharded covid)."""
    from ..parallel.mesh import active_plan
    shared = tuple(shared)
    plan = active_plan()
    if plan is not None and len(shared) > 1:
        shared = tuple(sorted(shared,
                              key=lambda d: plan._axis_for(d) is None))
    return shared


def lowrank_logprob(family_name, x, params) -> DT:
    """``sum_pos(family(params).log_prob(x))`` over the cross product of
    x-dims and param-dims, via a batched MXU contraction.  Returns a DT with
    dims = x.dims ∪ param dims and no positional axes (the
    ``DimDist.log_prob`` contract)."""
    x = as_dt(x)
    pvals = {k: as_dt(v) for k, v in params.items()}
    arg_dims = tuple(unify_dims(pvals.values()))
    union = tuple(unify_dims([x, *pvals.values()]))
    x_only = tuple(d for d in x.dims if d not in arg_dims)
    p_only = tuple(d for d in arg_dims if d not in x.dims)
    shared = _shard_major(
        d for d in union if d not in x_only and d not in p_only)
    sizes = dimsizes_of(x, *pvals.values())
    pos = jnp.broadcast_shapes(x.pos_shape,
                               *[v.pos_shape for v in pvals.values()])

    u_feats, v_coefs, c_p, c_x = _factored(family_name, x, pvals, x_only)

    U = jnp.concatenate(
        [_as_smf(u, shared, x_only, sizes, pos) for u in u_feats], axis=-1)
    V = jnp.concatenate(
        [_as_smf(v, shared, p_only, sizes, pos) for v in v_coefs], axis=-1)

    from ..perf import count_flops
    count_flops(matmul=2.0 * U.shape[0] * U.shape[1] * V.shape[1]
                * U.shape[-1])
    out = jax.lax.dot_general(
        U, V, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=_dot_precision())                       # (S, X, P)
    out_dims = shared + x_only + p_only
    out = out.reshape(tuple(sizes[d] for d in out_dims))
    res = DT(out, out_dims)

    # x-free term: sum over positional axes, broadcast over x_only
    Cf = _as_smf(c_p, shared, p_only, sizes, pos).sum(-1)      # (S, P)
    res = res + DT(Cf.reshape(tuple(sizes[d] for d in shared + p_only)),
                   shared + p_only)
    if c_x is not None:
        Hx = _as_smf(c_x, shared, x_only, sizes, pos).sum(-1)  # (S, X)
        res = res + DT(Hx.reshape(tuple(sizes[d] for d in shared + x_only)),
                       shared + x_only)
    return res


# ---- lazy factored form ----------------------------------------------------
#
# ``lowrank_logprob`` still *materialises* the cross-K product (as one MXU
# matmul).  The lazy form below keeps the factored operands (U, V) plus
# additive side terms symbolic until the K-contraction consumes the factor,
# at which point ``alan_tpu.reduce_ks.logsumexp_sum`` hands it to the fused
# Pallas kernel (``ops/pallas_lowrank.py``) — the K²·plate tensor then never
# exists in HBM, forward or backward.  Anywhere else the object materialises
# to a plain DT, reproducing the dense path exactly.


def _as_feat(terms, dims_order, sizes, pos) -> DT:
    """Stack feature terms into one DT with dims ``dims_order`` and a single
    positional axis of length ``len(terms) * prod(pos)``."""
    cols = []
    nd = len(dims_order)
    for t in terms:
        a = expand_to(t, dims_order)
        own_pos = a.shape[nd:]
        if len(own_pos) < len(pos):
            a = a.reshape(a.shape[:nd] + (1,) * (len(pos) - len(own_pos))
                          + own_pos)
        full = tuple(sizes[d] for d in dims_order) + tuple(pos)
        cols.append(jnp.broadcast_to(a, full).reshape(full[:nd] + (-1,)))
    return DT(jnp.concatenate(cols, axis=-1) if len(cols) > 1 else cols[0],
              tuple(dims_order))


def _side_sum(t, dims_order, sizes, pos) -> DT:
    """Positional-sum of a side term, broadcast over ``pos`` first."""
    return DT(_as_feat([t], dims_order, sizes, pos).data.sum(-1),
              tuple(dims_order))


class LowRankDT:
    """Lazy cross-K factored log-density: semantically the DT

        lp[shared, x_dims, p_dims] = U · V  (+ x_side) (+ p_side)

    with U carrying (shared, x_dims) and V (shared, p_dims), inner product
    over one positional feature axis.  Duck-types the DT dim protocol so it
    can ride the contraction planner; ``+``/``-`` absorb terms that live on
    one side and fall back to ``materialize()`` otherwise.
    """
    __lazy_dt__ = True

    def __init__(self, U: DT, V: DT, shared, x_dims, p_dims, sizes,
                 x_side: DT | None = None, p_side: DT | None = None):
        self.U, self.V = U, V
        self.shared = tuple(shared)
        self.x_dims = tuple(x_dims)
        self.p_dims = tuple(p_dims)
        self.sizes = dict(sizes)
        self.x_side, self.p_side = x_side, p_side

    # -- DT dim protocol --
    @property
    def dims(self):
        return self.shared + self.x_dims + self.p_dims

    @property
    def pos_ndim(self):
        return 0

    @property
    def pos_shape(self):
        return ()

    def dim_size(self, d):
        return self.sizes[d]

    def dimsizes(self):
        return {d: self.sizes[d] for d in self.dims}

    def __repr__(self):
        return (f"LowRankDT(shared={self.shared}, x={self.x_dims}, "
                f"p={self.p_dims}, F={self.U.pos_shape[-1]})")

    # -- arithmetic: absorb one-sided terms, else materialise --
    def _replace(self, **kw):
        args = dict(U=self.U, V=self.V, shared=self.shared,
                    x_dims=self.x_dims, p_dims=self.p_dims, sizes=self.sizes,
                    x_side=self.x_side, p_side=self.p_side)
        args.update(kw)
        return LowRankDT(**args)

    def _try_absorb(self, o, neg=False):
        if getattr(o, "__lazy_dt__", False):
            return None
        if isinstance(o, (int, float)):
            if o == 0:
                return self
            o = DT(jnp.asarray(o, jnp.float32), ())
        elif isinstance(o, DT):
            if o.pos_ndim != 0:
                return None
        elif hasattr(o, "ndim") and jnp.ndim(o) == 0:
            o = DT(jnp.asarray(o), ())
        else:
            return None
        if neg:
            o = -o
        od = set(o.dims)
        if od <= set(self.shared) | set(self.x_dims):
            return self._replace(
                x_side=o if self.x_side is None else self.x_side + o)
        if od <= set(self.shared) | set(self.p_dims):
            return self._replace(
                p_side=o if self.p_side is None else self.p_side + o)
        return None

    def __add__(self, o):
        r = self._try_absorb(o)
        if r is not None:
            return r
        o = o.materialize() if getattr(o, "__lazy_dt__", False) else o
        return self.materialize() + o

    __radd__ = __add__

    def __sub__(self, o):
        r = self._try_absorb(o, neg=True)
        if r is not None:
            return r
        o = o.materialize() if getattr(o, "__lazy_dt__", False) else o
        return self.materialize() - o

    def __rsub__(self, o):
        return as_dt(o) - self.materialize()

    def __neg__(self):
        return -self.materialize()

    # -- evaluation --
    def materialize(self) -> DT:
        """Dense evaluation — identical algebra to ``lowrank_logprob``."""
        sizes = self.sizes
        S = math.prod(sizes[d] for d in self.shared) if self.shared else 1
        X = math.prod(sizes[d] for d in self.x_dims) if self.x_dims else 1
        P = math.prod(sizes[d] for d in self.p_dims) if self.p_dims else 1
        u = self.U.with_dims_front(list(self.shared + self.x_dims))
        v = self.V.with_dims_front(list(self.shared + self.p_dims))
        from ..perf import count_flops
        count_flops(matmul=2.0 * S * X * P * self.U.pos_shape[-1])
        out = jax.lax.dot_general(
            u.data.reshape(S, X, -1), v.data.reshape(S, P, -1),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_dot_precision())
        out_dims = self.shared + self.x_dims + self.p_dims
        res = DT(out.reshape(tuple(sizes[d] for d in out_dims)), out_dims)
        if self.x_side is not None:
            res = res + self.x_side
        if self.p_side is not None:
            res = res + self.p_side
        return res

    def contract(self, Ks, others) -> DT | None:
        """``logsumexp_{Ks}(self + Σ others)`` via the fused kernel, or
        None if these factors don't fit the fused form (caller falls back
        to ``materialize()``)."""
        from .pallas_lowrank import (fused_available, lowrank_logsumexp,
                                     run_interpret)
        Kset = set(Ks)
        if not Kset or not Kset <= set(self.dims):
            return None
        if any(d in Kset for d in self.shared):
            return None
        red_x = [d for d in self.x_dims if d in Kset]
        red_p = [d for d in self.p_dims if d in Kset]
        if not red_x:
            if not red_p:
                return None
            # the reduction hits only the parameter side (e.g. an observation
            # factor whose params carry the parent's K-dim): the factored form
            # is symmetric in (U, x) <-> (V, p), so swap roles and recurse.
            swapped = LowRankDT(self.V, self.U, self.shared, self.p_dims,
                                self.x_dims, self.sizes,
                                x_side=self.p_side, p_side=self.x_side)
            return swapped.contract(Ks, others)

        x_set = set(self.shared) | set(self.x_dims)
        p_set = set(self.shared) | set(self.p_dims)
        x_terms = [] if self.x_side is None else [self.x_side]
        p_terms = [] if self.p_side is None else [self.p_side]
        for o in others:
            if getattr(o, "__lazy_dt__", False):
                return None
            o = as_dt(o)
            if o.pos_ndim != 0:
                return None
            if set(o.dims) <= x_set:
                x_terms.append(o)
            elif set(o.dims) <= p_set:
                p_terms.append(o)
            else:
                return None

        sizes = self.sizes
        kept_x = [d for d in self.x_dims if d not in Kset]
        S = math.prod(sizes[d] for d in self.shared) if self.shared else 1
        P = math.prod(sizes[d] for d in kept_x) if kept_x else 1
        I = math.prod(sizes[d] for d in red_x)
        J = math.prod(sizes[d] for d in self.p_dims) if self.p_dims else 1
        F = self.U.pos_shape[-1]
        if not fused_available(S, P, I, J, F):
            return None

        u_order = list(self.shared) + kept_x + red_x
        U4 = (self.U.with_dims_front(u_order)
              .data.reshape(S, P, I, F).astype(jnp.float32))
        V3 = (self.V.with_dims_front(list(self.shared + self.p_dims))
              .data.reshape(S, J, F).astype(jnp.float32))
        if x_terms:
            d_total = x_terms[0]
            for t in x_terms[1:]:
                d_total = d_total + t
            D3 = jnp.broadcast_to(
                expand_to(d_total, u_order),
                tuple(sizes[d] for d in u_order)).reshape(S, P, I)
            D3 = D3.astype(jnp.float32)
        else:
            D3 = jnp.zeros((S, P, I), jnp.float32)

        from ..perf import count_flops
        count_flops(matmul=2.0 * S * P * I * J * F,
                    elementwise=4.0 * S * P * I * J)
        out = lowrank_logsumexp(U4, V3, D3, run_interpret())
        out_dims = tuple(self.shared) + tuple(kept_x) + self.p_dims
        res = DT(out.reshape(tuple(sizes[d] for d in out_dims)), out_dims)
        for t in p_terms:
            res = res + t
        if red_p:
            from ..dims import logsumexp_dims
            res = logsumexp_dims(res, tuple(red_p))
        return res


def lowrank_logprob_lazy(family_name, x, params) -> LowRankDT:
    """Lazy counterpart of ``lowrank_logprob``: same factored algebra, the
    cross product deferred to the consuming K-contraction."""
    x = as_dt(x)
    pvals = {k: as_dt(v) for k, v in params.items()}
    arg_dims = tuple(unify_dims(pvals.values()))
    union = tuple(unify_dims([x, *pvals.values()]))
    x_only = tuple(d for d in x.dims if d not in arg_dims)
    p_only = tuple(d for d in arg_dims if d not in x.dims)
    shared = _shard_major(
        d for d in union if d not in x_only and d not in p_only)
    sizes = dimsizes_of(x, *pvals.values())
    pos = jnp.broadcast_shapes(x.pos_shape,
                               *[v.pos_shape for v in pvals.values()])

    u_feats, v_coefs, c_p, c_x = _factored(family_name, x, pvals, x_only)

    U = _as_feat(u_feats, shared + x_only, sizes, pos)
    V = _as_feat(v_coefs, shared + p_only, sizes, pos)
    p_side = _side_sum(c_p, shared + p_only, sizes, pos)
    x_side = (None if c_x is None
              else _side_sum(c_x, shared + x_only, sizes, pos))
    return LowRankDT(U, V, shared, x_only, p_only, sizes,
                     x_side=x_side, p_side=p_side)


# backwards-compatible aliases (first landing exposed Normal-only names)
def normal_lowrank_applicable(x, params, arg_dims):
    return lowrank_applicable("Normal", x, params, arg_dims)


def normal_lowrank_logprob(x, params):
    return lowrank_logprob("Normal", x, params)
