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
    # K^n cross — cap both operands at ~256MB f32.
    cap = 1 << 26
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
    shared = tuple(d for d in union if d not in x_only and d not in p_only)
    sizes = dimsizes_of(x, *pvals.values())
    pos = jnp.broadcast_shapes(x.pos_shape,
                               *[v.pos_shape for v in pvals.values()])

    u_feats, v_coefs, c_p, c_x = _factored(family_name, x, pvals, x_only)

    U = jnp.concatenate(
        [_as_smf(u, shared, x_only, sizes, pos) for u in u_feats], axis=-1)
    V = jnp.concatenate(
        [_as_smf(v, shared, p_only, sizes, pos) for v in v_coefs], axis=-1)

    out = jax.lax.dot_general(
        U, V, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)              # (S, X, P)
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


# backwards-compatible aliases (first landing exposed Normal-only names)
def normal_lowrank_applicable(x, params, arg_dims):
    return lowrank_applicable("Normal", x, params, arg_dims)


def normal_lowrank_logprob(x, params):
    return lowrank_logprob("Normal", x, params)
