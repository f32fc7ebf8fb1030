"""Cross-K diagonal-Normal log-density as an MXU contraction.

In MP inference a latent's P-factor evaluates the child's K samples against
*all* K parent-conditioned densities: ``lp[K_child, K_parent, plates]``
(reference semantics: ``logpq.py:211-235`` evaluating ``dist.log_prob`` on a
cross-K scope).  Evaluated elementwise that is O(K^2 * plate * event) VPU
work — the dominant cost of a training step at large K.

For a diagonal Normal the quadratic factorises.  With a stop-gradient
center c (the mean of x over its private K-dims, which keeps the expanded
square numerically tame), write x' = x - c, m' = loc - c:

    lp = sum_pos[ -(x'-m')^2/(2s^2) - log s - log sqrt(2pi) ]
       = sum_pos[ x'^2 * a + x' * b ] + sum_pos[ c_term ]
         with a = -1/(2s^2),  b = m'/s^2,  c_term = -m'^2/(2s^2) - log s - C

The first part is an inner product over (positional axes x {quadratic,
linear}) between an x-side matrix and a parameter-side matrix — a batched
matmul the MXU executes at ~2 FLOPs/element of the *factored* operands,
instead of ~6 VPU ops per element of the K^2 cross product.  The c-term is
x-free and broadcasts.

Accuracy: the expansion is exact algebra; f32 cancellation error grows as
ulp * ((x-c)/s)^2 nats, i.e. it is only material for sample/parameter pairs
whose density is already astronomically small relative to the max — which
the max-shifted K-contraction ignores.  Gradients are exact (same algebra,
autodiffed).  ``ALAN_TPU_NO_LOWRANK_LOGPROB=1`` disables the path;
``ALAN_TPU_LOWRANK_MIN`` tunes the work threshold (cross-product elements).
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from ..dims import DT, as_dt, unify_dims, expand_to, dimsizes_of

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def _threshold() -> int:
    return int(os.environ.get("ALAN_TPU_LOWRANK_MIN", str(1 << 21)))


def normal_lowrank_applicable(x, params, arg_dims) -> bool:
    """Route to the factored path when the sample and the parameters carry
    disjoint named dims (a genuine cross product) big enough to matter."""
    if os.environ.get("ALAN_TPU_NO_LOWRANK_LOGPROB") == "1":
        return False
    x = as_dt(x)
    p_only = [d for d in arg_dims if d not in x.dims]
    x_only = [d for d in x.dims if d not in arg_dims]
    if not p_only or not x_only:
        return False
    loc, scale = params["loc"], params["scale"]
    sizes = dimsizes_of(x, loc, scale)
    pos = jnp.broadcast_shapes(x.pos_shape, loc.pos_shape, scale.pos_shape)
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


def normal_lowrank_logprob(x, params) -> DT:
    """``sum_pos(Normal(loc, scale).log_prob(x))`` over the cross product of
    x-dims and param-dims, via a batched MXU contraction.  Returns a DT with
    dims = x.dims ∪ param dims and no positional axes (the ``DimDist
    .log_prob`` contract)."""
    x = as_dt(x)
    loc, scale = as_dt(params["loc"]), as_dt(params["scale"])
    arg_dims = tuple(unify_dims([loc, scale]))
    union = tuple(unify_dims([x, loc, scale]))
    x_only = tuple(d for d in x.dims if d not in arg_dims)
    p_only = tuple(d for d in arg_dims if d not in x.dims)
    shared = tuple(d for d in union if d not in x_only and d not in p_only)
    sizes = dimsizes_of(x, loc, scale)
    pos = jnp.broadcast_shapes(x.pos_shape, loc.pos_shape, scale.pos_shape)

    # stop-gradient center: mean of x over its private dims, per (shared, pos)
    xo = x.with_dims_front(list(x_only))
    c0 = DT(jax.lax.stop_gradient(
        jnp.mean(xo.data, axis=tuple(range(len(x_only))))),
        xo.dims[len(x_only):])

    xc = x - c0                                  # dims ⊆ x.dims ∪ shared
    locc = loc - c0                              # dims ⊆ arg_dims ∪ shared
    inv = 1.0 / (scale * scale)
    a = inv * (-0.5)
    b = locc * inv
    c_term = locc * locc * inv * (-0.5) - scale.log() - _HALF_LOG_2PI

    X1 = _as_smf(xc, shared, x_only, sizes, pos)          # (S, X, F)
    U = jnp.concatenate([X1 * X1, X1], axis=-1)           # (S, X, 2F)
    Va = _as_smf(a, shared, p_only, sizes, pos)           # (S, P, F)
    Vb = _as_smf(b, shared, p_only, sizes, pos)
    V = jnp.concatenate([Va, Vb], axis=-1)                # (S, P, 2F)

    out = jax.lax.dot_general(
        U, V, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)              # (S, X, P)
    out_dims = shared + x_only + p_only
    out = out.reshape(tuple(sizes[d] for d in out_dims))
    res = DT(out, out_dims)

    # x-free term: sum over positional axes, broadcast over x_only
    Cf = _as_smf(c_term, shared, p_only, sizes, pos).sum(-1)   # (S, P)
    Cdt = DT(Cf.reshape(tuple(sizes[d] for d in shared + p_only)),
             shared + p_only)
    return res + Cdt
