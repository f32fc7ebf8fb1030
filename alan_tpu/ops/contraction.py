"""MXU-mapped log-space contraction steps.

A reduce step of the K-contraction is ``logsumexp_{Ks}(A + B)``.  Evaluated
literally that is a broadcast add over the K-product space plus a reduction —
VPU-bound with an O(K^2·batch) intermediate.  Reformulated as
``log( exp(A - Amax) @ exp(B - Bmax) ) + Amax + Bmax`` it becomes a batched
matrix product that XLA tiles onto the MXU systolic array, with the exp/log
fused around it — the same trick the reference applies only to timeseries
(``utils.py:499-507``), applied here to *every* pairwise step of the
opt_einsum path.

Decomposition: reduced dims private to one factor are logsumexp'd out first
(the sum factorises); the shared reduced dims form the matmul contraction;
remaining shared dims are batch.

Accuracy envelope: the rank-1 shift ``Amax_i + Bmax_j`` upper-bounds the
joint max, so there is no overflow; accuracy degrades only when the bound is
loose by more than the f32 exp range (~87 nats), i.e. when the row/col maxes
misalign catastrophically.  (The reference's own logmmexp uses the same
shift with an *eps* floor of ~1e-7 — ``utils.py:499-507`` — which degrades
at a ~16-nat gap; the ``tiny`` floor here extends that to ~87.)  Set
``ALAN_TPU_NO_MATMUL_CONTRACT=1`` to force the exact joint-max path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import opt_einsum

from ..dims import DT, as_dt, dims_of, logsumexp_dims, amax_dims, expand_to


def pairwise_logsumexp_contract(a, b, Ks) -> DT:
    """logsumexp over ``Ks`` of ``a + b`` via a log-space batched matmul."""
    a, b = as_dt(a), as_dt(b)
    Ks = [k for k in Ks if k in a.dims or k in b.dims]
    Ka = [k for k in Ks if k in a.dims and k not in b.dims]
    Kb = [k for k in Ks if k in b.dims and k not in a.dims]
    Kab = [k for k in Ks if k in a.dims and k in b.dims]

    if Ka:
        a = logsumexp_dims(a, tuple(Ka))
    if Kb:
        b = logsumexp_dims(b, tuple(Kb))
    if not Kab:
        return a + b

    batch = [d for d in a.dims if d in b.dims and d not in Kab]
    i_dims = [d for d in a.dims if d not in b.dims and d not in Kab]
    j_dims = [d for d in b.dims if d not in a.dims and d not in Kab]

    # The batch block is collapsed to ONE axis below; a reshape that merges
    # a SHARDED dim anywhere but majormost is unrepresentable in GSPMD and
    # forces a full all-gather of the operand (measured: an 85 MB gather of
    # the covid chain operator per step with the T axis mesh-mapped).  Put
    # mesh-mapped dims first so the flat axis inherits their sharding.
    from ..parallel.mesh import active_plan
    plan = active_plan()
    if plan is not None and len(batch) > 1:
        batch.sort(key=lambda d: plan._axis_for(d) is None)

    # raw arrays, named order (batch, i/j, k)
    a_o = a.with_dims_front([*batch, *i_dims, *Kab])
    b_o = b.with_dims_front([*batch, *j_dims, *Kab])
    assert a_o.pos_ndim == 0 and b_o.pos_ndim == 0

    import math
    nb, ni, nj = len(batch), len(i_dims), len(j_dims)
    batch_shape = a_o.data.shape[:nb]
    b_size = math.prod(batch_shape) if nb else 1
    i_size = math.prod(a_o.data.shape[nb:nb + ni]) if ni else 1
    j_size = math.prod(b_o.data.shape[nb:nb + nj]) if nj else 1
    # collapse the batch block to ONE axis: dot_general with a single batch
    # dim compiles and tiles far better than one with many small batch dims.
    A = a_o.data.reshape((b_size, i_size, -1))
    B = b_o.data.reshape((b_size, j_size, -1))

    from ..perf import count_flops
    k_size = A.shape[-1]
    count_flops(
        matmul=2.0 * b_size * i_size * j_size * k_size,
        elementwise=(2.0 * b_size * (i_size + j_size) * k_size
                     + 2.0 * b_size * i_size * j_size))

    # XLA fuses the log-prob producer and the max/exp passes into the dot's
    # operand reads; a hand-fused Pallas kernel here measured SLOWER end-to-
    # end (20.1 -> 29.4 ms, grouped K=1000) because the kernel boundary
    # materialises the K^2*plate factor XLA never writes.  The fused-producer
    # form that does win is the lazy low-rank path (ops/pallas_lowrank.py),
    # which consumes the factored operands directly.
    a_max = jax.lax.stop_gradient(jnp.max(A, axis=-1, keepdims=True))
    b_max = jax.lax.stop_gradient(jnp.max(B, axis=-1, keepdims=True))
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    b_max = jnp.where(jnp.isfinite(b_max), b_max, 0.0)

    C = jnp.einsum("bik,bjk->bij", jnp.exp(A - a_max), jnp.exp(B - b_max),
                   preferred_element_type=jnp.float32)
    tiny = jnp.finfo(C.dtype).tiny
    out = jnp.log(C + tiny) + a_max + jnp.swapaxes(b_max, -1, -2)

    i_shape = a_o.data.shape[nb:nb + ni]
    j_shape = b_o.data.shape[nb:nb + nj]
    out = out.reshape(batch_shape + i_shape + j_shape)
    return DT(out, tuple(batch) + tuple(i_dims) + tuple(j_dims))
