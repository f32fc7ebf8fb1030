"""Log-space matrix products for timeseries contraction.

Parity: reference ``utils.py:478-510`` (``logmmexp`` / ``chain_logmmexp``).
The chain over T is reduced with a balanced pairwise tree (O(log T) depth),
unrolled at trace time; each node is a max-shifted matmul that XLA maps onto
the MXU.  A Pallas TPU kernel for the fused shift-exp-matmul-log lives in
``alan_tpu.ops.pallas_logmmexp`` and is used on TPU for large K.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def logmmexp(A, B, allow_pallas=True):
    """Batched log-space matmul: logsumexp_j(A[..., i, j] + B[..., j, k]).

    Max-shifted for stability, with the reference's eps inside the log
    (``utils.py:499-507``).
    """
    from ..perf import count_flops, counting_active
    if counting_active():
        import math
        nb = math.prod(jnp.broadcast_shapes(A.shape[:-2], B.shape[:-2]))
        i, k, j = A.shape[-2], A.shape[-1], B.shape[-1]
        count_flops(matmul=2.0 * nb * i * k * j,
                    elementwise=2.0 * nb * (i * k + k * j) + 2.0 * nb * i * j)
    if allow_pallas and A.shape[-1] >= 128 and A.dtype == jnp.float32:
        # VMEM guard: the kernel stages whole (M,K)/(K,N)/(M,N) blocks,
        # double-buffered; refuse when that exceeds the ~16 MB budget (e.g.
        # a 900x900 joint-chain operator needs 2*3*900^2*4B = 19 MB and
        # fails Mosaic stack allocation) — the dense XLA path handles it.
        M, Kd = A.shape[-2:]
        Nn = B.shape[-1]
        footprint = 2 * 4 * (M * Kd + Kd * Nn + M * Nn)
        if footprint <= int(14e6):
            from .pallas_logmmexp import have_pallas_tpu, logmmexp_fused
            if have_pallas_tpu():
                return logmmexp_fused(A, B)
    a_max = jax.lax.stop_gradient(jnp.max(A, axis=-1, keepdims=True))
    b_max = jax.lax.stop_gradient(jnp.max(B, axis=-2, keepdims=True))
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    b_max = jnp.where(jnp.isfinite(b_max), b_max, 0.0)
    C = jnp.einsum("...ij,...jk->...ik", jnp.exp(A - a_max), jnp.exp(B - b_max))
    tiny = jnp.finfo(C.dtype).tiny
    return jnp.log(C + tiny) + a_max + b_max


def _use_smallk_lanes(ms) -> bool:
    """Route small-K / large-batch chains to the batch-in-lanes Pallas
    kernel (``pallas_smallk``).  XLA pads every (K, K) log-matmul operand to
    a (32, 128) page below K=128, so the dense path wastes ~4/3 * 128/K of
    the HBM traffic and runs ~1%-utilised MXU passes; the lanes kernel is
    the covid hot path's fix (93% of the QEM step, measured).
    """
    import os
    if os.environ.get("ALAN_TPU_NO_SMALLK_CHAIN"):
        return False
    K = ms.shape[-1]
    nB = 1
    for d in ms.shape[:-3]:
        nB *= d
    if os.environ.get("ALAN_TPU_SMALLK_CHAIN"):
        return True
    max_k = int(os.environ.get("ALAN_TPU_SMALLK_CHAIN_MAX_K", "100"))
    if not (ms.dtype == jnp.float32 and 2 <= K <= max_k and ms.shape[-3] >= 2):
        return False
    if nB < 128:  # can't fill the lane axis; dense padding waste is small too
        return False
    from .pallas_smallk import fits_vmem, have_pallas_tpu
    # kernel VMEM footprint scales ~K^2 * lane-block; only route K whose
    # fwd AND bwd blocks fit the budget (binds near K~35; ADVICE r2)
    if not fits_vmem(K, nB):
        return False
    return have_pallas_tpu()


def chain_logmmexp(ms):
    """Reduce ``ms[..., T, K, K]`` over T with log-space matmuls in a
    balanced pairwise tree (reference ``chain_reduce``, ``utils.py:478-497``;
    vectorised over leading batch axes).

    On TPU, small-K chains with a large leading batch run in the
    batch-in-lanes Pallas kernel (identical tree order and numerics; see
    ``ops.pallas_smallk``)."""
    assert ms.shape[-1] == ms.shape[-2]
    if _use_smallk_lanes(ms):
        from .pallas_smallk import chain_logmmexp_lanes, have_pallas_tpu
        # interpret mode keeps the forced path testable off-TPU
        return chain_logmmexp_lanes(ms, interpret=not have_pallas_tpu())
    T_axis = ms.ndim - 3
    while ms.shape[T_axis] != 1:
        n = ms.shape[T_axis]
        even = jax.lax.slice_in_dim(ms, 0, n - (n % 2), stride=2, axis=T_axis)
        odd = jax.lax.slice_in_dim(ms, 1, n, stride=2, axis=T_axis)
        prod = logmmexp(even, odd)
        if n % 2 == 1:
            rem = jax.lax.slice_in_dim(ms, n - 1, n, axis=T_axis)
            prod = jnp.concatenate([prod, rem], axis=T_axis)
        ms = prod
    return jnp.squeeze(ms, axis=T_axis)
