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
    if allow_pallas and A.shape[-1] >= 128 and A.dtype == jnp.float32:
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


def chain_logmmexp(ms):
    """Reduce ``ms[..., T, K, K]`` over T with log-space matmuls in a
    balanced pairwise tree (reference ``chain_reduce``, ``utils.py:478-497``;
    vectorised over leading batch axes)."""
    assert ms.shape[-1] == ms.shape[-2]
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
