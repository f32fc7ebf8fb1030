"""Fused Pallas TPU kernel for log-space matmul (logmmexp).

XLA evaluates ``log(exp(A-Amax) @ exp(B-Bmax)) + shifts`` as a chain of
kernels with the K×K product materialised in HBM between them.  This kernel
fuses the whole pipeline in VMEM: per grid step it loads an (bm, K) block of
A and the (K, bn) block of B, computes the row/col maxes, exponentiates,
runs the MXU dot, and writes ``log(C + tiny) + shifts`` — one HBM round-trip
instead of four.

Used by ``chain_logmmexp`` on TPU for K >= 128 (below that the dispatch
overhead dominates); everywhere else the jnp path is used.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _kernel(a_ref, b_ref, o_ref):
    a = a_ref[0]
    b = b_ref[0]
    a_max = jnp.max(a, axis=-1, keepdims=True)
    b_max = jnp.max(b, axis=-2, keepdims=True)
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    b_max = jnp.where(jnp.isfinite(b_max), b_max, 0.0)
    c = jnp.dot(jnp.exp(a - a_max), jnp.exp(b - b_max),
                preferred_element_type=jnp.float32)
    tiny = jnp.finfo(jnp.float32).tiny
    o_ref[0] = jnp.log(c + tiny) + a_max + b_max


@functools.partial(jax.jit, static_argnames=("interpret",))
def logmmexp_pallas(A, B, interpret=False):
    """A: (*batch, M, K), B: (*batch, K, N) -> (*batch, M, N), all f32.

    Stability caveat: the max shift here is per full row/column (not per
    block), matching the jnp path's numerics exactly when the full K fits one
    block — which is the regime this kernel targets (K <= ~2048).
    """
    batch = A.shape[:-2]
    M, K = A.shape[-2:]
    N = B.shape[-1]
    A2 = A.reshape((-1, M, K))
    B2 = B.reshape((-1, K, N))
    nb = A2.shape[0]

    out = pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, M, K), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, K, N), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, M, N), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, M, N), jnp.float32),
        interpret=interpret,
    )(A2, B2)
    return out.reshape(batch + (M, N))


@jax.custom_vjp
def logmmexp_fused(A, B):
    """Differentiable wrapper: Pallas forward, matmul-formulated backward
    (Pallas primitives have no automatic autodiff rule)."""
    return logmmexp_pallas(A, B)


def _fwd(A, B):
    O = logmmexp_pallas(A, B)
    return O, (A, B)


def _bwd(res, g):
    A, B = res
    a_max = jnp.max(A, axis=-1, keepdims=True)
    b_max = jnp.max(B, axis=-2, keepdims=True)
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    b_max = jnp.where(jnp.isfinite(b_max), b_max, 0.0)
    Ea = jnp.exp(A - a_max)                       # (..., M, K)
    Eb = jnp.exp(B - b_max)                       # (..., K, N)
    C = jnp.einsum("...mk,...kn->...mn", Ea, Eb)
    G = g / (C + jnp.finfo(C.dtype).tiny)         # (..., M, N)
    dA = Ea * jnp.einsum("...mn,...kn->...mk", G, Eb)
    dB = Eb * jnp.einsum("...mk,...mn->...kn", Ea, G)
    return dA, dB


logmmexp_fused.defvjp(_fwd, _bwd)


def have_pallas_tpu() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
