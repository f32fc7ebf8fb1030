"""Batch-in-lanes Pallas TPU kernel for small-K log-space matmuls.

Covid-class timeseries models contract chains of ``[T, K, K]`` transition
operators with small K (~30) but an enormous leading batch — full covid is
``K_npis * nRs = 2760`` independent chains (reference hot path
``utils.py:478-510`` invoked at ``logpq.py:131-146``).  XLA lays each
``(K, K)`` matrix on its own (8, 128)-tiled page, so a 30x30 operand pads to
32x128 (4.5x wasted HBM traffic) and each matmul is a ~1%-utilised MXU pass;
measured on v5e, this chain contraction is **93%** of covid's whole QEM step
(388 of 418 ms, ``scripts/bench_covid_chain_share.py``).

This kernel transposes the problem instead of padding it: the batch rides
the 128-wide **lane** axis (``[L, K, K, B]`` layout, B innermost), so every
lane is useful and the only padding is K -> 32 sublanes (6.7%).  The
j-contraction ``c[i,k,b] = logsumexp_j(a[i,j,b] + b[j,k,b])`` becomes K
broadcast-multiply/reduce passes on the VPU — no MXU, no (32,128) page per
matrix.  Forward and backward (custom VJP, same layout) both run here;
``chain_logmmexp_lanes`` keeps the whole balanced tree in the transposed
layout so the transpose is paid once per chain, not per level.

Numerics match ``ops.logmmexp.logmmexp`` exactly: per-row/col max shifts
(finite-guarded), ``log(c + tiny) + shifts``, and the same XLA-formula
backward ``da = ea * (g/(c+tiny) @ eb^T)``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pragma: no cover - exercised indirectly
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_TINY = 1.1754943508222875e-38  # jnp.finfo(jnp.float32).tiny


def _cparams(dimension_semantics):
    if not _PALLAS_OK:
        return None
    try:
        return pltpu.CompilerParams(dimension_semantics=dimension_semantics)
    except Exception:  # pragma: no cover - older jax
        return pltpu.TPUCompilerParams(dimension_semantics=dimension_semantics)


def _shifts(a, b):
    """Finite-guarded row/col max shifts in lanes layout.

    a: (K, K, bl) with a[i, j, b]; b: (K, K, bl) with b[j, k, b].
    Returns (a_max[i, b], b_max[k, b], ea[i, j, b], eb[j, k, b]).
    """
    a_max = jnp.max(a, axis=1)  # over j -> (K, bl)
    b_max = jnp.max(b, axis=0)  # over j -> (K, bl)
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    b_max = jnp.where(jnp.isfinite(b_max), b_max, 0.0)
    ea = jnp.exp(a - a_max[:, None, :])
    eb = jnp.exp(b - b_max[None, :, :])
    return a_max, b_max, ea, eb


def _fwd_kernel(a_ref, b_ref, o_ref):
    a = a_ref[0]
    b = b_ref[0]
    K = a.shape[0]
    a_max, b_max, ea, eb = _shifts(a, b)
    # c[i, k, b] = sum_j ea[i, j, b] * eb[j, k, b]: one broadcast-mul +
    # leading-axis reduce per output row i (K VPU passes, no MXU).
    rows = []
    for i in range(K):
        rows.append(jnp.sum(ea[i][:, None, :] * eb, axis=0))  # (K, bl)
    c = jnp.stack(rows, axis=0)
    o_ref[0] = jnp.log(c + _TINY) + a_max[:, None, :] + b_max[None, :, :]


def _bwd_kernel(a_ref, b_ref, g_ref, da_ref, db_ref):
    a = a_ref[0]
    b = b_ref[0]
    g = g_ref[0]
    K = a.shape[0]
    a_max, b_max, ea, eb = _shifts(a, b)
    rows = []
    for i in range(K):
        rows.append(jnp.sum(ea[i][:, None, :] * eb, axis=0))
    c = jnp.stack(rows, axis=0)
    gc = g / (c + _TINY)  # (K_i, K_k, bl)
    # da[i, j, b] = ea[i, j, b] * sum_k gc[i, k, b] * eb[j, k, b]
    da_cols = []
    for j in range(K):
        acc = jnp.sum(gc * eb[j][None, :, :], axis=1)  # (K_i, bl)
        da_cols.append(ea[:, j, :] * acc)
    da_ref[0] = jnp.stack(da_cols, axis=1)
    # db[j, k, b] = eb[j, k, b] * sum_i ea[i, j, b] * gc[i, k, b]
    db_rows = []
    for j in range(K):
        acc = jnp.sum(ea[:, j, :][:, None, :] * gc, axis=0)  # (K_k, bl)
        db_rows.append(eb[j] * acc)
    db_ref[0] = jnp.stack(db_rows, axis=0)


# VMEM footprint model: each kernel holds ~coeff live (K, K, bl) f32 arrays
# (operand/output blocks + ea/eb/c/gc intermediates + stack temps).  The bwd
# coefficient is calibrated against the one hardware measurement we have —
# 19.7 MB at K=30, bl=256 (~22 arrays); the fwd keeps fewer live (~14, and
# K=30 bl=256 compiles and runs on v5e under that estimate: 12.9 MB).
_VMEM_BUDGET = 14e6   # leave headroom under the ~16 MB/core budget
_C_FWD, _C_BWD = 14, 22


def _block_lanes(B, K, cap=256, coeff=_C_FWD):
    """Lane-block size: the largest 128-multiple <= cap whose estimated VMEM
    footprint (coeff * K^2 * bl * 4 bytes, see above) fits the budget, or
    B itself when B < 128.  Returns 0 when no block fits — the caller must
    not route to this kernel (footprint scales with K^2, so large K
    overflows VMEM even at bl=128)."""
    bl = B if B < 128 else cap
    while bl >= 128 and coeff * K * K * bl * 4 > _VMEM_BUDGET:
        bl -= 128
    if B < 128:
        return bl if coeff * K * K * bl * 4 <= _VMEM_BUDGET else 0
    return bl if bl >= 128 else 0


def fits_vmem(K, B) -> bool:
    """True iff both the forward and backward lane kernels have a viable
    block size for this (K, batch) under the VMEM footprint model.  Used by
    the auto-route in ``ops.logmmexp._use_smallk_lanes`` (the bwd binds:
    K above ~35 has no fitting 128-multiple block)."""
    return (_block_lanes(B, K, cap=256, coeff=_C_FWD) > 0
            and _block_lanes(B, K, cap=128, coeff=_C_BWD) > 0)


def _pad_lanes(x, bl):
    B = x.shape[-1]
    pad = (-B) % bl
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


@functools.partial(jax.jit, static_argnames=("interpret",))
def _logmmexp_lanes_fwd(A, B, interpret=False):
    L, K, _, nB = A.shape
    bl = _block_lanes(nB, K)
    if bl <= 0:
        raise ValueError(
            f"smallk lanes fwd kernel: K={K} has no lane block fitting the "
            f"VMEM budget (footprint ~{_C_FWD * K * K * 128 * 4 / 1e6:.1f} MB "
            "at bl=128); use the dense chain_logmmexp path")
    Ap = _pad_lanes(A, bl)
    Bp = _pad_lanes(B, bl)
    nb = Ap.shape[-1] // bl
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(L, nb),
        in_specs=[
            pl.BlockSpec((1, K, K, bl), lambda l, i: (l, 0, 0, i)),
            pl.BlockSpec((1, K, K, bl), lambda l, i: (l, 0, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, K, K, bl), lambda l, i: (l, 0, 0, i)),
        out_shape=jax.ShapeDtypeStruct(Ap.shape, jnp.float32),
        compiler_params=_cparams(("parallel", "parallel")),
        interpret=interpret,
    )(Ap, Bp)
    return out[..., :nB]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _logmmexp_lanes_bwd(A, B, g, interpret=False):
    L, K, _, nB = A.shape
    bl = _block_lanes(nB, K, cap=128, coeff=_C_BWD)
    if bl <= 0:
        raise ValueError(
            f"smallk lanes bwd kernel: K={K} has no lane block fitting the "
            f"VMEM budget (footprint ~{_C_BWD * K * K * 128 * 4 / 1e6:.1f} MB "
            "at bl=128); use the dense chain_logmmexp path")
    Ap = _pad_lanes(A, bl)
    Bp = _pad_lanes(B, bl)
    gp = _pad_lanes(g, bl)
    nb = Ap.shape[-1] // bl
    spec = pl.BlockSpec((1, K, K, bl), lambda l, i: (l, 0, 0, i))
    da, db = pl.pallas_call(
        _bwd_kernel,
        grid=(L, nb),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(Ap.shape, jnp.float32)] * 2,
        compiler_params=_cparams(("parallel", "parallel")),
        interpret=interpret,
    )(Ap, Bp, gp)
    return da[..., :nB], db[..., :nB]


def _count_lanes_flops(A):
    """Model FLOPs of one lanes log-matmul level (hooked for the analytic
    MFU model, ``perf.analytic_flops``): the kernel's j-contraction is
    2*K^3 mul+adds per (level, lane), plus the shift/exp/log elementwise."""
    from ..perf import count_flops
    L, K, _, nB = A.shape
    count_flops(matmul=2.0 * L * K * K * K * nB,
                elementwise=6.0 * L * K * K * nB)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def logmmexp_lanes(A, B, interpret=False):
    """Log-space matmul in lanes layout.

    A: (L, K, K, B) with A[l, i, j, b]; B: (L, K, K, B) with B[l, j, k, b]
    -> (L, K, K, B) out[l, i, k, b] = logsumexp_j(A[l,i,j,b] + B[l,j,k,b]).
    """
    _count_lanes_flops(A)
    return _logmmexp_lanes_fwd(A, B, interpret=interpret)


def _vjp_fwd(A, B, interpret):
    _count_lanes_flops(A)
    return _logmmexp_lanes_fwd(A, B, interpret=interpret), (A, B)


def _vjp_bwd(interpret, res, g):
    A, B = res
    return _logmmexp_lanes_bwd(A, B, g, interpret=interpret)


logmmexp_lanes.defvjp(_vjp_fwd, _vjp_bwd)


def chain_logmmexp_lanes(ms, interpret=False):
    """Balanced-tree chain reduction of ``ms[..., T, K, K]`` over T, run
    entirely in the batch-in-lanes layout (one transpose in, one out).

    Semantically identical to ``ops.logmmexp.chain_logmmexp``: same pairwise
    tree, same shift/tiny numerics; differences are FMA/vectorisation
    noise — measured 7.8e-5 max relative on the full covid shape
    (B=2760, T=137, K=30; one covid QEM step's ELBO matches the dense path
    exactly — ``results/covid_chain_kernel_verify.json``).
    """
    *batch, T, K, K2 = ms.shape
    assert K == K2
    if ms.dtype != jnp.float32:
        # out_shape and _TINY are float32-specific; a forced float64 chain
        # would otherwise be silently downcast (ADVICE r2)
        raise TypeError(
            f"chain_logmmexp_lanes requires float32 input, got {ms.dtype}")
    nB = 1
    for d in batch:
        nB *= d
    x = ms.reshape((nB, T, K, K))
    x = jnp.transpose(x, (1, 2, 3, 0))  # (T, K, K, B)
    while x.shape[0] != 1:
        n = x.shape[0]
        even = jax.lax.slice_in_dim(x, 0, n - (n % 2), stride=2, axis=0)
        odd = jax.lax.slice_in_dim(x, 1, n, stride=2, axis=0)
        prod = logmmexp_lanes(even, odd, interpret)
        if n % 2 == 1:
            prod = jnp.concatenate(
                [prod, jax.lax.slice_in_dim(x, n - 1, n, axis=0)], axis=0)
        x = prod
    out = jnp.transpose(x[0], (2, 0, 1))  # (B, K, K)
    return out.reshape((*batch, K, K))


def have_pallas_tpu() -> bool:
    if not _PALLAS_OK:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
