"""Fused Pallas TPU kernel for the batched pairwise K-contraction step.

The contraction step ``out[b,i,j] = logsumexp_k(A[b,i,k] + B[b,j,k])``
(reference ``reduce_Ks.py:249-251``, matmul-formulated in
``ops/contraction.py``) is bandwidth-bound: the K-dimmed factors are the
largest tensors in the program (K^2·plate floats).  XLA evaluates the
matmul formulation as  max-pass -> exp (materialised in HBM) -> dot ->
log-epilogue,  i.e. ~3 reads + 1 write of each factor.  This kernel fuses
the whole pipeline per (batch, i-tile, j-tile) grid step in VMEM: one HBM
read of A, ``n_i_tiles`` reads of B (B is placed as the smaller factor by
the wrapper), one write of the output.

Numerics match ``pairwise_logsumexp_contract`` exactly when K fits one
block (the only regime the wrapper routes here): per-row/col max shift,
``tiny`` floor, non-finite maxes clamped to 0.

The custom VJP reconstructs ``1/(C+tiny) = exp(amax + bmax - out)`` from
the forward output, so the backward needs no extra forward matmul:
``dA = expA * (G' @ expB)``, ``dB = expB * (G'^T @ expA)`` — two batched
matmuls evaluated by XLA (saved residuals: A, B, out).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False


def _kernel(a_ref, b_ref, o_ref, *, j_valid):
    a = a_ref[0]                                    # (bi, K)
    b = b_ref[0]                                    # (bj, K)
    a_max = jnp.max(a, axis=-1, keepdims=True)      # (bi, 1)
    b_max = jnp.max(b, axis=-1, keepdims=True)      # (bj, 1)
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    b_max = jnp.where(jnp.isfinite(b_max), b_max, 0.0)
    ea = jnp.exp(a - a_max)
    eb = jnp.exp(b - b_max)
    bj = b.shape[0]
    # grid-overhang masking: the last j-tile may read unspecified padding;
    # zero those rows of exp(B) so they contribute nothing to the dot.
    j0 = pl.program_id(2) * bj
    row = jax.lax.broadcasted_iota(jnp.int32, (bj, 1), 0) + j0
    eb = jnp.where(row < j_valid, eb, 0.0)
    # HIGHEST: f32-accurate multiplies — the step is bandwidth-bound, so
    # the extra MXU passes are free, and bf16 products cost ~4e-3 nats.
    c = jax.lax.dot_general(ea, eb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST)  # (bi, bj)
    tiny = jnp.finfo(jnp.float32).tiny
    o_ref[0] = jnp.log(c + tiny) + a_max + b_max.T


def _block(n, budget_rows):
    """Largest multiple-of-8 tile <= budget_rows covering n (min 8)."""
    if n <= budget_rows:
        return max(8, -(-n // 8) * 8)
    return max(8, (budget_rows // 8) * 8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_fwd(A, B, interpret=False):
    nb, I, K = A.shape
    J = B.shape[1]
    # VMEM budgets (double-buffered by the pipeline): ~4MB for the A block
    # (fewer grid steps on the read-once factor measured faster), ~2MB for B.
    bi = _block(I, max(8, (4 * 1024 * 1024) // (K * 4)))
    bj = _block(J, max(8, (2 * 1024 * 1024) // (K * 4)))
    grid = (nb, pl.cdiv(I, bi), pl.cdiv(J, bj))
    out = pl.pallas_call(
        functools.partial(_kernel, j_valid=J),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bi, K), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bj, K), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bi, bj), lambda b, i, j: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((nb, pl.cdiv(I, bi) * bi,
                                        pl.cdiv(J, bj) * bj), jnp.float32),
        interpret=interpret,
    )(A, B)
    return out[:, :I, :J]


def _shifts(X):
    m = jax.lax.stop_gradient(jnp.max(X, axis=-1, keepdims=True))
    return jnp.where(jnp.isfinite(m), m, 0.0)


def _bwd_kernel(a_ref, b_ref, g_ref, o_ref, da_ref, db_ref, *, i_valid):
    """Per (batch, i-tile): dA tile + dB accumulation (see _pallas_bwd)."""
    a = a_ref[0]                                    # (bi, K)
    b = b_ref[0]                                    # (J,  K)
    g = g_ref[0]                                    # (bi, J)
    out = o_ref[0]                                  # (bi, J)
    a_max = jnp.max(a, axis=-1, keepdims=True)
    b_max = jnp.max(b, axis=-1, keepdims=True)
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    b_max = jnp.where(jnp.isfinite(b_max), b_max, 0.0)
    # grid-overhang masking along i: the last i-tile reads unspecified
    # padding; zero BOTH ea and gp there so neither dot sees 0*NaN.
    bi = a.shape[0]
    i0 = pl.program_id(1) * bi
    row = jax.lax.broadcasted_iota(jnp.int32, (bi, 1), 0) + i0
    valid = row < i_valid
    ea = jnp.where(valid, jnp.exp(a - a_max), 0.0)
    eb = jnp.exp(b - b_max)
    # Gp = g / (C + tiny), reconstructed from the forward output.
    gp = jnp.where(valid, g * jnp.exp(a_max + b_max.T - out), 0.0)
    da = ea * jax.lax.dot_general(gp, eb, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.HIGHEST)
    da_ref[0] = jnp.where(valid, da, 0.0)
    db_inc = eb * jax.lax.dot_general(gp, ea, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32,
                                      precision=jax.lax.Precision.HIGHEST)

    @pl.when(pl.program_id(1) == 0)
    def _():
        db_ref[0] = jnp.zeros_like(db_ref[0])

    db_ref[0] += db_inc


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_bwd(A, B, out, g, interpret=False):
    """Fused cotangents: dA = Ea*(Gp@Eb), dB = Eb*(Gp^T@Ea), with Gp, Ea,
    Eb computed in VMEM.  One HBM pass over A/dA, one over B/dB/g/out —
    the XLA formulation takes ~6 passes of the A-scale tensors.  Requires
    the whole (J, K) face in VMEM (the wrapper gates on that)."""
    nb, I, K = A.shape
    J = B.shape[1]
    rows = max(8, (2 * 1024 * 1024) // (K * 4))
    bi = _block(I, rows)
    ni = pl.cdiv(I, bi)
    grid = (nb, ni)
    Ipad = ni * bi
    dA, dB = pl.pallas_call(
        functools.partial(_bwd_kernel, i_valid=I),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bi, K), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, J, K), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, bi, J), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, bi, J), lambda b, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bi, K), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, J, K), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, Ipad, K), jnp.float32),
            jax.ShapeDtypeStruct((nb, J, K), jnp.float32),
        ],
        interpret=interpret,
    )(A, B, g, out)
    return dA[:, :I], dB


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def pairwise_logmmexp_fused(A, B, interpret=False):
    """``out[b,i,j] = logsumexp_k(A[b,i,k] + B[b,j,k])``, fused on TPU.

    A: (nb, I, K), B: (nb, J, K), all float32.  Differentiable (exact
    softmax-weighted cotangents, matching the jnp formulation with
    stop-gradient maxes and the ``tiny`` floor).
    """
    return _pallas_fwd(A, B, interpret=interpret)


def _fused_fwd(A, B, interpret):
    out = _pallas_fwd(A, B, interpret=interpret)
    return out, (A, B, out)


def _fused_bwd(interpret, res, g):
    A, B, out = res
    J, K = B.shape[1], B.shape[2]
    # fused path needs the whole (J, K) face of B/dB in VMEM
    if interpret or (J * K * 4 <= 2 * 1024 * 1024 and
                     os.environ.get("ALAN_TPU_NO_PALLAS_BWD") != "1"):
        return _pallas_bwd(A, B, out, g, interpret=interpret)
    a_max = _shifts(A)                              # (nb, I, 1)
    b_max = _shifts(B)                              # (nb, J, 1)
    # 1/(C+tiny) reconstructed from the forward output — exact.
    Gp = g * jnp.exp(a_max + jnp.swapaxes(b_max, -1, -2) - out)  # (nb,I,J)
    Ea = jnp.exp(A - a_max)
    Eb = jnp.exp(B - b_max)
    dA = Ea * jnp.einsum("bij,bjk->bik", Gp, Eb)
    dB = Eb * jnp.einsum("bij,bik->bjk", Gp, Ea)
    return dA, dB


pairwise_logmmexp_fused.defvjp(_fused_fwd, _fused_bwd)


# ---- routing gate ----------------------------------------------------------

# Keep each input block around 2MB => K*4*rows <= 2MB with rows >= 8.
_MAX_K_LANES = (2 * 1024 * 1024) // (4 * 8)       # K <= 65536
_MIN_WORK = 1 << 20                               # don't dispatch tiny steps


def fusable(nb, I, J, K) -> bool:
    """Worth routing to the fused kernel?  Requires TPU, a K block that
    fits VMEM, and enough work that kernel dispatch is amortised.

    OFF by default (``ALAN_TPU_PALLAS_CONTRACT=1`` opts in): measured on a
    v5e at the K=1000 grouped-movielens shapes, XLA's producer fusion makes
    the plain einsum formulation faster end-to-end — the log-prob producer
    fuses into the max/exp passes, so forcing the factor through a kernel
    boundary materialises ~1.2GB that XLA never writes (20.1ms -> 29.4ms
    step); even on matmul-produced factors (ops/lowrank.py) the kernel lost
    13.3ms -> 15.0ms.  The kernel remains for shapes where a measured win
    exists (isolated contractions: 3.3ms vs 4.0ms, and ~70x better f32
    accuracy than XLA's bf16 MXU einsum at J>=8)."""
    if not _PALLAS_OK or os.environ.get("ALAN_TPU_PALLAS_CONTRACT") != "1":
        return False
    try:
        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    if K > _MAX_K_LANES:
        return False
    return nb * max(I, J) * K >= _MIN_WORK
