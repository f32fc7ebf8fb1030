"""Fused lazy low-rank K-contraction: the K²·plate tensor never exists.

The hot step of MP inference contracts a cross-K exp-family log-density
against its co-factors (reference ``logpq.py:128`` → ``reduce_Ks.py:249``):

    out[s, p, j] = logsumexp_i( A[s, p, i, j] + D[s, p, i] )
    A[s, p, i, j] = U[s, p, i, :] · V[s, j, :]

where ``i`` is the child latent's K-dim, ``j`` the parent K-dim(s), ``p``
the kept plate dims, ``s`` shared batch dims, and (U, V) the factored
exp-family operands from ``ops/lowrank.py``.  Evaluated dense, ``A`` is the
largest tensor in the program (K²·plate floats: 1.2 GB at K=1000 on grouped
MovieLens) and XLA writes + re-reads it ~4x per training step (forward
matmul write, max pass, exp pass, contraction read — and again, mirrored,
in the backward).  This kernel streams (U, V, D) through VMEM with a
flash-attention-style online logsumexp over ``i`` tiles, so HBM traffic is
O(K·plate·F) instead of O(K²·plate).

Numerics: exact per-(p, j) running max (tighter than the dense path's
rank-1 ``Amax_i + Bmax_j`` shift), ``tiny`` floor on the sum, non-finite
maxes clamped to 0 — the same envelope as ``ops/contraction.py``.

The custom VJP recomputes the softmax weights tile-wise from the saved
forward output (``W = exp(A + D − out)``), so the backward also never
materialises A:  dD = Σ_j GW,  dU = GW @ V,  dV = GWᵀ @ U  with
GW = g·W, accumulated per tile in VMEM.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_HIGHEST = jax.lax.Precision.HIGHEST

# Score-matmul precision. The kernel does ~4x the dense path's matmul work
# (flash-style recompute: fwd scores + bwd scores/dU/dV) in exchange for
# never touching the K^2*plate tensor in HBM, so MXU pass count decides the
# end-to-end outcome.  "high" = bf16x3 split-accumulate (~1e-6 relative
# error on the log-density scores, immaterial against f32 summation noise),
# half the MXU passes of HIGHEST = bf16x6.  Mosaic can't lower
# Precision.HIGH directly, so bf16x3 is spelled as DEFAULT dots over
# hi/lo bf16 splits.  Mode "high" (default) = the PACKED path: operands
# pre-concatenated outside the kernel to k=3F bf16 ([Uh Uh Ul]·[Vh Vl Vh])
# so every dot is one ~84%-fill MXU pass instead of three 28%-fill ones
# (F=36 vs the 128-deep array); "highsplit" = the legacy three-dot form;
# "highcat" = in-kernel concat (measured worse: unaligned lane relayout).
# ALAN_TPU_LOWRANK_PRECISION overrides; ALAN_TPU_LOWRANK_GRAD_PRECISION
# sets the dU/dV gradient dots for the non-packed paths (the packed path
# always computes bf16x3-quality grads via the aligned gw split).
_PRECISION_MODE = os.environ.get("ALAN_TPU_LOWRANK_PRECISION", "high").lower()
_GRAD_PRECISION_MODE = os.environ.get(
    "ALAN_TPU_LOWRANK_GRAD_PRECISION", _PRECISION_MODE).lower()


def _dot1(a, b, dims, precision):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=precision)


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot(a, b, dims, mode=None):
    mode = _PRECISION_MODE if mode is None else mode
    if mode == "highest":
        return _dot1(a, b, dims, jax.lax.Precision.HIGHEST)
    if mode == "default":
        return _dot1(a, b, dims, jax.lax.Precision.DEFAULT)
    # bf16x3: a·b = ah·bh + ah·bl + al·bh  (+ al·bl ~ 2^-16 rel, dropped)
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)
    d = jax.lax.Precision.DEFAULT
    if mode == "highsplit":
        return (_dot1(ah, bh, dims, d) + _dot1(ah, bl, dims, d)
                + _dot1(al, bh, dims, d))
    # "highcat": the three products in one MXU call over a concatenated
    # contraction dim.  NOTE: measured WORSE than highsplit in-kernel —
    # lane-dim concat at offset F=36 is an unaligned relayout in Mosaic;
    # the production packed path ("high") concatenates OUTSIDE the kernel
    # instead (see _pack3).
    (ka,), (kb,) = dims
    a3 = jnp.concatenate([ah, ah, al], axis=ka)
    b3 = jnp.concatenate([bh, bl, bh], axis=kb)
    return _dot1(a3, b3, dims, d)


def _gdot(a, b, dims):
    return _dot(a, b, dims, mode=_GRAD_PRECISION_MODE)


# ---- packed bf16x3 ("high", the default) -----------------------------------
# The kernels' dots have k = F = 36 (scores) or n = F = 36 (dU/dV): against
# the 128-wide MXU that is 28% array fill, and spelling bf16x3 as three
# separate dots triples the passes — the round-5 trace showed the backward
# MXU-bound at exactly 9 x 28%-fill dots/tile.  The packed path builds the
# hi/lo operands ONCE outside the kernel (XLA fuses the casts/concats into
# the producers, and the layout change is free there):
#     U3 = [Uh Uh Ul],  V3 = [Vh Vl Vh]   (bf16, k = 3F = 108)
# so the score dot is a SINGLE DEFAULT MXU pass at 84% fill computing
# exactly ah·bh + ah·bl + al·bh — the identical bf16x3 product set.  The
# backward splits gw at lane-ALIGNED offset 128 in-kernel and contracts
# against duplicated V3/U3, yielding segment gradients that reassemble as
#     dU = dU3[:F] + dU3[F:2F]        (gw·Vh + gw·Vl, both gw-split)
#     dV = dV3[:F] + dV3[2F:]         ((gwh+gwl)ᵀ·(Uh+Ul))
# (segment 2 of dU3 duplicates segment 0's Vh product; segment 1 of dV3
# duplicates segment 0's Uh product — each is summed once.)

def _split_bf16_xla(x):
    """hi/lo split for XLA-side (outside-kernel) use.  MUST go through
    ``lax.reduce_precision``: under ``--xla_allow_excess_precision=true``
    (set by this environment's TPU compile service) XLA folds
    ``convert_f32(convert_bf16(x))`` back to ``x``, which turns the lo
    term into exactly 0 and silently degrades the packed bf16x3 operands
    to plain bf16 (observed: ~1e-3-relative score errors ONLY in fused
    graphs — isolated kernel calls were exact, which is what made this
    hunt long).  ``reduce_precision`` has explicit rounding semantics the
    simplifier must preserve."""
    hi_f32 = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    hi = hi_f32.astype(jnp.bfloat16)
    lo = (x - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def _pack3(U, V):
    Uh, Ul = _split_bf16_xla(U)
    Vh, Vl = _split_bf16_xla(V)
    U3 = jnp.concatenate([Uh, Uh, Ul], axis=-1)
    V3 = jnp.concatenate([Vh, Vl, Vh], axis=-1)
    # pad the packed contraction dim to a lane multiple: zero columns add
    # nothing to the scores and a 128-aligned bf16 minor dim avoids
    # relayout work at the custom-call boundary
    k = U3.shape[-1]
    pad = (-k) % 128
    if pad:
        U3 = jnp.pad(U3, [(0, 0)] * (U3.ndim - 1) + [(0, pad)])
        V3 = jnp.pad(V3, [(0, 0)] * (V3.ndim - 1) + [(0, pad)])
    return U3, V3


# Mosaic scoped-VMEM ceiling for this kernel.  The chip has 128 MB VMEM per
# core but Mosaic's default scoped limit is ~16 MB, which forced the
# backward onto (bp=8, bi=256) tiles — 4x the grid steps of the forward and
# the dominant cost of the grouped-K=1000 step (71% of it sat in the bwd
# kernel, results/grouped_k1000_profile.json).  0 = compiler default.
_VMEM_LIMIT_MB = int(os.environ.get("ALAN_TPU_LOWRANK_VMEM_MB", "0"))


def _cparams(dimension_semantics):
    """Tell Mosaic which grid dims are parallel vs sequential-accumulation:
    without this the whole grid is treated as arbitrary (serialised), which
    costs pipelining across the parallel dims."""
    kw = {"dimension_semantics": dimension_semantics}
    if _VMEM_LIMIT_MB:
        kw["vmem_limit_bytes"] = _VMEM_LIMIT_MB * 1024 * 1024
    try:
        return pltpu.CompilerParams(**kw)
    except Exception:  # pragma: no cover (older pallas naming)
        return pltpu.TPUCompilerParams(**kw)


# ---- tiling ----------------------------------------------------------------

# plate rows / score elements per tile, separately for fwd and bwd: the
# forward holds only scores + two (bp, bj) accumulators, so it can afford
# much larger tiles (fewer grid steps, better DMA pipelining, bigger MXU
# calls); the backward additionally holds gw plus the dU accumulator and dV
# output concurrently — 512k score elements put it 0.5MB over the 16MB
# scoped-vmem limit at (P=300, I=1000, F=36).  Env-tunable for sweeps.
_BP_FWD = int(os.environ.get("ALAN_TPU_LOWRANK_BP_FWD", "16"))
_BP_BWD = int(os.environ.get("ALAN_TPU_LOWRANK_BP_BWD", "8"))
_SCORE_BUDGET_FWD = int(os.environ.get("ALAN_TPU_LOWRANK_SCORE_FWD",
                                       str(1024 * 1024)))
_SCORE_BUDGET_BWD = int(os.environ.get("ALAN_TPU_LOWRANK_SCORE_BWD",
                                       str(256 * 1024)))


def _tiles(P, I, J, F, bwd=False):
    """(bp, bi, bj) or None if no legal tiling fits VMEM."""
    BP = _BP_BWD if bwd else _BP_FWD
    budget = _SCORE_BUDGET_BWD if bwd else _SCORE_BUDGET_FWD
    bp = min(BP, max(1, P)) if P < BP else BP
    bj = J if J <= 128 else 128            # minor dim: full or mult-of-128
    bi_cap = budget // max(1, bp * bj)
    if I <= bi_cap:
        bi = I                             # full i in one tile
    else:
        bi = (bi_cap // 128) * 128         # i-tiling: mult-of-128 blocks
        if bi < 128:
            return None
    # U tile must fit comfortably (double-buffered by the pipeline); the
    # headroom scales with a raised scoped-VMEM ceiling
    u_cap_mb = max(6, _VMEM_LIMIT_MB // 4)
    if bp * bi * F * 4 > u_cap_mb * 1024 * 1024:
        return None
    return bp, bi, bj


# ---- forward ---------------------------------------------------------------

def _fwd_kernel(u_ref, v_ref, d_ref, o_ref, m_acc, s_acc, *, ni,
                score_mode):
    i_idx = pl.program_id(3)
    u = u_ref[0]                                       # (bp, bi, Fk)
    v = v_ref[0]                                       # (bj, Fk)
    d = d_ref[0]                                       # (bp, bi)
    bp, bi, Fk = u.shape
    bj = v.shape[0]

    # overhang handled by explicit operand padding in the wrapper (U=0,
    # D=-inf -> exp underflows to exactly 0): no per-tile mask ops
    scores = _dot(u.reshape(bp * bi, Fk), v, ((1,), (1,)),
                  mode=score_mode)                     # (bp*bi, bj)
    scores = scores.reshape(bp, bi, bj) + d[..., None]

    @pl.when(i_idx == 0)
    def _():
        m_acc[...] = jnp.full_like(m_acc, -jnp.inf)
        s_acc[...] = jnp.zeros_like(s_acc)

    m_old = m_acc[...]                                 # (bp, bj)
    m_new = jnp.maximum(m_old, jnp.max(scores, axis=1))
    # clamp: all--inf rows shift by 0 (same envelope as the dense path)
    m_new = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    s_acc[...] = (s_acc[...] * jnp.exp(m_old - m_new)
                  + jnp.sum(jnp.exp(scores - m_new[:, None, :]), axis=1))
    m_acc[...] = m_new

    @pl.when(i_idx == ni - 1)
    def _():
        tiny = jnp.finfo(jnp.float32).tiny
        o_ref[0] = jnp.log(s_acc[...] + tiny) + m_acc[...]


def _pad(x, tile_sizes, const=0.0):
    """Pad trailing dims of ``x`` up to multiples of ``tile_sizes``."""
    pads = [(0, 0)] * (x.ndim - len(tile_sizes))
    for dim, t in zip(x.shape[x.ndim - len(tile_sizes):], tile_sizes):
        pads.append((0, (-dim) % t if t else 0))
    if not any(p for _, p in pads):
        return x
    return jnp.pad(x, pads, constant_values=const)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_fwd(U, V, D, interpret=False):
    S, P, I, F = U.shape
    J = V.shape[1]
    bp, bi, bj = _tiles(P, I, J, F)
    np_, ni, nj = pl.cdiv(P, bp), pl.cdiv(I, bi), pl.cdiv(J, bj)
    if _PRECISION_MODE == "high":
        U, V = _pack3(U, V)                 # bf16, k = 3F, one MXU pass
        score_mode = "default"
    else:
        score_mode = _PRECISION_MODE
    # explicit overhang padding (replaces in-kernel masking): U rows of 0
    # with D=-inf produce exactly-0 weights; padded out rows/cols are
    # sliced off below
    U = _pad(U, (bp, bi, 0))
    V = _pad(V, (bj, 0))
    D = _pad(D, (bp, bi), const=-jnp.inf)
    Fk = U.shape[-1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, ni=ni, score_mode=score_mode),
        grid=(S, np_, nj, ni),
        in_specs=[
            pl.BlockSpec((1, bp, bi, Fk), lambda s, p, j, i: (s, p, i, 0)),
            pl.BlockSpec((1, bj, Fk), lambda s, p, j, i: (s, j, 0)),
            pl.BlockSpec((1, bp, bi), lambda s, p, j, i: (s, p, i)),
        ],
        out_specs=pl.BlockSpec((1, bp, bj), lambda s, p, j, i: (s, p, j)),
        out_shape=jax.ShapeDtypeStruct((S, np_ * bp, nj * bj), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bp, bj), jnp.float32),
                        pltpu.VMEM((bp, bj), jnp.float32)],
        compiler_params=_cparams(("parallel", "parallel", "parallel",
                                  "arbitrary")),
        interpret=interpret,
    )(U, V, D)
    return out[:, :P, :J]


# ---- backward --------------------------------------------------------------

def _bwd_kernel(u_ref, v_ref, d_ref, o_ref, g_ref, du_ref, dd_ref, dv_ref,
                *, nj, score_mode, packed):
    j_idx = pl.program_id(3)
    u = u_ref[0]                                       # (bp, bi, Fk)
    v = v_ref[0]                                       # (bj, Fk)
    d = d_ref[0]                                       # (bp, bi)
    out = o_ref[0]                                     # (bp, bj)
    g = g_ref[0]                                       # (bp, bj)
    bp, bi, Fk = u.shape
    bj = v.shape[0]

    # Overhang is handled by explicit operand padding in the wrapper
    # (U=V=0, D=-inf, out=+inf, g=0), chosen so every padded gw cell is
    # EXACTLY 0 with no inf-inf/0*inf hazards: padded i/p give
    # exp(-inf - finite) = 0; padded j give g=0 times exp(scores - inf)=0.
    # This removes 4 iota builds + 3 wheres per tile — elementwise VPU work
    # over the score space was a comparable cost to the exp itself.
    scores = _dot(u.reshape(bp * bi, Fk), v, ((1,), (1,)), mode=score_mode)
    scores = scores.reshape(bp, bi, bj) + d[..., None]
    gw = g[:, None, :] * jnp.exp(scores - out[:, None, :])  # (bp, bi, bj)

    @pl.when(j_idx == 0)
    def _():
        du_ref[0] = jnp.zeros_like(du_ref[0])
        dd_ref[0] = jnp.zeros_like(dd_ref[0])

    gw2 = gw.reshape(bp * bi, bj)
    if packed:
        # gw split at lane-ALIGNED offset bj (free concat), contracted
        # against duplicated packed operands: one MXU pass each for the
        # segment grads (wrapper reassembles dU/dV; see _pack3 notes)
        gwh, gwl = _split_bf16(gw2)
        gw_k = jnp.concatenate([gwh, gwl], axis=1)      # (bp*bi, 2*bj)
        v2 = jnp.concatenate([v, v], axis=0)            # (2*bj, Fk)
        du_ref[0] += _dot1(gw_k, v2, ((1,), (0,)),
                           jax.lax.Precision.DEFAULT).reshape(bp, bi, Fk)
        gw_r = jnp.concatenate([gwh, gwl], axis=0)      # (2*bp*bi, bj)
        u2 = jnp.concatenate([u.reshape(bp * bi, Fk)] * 2, axis=0)
        dv_ref[0] = _dot1(gw_r, u2, ((0,), (0,)),
                          jax.lax.Precision.DEFAULT)
        # (routing dD through an MXU matvec on gw_k was tried and measured
        # SLOWER end-to-end, 7.30 -> 8.12 ms: the VPU lane reduction is
        # cheaper than the extra MXU pass here)
    else:
        du_ref[0] += _gdot(gw2, v, ((1,), (0,))).reshape(bp, bi, Fk)
        dv_ref[0] = _gdot(gw2, u.reshape(bp * bi, Fk), ((0,), (0,)))
    dd_ref[0] += jnp.sum(gw, axis=2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_bwd(U, V, D, out, g, interpret=False):
    S, P, I, F = U.shape
    J = V.shape[1]
    bp, bi, bj = _tiles(P, I, J, F, bwd=True)
    np_, ni, nj = pl.cdiv(P, bp), pl.cdiv(I, bi), pl.cdiv(J, bj)
    packed = _PRECISION_MODE == "high"
    if packed:
        U, V = _pack3(U, V)
        score_mode = "default"
    else:
        score_mode = _PRECISION_MODE
    # explicit overhang padding; see _bwd_kernel for the exact-zero
    # construction
    U = _pad(U, (bp, bi, 0))
    V = _pad(V, (bj, 0))
    D = _pad(D, (bp, bi), const=-jnp.inf)
    out = _pad(out, (bp, bj), const=jnp.inf)
    g = _pad(g, (bp, bj))
    Fk = U.shape[-1]
    dU, dD, dVx = pl.pallas_call(
        functools.partial(_bwd_kernel, nj=nj, score_mode=score_mode,
                          packed=packed),
        grid=(S, np_, ni, nj),
        in_specs=[
            pl.BlockSpec((1, bp, bi, Fk), lambda s, p, i, j: (s, p, i, 0)),
            pl.BlockSpec((1, bj, Fk), lambda s, p, i, j: (s, j, 0)),
            pl.BlockSpec((1, bp, bi), lambda s, p, i, j: (s, p, i)),
            pl.BlockSpec((1, bp, bj), lambda s, p, i, j: (s, p, j)),
            pl.BlockSpec((1, bp, bj), lambda s, p, i, j: (s, p, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, bp, bi, Fk), lambda s, p, i, j: (s, p, i, 0)),
            pl.BlockSpec((1, bp, bi), lambda s, p, i, j: (s, p, i)),
            # dV contributions expanded over (p, i) tiles — each block is
            # written exactly once; XLA sums the (small) leading axis after.
            pl.BlockSpec((1, bj, Fk),
                         lambda s, p, i, j: ((p * ni + i) * S + s, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, np_ * bp, ni * bi, Fk), jnp.float32),
            jax.ShapeDtypeStruct((S, np_ * bp, ni * bi), jnp.float32),
            jax.ShapeDtypeStruct((np_ * ni * S, nj * bj, Fk), jnp.float32),
        ],
        compiler_params=_cparams(("parallel", "parallel", "parallel",
                                  "arbitrary")),
        interpret=interpret,
    )(U, V, D, out, g)
    dV3 = jnp.sum(dVx.reshape(np_ * ni, S, nj * bj, Fk), axis=0)[:, :J]
    dU = dU[:, :P, :I]
    dD = dD[:, :P, :I]
    if packed:
        # reassemble the true-operand grads from the segment grads
        # (dU: gw·Vh + gw·Vl; dV: (gwh+gwl)ᵀ·(Uh+Ul) — see _pack3 notes)
        dU = dU[..., :F] + dU[..., F:2 * F]
        dV = dV3[..., :F] + dV3[..., 2 * F:3 * F]
        return dU, dD, dV
    return dU, dD, dV3


# ---- reference (XLA dense; CPU fallback + test oracle) ---------------------

def reference_lowrank_logsumexp(U, V, D):
    """Dense XLA evaluation of the same contraction (materialises A)."""
    A = jnp.einsum("spif,sjf->spij", U, V, precision=_HIGHEST,
                   preferred_element_type=jnp.float32) + D[..., None]
    m = jax.lax.stop_gradient(jnp.max(A, axis=2))
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    tiny = jnp.finfo(jnp.float32).tiny
    return jnp.log(jnp.sum(jnp.exp(A - m[:, :, None, :]), axis=2) + tiny) + m


# ---- public op -------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lowrank_logsumexp(U, V, D, interpret=False):
    """``out[s,p,j] = logsumexp_i(U[s,p,i,:]·V[s,j,:] + D[s,p,i])`` fused on
    TPU (flash-style online logsumexp; A is never materialised).

    U: (S, P, I, F), V: (S, J, F), D: (S, P, I), float32.
    """
    return _pallas_fwd(U, V, D, interpret=interpret)


def _vjp_fwd(U, V, D, interpret):
    out = _pallas_fwd(U, V, D, interpret=interpret)
    return out, (U, V, D, out)


def _vjp_bwd(interpret, res, g):
    U, V, D, out = res
    dU, dD, dV = _pallas_bwd(U, V, D, out, g, interpret=interpret)
    return dU, dV, dD


lowrank_logsumexp.defvjp(_vjp_fwd, _vjp_bwd)


# ---- routing ---------------------------------------------------------------

def fused_available(S, P, I, J, F) -> bool:
    """True when the fused kernel can and should run for these sizes."""
    if not _PALLAS_OK or os.environ.get("ALAN_TPU_NO_LAZY_LOWRANK") == "1":
        return False
    if os.environ.get("ALAN_TPU_LAZY_LOWRANK_INTERPRET") == "1":
        return (_tiles(P, I, J, F) is not None
                and _tiles(P, I, J, F, bwd=True) is not None)
    try:
        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    if _tiles(P, I, J, F) is None or _tiles(P, I, J, F, bwd=True) is None:
        return False
    # dV expansion in the backward must stay small (packed mode carries
    # 3F-wide segment grads)
    bp, bi, bj = _tiles(P, I, J, F, bwd=True)
    n_exp = pl.cdiv(P, bp) * pl.cdiv(I, bi) * S
    f_eff = (-(-3 * F // 128) * 128) if _PRECISION_MODE == "high" else F
    if n_exp * pl.cdiv(J, bj) * bj * f_eff * 4 > 256 * 1024 * 1024:
        return False
    return True


def run_interpret() -> bool:
    return os.environ.get("ALAN_TPU_LAZY_LOWRANK_INTERPRET") == "1"
