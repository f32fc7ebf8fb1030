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
# hi/lo bf16 splits — as ONE dot over a 3x-concatenated contraction dim
# ([ah ah al]·[bh bl bh]ᵀ): with F=36 minor, three separate k=36 dots run
# the 128-wide MXU at 28% fill while one k=108 dot runs it at 84%
# ("highsplit" keeps the old 3-dot form).  ALAN_TPU_LOWRANK_PRECISION
# overrides; ALAN_TPU_LOWRANK_GRAD_PRECISION sets the dU/dV gradient dots
# separately (gradient noise tolerates DEFAULT bf16 — see
# results/lowrank_bwd_sweep.json before changing defaults).
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
    # "high": same three products in one MXU call over a concatenated
    # contraction dim
    (ka,), (kb,) = dims
    a3 = jnp.concatenate([ah, ah, al], axis=ka)
    b3 = jnp.concatenate([bh, bl, bh], axis=kb)
    return _dot1(a3, b3, dims, d)


def _gdot(a, b, dims):
    return _dot(a, b, dims, mode=_GRAD_PRECISION_MODE)


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

def _fwd_kernel(u_ref, v_ref, d_ref, o_ref, m_acc, s_acc, *, ni, i_valid):
    i_idx = pl.program_id(3)
    u = u_ref[0]                                       # (bp, bi, F)
    v = v_ref[0]                                       # (bj, F)
    d = d_ref[0]                                       # (bp, bi)
    bp, bi, F = u.shape
    bj = v.shape[0]

    scores = _dot(u.reshape(bp * bi, F), v, ((1,), (1,)))   # (bp*bi, bj)
    scores = scores.reshape(bp, bi, bj) + d[..., None]
    # mask the i-overhang of the last tile (padding is unspecified memory)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, bi, 1), 1) + i_idx * bi
    scores = jnp.where(row < i_valid, scores, -jnp.inf)

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


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_fwd(U, V, D, interpret=False):
    S, P, I, F = U.shape
    J = V.shape[1]
    bp, bi, bj = _tiles(P, I, J, F)
    np_, ni, nj = pl.cdiv(P, bp), pl.cdiv(I, bi), pl.cdiv(J, bj)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, ni=ni, i_valid=I),
        grid=(S, np_, nj, ni),
        in_specs=[
            pl.BlockSpec((1, bp, bi, F), lambda s, p, j, i: (s, p, i, 0)),
            pl.BlockSpec((1, bj, F), lambda s, p, j, i: (s, j, 0)),
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
                *, nj, p_valid, i_valid, j_valid):
    p_idx, i_idx, j_idx = pl.program_id(1), pl.program_id(2), pl.program_id(3)
    u = u_ref[0]                                       # (bp, bi, F)
    v = v_ref[0]                                       # (bj, F)
    d = d_ref[0]                                       # (bp, bi)
    out = o_ref[0]                                     # (bp, bj)
    g = g_ref[0]                                       # (bp, bj)
    bp, bi, F = u.shape
    bj = v.shape[0]

    # overhang tiles read unspecified padding: zero-mask the operands
    # themselves, not just gw — 0·NaN inside the dots would poison real cells
    prow = jax.lax.broadcasted_iota(jnp.int32, (bp, 1, 1), 0) + p_idx * bp
    irow = jax.lax.broadcasted_iota(jnp.int32, (1, bi, 1), 1) + i_idx * bi
    jcol = jax.lax.broadcasted_iota(jnp.int32, (1, 1, bj), 2) + j_idx * bj
    vrow = jax.lax.broadcasted_iota(jnp.int32, (bj, 1), 0) + j_idx * bj
    v = jnp.where(vrow < j_valid, v, 0.0)
    u = jnp.where((prow < p_valid) & (irow < i_valid), u, 0.0)

    scores = _dot(u.reshape(bp * bi, F), v, ((1,), (1,)))
    scores = scores.reshape(bp, bi, bj) + d[..., None]
    # softmax weights from the saved forward output; mask every overhang
    # (p rows feed dV, i rows feed dV/dD, j cols feed dU/dD — all must be 0)
    gw = g[:, None, :] * jnp.exp(scores - out[:, None, :])
    valid = (prow < p_valid) & (irow < i_valid) & (jcol < j_valid)
    gw = jnp.where(valid, gw, 0.0)                     # (bp, bi, bj)

    @pl.when(j_idx == 0)
    def _():
        du_ref[0] = jnp.zeros_like(du_ref[0])
        dd_ref[0] = jnp.zeros_like(dd_ref[0])

    gw2 = gw.reshape(bp * bi, bj)
    du_ref[0] += _gdot(gw2, v, ((1,), (0,))).reshape(bp, bi, F)
    dd_ref[0] += jnp.sum(gw, axis=2)
    dv_ref[0] = _gdot(gw2, u.reshape(bp * bi, F), ((0,), (0,)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_bwd(U, V, D, out, g, interpret=False):
    S, P, I, F = U.shape
    J = V.shape[1]
    bp, bi, bj = _tiles(P, I, J, F, bwd=True)
    np_, ni, nj = pl.cdiv(P, bp), pl.cdiv(I, bi), pl.cdiv(J, bj)
    dU, dD, dVx = pl.pallas_call(
        functools.partial(_bwd_kernel, nj=nj, p_valid=P, i_valid=I, j_valid=J),
        grid=(S, np_, ni, nj),
        in_specs=[
            pl.BlockSpec((1, bp, bi, F), lambda s, p, i, j: (s, p, i, 0)),
            pl.BlockSpec((1, bj, F), lambda s, p, i, j: (s, j, 0)),
            pl.BlockSpec((1, bp, bi), lambda s, p, i, j: (s, p, i)),
            pl.BlockSpec((1, bp, bj), lambda s, p, i, j: (s, p, j)),
            pl.BlockSpec((1, bp, bj), lambda s, p, i, j: (s, p, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, bp, bi, F), lambda s, p, i, j: (s, p, i, 0)),
            pl.BlockSpec((1, bp, bi), lambda s, p, i, j: (s, p, i)),
            # dV contributions expanded over (p, i) tiles — each block is
            # written exactly once; XLA sums the (small) leading axis after.
            pl.BlockSpec((1, bj, F),
                         lambda s, p, i, j: ((p * ni + i) * S + s, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, np_ * bp, ni * bi, F), jnp.float32),
            jax.ShapeDtypeStruct((S, np_ * bp, ni * bi), jnp.float32),
            jax.ShapeDtypeStruct((np_ * ni * S, nj * bj, F), jnp.float32),
        ],
        compiler_params=_cparams(("parallel", "parallel", "parallel",
                                  "arbitrary")),
        interpret=interpret,
    )(U, V, D, out, g)
    dV = jnp.sum(dVx.reshape(np_ * ni, S, nj * bj, F), axis=0)[:, :J]
    return dU[:, :P, :I], dD[:, :P, :I], dV


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
    # dV expansion in the backward must stay small
    bp, bi, bj = _tiles(P, I, J, F, bwd=True)
    n_exp = pl.cdiv(P, bp) * pl.cdiv(I, bi) * S
    if n_exp * pl.cdiv(J, bj) * bj * F * 4 > 256 * 1024 * 1024:
        return False
    return True


def run_interpret() -> bool:
    return os.environ.get("ALAN_TPU_LAZY_LOWRANK_INTERPRET") == "1"
