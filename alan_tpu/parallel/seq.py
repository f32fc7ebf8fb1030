"""Sequence (timeseries) parallelism: shard the T dimension of the
[T, K, K] log-transition chain across chips.

The contraction over T is a product of K×K log-space operators — an
associative reduce.  Sharded over a mesh axis it becomes: local balanced
tree per shard, ``all_gather`` of the per-shard boundary operators (tiny,
K×K), and a final small tree — the ring/CP analog for state-space
contraction (SURVEY §5.7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.logmmexp import chain_logmmexp


def chain_logmmexp_sharded(ms, mesh: Mesh, axis: str, method: str = "auto"):
    """``ms[..., T, K, K] -> [..., K, K]`` with T sharded over mesh axis
    ``axis``.  T must divide the axis size.

    ``method``:
      * ``"butterfly"`` — recursive-doubling compose: log2(n) ``ppermute``
        stages, each exchanging one boundary operator per chip and composing
        adjacent blocks in T order.  Per-chip wire bytes log2(n)·B·K² vs the
        all_gather's (n−1)·B·K² (covid-scale boundary operators carry a big
        batch B, so this is the difference between 168 MB and ~72 MB per
        step at n=8).  The stage-s compose pairs blocks of size 2^s exactly
        like the balanced pairwise tree, so the bracketing — and hence the
        floats — match the single-chip ``chain_logmmexp`` bit-for-bit.
        Needs n a power of two.
      * ``"all_gather"`` — local balanced tree per shard, one all_gather of
        the n boundary K×K operators, small final tree (one collective,
        n·K² payload).
      * ``"ring"`` — n−1 ``ppermute`` steps rotating each shard's boundary
        operator around the ring, composing in T order as pieces arrive
        (the ring-attention analog for state-space contraction; payload per
        step is one K×K operator, overlappable with the compose matmul).
      * ``"auto"`` (default) — butterfly when n is a power of two, else
        all_gather.
    """
    nd = ms.ndim
    spec_in = P(*([None] * (nd - 3) + [axis, None, None]))
    spec_out = P(*([None] * (nd - 3) + [None, None]))

    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]
    if method == "auto":
        method = "butterfly" if (n & (n - 1)) == 0 else "all_gather"

    def local_gather(ms_local):
        prod = chain_logmmexp(ms_local)                 # (..., K, K)
        gathered = jax.lax.all_gather(prod, axis)       # (n, ..., K, K)
        gathered = jnp.moveaxis(gathered, 0, -3)        # (..., n, K, K)
        return chain_logmmexp(gathered)

    def local_ring(ms_local):
        from ..ops.logmmexp import logmmexp
        own = chain_logmmexp(ms_local)                  # (..., K, K)
        i = jax.lax.axis_index(axis)
        neutral = jnp.broadcast_to(
            jnp.where(jnp.eye(own.shape[-1], dtype=own.dtype) > 0, 0.0,
                      -jnp.inf), own.shape)             # log-space identity
        # rotate each shard's ORIGINAL operator leftward around the ring;
        # at step s shard i receives shard (i-s) mod n's operator.  Pieces
        # with source index j < i extend the left block (prepend: arriving
        # in decreasing j), pieces with j > i the right block; the true
        # T-ordered product is left ∘ own ∘ right.
        perm = [(k, (k + 1) % n) for k in range(n)]

        def step(s, carry):
            rot, left, right = carry
            rot = jax.lax.ppermute(rot, axis, perm)
            j = (i - s) % n
            new_left = logmmexp(rot, left)
            new_right = logmmexp(rot, right)
            is_left = j < i
            left = jnp.where(is_left, new_left, left)
            right = jnp.where(is_left, right, new_right)
            return rot, left, right

        _, left, right = jax.lax.fori_loop(
            1, n, step, (own, neutral, neutral))
        return logmmexp(logmmexp(left, own), right)

    def local_butterfly(ms_local):
        from ..ops.logmmexp import logmmexp
        own = chain_logmmexp(ms_local)                  # (..., K, K)
        i = jax.lax.axis_index(axis)
        s = 1
        while s < n:
            perm = [(k, k ^ s) for k in range(n)]
            other = jax.lax.ppermute(own, axis, perm)
            right_block = (i & s) > 0    # bit set -> own is the right block
            left = jnp.where(right_block, other, own)
            right = jnp.where(right_block, own, other)
            own = logmmexp(left, right)
            s *= 2
        return own

    local = {"all_gather": local_gather, "ring": local_ring,
             "butterfly": local_butterfly}[method]

    # jax>=0.8 renamed check_rep -> check_vma (both disable the replication
    # checker, which rejects the psum-of-gathered-operators pattern here)
    try:
        f = shard_map(local, mesh=mesh, in_specs=(spec_in,),
                      out_specs=spec_out, check_vma=False)
    except TypeError:  # pragma: no cover
        f = shard_map(local, mesh=mesh, in_specs=(spec_in,),
                      out_specs=spec_out, check_rep=False)
    return f(ms)
