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


def chain_logmmexp_sharded(ms, mesh: Mesh, axis: str, method: str = "all_gather"):
    """``ms[..., T, K, K] -> [..., K, K]`` with T sharded over mesh axis
    ``axis``.  T must divide the axis size.

    ``method``:
      * ``"all_gather"`` — local balanced tree per shard, one all_gather of
        the n boundary K×K operators, small final tree (default; one
        collective, n·K² payload).
      * ``"ring"`` — n−1 ``ppermute`` steps rotating each shard's boundary
        operator around the ring, composing in T order as pieces arrive
        (the ring-attention analog for state-space contraction; payload per
        step is one K×K operator, overlappable with the compose matmul).
    """
    nd = ms.ndim
    spec_in = P(*([None] * (nd - 3) + [axis, None, None]))
    spec_out = P(*([None] * (nd - 3) + [None, None]))

    n = dict(zip(mesh.axis_names, mesh.devices.shape))[axis]

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

    local = {"all_gather": local_gather, "ring": local_ring}[method]

    # jax>=0.8 renamed check_rep -> check_vma (both disable the replication
    # checker, which rejects the psum-of-gathered-operators pattern here)
    try:
        f = shard_map(local, mesh=mesh, in_specs=(spec_in,),
                      out_specs=spec_out, check_vma=False)
    except TypeError:  # pragma: no cover
        f = shard_map(local, mesh=mesh, in_specs=(spec_in,),
                      out_specs=spec_out, check_rep=False)
    return f(ms)
