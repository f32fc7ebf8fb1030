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


def chain_logmmexp_sharded(ms, mesh: Mesh, axis: str):
    """``ms[..., T, K, K] -> [..., K, K]`` with T sharded over mesh axis
    ``axis``.  T must divide the axis size."""
    nd = ms.ndim
    spec_in = P(*([None] * (nd - 3) + [axis, None, None]))
    spec_out = P(*([None] * (nd - 3) + [None, None]))

    def local(ms_local):
        prod = chain_logmmexp(ms_local)                 # (..., K, K)
        gathered = jax.lax.all_gather(prod, axis)       # (n, ..., K, K)
        gathered = jnp.moveaxis(gathered, 0, -3)        # (..., n, K, K)
        return chain_logmmexp(gathered)

    # jax>=0.8 renamed check_rep -> check_vma (both disable the replication
    # checker, which rejects the psum-of-gathered-operators pattern here)
    try:
        f = shard_map(local, mesh=mesh, in_specs=(spec_in,),
                      out_specs=spec_out, check_vma=False)
    except TypeError:  # pragma: no cover
        f = shard_map(local, mesh=mesh, in_specs=(spec_in,),
                      out_specs=spec_out, check_rep=False)
    return f(ms)
