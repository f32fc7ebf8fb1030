"""Multi-chip sharding of the massively-parallel inference computation.

The reference is single-device (SURVEY.md §2.4: no distributed backend at
all).  Here the named-dim substrate makes sharding natural: a ``MeshPlan``
maps *dim names* (K-dims, plate dims) onto mesh axes, and
``with_sharding_constraint`` pins each dimmed tensor's layout.  XLA GSPMD
then inserts the collectives (log-space ``psum`` for the contractions riding
the ICI) — the scaling-book recipe: pick a mesh, annotate shardings, let XLA
place the collectives.

Typical plans:
  * data-parallel over a large plate:    ``{"plate_1": "p"}``
  * particle-parallel over the K dims:   ``{"K_z": "k", ...}`` or
    ``plan.shard_all_K("k")``
"""
from __future__ import annotations

import contextlib

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..dims import DT, dims_of

# The plan currently in force during an elbo/step trace (set by
# ``MeshPlan.active()``; consulted by ``logpq`` to route e.g. the timeseries
# chain contraction to its T-sharded implementation).  Trace-time only.
_active_plan: "MeshPlan | None" = None


def active_plan() -> "MeshPlan | None":
    return _active_plan


def make_mesh(axis_sizes: dict[str, int], devices=None) -> Mesh:
    """Build a mesh with the given axis names/sizes from available devices."""
    import numpy as np
    devices = devices if devices is not None else jax.devices()
    n = 1
    for s in axis_sizes.values():
        n *= s
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(tuple(axis_sizes.values()))
    return Mesh(arr, tuple(axis_sizes.keys()))


class MeshPlan:
    """Maps dim names to mesh axes; constrains dimmed tensors accordingly.

    ``strict=True`` raises when a planned dim can't actually be sharded
    (size doesn't divide the mesh axis); the default warns once per
    (dim, size, axis) so a scaling run can't silently execute unsharded.
    """

    def __init__(self, mesh: Mesh, dim2axis: dict[str, str],
                 strict: bool = False):
        self.mesh = mesh
        self.dim2axis = dict(dim2axis)
        self.strict = strict
        self._warned: set = set()

    def with_all_K(self, axis: str) -> "MeshPlan":
        """Return a plan that additionally shards every K-dim (any dim with
        the reserved ``K_`` prefix) over ``axis``."""
        plan = MeshPlan(self.mesh, self.dim2axis, strict=self.strict)
        plan._k_axis = axis
        return plan

    _k_axis: str | None = None

    @contextlib.contextmanager
    def active(self):
        """Make this plan visible to the evaluation engine for the duration
        of a trace (``logpq`` consults it to shard the timeseries chain)."""
        global _active_plan
        prev = _active_plan
        _active_plan = self
        try:
            yield self
        finally:
            _active_plan = prev

    def axis_size(self, axis: str) -> int:
        return dict(zip(self.mesh.axis_names, self.mesh.devices.shape))[axis]

    def _undividable(self, dim: str, size: int, axis: str, axis_size: int):
        msg = (f"MeshPlan: dim '{dim}' (size {size}) does not divide mesh "
               f"axis '{axis}' (size {axis_size}); the tensor stays "
               f"UNSHARDED along '{dim}'. Pad the dim or resize the mesh.")
        if self.strict:
            raise ValueError(msg)
        key = (dim, size, axis)
        if key not in self._warned:
            self._warned.add(key)
            import warnings
            warnings.warn(msg, stacklevel=3)

    def _axis_for(self, dim: str):
        if dim in self.dim2axis:
            return self.dim2axis[dim]
        if self._k_axis is not None and dim.startswith("K_"):
            return self._k_axis
        return None

    def spec_for(self, x: DT) -> PartitionSpec:
        parts = [self._axis_for(d) for d in dims_of(x)]
        # positional axes stay unsharded
        return PartitionSpec(*parts)

    def constrain(self, x):
        if not isinstance(x, DT):
            return x
        axes = [self._axis_for(d) for d in dims_of(x)]
        if not any(a is not None for a in axes):
            return x
        sizes = dict(zip(self.mesh.axis_names, self.mesh.devices.shape))
        parts = []
        for d, a in zip(dims_of(x), axes):
            if a is not None and x.dim_size(d) % sizes[a] == 0:
                parts.append(a)
            else:
                if a is not None:
                    # requested but un-shardable: warn (or raise if strict)
                    self._undividable(d, x.dim_size(d), a, sizes[a])
                parts.append(None)
        spec = PartitionSpec(*parts)
        sharding = NamedSharding(self.mesh, spec)
        return DT(jax.lax.with_sharding_constraint(x.data, sharding), x.dims)

    def constrain_tree(self, tree):
        """Apply sharding constraints to every DT leaf of a nested dict."""
        if isinstance(tree, dict):
            return {k: self.constrain_tree(v) for k, v in tree.items()}
        return self.constrain(tree)
