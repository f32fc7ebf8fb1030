"""Dim-aware distribution wrapper (behavioral spec: reference
``src/alan/TorchDimDist.py``).

``DimDist`` lets distribution parameters carry named dims (K-dims and plate
dims).  Sampling broadcasts new named dims onto the draw; ``log_prob`` aligns
the sample against parameter dims, inserting singleton axes for parameter
dims absent from the sample (the reference's ``ultimate_order`` dance,
``TorchDimDist.py:127-162`` / ``utils.py:308-368``) — here this is a couple of
trace-time reshapes that XLA folds away.

Layout convention: a parameter prepared for its family is shaped
``(*arg_dim_sizes_or_1, *pad_1s, *own_batch, *own_event)`` so that all
parameters right-align on the broadcast batch block.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dims import DT, as_dt, dims_of, unify_dims, expand_to, sum_pos
from .families import Family


class DimDist:
    def __init__(self, family: type[Family], **params):
        self.family = family
        params = {k: v for k, v in params.items() if v is not None}
        params = family.canonicalize(params)
        # keep pre-conversion values: shape-determining params (e.g. LKJ's
        # ``dim``) must stay static python numbers (inside lax.scan traces,
        # even jnp constants become tracers)
        self._raw_params = params
        self.params = {k: as_dt(v) for k, v in params.items()}
        self.arg_dims = tuple(unify_dims(self.params.values()))

        # per-arg event ndim; args introduced by canonicalize default to the
        # family's declared table (missing -> 0).
        self._arg_event = {k: family.arg_event_ndim.get(k, 0) for k in self.params}
        self._batch_ndims = {k: v.pos_ndim - self._arg_event[k] for k, v in self.params.items()}
        self.batch_ndim = max(self._batch_ndims.values(), default=0)
        if self.batch_ndim < 0:
            raise ValueError("parameter has fewer positional axes than its event rank")

        # broadcast batch shape across params
        batch_shapes = []
        for k, v in self.params.items():
            bnd = self._batch_ndims[k]
            batch_shapes.append(v.pos_shape[:bnd] if bnd > 0 else ())
        self.batch_shape = jnp.broadcast_shapes(*batch_shapes) if batch_shapes else ()

        # sample event shape: broadcast trailing `family.event_ndim` axes of
        # params that carry at least that many event axes.
        ev = family.event_ndim
        explicit = family.event_shape(self._raw_params)
        if explicit is not None:
            self.event_shape = tuple(explicit)
        elif ev == 0:
            self.event_shape = ()
        else:
            cands = []
            for k, v in self.params.items():
                if self._arg_event[k] >= ev:
                    cands.append(v.pos_shape[len(v.pos_shape) - ev:])
            self.event_shape = jnp.broadcast_shapes(*cands)

        self._dim_sizes = {}
        for v in self.params.values():
            self._dim_sizes.update(v.dimsizes())

    def _prepared_params(self, n_pad: int):
        """Each param as a raw array (*arg_dims_or_1, *1s, *own_pos) where the
        number of singleton axes lines its batch block up with the target."""
        out = {}
        for k, v in self.params.items():
            a = expand_to(v, self.arg_dims)  # (*arg_dims_or_1, *own_pos)
            pad = n_pad + (self.batch_ndim - self._batch_ndims[k])
            if pad > 0:
                a = a.reshape(a.shape[:len(self.arg_dims)] + (1,) * pad + a.shape[len(self.arg_dims):])
            out[k] = a
        return out

    def sample(self, key, reparam: bool, sample_dims, dim_sizes: dict[str, int],
               sample_shape=()) -> DT:
        """Draw with all named dims in ``sample_dims`` present on the result.

        ``dim_sizes`` supplies sizes for dims not already on the parameters.
        Mirrors ``TorchDimDist.sample`` (reference ``TorchDimDist.py:88-125``).
        """
        sample_dims = list(sample_dims)
        if len(set(sample_dims)) != len(sample_dims):
            raise ValueError(f"duplicate sample_dims {sample_dims}")
        if not set(self.arg_dims).issubset(sample_dims):
            raise ValueError(f"sample_dims {sample_dims} must include arg dims {self.arg_dims}")
        if reparam and not self.family.has_rsample:
            raise ValueError(
                f"Trying to do reparameterised sampling of {self.family.name}, "
                f"which has no reparameterised sampler (likely a discrete distribution).")

        extra = [d for d in sample_dims if d not in self.arg_dims]
        sizes = {**self._dim_sizes, **{d: dim_sizes[d] for d in extra}}
        sample_shape = tuple(sample_shape)

        full = (tuple(sizes[d] for d in extra)
                + tuple(sizes[d] for d in self.arg_dims)
                + sample_shape + tuple(self.batch_shape) + tuple(self.event_shape))
        params = self._prepared_params(len(sample_shape))
        data = self.family.sample(key, full, params)
        out = DT(data, tuple(extra) + self.arg_dims)
        if not reparam:
            out = DT(jax.lax.stop_gradient(out.data), out.dims)
        return out

    def log_prob(self, x) -> DT:
        """Log-density of ``x``; result named dims = x.dims ∪ arg_dims,
        positional (sample_shape, batch) axes are summed (reference
        ``TorchDimDist.py:127-162`` + ``sum_non_dim``)."""
        x = as_dt(x)
        ev = self.family.event_ndim
        sample_ndim = x.pos_ndim - self.batch_ndim - ev
        if sample_ndim < 0:
            raise ValueError(
                f"sample for {self.family.name} has {x.pos_ndim} positional axes; "
                f"expected at least batch({self.batch_ndim}) + event({ev})")

        # Cross-K fast path: when sample and parameters carry disjoint K-dims
        # an exp-family density factorises into an MXU contraction instead of
        # O(K^2 * plate * event) VPU broadcasting (ops/lowrank.py).
        from ..ops.lowrank import (LOWRANK_FAMILIES, lowrank_applicable,
                                   lowrank_logprob, lowrank_logprob_lazy,
                                   lowrank_lazy_preferred)
        if self.family.name in LOWRANK_FAMILIES and lowrank_applicable(
                self.family.name, x, self.params, self.arg_dims):
            if lowrank_lazy_preferred(x, self.params):
                # lazy: the consuming K-contraction fuses the cross product
                # in VMEM (ops/pallas_lowrank.py) so it never hits HBM —
                # routed when the dense cross tensor would strain/overflow
                # HBM (see lowrank_lazy_preferred for measurements).
                return lowrank_logprob_lazy(self.family.name, x, self.params)
            return lowrank_logprob(self.family.name, x, self.params)

        union = unify_dims([x] + list(self.params.values()))
        x_arr = expand_to(x, union)
        # params: (*union_or_1, *1s(sample_ndim + batch pad), *own_pos)
        params = {}
        for k, v in self.params.items():
            a = expand_to(v, union)
            pad = sample_ndim + (self.batch_ndim - self._batch_ndims[k])
            if pad > 0:
                a = a.reshape(a.shape[:len(union)] + (1,) * pad + a.shape[len(union):])
            params[k] = a
        lp = self.family.log_prob(x_arr, params)
        return sum_pos(DT(lp, tuple(union)))
