"""Proposal samplers: how child particles condition on parent particles.

Parity: reference ``src/alan/Sampler.py``.  In the massively-parallel scheme
every latent has its own K-dim; when sampling a child from Q we must pick, for
each of the child's K particles, which parent particle to condition on:

  * ``PermutationSampler`` — permute parent particles (each parent particle
    has exactly one child; avoids particle degeneracy).  Default.
  * ``CategoricalSampler`` — resample parents uniformly with replacement.
  * ``IndependentSampler`` — identity (used by the non-MP global-K baseline).

``reduce_logQ`` then turns the raw Q log-prob (which carries parent K-dims)
into the matching mixture-proposal log-prob by log-mean-exp over parent K-dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .dims import DT, dims_of, dt_index, bind, logmeanexp_dims


def _kdim_groups(scope: dict, active_platedims):
    """Group scope tensors by their single K-dim (reference ``Sampler.py:17-56``)."""
    groups: dict = {}
    for varname, tensor in scope.items():
        kdims = [d for d in dims_of(tensor) if d not in active_platedims]
        assert len(kdims) in (0, 1), f"{varname} has K-dims {kdims}"
        kdim = kdims[0] if kdims else None
        groups.setdefault(kdim, {})[varname] = tensor
    return groups


class Sampler:
    @classmethod
    def resample_scope(cls, scope, active_platedims, Kdim, dim_sizes, keygen):
        """Re-index every in-scope parent onto the child's K-dim
        (reference ``Sampler.py:85-115``)."""
        new_scope = {}
        for var_Kdim, varname2tensor in _kdim_groups(scope, active_platedims).items():
            if var_Kdim is None:
                new_scope.update(varname2tensor)
                continue
            tensor0 = next(iter(varname2tensor.values()))
            perm = cls.perm(dims=list(dims_of(tensor0)), Kdim=var_Kdim,
                            dim_sizes={**dim_sizes, var_Kdim: tensor0.dim_size(var_Kdim)},
                            key=keygen())
            for varname, tensor in varname2tensor.items():
                permuted = dt_index(tensor, var_Kdim, perm)  # pos: (K, *pos)
                new_scope[varname] = bind(permuted, Kdim)
        # check: everything now carries only {Kdim, *active_platedims}
        ok = set([Kdim, *active_platedims])
        for t in new_scope.values():
            assert set(dims_of(t)).issubset(ok)
        return new_scope


class SamplerMP(Sampler):
    @staticmethod
    def reduce_logQ(lp: DT, active_platedims, Kdim) -> DT:
        """logmeanexp over parent K-dims -> mixture-proposal correction
        (reference ``Sampler.py:118-134``)."""
        parent_Kdims = tuple(d for d in dims_of(lp) if d != Kdim and d not in active_platedims)
        return logmeanexp_dims(lp, parent_Kdims) if parent_Kdims else lp


class PermutationSampler(SamplerMP):
    """Permute the parent particles (reference ``Sampler.py:139-148``)."""

    @staticmethod
    def perm(dims, Kdim, dim_sizes, key) -> DT:
        plate_ds = [d for d in dims if d != Kdim]
        shape = tuple(dim_sizes[d] for d in plate_ds) + (dim_sizes[Kdim],)
        u = jax.random.uniform(key, shape)
        p = jnp.argsort(u, axis=-1)
        # named dims = plates (leading); the trailing K axis is positional.
        return DT(p, tuple(plate_ds))


class CategoricalSampler(SamplerMP):
    """Uniform resampling of parent particles (reference ``Sampler.py:150-161``)."""

    @staticmethod
    def perm(dims, Kdim, dim_sizes, key) -> DT:
        plate_ds = [d for d in dims if d != Kdim]
        K = dim_sizes[Kdim]
        shape = tuple(dim_sizes[d] for d in plate_ds) + (K,)
        p = jax.random.randint(key, shape, 0, K)
        return DT(p, tuple(plate_ds))


class IndependentSampler(Sampler):
    """Identity resampling — the non-MP, single-global-K path
    (reference ``Sampler.py:163-169``)."""

    @staticmethod
    def perm(dims, Kdim, dim_sizes, key) -> DT:
        return DT(jnp.arange(dim_sizes[Kdim]), ())

    @staticmethod
    def reduce_logQ(lp: DT, active_platedims, Kdim) -> DT:
        return lp


samplers = [CategoricalSampler, PermutationSampler]
