"""Marginal posterior weights over the K particles
(parity: reference ``src/alan/Marginals.py``)."""
from __future__ import annotations

from .dims import DT, dims_of, sum_dims, amin_dims
from .moments import torchdim_moments_mixin, named_moments_mixin


class Marginals:
    def __init__(self, samples: dict, weights: dict, all_platedims: dict,
                 varname2groupvarname: dict):
        """``samples``: varname -> dimmed tensor; ``weights``:
        frozenset[groupvarname] -> weight tensor over (joint) K-dims."""
        self.samples = samples
        self.weights = weights
        self.all_platedims = all_platedims
        self.varname2groupvarname = varname2groupvarname

    def _moments_uniform_input(self, moms):
        assert isinstance(moms, list)
        result = []
        for varnames, m in moms:
            samples = tuple(self.samples[vn] for vn in varnames)
            gvns = frozenset(self.varname2groupvarname[vn] for vn in varnames)
            weights = self.weights[gvns]
            result.append(m.from_marginals(samples, weights, self.all_platedims))
        return result

    _moments = torchdim_moments_mixin
    moments = named_moments_mixin

    def ess(self):
        """Effective sample size 1/Σw² per (joint) marginal
        (reference ``Marginals.py:48-56``)."""
        result = {}
        platenames = set(self.all_platedims)
        for varnames, w in self.weights.items():
            Kdims = tuple(d for d in dims_of(w) if d not in platenames)
            assert len(Kdims) >= 1
            result[varnames] = 1.0 / sum_dims(w * w, Kdims)
        return result

    def min_ess(self):
        import jax.numpy as jnp
        vals = []
        for ess in self.ess().values():
            vals.append(jnp.min(ess.data))
        return min(vals, key=float)
