"""Importance samples, plate extension and predictive log-likelihood
(parity: reference ``src/alan/ImportanceSample.py``)."""
from __future__ import annotations

import jax

from .dims import DT, as_dt, dims_of, logmeanexp_dims, sum_dims
from .ir.plate import flatten_tree, tensordict2tree
from .moments import torchdim_moments_mixin, named_moments_mixin
from .utils import KeyGen


class AbstractImportanceSample:
    def dump(self):
        """The importance samples as a flat dict of dimmed tensors (the ``N``
        dim indexes the joint samples)."""
        return dict(self.samples_flatdict)

    def _moments_uniform_input(self, moms):
        assert isinstance(moms, list)
        result = []
        for varnames, m in moms:
            samples = tuple(self.samples_flatdict[vn] for vn in varnames)
            result.append(m.from_samples(samples, self.Ndim))
        return result

    _moments = torchdim_moments_mixin
    moments = named_moments_mixin


class ImportanceSample(AbstractImportanceSample):
    def __init__(self, problem, samples_tree, Ndim, states=(None, None)):
        self.problem = problem
        self.samples_tree = samples_tree
        self.samples_flatdict = flatten_tree(samples_tree)
        self.Ndim = Ndim
        self._states = states

    def extend(self, extended_platesizes: dict, extended_inputs=None, key=None):
        """Extend plate sizes and sample the extra latents from the prior
        (reference ``ImportanceSample.py:43-98``)."""
        assert isinstance(extended_platesizes, dict)
        extended_platesizes = dict(extended_platesizes)
        extended_inputs = {k: as_dt(v) for k, v in (extended_inputs or {}).items()}

        for name, size in self.problem.all_platedims.items():
            if name not in extended_platesizes:
                extended_platesizes[name] = size
        assert set(extended_platesizes) == set(self.problem.all_platedims)

        all_inputs_params = tensordict2tree(self.problem.P.plate, extended_inputs)

        if key is None:
            key = jax.random.key(2000)
        keygen = KeyGen(key)

        # thread the N-dim size through the per-dist samplers
        N_size = next(v.dim_size(self.Ndim)
                      for v in self.samples_flatdict.values()
                      if self.Ndim in v.dims)
        extended_platesizes = {**extended_platesizes, self.Ndim: N_size}

        # P's params/inputs must be visible in scope (reference
        # ``BoundPlate.py:322``); covariates with extended plates are
        # overridden by extended_inputs via the inputs_params tree.
        base_scope = {k: v for k, v in
                      self.problem.P.inputs_params_flat_named(self._states[0]).items()
                      if k not in extended_inputs}

        extended_sample = self.problem.P.plate.sample_extended(
            sample=self.samples_tree,
            name=None,
            scope=base_scope,
            inputs_params=all_inputs_params,
            original_platedims=self.problem.all_platedims,
            extended_platedims=extended_platesizes,
            active_extended_platedims=[],
            Ndim=self.Ndim,
            keygen=keygen,
            original_data=self.problem.data,
        )
        return ExtendedImportanceSample(self.problem, extended_sample, self.Ndim,
                                        extended_platesizes, extended_inputs,
                                        states=self._states)


class ExtendedImportanceSample(AbstractImportanceSample):
    def __init__(self, problem, samples_tree, Ndim, extended_platedims,
                 extended_inputs, states=(None, None)):
        self.problem = problem
        self.samples_tree = samples_tree
        self.samples_flatdict = flatten_tree(samples_tree)
        self.Ndim = Ndim
        self.extended_platedims = extended_platedims
        self.extended_inputs = extended_inputs
        self._states = states

    def predictive_ll(self, data: dict):
        """Average predictive log-likelihood of held-out data
        (reference ``ImportanceSample.py:118-177``):
        ``logmeanexp_N(Σ ll_all − Σ ll_train)`` per data variable."""
        assert isinstance(data, dict)
        extended_data = {k: as_dt(v) for k, v in data.items()}
        original_data = flatten_tree(self.problem.data)

        for name, tensor in original_data.items():
            if name not in extended_data:
                extended_data[name] = tensor
        assert set(extended_data) == set(original_data)

        all_inputs_params = tensordict2tree(self.problem.P.plate,
                                            dict(self.extended_inputs))

        base_scope = {k: v for k, v in
                      self.problem.P.inputs_params_flat_named(self._states[0]).items()
                      if k not in self.extended_inputs}

        lls_train, lls_all = self.problem.P.plate.predictive_ll(
            sample=self.samples_tree,
            name=None,
            scope=base_scope,
            inputs_params=all_inputs_params,
            original_platedims=self.problem.all_platedims,
            extended_platedims=self.extended_platedims,
            original_data=original_data,
            extended_data=extended_data,
        )
        assert set(lls_all) == set(lls_train)

        result = {}
        for varname in lls_all:
            ll_all = lls_all[varname]
            ll_train = lls_train[varname]
            dims_all = [d for d in dims_of(ll_all) if d != self.Ndim]
            dims_train = [d for d in dims_of(ll_train) if d != self.Ndim]
            assert len(dims_all) == len(dims_train)
            if dims_all:
                ll_all = sum_dims(ll_all, tuple(dims_all))
                ll_train = sum_dims(ll_train, tuple(dims_train))
            result[varname] = logmeanexp_dims(ll_all - ll_train, (self.Ndim,))
        return result
