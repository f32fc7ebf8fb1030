"""Problem: the (P, Q, data) triple (parity: reference ``src/alan/Problem.py``)."""
from __future__ import annotations

import jax

from .dims import as_dt, dims_of
from .bound import BoundPlate
from .ir.plate import tensordict2tree
from .ir.checking import check_PQ_plate, check_inputs_params
from .sampler import Sampler, PermutationSampler, IndependentSampler
from .sample import Sample
from .sample_nonmp import SampleNonMP


class Problem:
    def __init__(self, P: BoundPlate, Q: BoundPlate, data: dict):
        if not isinstance(P, BoundPlate) or not isinstance(Q, BoundPlate):
            raise Exception(
                "P and Q must be BoundPlates, not e.g. Plates. Convert with "
                "BoundPlate(plate, all_platesizes).")
        self.P = P
        self.Q = Q

        if P.all_platesizes != Q.all_platesizes:
            raise Exception(
                f"all_platesizes mismatch between P ({P.all_platesizes}) "
                f"and Q ({Q.all_platesizes})")
        self.all_platedims = dict(P.all_platesizes)

        self._data = {k: as_dt(v) for k, v in data.items()}
        for k, v in self._data.items():
            for d in dims_of(v):
                if d in self.all_platedims and v.dim_size(d) != self.all_platedims[d]:
                    raise Exception(
                        f"data {k} has size {v.dim_size(d)} along plate {d}, "
                        f"expected {self.all_platedims[d]}")

        check_PQ_plate(None, P.plate, Q.plate, self.data)
        check_inputs_params(P, Q)

        self._counter = 0

    @property
    def data(self):
        return tensordict2tree(self.P.plate, dict(self._data))

    def _next_key(self, key):
        if key is None:
            self._counter += 1
            key = jax.random.fold_in(jax.random.key(0), self._counter)
        return key

    def sample(self, K: int, reparam: bool = True,
               sampler: type[Sampler] = PermutationSampler, key=None) -> Sample:
        """Draw K samples per latent from Q (reference ``Problem.py:71-97``).

        ``key`` is an optional JAX PRNG key; omitted, an internal counter
        derives a fresh deterministic key per call.
        """
        key = self._next_key(key)
        sample, groupvarname2Kdim = self.Q._sample(K, reparam, sampler,
                                                   self.all_platedims, key)
        return Sample(problem=self, sample=sample,
                      groupvarname2Kdim=groupvarname2Kdim,
                      sampler=sampler, reparam=reparam)

    def sample_nonmp(self, K: int, reparam: bool = True, key=None):
        """Global single-K (IWAE-style) baseline (reference ``Problem.py:99-110``)."""
        key = self._next_key(key)
        sampler = IndependentSampler
        sample, groupvarname2Kdim = self.Q._sample(K, reparam, sampler,
                                                   self.all_platedims, key)
        return SampleNonMP(problem=self, sample=sample,
                           groupvarname2Kdim=groupvarname2Kdim, reparam=reparam)

    def to(self, device=None):
        """Compatibility no-op (reference ``problem.to(device)``): JAX manages
        placement; see docs/migration.md."""
        return self

    def inputs_params(self, stateP=None, stateQ=None):
        flat = {**self.P.inputs_params_flat_named(stateP),
                **self.Q.inputs_params_flat_named(stateQ)}
        return tensordict2tree(self.P.plate, flat)
