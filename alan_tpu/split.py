"""Computation strategies: ``no_checkpoint`` / ``checkpoint`` / ``Split``.

Parity: reference ``src/alan/Split.py``.  ``Split(platename, split_size)``
chunks the evaluation of one plate to bound peak memory; chunking is *exact*
(the test suite pins split == unsplit to isclose equality).  On TPU,
``checkpoint`` maps to ``jax.checkpoint`` (rematerialisation) around each
plate body, and Split chunks are unrolled at trace time (equal-size chunks
could also ride a ``lax.scan``; unrolling keeps the remainder chunk exact).
"""
from __future__ import annotations

from .dims import DT, dims_of, slice_dim


class NoSplit:
    def split_args(self, name, sample, inputs_params, extra_log_factors, data,
                   all_platedims):
        return [{
            "sample": sample,
            "inputs_params": inputs_params,
            "extra_log_factors": extra_log_factors,
            "data": data,
            "all_platedims": all_platedims,
        }]


class NoCheckpoint(NoSplit):
    pass


no_checkpoint = NoCheckpoint()


class Checkpoint(NoSplit):
    pass


checkpoint = Checkpoint()


class Split:
    """Chunk the computation along one plate (reference ``Split.py:24-71``).

    ``split_size`` is the size of each chunk (not the number of chunks), so a
    model that fits in memory keeps fitting when the data grows.
    """

    def __init__(self, platename: str, split_size: int):
        assert isinstance(platename, str)
        assert isinstance(split_size, int)
        self.platename = platename
        self.split_size = split_size

    def _split_bounds(self, size: int):
        assert size > self.split_size, \
            f"Split size {self.split_size} >= plate size {size}"
        bounds = []
        start = 0
        while start < size:
            stop = min(start + self.split_size, size)
            bounds.append((start, stop))
            start = stop
        return bounds

    def _split_tree(self, tree: dict, bounds):
        results = [dict() for _ in bounds]
        for k, v in tree.items():
            if isinstance(v, dict):
                subs = self._split_tree(v, bounds)
                for r, s in zip(results, subs):
                    r[k] = s
            elif v is None:
                for r in results:
                    r[k] = None
            else:
                if self.platename in dims_of(v):
                    for r, (a, b) in zip(results, bounds):
                        r[k] = slice_dim(v, self.platename, a, b)
                else:
                    for r in results:
                        r[k] = v
        return results

    def split_args(self, name, sample, inputs_params, extra_log_factors, data,
                   all_platedims):
        if self.platename != name:
            return [{
                "sample": sample,
                "inputs_params": inputs_params,
                "extra_log_factors": extra_log_factors,
                "data": data,
                "all_platedims": all_platedims,
            }]

        bounds = self._split_bounds(all_platedims[self.platename])
        samples = self._split_tree(sample, bounds)
        ips = self._split_tree(inputs_params, bounds)
        elfs = self._split_tree(extra_log_factors, bounds)
        datas = self._split_tree(data, bounds)
        platedimss = [{**all_platedims, self.platename: b - a} for a, b in bounds]
        return [
            {"sample": s, "inputs_params": i, "extra_log_factors": e,
             "data": d, "all_platedims": p}
            for s, i, e, d, p in zip(samples, ips, elfs, datas, platedimss)
        ]
