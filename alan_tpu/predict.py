"""Fused, jitted posterior-predictive pipeline.

The object API's ``sample -> importance_sample -> extend -> predictive_ll``
chain is great interactively but dispatches eagerly.  For production
evaluation loops (reference ``runner.py:161-172`` re-evaluates predictive LL
every iteration), this compiles the whole pipeline — Q sampling, reverse-
replay K-index sampling (incl. timeseries FFBS), prior extension and the
predictive log-lik — into one XLA program.
"""
from __future__ import annotations

import jax

from .sample import Sample
from .sampler import PermutationSampler
from .split import no_checkpoint


def predictive_ll_fn(problem, K: int, N: int, extended_platesizes: dict,
                     sampler=PermutationSampler,
                     computation_strategy=no_checkpoint):
    """Returns a jitted ``f(stateP, stateQ, extended_inputs, all_data, key)
    -> dict[varname, scalar]``.

    ``extended_inputs``/``all_data`` are dicts of dimmed tensors over the
    extended plates; shapes are static per returned function.
    """
    extended_platesizes = dict(extended_platesizes)

    def f(stateP, stateQ, extended_inputs, all_data, key):
        k1, k2, k3 = jax.random.split(key, 3)
        tree, gv2K = problem.Q._sample(K, False, sampler,
                                       problem.all_platedims, k1, state=stateQ)
        s = Sample(problem, tree, gv2K, sampler, False,
                   states=(stateP, stateQ))
        isamp = s.importance_sample(N, computation_strategy, key=k2)
        ext = isamp.extend(dict(extended_platesizes), extended_inputs, key=k3)
        pll = ext.predictive_ll(all_data)
        return {k: v.data for k, v in pll.items()}

    return jax.jit(f)


def importance_sample_fn(problem, K: int, N: int,
                         sampler=PermutationSampler,
                         computation_strategy=no_checkpoint):
    """Returns a jitted ``f(stateP, stateQ, key) -> dict[varname, DT]`` of N
    posterior draws per latent (the production form of
    ``problem.sample(K).importance_sample(N).dump()`` — one XLA program
    instead of an eager op-per-dispatch walk, which over the remote-TPU
    tunnel is orders of magnitude slower).  Draws carry the ``N`` dim plus
    their plate dims."""

    def f(stateP, stateQ, key):
        k1, k2 = jax.random.split(key)
        tree, gv2K = problem.Q._sample(K, False, sampler,
                                       problem.all_platedims, k1, state=stateQ)
        s = Sample(problem, tree, gv2K, sampler, False,
                   states=(stateP, stateQ))
        isamp = s.importance_sample(N, computation_strategy, key=k2)
        return isamp.dump()

    return jax.jit(f)
