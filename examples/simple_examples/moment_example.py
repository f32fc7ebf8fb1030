"""Moments three ways: sample source-terms, marginals, importance samples
(parity: reference ``examples/simple_examples/moment_example.py``)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from alan_tpu import (Normal, Plate, BoundPlate, Group, Problem, Data, mean,
                      mean2, var, named)

P = Plate(
    ab=Group(
        a=Normal(0, 1),
        b=Normal("a", 1),
    ),
    c=Normal(0, lambda a: a.exp()),
    p1=Plate(
        d=Normal("a", 1),
        p2=Plate(
            e=Normal("d", 1.),
        ),
    ),
)

Q = Plate(
    ab=Group(
        a=Normal("a_mean", 1),
        b=Normal("a", 1),
    ),
    c=Normal(0, lambda a: a.exp()),
    p1=Plate(
        d=Normal("d_mean", 1),
        p2=Plate(
            e=Data(),
        ),
    ),
)

platesizes = {'p1': 3, 'p2': 4}
rng = np.random.default_rng(0)
data = {'e': named(jnp.asarray(rng.standard_normal((3, 4)), jnp.float32), 'p1', 'p2')}

P = BoundPlate(P, platesizes)
Q = BoundPlate(Q, platesizes,
               extra_opt_params={'a_mean': jnp.zeros(()),
                                 'd_mean': named(jnp.zeros(3), 'p1')})

prob = Problem(P, Q, data)

print("ELBO vs K:")
for K in [1, 3, 10, 30, 100]:
    print(f"  K={K:4d}: {float(prob.sample(K).elbo_nograd()):.4f}")

sample = prob.sample(100)
marginals = sample.marginals()
print("\nMoments from marginals:")
for vn in ["a", "b", "c", "d"]:
    m = marginals._moments(vn, mean)
    v = marginals._moments(vn, var)
    print(f"  E[{vn}] =", np.asarray(m.data).round(3),
          " Var[{}] =".format(vn), np.asarray(v.data).round(3))

print("\nSame moments from the source-term trick (sample.moments):")
for vn in ["a", "b", "c", "d"]:
    print(f"  E[{vn}] =", np.asarray(sample._moments(vn, mean).data).round(3))

isample = sample.importance_sample(N=1000)
print("\nSame moments from importance samples:")
for vn in ["a", "b", "c", "d"]:
    print(f"  E[{vn}] =", np.asarray(isample._moments(vn, mean).data).round(3))

print("\nmin ESS:", float(marginals.min_ess()))
