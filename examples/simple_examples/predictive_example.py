"""Posterior-predictive workflow: importance-sample, extend the plates,
compute predictive log-likelihood (parity: reference
``examples/simple_examples/predictive_example.py``)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from alan_tpu import Normal, Plate, BoundPlate, Group, Problem, Data, named

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

sample = prob.sample(5)
importance_sample = sample.importance_sample(N=10)

extended_platesizes = {'p1': 5, 'p2': 6}
predictive_samples = importance_sample.extend(extended_platesizes, None)
for k, v in predictive_samples.dump().items():
    print(k, v)

test_data = {'e': named(jnp.asarray(rng.standard_normal((5, 6)), jnp.float32),
                        'p1', 'p2')}
pll = predictive_samples.predictive_ll(test_data)
print("predictive_ll:", {k: float(v.data) for k, v in pll.items()})
