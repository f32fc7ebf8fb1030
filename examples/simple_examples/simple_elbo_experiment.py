"""ELBO tightening with K on scalar- and vector-valued models
(parity: reference ``examples/simple_examples/simple_elbo_experiment.py``)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from alan_tpu import Normal, Plate, BoundPlate, Group, Problem, Data, named

num_runs = 20
Ks = [1, 10, 100]
platesizes = {'p1': 3, 'p2': 4}
rng = np.random.default_rng(0)
data = {'e': named(jnp.asarray(rng.standard_normal((3, 4)), jnp.float32), 'p1', 'p2')}


def build():
    P = Plate(
        ab=Group(a=Normal(0, 1), b=Normal("a", 1)),
        c=Normal(0, lambda a: a.exp()),
        p1=Plate(d=Normal("a", 1), p2=Plate(e=Normal("d", 1.))),
    )
    Q = Plate(
        ab=Group(a=Normal(0, 1), b=Normal("a", 1)),
        c=Normal(0, lambda a: a.exp()),
        p1=Plate(d=Normal("a", 1), p2=Plate(e=Data())),
    )
    return Problem(BoundPlate(P, platesizes), BoundPlate(Q, platesizes), data)


prob = build()
print("mean ELBO over runs (higher K => tighter bound):")
for K in Ks:
    elbos = [float(prob.sample(K, key=jax.random.fold_in(jax.random.key(1), r))
                   .elbo_nograd()) for r in range(num_runs)]
    print(f"  K={K:4d}: {np.mean(elbos):8.3f} ± {np.std(elbos)/np.sqrt(num_runs):.3f}")
