"""Two-level linear-Gaussian chain inside a plate: ELBO variants plus the
predictive workflow (parity: reference
``examples/simple_examples/linear_gaussian_plated.py``; the reference's
``breakpoint()`` is, naturally, omitted)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax.numpy as jnp
import numpy as np

from alan_tpu import Normal, Plate, BoundPlate, Problem, Data, named

P = Plate(
    mu=Normal(jnp.zeros(2), jnp.ones(2)),
    p1=Plate(
        psi=Normal("mu", jnp.ones(2)),
        obs=Normal("psi", jnp.ones(2)),
    ),
)

Q = Plate(
    mu=Normal("mu_mean", jnp.ones(2)),
    p1=Plate(
        psi=Normal("psi_mean", jnp.ones(2)),
        obs=Data(),
    ),
)

platesizes = {'p1': 3}
rng = np.random.default_rng(0)
data = {'obs': named(jnp.asarray(rng.standard_normal((3, 2)), jnp.float32), 'p1')}

P = BoundPlate(P, platesizes)
Q = BoundPlate(Q, platesizes,
               extra_opt_params={'mu_mean': jnp.zeros(2),
                                 'psi_mean': jnp.zeros(2)})

prob = Problem(P, Q, data)

K = 4

sample = prob.sample(K)
print("elbo_nograd:", float(sample.elbo_nograd()))
print("elbo_vi:", float(sample.elbo_vi()))
print("elbo_rws:", float(sample.elbo_rws()))

importance_sample = sample.importance_sample(N=10)
for k, v in importance_sample.dump().items():
    print(k, v)

extended_platesizes = {'p1': 4}
extended_importance_sample = importance_sample.extend(extended_platesizes, None)
for k, v in extended_importance_sample.dump().items():
    print(k, v)

extended_data = {'obs': named(jnp.asarray(rng.standard_normal((4, 2)),
                                          jnp.float32), 'p1')}
ll = extended_importance_sample.predictive_ll(extended_data)
print("predictive_ll:", float(ll['obs'].data))
