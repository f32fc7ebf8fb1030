"""Canonical full-API demo (parity: reference
``examples/simple_examples/example.py``) — define P and Q, sample, compute
the ELBO, posterior moments, marginals, importance samples, and run one
update of each training method (QEM natural-gradient, VI, RWS).

The JAX-native difference vs the reference: training goes through the fused
jitted step factories in ``alan_tpu.train`` (no autograd tape), so the
"one VI step" here is ``train.vi(...)`` rather than ``elbo.backward()``.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from alan_tpu import (Normal, Plate, BoundPlate, Group, Problem, Data, mean,
                      var, Split, OptParam, QEMParam, checkpoint,
                      no_checkpoint, named)
from alan_tpu import train

computation_strategy = checkpoint  # no_checkpoint / checkpoint / Split('p1', 3)

P_plate = Plate(
    a=Normal(OptParam(0., name='a_loc_P'), 1),
    bc=Group(
        b=Normal('a', 1),
        c=Normal('b', 1),
    ),
    d=Normal(0, lambda c: c.exp()),
    p1=Plate(
        e=Normal("d", 1),
        p2=Plate(
            f=Normal("e", 1.),
        ),
    ),
)

Q_plate = Plate(
    a=Normal(OptParam(0.), OptParam(1.)),
    bc=Group(
        b=Normal(QEMParam(0.), QEMParam(1.)),
        c=Normal('c_loc', lambda c_log_scale: c_log_scale.exp()),
    ),
    d=Normal(0, lambda c: c.exp()),
    p1=Plate(
        e=Normal(QEMParam(0.), QEMParam(1.)),
        p2=Plate(
            f=Data(),
        ),
    ),
)

all_platesizes = {'p1': 4, 'p2': 6}
extra_opt_params = {'c_loc': jnp.zeros(()), 'c_log_scale': jnp.zeros(())}

P_bound_plate = BoundPlate(P_plate, all_platesizes)
Q_bound_plate = BoundPlate(Q_plate, all_platesizes,
                           extra_opt_params=extra_opt_params)

# draw synthetic data from the prior
P_sample = P_bound_plate.sample(key=jax.random.key(0))
data = {'f': P_sample['f']}

problem = Problem(P_bound_plate, Q_bound_plate, data)

sample = problem.sample(K=10)

# ELBOs
print("elbo_vi:     ", float(sample.elbo_vi(computation_strategy=computation_strategy)))
print("elbo_rws:    ", float(sample.elbo_rws(computation_strategy=computation_strategy)))
print("elbo_nograd: ", float(sample.elbo_nograd(computation_strategy=computation_strategy)))

# One QEM update through the object API
sample.update_qem_params(0.1, computation_strategy=computation_strategy)

# One fused-jitted step of each training method
for method in ("vi", "rws", "qem"):
    elbos = train.fit(problem, method=method, K=10, iters=1)
    print(f"one {method} step, elbo:", float(elbos[-1]))

# Posterior moments three ways
sample = problem.sample(K=10)
print("E[a] (sample.moments):   ", float(sample._moments('a', mean).data))
marginals = sample.marginals()
print("E[a] (marginals.moments):", float(marginals._moments('a', mean).data))
print("Var[a]:                  ", float(marginals._moments('a', var).data))
print("min ESS:                 ", float(marginals.min_ess()))

importance_sample = sample.importance_sample(N=100)
print("E[a] (importance sample):", float(importance_sample._moments('a', mean).data))

# Prediction: extend p1 and compute predictive log-likelihood on "all" data
extended_platesizes = {'p1': 6, 'p2': 6}
extended = importance_sample.extend(extended_platesizes)
# fake extended data: just reuse prior sample at extended sizes
P_ext = BoundPlate(P_plate, extended_platesizes)
all_data = {'f': P_ext.sample(key=jax.random.key(1))['f']}
pll = extended.predictive_ll(all_data)
print("predictive_ll:", {k: float(v.data) for k, v in pll.items()})
