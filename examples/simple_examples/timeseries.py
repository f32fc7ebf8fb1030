"""Grouped double-timeseries demo (parity: reference
``examples/simple_examples/timeseries.py``; Q groups the two chains so they
share one K-dim, which is also what makes the single-chain contraction over
T well-defined)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

from alan_tpu import Normal, Plate, BoundPlate, Problem, Timeseries, Data, Group

P = Plate(
    gp1=Group(
        ts1_init=Normal(0., 1.),
        ts2_init=Normal(0., 1.),
    ),
    T=Plate(
        gp2=Group(
            ts1=Timeseries('ts1_init', Normal(lambda prev: 0.9 * prev, 0.1)),
            ts2=Timeseries('ts2_init', Normal(lambda ts1, prev: 0.9 * ts1 + prev, 0.1)),
            a=Normal('ts2', 1.),
        ),
    ),
)

Q = Plate(
    gp1=Group(
        ts1_init=Normal(0., 1.),
        ts2_init=Normal(0., 1.),
    ),
    T=Plate(
        gp2=Group(
            ts1=Normal(0., 1.),
            ts2=Normal(0., 1.),
        ),
        a=Data(),
    ),
)

bP = BoundPlate(P, {'T': 3})
bQ = BoundPlate(Q, {'T': 3})

data = {'a': bP.sample(key=jax.random.key(0))['a']}

problem = Problem(bP, bQ, data)
sample = problem.sample(K=10)

print("elbo:", float(sample.elbo_vi()))
