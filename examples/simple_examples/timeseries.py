"""Double-timeseries demo (parity: reference
``examples/simple_examples/timeseries.py``).

Part 1 groups the two chains so they share one K-dim (the reference's
layout, cheapest: one K x K chain).  Part 2 leaves them UNGROUPED — each
chain keeps its own K-dim and the engine contracts the joint
[T, K^2, K^2] product chain (O(K^4) memory: keep K small or group)."""
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


# ---- part 2: the same two chains UNGROUPED (each keeps its own K-dim;
# the engine contracts the joint product chain — exact, O(K^4) memory) ----
Q_ungrouped = Plate(
    ts1_init=Normal(0., 1.),
    ts2_init=Normal(0., 1.),
    T=Plate(
        ts1=Normal(0., 1.),
        ts2=Normal(0., 1.),
        a=Data(),
    ),
)
problem_u = Problem(bP, BoundPlate(Q_ungrouped, {'T': 3}), data)
sample_u = problem_u.sample(K=10)
print("elbo (ungrouped, joint chain):", float(sample_u.elbo_vi()))
isamp = sample_u.importance_sample(N=20, key=jax.random.key(1))
print("joint-FFBS posterior draws:", isamp.dump()['ts1'].dims)
