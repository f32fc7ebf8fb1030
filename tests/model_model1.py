"""Grouped Q + QEM/Opt params + nested plates (parity: reference
``tests/model1.py``)."""
import numpy as np
import jax.numpy as jnp
from alan_tpu import (Normal, Plate, BoundPlate, Group, Data, mean, Split,
                      OptParam, QEMParam, named)
from testproblem import TestProblem

P = Plate(
    a=Normal(0, 1),
    b=Normal("a", 1),
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
        a=Normal(QEMParam(0.), QEMParam(1.)),
        b=Normal("a", 1),
    ),
    c=Normal(0, lambda a: a.exp()),
    p1=Plate(
        d=Normal(OptParam(0.), "d_scale"),
        p2=Plate(
            e=Data(),
        ),
    ),
)

all_platesizes = {'p1': 4, 'p2': 4}
extra_opt_params = {'d_scale': named(jnp.ones(4), 'p1')}
P = BoundPlate(P, all_platesizes)
Q = BoundPlate(Q, all_platesizes, extra_opt_params=extra_opt_params)

rng = np.random.default_rng(11)
data = {'e': named(jnp.asarray(rng.standard_normal((4, 4)), jnp.float32), 'p1', 'p2')}
moments = [('a', mean), ('b', mean), ('c', mean), ('d', mean)]

tp = TestProblem(
    P, Q, data, moments,
    moment_K=1000,
    computation_strategy=Split('p1', 3),
)
