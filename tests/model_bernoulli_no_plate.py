"""Conjugate Beta-Bernoulli with a closed-form posterior mean
(parity: reference ``tests/bernoulli_no_plate.py``)."""
import jax.numpy as jnp
from alan_tpu import Bernoulli, Beta, Plate, BoundPlate, Problem, Data, mean, Split, named
from testproblem import TestProblem

P = Plate(
    p=Beta(2, 1),
    T=Plate(
        coin=Bernoulli('p'),
    ),
)

Q = Plate(
    p=Beta(1, 1),
    T=Plate(
        coin=Data(),
    ),
)

all_platesizes = {'T': 10}
P = BoundPlate(P, all_platesizes)
Q = BoundPlate(Q, all_platesizes)

data = {'coin': named(jnp.concatenate([jnp.zeros(3), jnp.ones(7)]), 'T')}

moments = [('p', mean)]
known_moments = {('p', mean): (7 + 2) / (2 + 1 + 10)}

tp = TestProblem(
    P, Q, data,
    moments,
    known_moments=known_moments,
    moment_K=10000,
    computation_strategy=Split('T', 4),
)
