"""Plated latents with unnamed batch dims (parity: reference
``tests/linear_gaussian_latents_batch.py``)."""
import numpy as np
import jax.numpy as jnp
from alan_tpu import Plate, BoundPlate, Data, mean, mean2, Normal, Split, named
from testproblem import TestProblem

rng = np.random.default_rng(7)
prior_mean = jnp.asarray(rng.standard_normal(2), jnp.float32)
prior_scale = jnp.array([1., 2.])
prior_var = prior_scale**2
prior_prec = 1 / prior_var

z_scale = jnp.array([1.3, 1.6])
d_scale = jnp.array([2., 3.])
like_var = z_scale**2 + d_scale**2
like_prec = 1 / like_var

N = 10
data_np = 1.5 + rng.standard_normal((N, 2)).astype(np.float32)
post_prec = prior_prec + N * like_prec
post_mean = (prior_prec * prior_mean + like_prec * jnp.asarray(data_np).sum(0)) / post_prec

P = Plate(
    a=Normal(prior_mean, prior_scale),
    T=Plate(
        z=Normal('a', z_scale),
        d=Normal('z', d_scale),
    ),
)
Q = Plate(
    a=Normal(jnp.zeros(2), 4),
    T=Plate(
        z=Normal(lambda a: 0.5 * a, 6),
        d=Data(),
    ),
)

all_platesizes = {'T': N}
P = BoundPlate(P, all_platesizes)
Q = BoundPlate(Q, all_platesizes)
data = {'d': named(jnp.asarray(data_np), 'T')}

moments = [('a', mean), ('a', mean2), ('z', mean), ('z', mean2)]
known_moments = {
    ('a', mean): post_mean,
    ('a', mean2): post_mean**2 + 1 / post_prec,
}

tp = TestProblem(
    P, Q, data, moments,
    known_moments=known_moments,
    moment_K=1000,
    computation_strategy=Split('T', 3),
)
