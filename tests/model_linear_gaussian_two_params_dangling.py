"""Dangling (unused) latent b (parity: reference
``tests/linear_gaussian_two_params_dangling.py``)."""
import numpy as np
import jax.numpy as jnp
from jax.scipy.stats import multivariate_normal
from alan_tpu import Plate, BoundPlate, Data, mean, mean2, Normal, named
from testproblem import TestProblem

prior_mean, prior_scale = 2, 2
prior_prec = 1 / prior_scale**2
like_scale = 3
like_prec = 1 / like_scale**2
mult = 2.5

N = 10
rng = np.random.default_rng(4)
data_np = 1.5 + rng.standard_normal(N)
post_prec = prior_prec + N * like_prec * mult**2
post_mean = (prior_prec * prior_mean + like_prec * mult**2 * (data_np.sum() / mult)) / post_prec

marginal_prior_mean = prior_mean * mult * np.ones(N)
marginal_prior_cov = ((mult * prior_scale) ** 2) * np.ones((N, N)) + (like_scale**2) * np.eye(N)
known_elbo = float(multivariate_normal.logpdf(
    jnp.asarray(data_np), jnp.asarray(marginal_prior_mean), jnp.asarray(marginal_prior_cov)))

P = Plate(
    a=Normal(prior_mean, prior_scale),
    b=Normal('a', 1.3),
    T=Plate(d=Normal(lambda a: mult * a, like_scale)),
)
Q = Plate(
    a=Normal(1, 4),
    b=Normal(lambda a: 1.2 * a, 1.2),
    T=Plate(d=Data()),
)

all_platesizes = {'T': N}
P = BoundPlate(P, all_platesizes)
Q = BoundPlate(Q, all_platesizes)
data = {'d': named(jnp.asarray(data_np), 'T')}

moments = [('a', mean), ('a', mean2), ('b', mean), ('b', mean2)]
known_moments = {
    ('a', mean): post_mean,
    ('a', mean2): post_mean**2 + 1 / post_prec,
    ('b', mean): post_mean,
    ('b', mean2): post_mean**2 + 1 / post_prec + 1.3**2,
}

tp = TestProblem(P, Q, data, moments, known_moments=known_moments,
                 known_elbo=known_elbo, moment_K=1000, elbo_K=1000)
