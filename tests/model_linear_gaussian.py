"""Univariate Gaussian, plated data only (parity: reference
``tests/linear_gaussian.py``)."""
import numpy as np
import jax.numpy as jnp
from jax.scipy.stats import multivariate_normal
from alan_tpu import Plate, BoundPlate, Data, mean, mean2, Normal, Split, named
from testproblem import TestProblem

prior_mean, prior_scale = 2, 2
prior_prec = 1 / prior_scale**2
like_scale = 3
like_prec = 1 / like_scale**2
mult = 2.5

N = 10
rng = np.random.default_rng(0)
data_np = 1.5 + rng.standard_normal(N)
post_prec = prior_prec + N * like_prec * mult**2
post_mean = (prior_prec * prior_mean + like_prec * mult**2 * (data_np.sum() / mult)) / post_prec

marginal_prior_mean = prior_mean * mult * np.ones(N)
marginal_prior_cov = ((mult * prior_scale) ** 2) * np.ones((N, N)) + (like_scale**2) * np.eye(N)
known_elbo = float(multivariate_normal.logpdf(
    jnp.asarray(data_np), jnp.asarray(marginal_prior_mean), jnp.asarray(marginal_prior_cov)))

P = Plate(
    a=Normal(prior_mean, prior_scale),
    T=Plate(
        d=Normal(lambda a: mult * a, like_scale),
    ),
)

Q = Plate(
    a=Normal(1, 4),
    T=Plate(
        d=Data(),
    ),
)

all_platesizes = {'T': N}
P = BoundPlate(P, all_platesizes)
Q = BoundPlate(Q, all_platesizes)

data = {'d': named(jnp.asarray(data_np), 'T')}

known_moments = {
    ('a', mean): post_mean,
    ('a', mean2): post_mean**2 + 1 / post_prec,
}
moments = list(known_moments.keys())

tp = TestProblem(
    P, Q, data, moments,
    known_moments=known_moments,
    known_elbo=known_elbo,
    moment_K=10000,
    elbo_K=10000,
    computation_strategy=Split('T', 4),
)
