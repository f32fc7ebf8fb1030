"""Two params, correlated Q (parity: reference
``tests/linear_gaussian_two_params_corr_Q.py``)."""
import numpy as np
import jax.numpy as jnp
from jax.scipy.stats import multivariate_normal
from alan_tpu import Plate, BoundPlate, Data, mean, mean2, Normal, Split, named
from testproblem import TestProblem

prior_mean = 2
a_scale = b_scale = 1
prior_var = a_scale**2 + b_scale**2
prior_prec = 1 / prior_var
like_scale = 3
like_prec = 1 / like_scale**2

N = 10
rng = np.random.default_rng(2)
data_np = 1.5 + rng.standard_normal(N)
post_prec = prior_prec + N * like_prec
post_mean = (prior_prec * prior_mean + like_prec * data_np.sum()) / post_prec

marginal_prior_cov = prior_var * np.ones((N, N)) + (like_scale**2) * np.eye(N)
known_elbo = float(multivariate_normal.logpdf(
    jnp.asarray(data_np), prior_mean * jnp.ones(N), jnp.asarray(marginal_prior_cov)))

P = Plate(
    a=Normal(prior_mean, a_scale),
    b=Normal('a', b_scale),
    T=Plate(d=Normal('b', like_scale)),
)
Q = Plate(
    a=Normal(1, 4),
    b=Normal('a', 1.2),
    T=Plate(d=Data()),
)

all_platesizes = {'T': N}
P = BoundPlate(P, all_platesizes)
Q = BoundPlate(Q, all_platesizes)
data = {'d': named(jnp.asarray(data_np), 'T')}

moments = [('a', mean), ('a', mean2), ('b', mean), ('b', mean2)]
known_moments = {
    ('b', mean): post_mean,
    ('b', mean2): post_mean**2 + 1 / post_prec,
}

tp = TestProblem(
    P, Q, data, moments,
    known_moments=known_moments,
    known_elbo=known_elbo,
    moment_K=1000, elbo_K=1000,
    computation_strategy=Split('T', 5),
)
