"""Plated latents + dangling plated latent zp (parity: reference
``tests/linear_gaussian_latents_dangling.py``)."""
import numpy as np
import jax.numpy as jnp
from jax.scipy.stats import multivariate_normal
from alan_tpu import Plate, BoundPlate, Data, mean, mean2, Normal, Split, named
from testproblem import TestProblem

prior_mean, prior_scale = 2, 2
prior_var = prior_scale**2
prior_prec = 1 / prior_var
z_scale, d_scale = 1.3, 1.5
like_var = z_scale**2 + d_scale**2
like_prec = 1 / like_var

N = 10
rng = np.random.default_rng(6)
data_np = 1.5 + rng.standard_normal(N)
post_prec = prior_prec + N * like_prec
post_mean = (prior_prec * prior_mean + like_prec * data_np.sum()) / post_prec

marginal_prior_cov = prior_var * np.ones((N, N)) + like_var * np.eye(N)
known_elbo = float(multivariate_normal.logpdf(
    jnp.asarray(data_np), prior_mean * jnp.ones(N), jnp.asarray(marginal_prior_cov)))

P = Plate(
    a=Normal(prior_mean, prior_scale),
    T=Plate(
        z=Normal('a', z_scale),
        zp=Normal('a', 1.),
        d=Normal('z', d_scale),
    ),
)
Q = Plate(
    a=Normal(1, 4),
    T=Plate(
        z=Normal(lambda a: 1.5 * a, 3.5),
        zp=Normal(lambda a: 1.5 * a, 3.5),
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
    known_elbo=known_elbo,
    moment_K=100, elbo_K=1000, elbo_iters=30, elbo_gap_cat=2,
    computation_strategy=Split('T', 5),
)
