"""MVN with plated data (parity: reference
``tests/linear_multivariate_gaussian_param.py``)."""
import numpy as np
import jax.numpy as jnp
from alan_tpu import Plate, BoundPlate, Data, mean, MultivariateNormal, named
from testproblem import TestProblem

F = 2
rng = np.random.default_rng(10)
prior_mean = rng.standard_normal(F).astype(np.float32)
A = rng.standard_normal((F, F)).astype(np.float32)
prior_cov = A @ A.T
prior_prec = np.linalg.inv(prior_cov)

ap_mean = rng.standard_normal(F).astype(np.float32)
B = rng.standard_normal((F, F)).astype(np.float32)
ap_cov = B @ B.T + 4 * np.eye(F, dtype=np.float32)

C = rng.standard_normal((F, F)).astype(np.float32)
like_cov = C @ C.T
like_prec = np.linalg.inv(like_cov)

N = 10
data_np = (1.5 + rng.standard_normal((N, F))).astype(np.float32)
post_prec = prior_prec + N * like_prec
post_cov = np.linalg.inv(post_prec)
post_mean = post_cov @ (prior_prec @ prior_mean + like_prec @ data_np.sum(0))

P = Plate(
    a=MultivariateNormal(jnp.asarray(prior_mean), jnp.asarray(prior_cov)),
    T=Plate(d=MultivariateNormal('a', jnp.asarray(like_cov))),
)
Q = Plate(
    a=MultivariateNormal(jnp.asarray(ap_mean), jnp.asarray(ap_cov)),
    T=Plate(d=Data()),
)

all_platesizes = {'T': N}
P = BoundPlate(P, all_platesizes)
Q = BoundPlate(Q, all_platesizes)
data = {'d': named(jnp.asarray(data_np), 'T')}

moments = [('a', mean)]
known_moments = {('a', mean): jnp.asarray(post_mean)}

tp = TestProblem(P, Q, data, moments, known_moments=known_moments, moment_K=10000)
