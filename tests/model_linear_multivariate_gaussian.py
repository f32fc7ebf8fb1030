"""MultivariateNormal conjugate model (parity: reference
``tests/linear_multivariate_gaussian.py``)."""
import numpy as np
import jax.numpy as jnp
from jax.scipy.stats import multivariate_normal
from alan_tpu import Plate, BoundPlate, Data, mean, MultivariateNormal, named
from testproblem import TestProblem

F = 2
rng = np.random.default_rng(8)
prior_mean = rng.standard_normal(F).astype(np.float32)
A = rng.standard_normal((F, F)).astype(np.float32)
prior_cov = A @ A.T
prior_prec = np.linalg.inv(prior_cov)

ap_mean = rng.standard_normal(F).astype(np.float32)
B = rng.standard_normal((F, F)).astype(np.float32)
ap_cov = B @ B.T + 2 * np.eye(F, dtype=np.float32)

C = rng.standard_normal((F, F)).astype(np.float32)
like_cov = C @ C.T
like_prec = np.linalg.inv(like_cov)

data_np = (1.5 + rng.standard_normal(F)).astype(np.float32)
post_prec = prior_prec + like_prec
post_cov = np.linalg.inv(post_prec)
post_mean = post_cov @ (prior_prec @ prior_mean + like_prec @ data_np)

known_elbo = float(multivariate_normal.logpdf(
    jnp.asarray(data_np), jnp.asarray(prior_mean), jnp.asarray(prior_cov + like_cov)))

P = Plate(
    a=MultivariateNormal(jnp.asarray(prior_mean), jnp.asarray(prior_cov)),
    d=MultivariateNormal('a', jnp.asarray(like_cov)),
)
Q = Plate(
    a=MultivariateNormal(jnp.asarray(ap_mean), jnp.asarray(ap_cov)),
    d=Data(),
)

P = BoundPlate(P, {})
Q = BoundPlate(Q, {})
data = {'d': jnp.asarray(data_np)}

moments = [('a', mean)]
known_moments = {('a', mean): jnp.asarray(post_mean)}

tp = TestProblem(P, Q, data, moments, known_elbo=known_elbo,
                 known_moments=known_moments, moment_K=10000, elbo_K=1000)
