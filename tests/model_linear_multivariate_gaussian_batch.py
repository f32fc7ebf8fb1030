"""MVN with unnamed batch dims (parity: reference
``tests/linear_multivariate_gaussian_batch.py``)."""
import numpy as np
import jax.numpy as jnp
from alan_tpu import Plate, BoundPlate, Data, mean, MultivariateNormal
from testproblem import TestProblem

N, F = 3, 2
rng = np.random.default_rng(9)
prior_mean = rng.standard_normal((N, F)).astype(np.float32)
prior_mean_ = prior_mean[..., None]
A = rng.standard_normal((N, F, F)).astype(np.float32)
prior_cov = A @ np.swapaxes(A, -1, -2)
prior_prec = np.linalg.inv(prior_cov)

# Q must be a usable proposal: centre it near the prior and widen it
# (a random far-off Q degenerates the importance weights, ESS -> 1).
ap_mean = prior_mean + 0.5 * rng.standard_normal((N, F)).astype(np.float32)
ap_cov = prior_cov + 2 * np.eye(F, dtype=np.float32)

C = rng.standard_normal((N, F, F)).astype(np.float32)
like_cov = C @ np.swapaxes(C, -1, -2)
like_prec = np.linalg.inv(like_cov)

data_np = (1.5 + rng.standard_normal((N, F))).astype(np.float32)
data_ = data_np[..., None]
post_prec = prior_prec + like_prec
post_cov = np.linalg.inv(post_prec)
post_mean_ = post_cov @ (prior_prec @ prior_mean_ + like_prec @ data_)
post_mean = post_mean_.squeeze(-1)

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

tp = TestProblem(P, Q, data, moments, known_moments=known_moments, moment_K=10000)
