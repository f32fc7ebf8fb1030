"""Kalman-checkable AR(1) timeseries (parity: reference
``tests/timeseries.py`` — disabled there, enabled here: the TPU build's
FFBS/associative-chain path is exact)."""
import numpy as np
import jax.numpy as jnp
from jax.scipy.stats import multivariate_normal
from alan_tpu import Normal, Timeseries, Plate, BoundPlate, Data, mean, named
from testproblem import TestProblem

T = 4
A = 0.9
init_scale = 1.
ts_noise_scale = 0.1
obs_noise_scale = 1.

init_var = init_scale**2
ts_noise_var = ts_noise_scale**2
obs_noise_var = obs_noise_scale**2

P = Plate(
    init=Normal(0, init_scale),
    T=Plate(
        ts=Timeseries("init", Normal(lambda prev: A * prev, ts_noise_scale)),
        obs=Normal('ts', obs_noise_scale),
    ),
)

Q = Plate(
    init=Normal(0, 1),
    T=Plate(
        ts=Normal(0, 1),
        obs=Data(),
    ),
)

prior_cov = np.zeros((T, T))
diag_var = init_var
for i in range(T):
    diag_var = diag_var * A**2 + ts_noise_var
    future = diag_var * A ** np.arange(T - i)
    prior_cov[i, i:] = future
    prior_cov[i:, i] = future

rng = np.random.default_rng(12)
full_cov = prior_cov + obs_noise_var * np.eye(T)
data_ts = np.linalg.cholesky(full_cov) @ rng.standard_normal(T)
known_elbo = float(multivariate_normal.logpdf(
    jnp.asarray(data_ts), jnp.zeros(T), jnp.asarray(full_cov)))

like_prec = np.eye(T) / obs_noise_var
prior_prec = np.linalg.inv(prior_cov)
post_prec = prior_prec + like_prec
post_cov = np.linalg.inv(post_prec)
post_mean = post_cov @ like_prec @ data_ts

all_platesizes = {'T': T}
P = BoundPlate(P, all_platesizes)
Q = BoundPlate(Q, all_platesizes)

data = {'obs': named(jnp.asarray(data_ts, jnp.float32), 'T')}

moments = [('ts', mean)]
known_moments = {('ts', mean): named(jnp.asarray(post_mean, jnp.float32), 'T')}

tp = TestProblem(
    P, Q, data, moments,
    known_moments=known_moments,
    moment_K=1000,
    elbo_K=1000,
    known_elbo=known_elbo,
)
