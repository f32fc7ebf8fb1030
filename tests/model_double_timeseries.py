"""Two INDEPENDENT (ungrouped) AR(1) timeseries in one plate, observed
through their sum — Kalman-checkable.

Exercises the joint multi-K-group chain contraction (reference
``logpq.py:133-146`` flattens the K_inits/K_currs lists into joint axes) and
the joint FFBS posterior-index sampling: each timeseries has its own K-dim,
so the ELBO must contract the [T, K1·K2, K1·K2] joint operator and
importance sampling must smooth the joint particle chain.
"""
import numpy as np
import jax.numpy as jnp
from jax.scipy.stats import multivariate_normal
from alan_tpu import Normal, Timeseries, Plate, BoundPlate, Data, mean, named
from testproblem import TestProblem

T = 4
A1, A2 = 0.9, 0.5
init_scale = 1.
ts_noise_scale = 0.4
obs_noise_scale = 1.

init_var = init_scale**2
ts_noise_var = ts_noise_scale**2
obs_noise_var = obs_noise_scale**2

P = Plate(
    init1=Normal(0, init_scale),
    init2=Normal(0, init_scale),
    T=Plate(
        ts1=Timeseries("init1", Normal(lambda prev: A1 * prev, ts_noise_scale)),
        ts2=Timeseries("init2", Normal(lambda prev: A2 * prev, ts_noise_scale)),
        obs=Normal(lambda ts1, ts2: ts1 + ts2, obs_noise_scale),
    ),
)

Q = Plate(
    init1=Normal(0, 1),
    init2=Normal(0, 1),
    T=Plate(
        ts1=Normal(0, 1),
        ts2=Normal(0, 1),
        obs=Data(),
    ),
)


def _ar1_cov(A):
    """Cov of [x_1..x_T] with x_1 = A·init + ε, x_t = A·x_{t-1} + ε."""
    cov = np.zeros((T, T))
    diag_var = init_var
    for i in range(T):
        diag_var = diag_var * A**2 + ts_noise_var
        future = diag_var * A ** np.arange(T - i)
        cov[i, i:] = future
        cov[i:, i] = future
    return cov


C1, C2 = _ar1_cov(A1), _ar1_cov(A2)
S = C1 + C2 + obs_noise_var * np.eye(T)

rng = np.random.default_rng(21)
data_ts = np.linalg.cholesky(S) @ rng.standard_normal(T)
known_elbo = float(multivariate_normal.logpdf(
    jnp.asarray(data_ts), jnp.zeros(T), jnp.asarray(S)))

# posterior means: E[ts_i | y] = C_i S^{-1} y  (y = ts1 + ts2 + noise)
Sinv_y = np.linalg.solve(S, data_ts)
post_mean1 = C1 @ Sinv_y
post_mean2 = C2 @ Sinv_y

all_platesizes = {'T': T}
P = BoundPlate(P, all_platesizes)
Q = BoundPlate(Q, all_platesizes)

data = {'obs': named(jnp.asarray(data_ts, jnp.float32), 'T')}

moments = [('ts1', mean), ('ts2', mean)]
known_moments = {
    ('ts1', mean): named(jnp.asarray(post_mean1, jnp.float32), 'T'),
    ('ts2', mean): named(jnp.asarray(post_mean2, jnp.float32), 'T'),
}

# NOTE: two UNGROUPED timeseries contract over the joint product state
# space — [T, K^2, K^2] operators, O(K^4) memory — so K stays small here
# (that cost is semantic, matching the reference; Group the timeseries to
# get back to O(K^2)).
tp = TestProblem(
    P, Q, data, moments,
    known_moments=known_moments,
    moment_K=30,
    elbo_K=30,
    elbo_gap_cat=3,
    elbo_gap_perm=3,
    known_elbo=known_elbo,
)
