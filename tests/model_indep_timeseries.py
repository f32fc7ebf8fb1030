"""Three INDEPENDENT (ungrouped) AR(1) timeseries in one plate, each with
its own observation — Kalman-checkable.

Nothing couples the chains, so the factor-component decomposition
(``reduce_ks.factor_components``) must contract and smooth them separately:
3·O(T·K²) instead of the joint O(T·K⁶) — at the zoo's K=30 the joint chain
operator would be [T, 27000, 27000] (≈3·10⁹ elements), so this model running
in the suite at all is evidence the decomposition engages.  The reference
always builds the joint (``logpq.py:133-146``).
"""
import numpy as np
import jax.numpy as jnp
from jax.scipy.stats import multivariate_normal
from alan_tpu import Normal, Timeseries, Plate, BoundPlate, Data, mean, named
from testproblem import TestProblem

T = 4
AS = [0.9, 0.5, -0.7]
init_scale = 1.
ts_noise_scale = 0.4
obs_noise_scale = 1.

init_var = init_scale**2
ts_noise_var = ts_noise_scale**2
obs_noise_var = obs_noise_scale**2

P = Plate(
    init1=Normal(0, init_scale),
    init2=Normal(0, init_scale),
    init3=Normal(0, init_scale),
    T=Plate(
        ts1=Timeseries("init1", Normal(lambda prev: AS[0] * prev, ts_noise_scale)),
        ts2=Timeseries("init2", Normal(lambda prev: AS[1] * prev, ts_noise_scale)),
        ts3=Timeseries("init3", Normal(lambda prev: AS[2] * prev, ts_noise_scale)),
        obs1=Normal("ts1", obs_noise_scale),
        obs2=Normal("ts2", obs_noise_scale),
        obs3=Normal("ts3", obs_noise_scale),
    ),
)

Q = Plate(
    init1=Normal(0, 1),
    init2=Normal(0, 1),
    init3=Normal(0, 1),
    T=Plate(
        ts1=Normal(0, 1),
        ts2=Normal(0, 1),
        ts3=Normal(0, 1),
        obs1=Data(),
        obs2=Data(),
        obs3=Data(),
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


rng = np.random.default_rng(33)
data = {}
known_elbo = 0.0
known_moments = {}
moments = []
for i, A in enumerate(AS, start=1):
    C = _ar1_cov(A)
    S = C + obs_noise_var * np.eye(T)
    y = np.linalg.cholesky(S) @ rng.standard_normal(T)
    data[f"obs{i}"] = named(jnp.asarray(y, jnp.float32), "T")
    known_elbo += float(multivariate_normal.logpdf(
        jnp.asarray(y), jnp.zeros(T), jnp.asarray(S)))
    post_mean = C @ np.linalg.solve(S, y)
    moments.append((f"ts{i}", mean))
    known_moments[(f"ts{i}", mean)] = named(
        jnp.asarray(post_mean, jnp.float32), "T")

all_platesizes = {'T': T}
P = BoundPlate(P, all_platesizes)
Q = BoundPlate(Q, all_platesizes)

tp = TestProblem(
    P, Q, data, moments,
    known_moments=known_moments,
    moment_K=30,
    elbo_K=30,
    elbo_gap_cat=3,
    elbo_gap_perm=3,
    known_elbo=known_elbo,
)
