"""HMC and SMC validated against analytic posteriors (the reference only
wraps external PyMC/BlackJAX baselines; here the samplers are first-class)."""
import jax
import numpy as np
import pytest

import model_linear_gaussian as m
from alan_tpu.mcmc import run_hmc, log_joint, make_logpost
from alan_tpu.smc import run_smc


def test_hmc_linear_gaussian():
    samples, diag = run_hmc(m.P, m.data, num_samples=400, num_warmup=400,
                            num_chains=4, key=jax.random.key(0))
    a = np.asarray(samples['a'].data)
    true_sd = (1 / m.post_prec) ** 0.5
    mcse = a.std() / np.sqrt(200)  # conservative ESS guess
    assert abs(a.mean() - m.post_mean) < 8 * mcse + 0.05
    assert abs(a.std() - true_sd) < 0.15
    assert diag["mean_accept"] > 0.5


def test_smc_linear_gaussian_evidence():
    samples, info = run_smc(m.P, m.data, num_particles=512, mutation_steps=8,
                            step_size=0.3, key=jax.random.key(1))
    a = np.asarray(samples['a'].data)
    assert abs(a.mean() - m.post_mean) < 0.2
    # evidence estimate close to the analytic log evidence
    assert abs(info["log_Z"] - m.known_elbo) < 1.0
    assert info["final_lambda"] == 1.0


def test_logpost_finite_grad():
    logpost, theta0, _, _ = make_logpost(m.P, m.data)
    v, g = jax.value_and_grad(logpost)(theta0)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))


def test_nuts_linear_gaussian():
    from alan_tpu.nuts import run_nuts
    samples, diag = run_nuts(m.P, m.data, num_samples=400, num_warmup=400,
                             num_chains=4, max_depth=6, key=jax.random.key(3))
    a = np.asarray(samples['a'].data)
    true_sd = (1 / m.post_prec) ** 0.5
    assert abs(a.mean() - m.post_mean) < 0.1
    assert abs(a.std() - true_sd) < 0.1
    assert diag["mean_accept"] > 0.6
    # chains agree
    assert np.abs(a.mean(axis=0) - a.mean()).max() < 0.25


def test_hmc_simplex_dirichlet_categorical():
    """Stick-breaking unconstraining: HMC recovers the Dirichlet-Categorical
    conjugate posterior."""
    import jax.numpy as jnp
    from alan_tpu import Dirichlet, Categorical, Plate, BoundPlate, named
    counts = np.array([0, 0, 1, 1, 1, 2, 2, 2, 2, 2], np.float32)
    P = Plate(p=Dirichlet(jnp.ones(3)), T=Plate(c=Categorical(probs='p')))
    Pb = BoundPlate(P, {'T': 10})
    samples, diag = run_hmc(Pb, {'c': named(jnp.asarray(counts), 'T')},
                            num_samples=500, num_warmup=500, num_chains=4,
                            key=jax.random.key(5))
    p = np.asarray(samples['p'].data)
    alpha = np.array([3., 4., 6.])
    assert np.allclose(p.mean(axis=(0, 1)), alpha / alpha.sum(), atol=0.07)


def test_hmc_lkj_correlation():
    """corr_cholesky unconstraining: HMC recovers a known correlation under
    an LKJ prior."""
    import jax.numpy as jnp
    from alan_tpu import LKJCholesky, MultivariateNormal, Plate, BoundPlate, named
    rng = np.random.default_rng(0)
    true_L = np.linalg.cholesky(np.array([[1., .7], [.7, 1.]]))
    N = 200
    obs = (rng.standard_normal((N, 2)) @ true_L.T).astype(np.float32)
    P = Plate(L=LKJCholesky(2, 2.0),
              T=Plate(y=MultivariateNormal(jnp.zeros(2), scale_tril='L')))
    Pb = BoundPlate(P, {'T': N})
    samples, diag = run_hmc(Pb, {'y': named(jnp.asarray(obs), 'T')},
                            num_samples=300, num_warmup=300, num_chains=4,
                            key=jax.random.key(0))
    Ls = np.asarray(samples['L'].data)
    corr = (Ls @ np.swapaxes(Ls, -1, -2))[..., 0, 1]
    assert abs(corr.mean() - 0.7) < 0.1
