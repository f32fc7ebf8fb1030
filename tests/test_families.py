"""Distribution-family correctness: log_prob vs scipy.stats, sampler moments
vs analytic moments (the reference gets these for free from
torch.distributions; our JAX families need their own oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from alan_tpu.distributions import families as F

KEY = jax.random.key(0)
N = 200_000


def draw(fam, params, shape=(N,)):
    return np.asarray(fam.sample(KEY, shape, params))


def lp(fam, x, params):
    return np.asarray(fam.log_prob(jnp.asarray(x), params))


def check_lp(fam, params, sp_dist, n=50):
    x = draw(fam, params, (n,))
    ours = lp(fam, x, params)
    theirs = sp_dist.logpmf(x) if hasattr(sp_dist, "logpmf") else sp_dist.logpdf(x)
    assert np.allclose(ours, theirs, rtol=1e-4, atol=1e-4), (fam.name, ours[:3], theirs[:3])


def check_mean_var(fam, params, mean, var, rtol=0.05, atol=0.02):
    x = draw(fam, params)
    se_mean = np.sqrt(var / N)
    assert abs(x.mean() - mean) < 6 * se_mean + atol, (fam.name, x.mean(), mean)
    assert np.isclose(x.var(), var, rtol=rtol, atol=atol), (fam.name, x.var(), var)


def test_normal():
    p = {"loc": 1.5, "scale": 2.0}
    check_lp(F.Normal, p, st.norm(1.5, 2.0))
    check_mean_var(F.Normal, p, 1.5, 4.0)


def test_halfnormal():
    p = {"scale": 2.0}
    check_lp(F.HalfNormal, p, st.halfnorm(0, 2.0))
    check_mean_var(F.HalfNormal, p, 2.0 * np.sqrt(2 / np.pi), 4.0 * (1 - 2 / np.pi))


def test_cauchy():
    p = {"loc": 0.5, "scale": 1.5}
    check_lp(F.Cauchy, p, st.cauchy(0.5, 1.5))


def test_halfcauchy():
    p = {"scale": 1.5}
    check_lp(F.HalfCauchy, p, st.halfcauchy(0, 1.5))


def test_lognormal():
    p = {"loc": 0.2, "scale": 0.5}
    check_lp(F.LogNormal, p, st.lognorm(s=0.5, scale=np.exp(0.2)))
    m = np.exp(0.2 + 0.125)
    v = (np.exp(0.25) - 1) * np.exp(0.4 + 0.25)
    check_mean_var(F.LogNormal, p, m, v)


def test_uniform():
    p = {"low": -1.0, "high": 3.0}
    check_lp(F.Uniform, p, st.uniform(-1.0, 4.0))
    check_mean_var(F.Uniform, p, 1.0, 16 / 12)


def test_exponential():
    p = {"rate": 2.0}
    check_lp(F.Exponential, p, st.expon(scale=0.5))
    check_mean_var(F.Exponential, p, 0.5, 0.25)


def test_gamma():
    p = {"concentration": 3.0, "rate": 2.0}
    check_lp(F.Gamma, p, st.gamma(3.0, scale=0.5))
    check_mean_var(F.Gamma, p, 1.5, 0.75)


def test_chi2():
    p = F.Chi2.canonicalize({"df": 5.0})
    check_lp(F.Chi2, p, st.chi2(5.0))
    check_mean_var(F.Chi2, p, 5.0, 10.0)


def test_beta():
    p = {"concentration1": 2.0, "concentration0": 3.0}
    check_lp(F.Beta, p, st.beta(2.0, 3.0))
    check_mean_var(F.Beta, p, 0.4, 2 * 3 / (25 * 6))


def test_studentt():
    p = {"df": 5.0, "loc": 1.0, "scale": 2.0}
    check_lp(F.StudentT, p, st.t(5.0, 1.0, 2.0))
    check_mean_var(F.StudentT, p, 1.0, 4.0 * 5 / 3, rtol=0.1)


def test_laplace():
    p = {"loc": 0.5, "scale": 1.5}
    check_lp(F.Laplace, p, st.laplace(0.5, 1.5))
    check_mean_var(F.Laplace, p, 0.5, 2 * 1.5**2)


def test_gumbel():
    p = {"loc": 0.5, "scale": 1.5}
    check_lp(F.Gumbel, p, st.gumbel_r(0.5, 1.5))
    check_mean_var(F.Gumbel, p, 0.5 + 1.5 * np.euler_gamma, (np.pi * 1.5)**2 / 6)


def test_pareto():
    p = {"scale": 1.0, "alpha": 3.0}
    check_lp(F.Pareto, p, st.pareto(3.0))
    check_mean_var(F.Pareto, p, 1.5, 0.75, rtol=0.3)


def test_weibull():
    p = {"scale": 2.0, "concentration": 1.5}
    check_lp(F.Weibull, p, st.weibull_min(1.5, scale=2.0))


def test_kumaraswamy():
    p = {"concentration1": 2.0, "concentration0": 3.0}
    from scipy.special import beta as betafn
    m = 3.0 * betafn(1 + 1 / 2.0, 3.0)
    x = draw(F.Kumaraswamy, p)
    assert abs(x.mean() - m) < 0.01
    xs = np.linspace(0.01, 0.99, 25)
    ours = lp(F.Kumaraswamy, xs, p)
    a, b = 2.0, 3.0
    theirs = np.log(a * b) + (a - 1) * np.log(xs) + (b - 1) * np.log1p(-xs**a)
    assert np.allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_fishersnedecor():
    p = {"df1": 5.0, "df2": 8.0}
    check_lp(F.FisherSnedecor, p, st.f(5.0, 8.0))
    check_mean_var(F.FisherSnedecor, p, 8 / 6, None if False else 2 * 8**2 * 11 / (5 * 36 * 4), rtol=0.2)


def test_vonmises():
    p = {"loc": 0.5, "concentration": 2.0}
    check_lp(F.VonMises, p, st.vonmises(2.0, loc=0.5))
    from scipy.special import i0, i1
    x = draw(F.VonMises, p)
    # circular mean
    cm = np.angle(np.exp(1j * x).mean())
    assert abs(cm - 0.5) < 0.02
    r = np.abs(np.exp(1j * x).mean())
    assert abs(r - i1(2.0) / i0(2.0)) < 0.01


def test_bernoulli():
    p = {"probs": 0.3}
    check_lp(F.Bernoulli, p, st.bernoulli(0.3))
    check_mean_var(F.Bernoulli, p, 0.3, 0.21)
    p2 = {"logits": 0.7}
    pr = 1 / (1 + np.exp(-0.7))
    check_mean_var(F.Bernoulli, p2, pr, pr * (1 - pr))


def test_binomial():
    p = {"total_count": 10, "probs": 0.3}
    check_lp(F.Binomial, p, st.binom(10, 0.3))
    check_mean_var(F.Binomial, p, 3.0, 2.1)


def test_poisson():
    p = {"rate": 4.0}
    check_lp(F.Poisson, p, st.poisson(4.0))
    check_mean_var(F.Poisson, p, 4.0, 4.0)


def test_geometric():
    p = {"probs": 0.3}
    check_lp(F.Geometric, p, st.geom(0.3, loc=-1))  # torch counts failures
    check_mean_var(F.Geometric, p, 0.7 / 0.3, 0.7 / 0.09, rtol=0.1)


def test_negative_binomial():
    p = {"total_count": 5.0, "probs": 0.4}
    # torch convention: probs = success prob, pmf ∝ (1-p)^r p^x
    check_lp(F.NegativeBinomial, p, st.nbinom(5, 0.6))
    m = 5 * 0.4 / 0.6
    v = 5 * 0.4 / 0.36
    check_mean_var(F.NegativeBinomial, p, m, v, rtol=0.1)


def test_categorical():
    probs = np.array([0.2, 0.5, 0.3])
    p = {"probs": jnp.asarray(probs)}
    x = draw(F.Categorical, p)
    counts = np.bincount(x.astype(int), minlength=3) / N
    assert np.allclose(counts, probs, atol=0.01)
    ours = lp(F.Categorical, np.array([0., 1., 2.]), p)
    assert np.allclose(ours, np.log(probs), rtol=1e-5)


def test_dirichlet():
    conc = np.array([2.0, 3.0, 5.0])
    p = {"concentration": jnp.asarray(conc)}
    x = draw(F.Dirichlet, p, (N, 3))
    assert np.allclose(x.mean(0), conc / conc.sum(), atol=0.01)
    pts = np.asarray(F.Dirichlet.sample(KEY, (20, 3), p))
    ours = lp(F.Dirichlet, pts, p)
    pts64 = np.clip(pts.astype(np.float64), 1e-6, 1)
    pts64 = pts64 / pts64.sum(-1, keepdims=True)
    theirs = np.array([st.dirichlet(conc).logpdf(q) for q in pts64])
    assert np.allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_multivariate_normal():
    mean = np.array([1.0, -1.0])
    A = np.array([[2.0, 0.5], [0.5, 1.0]])
    cov = A @ A.T
    p = {"loc": jnp.asarray(mean), "covariance_matrix": jnp.asarray(cov)}
    x = draw(F.MultivariateNormal, p, (N, 2))
    assert np.allclose(x.mean(0), mean, atol=0.05)
    assert np.allclose(np.cov(x.T), cov, atol=0.1)
    pts = x[:20]
    ours = lp(F.MultivariateNormal, pts, p)
    theirs = st.multivariate_normal(mean, cov).logpdf(pts)
    assert np.allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_wishart():
    df = 5.0
    V = np.array([[1.0, 0.3], [0.3, 2.0]])
    p = {"df": df, "covariance_matrix": jnp.asarray(V)}
    x = draw(F.Wishart, p, (20000, 2, 2))
    assert np.allclose(x.mean(0), df * V, rtol=0.05)
    pts = x[:10]
    ours = lp(F.Wishart, pts, p)
    theirs = np.array([st.wishart(df, V).logpdf(q) for q in pts])
    assert np.allclose(ours, theirs, rtol=1e-3, atol=1e-3)
