"""Distribution families in pure JAX.

The reference delegates all distribution math to ``torch.distributions``
(C++/ATen kernels; see reference ``src/alan/dist.py:323-359`` for the table
of 35 wrapped families).  Here each family is implemented directly on
``jax.numpy`` + ``jax.random`` so sampling and log-probs trace into a single
XLA program (and fuse with the downstream log-space contraction).

Every family declares:
  - ``args``:   ordered parameter signature (name -> default), mirroring the
                torch constructor so positional binding matches the reference.
  - ``arg_event_ndim``: event rank of each parameter.
  - ``event_ndim``: event rank of a sample.
  - ``support``: a string token; P/Q support-equality checking
                 (reference ``checking.py:29-36``) compares these.
  - ``sample(key, shape, params)``: draw of the given full shape
                 (shape includes event dims; params broadcast right-aligned).
  - ``log_prob(x, params)``: log-density with event dims reduced.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


class Family:
    name: str = ""
    args: tuple = ()              # tuple of (argname, default); default=None means required-ish
    arg_event_ndim: dict = {}
    event_ndim: int = 0
    has_rsample: bool = True
    discrete: bool = False
    support: str = "real"

    @classmethod
    def bind_args(cls, args, kwargs):
        """Map positional/keyword user args onto parameter names (mirrors
        ``inspect.signature(dist).bind`` in reference ``dist.py:139``)."""
        names = [a for a, _ in cls.args]
        if len(args) > len(names):
            raise TypeError(f"{cls.name}: too many positional args")
        bound = dict(zip(names, args))
        for k, v in kwargs.items():
            if k not in names:
                raise TypeError(f"{cls.name}: unexpected arg {k}")
            if k in bound:
                raise TypeError(f"{cls.name}: duplicate arg {k}")
            bound[k] = v
        return bound

    @classmethod
    def canonicalize(cls, params: dict) -> dict:
        """Optionally rewrite params (e.g. logits -> probs)."""
        return params

    @classmethod
    def event_shape(cls, params) -> tuple | None:
        """Event shape when it isn't derivable from parameter shapes
        (None = infer from params, the common case)."""
        return None

    # subclasses implement:
    @classmethod
    def sample(cls, key, shape, params):
        raise NotImplementedError(cls.name)

    @classmethod
    def log_prob(cls, x, params):
        raise NotImplementedError(cls.name)


def _xlogy(x, y):
    return jsp.xlogy(x, y)


def _u(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype=dtype, minval=jnp.finfo(dtype).tiny)


# --------------------------------------------------------------------------
# Continuous univariate
# --------------------------------------------------------------------------

class Normal(Family):
    name = "Normal"
    args = (("loc", None), ("scale", None))
    arg_event_ndim = {"loc": 0, "scale": 0}
    support = "real"

    @classmethod
    def sample(cls, key, shape, p):
        return p["loc"] + p["scale"] * jax.random.normal(key, shape)

    @classmethod
    def log_prob(cls, x, p):
        z = (x - p["loc"]) / p["scale"]
        return -0.5 * z * z - jnp.log(p["scale"]) - _HALF_LOG_2PI


class HalfNormal(Family):
    name = "HalfNormal"
    args = (("scale", None),)
    arg_event_ndim = {"scale": 0}
    support = "positive"

    @classmethod
    def sample(cls, key, shape, p):
        return jnp.abs(p["scale"] * jax.random.normal(key, shape))

    @classmethod
    def log_prob(cls, x, p):
        z = x / p["scale"]
        lp = -0.5 * z * z - jnp.log(p["scale"]) - _HALF_LOG_2PI + math.log(2.0)
        return jnp.where(x >= 0, lp, -jnp.inf)


class Cauchy(Family):
    name = "Cauchy"
    args = (("loc", None), ("scale", None))
    arg_event_ndim = {"loc": 0, "scale": 0}
    support = "real"

    @classmethod
    def sample(cls, key, shape, p):
        return p["loc"] + p["scale"] * jax.random.cauchy(key, shape)

    @classmethod
    def log_prob(cls, x, p):
        z = (x - p["loc"]) / p["scale"]
        return -jnp.log1p(z * z) - jnp.log(p["scale"]) - math.log(math.pi)


class HalfCauchy(Family):
    name = "HalfCauchy"
    args = (("scale", None),)
    arg_event_ndim = {"scale": 0}
    support = "positive"

    @classmethod
    def sample(cls, key, shape, p):
        return jnp.abs(p["scale"] * jax.random.cauchy(key, shape))

    @classmethod
    def log_prob(cls, x, p):
        z = x / p["scale"]
        lp = -jnp.log1p(z * z) - jnp.log(p["scale"]) + math.log(2.0 / math.pi)
        return jnp.where(x >= 0, lp, -jnp.inf)


class LogNormal(Family):
    name = "LogNormal"
    args = (("loc", None), ("scale", None))
    arg_event_ndim = {"loc": 0, "scale": 0}
    support = "positive"

    @classmethod
    def sample(cls, key, shape, p):
        return jnp.exp(p["loc"] + p["scale"] * jax.random.normal(key, shape))

    @classmethod
    def log_prob(cls, x, p):
        lx = jnp.log(x)
        z = (lx - p["loc"]) / p["scale"]
        return -0.5 * z * z - jnp.log(p["scale"]) - _HALF_LOG_2PI - lx


class Uniform(Family):
    name = "Uniform"
    args = (("low", None), ("high", None))
    arg_event_ndim = {"low": 0, "high": 0}
    support = "interval"

    @classmethod
    def sample(cls, key, shape, p):
        return p["low"] + (p["high"] - p["low"]) * jax.random.uniform(key, shape)

    @classmethod
    def log_prob(cls, x, p):
        inside = (x >= p["low"]) & (x <= p["high"])
        return jnp.where(inside, -jnp.log(p["high"] - p["low"]), -jnp.inf)


class Exponential(Family):
    name = "Exponential"
    args = (("rate", None),)
    arg_event_ndim = {"rate": 0}
    support = "positive"

    @classmethod
    def sample(cls, key, shape, p):
        return jax.random.exponential(key, shape) / p["rate"]

    @classmethod
    def log_prob(cls, x, p):
        return jnp.log(p["rate"]) - p["rate"] * x


class Gamma(Family):
    name = "Gamma"
    args = (("concentration", None), ("rate", None))
    arg_event_ndim = {"concentration": 0, "rate": 0}
    support = "positive"

    @classmethod
    def sample(cls, key, shape, p):
        a = jnp.broadcast_to(p["concentration"], shape)
        return jax.random.gamma(key, a, shape) / p["rate"]

    @classmethod
    def log_prob(cls, x, p):
        a, b = p["concentration"], p["rate"]
        return _xlogy(a, b) + _xlogy(a - 1.0, x) - b * x - jsp.gammaln(a)


class Chi2(Gamma):
    name = "Chi2"
    args = (("df", None),)
    arg_event_ndim = {"df": 0}
    support = "positive"

    @classmethod
    def canonicalize(cls, p):
        if "df" in p:
            return {"concentration": p["df"] / 2.0, "rate": 0.5}
        return p


class Beta(Family):
    name = "Beta"
    args = (("concentration1", None), ("concentration0", None))
    arg_event_ndim = {"concentration1": 0, "concentration0": 0}
    support = "unit_interval"

    @classmethod
    def sample(cls, key, shape, p):
        a = jnp.broadcast_to(jnp.asarray(p["concentration1"], jnp.float32), shape)
        b = jnp.broadcast_to(jnp.asarray(p["concentration0"], jnp.float32), shape)
        return jax.random.beta(key, a, b, shape)

    @classmethod
    def log_prob(cls, x, p):
        a, b = p["concentration1"], p["concentration0"]
        return (_xlogy(a - 1.0, x) + _xlogy(b - 1.0, 1.0 - x)
                - (jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b)))


class StudentT(Family):
    name = "StudentT"
    args = (("df", None), ("loc", 0.0), ("scale", 1.0))
    arg_event_ndim = {"df": 0, "loc": 0, "scale": 0}
    support = "real"

    @classmethod
    def sample(cls, key, shape, p):
        df = jnp.broadcast_to(jnp.asarray(p["df"], jnp.float32), shape)
        return p["loc"] + p["scale"] * jax.random.t(key, df, shape)

    @classmethod
    def log_prob(cls, x, p):
        df, loc, scale = p["df"], p["loc"], p["scale"]
        z = (x - loc) / scale
        return (jsp.gammaln((df + 1.0) / 2.0) - jsp.gammaln(df / 2.0)
                - 0.5 * jnp.log(df * math.pi) - jnp.log(scale)
                - 0.5 * (df + 1.0) * jnp.log1p(z * z / df))


class Laplace(Family):
    name = "Laplace"
    args = (("loc", None), ("scale", None))
    arg_event_ndim = {"loc": 0, "scale": 0}
    support = "real"

    @classmethod
    def sample(cls, key, shape, p):
        return p["loc"] + p["scale"] * jax.random.laplace(key, shape)

    @classmethod
    def log_prob(cls, x, p):
        return -jnp.abs(x - p["loc"]) / p["scale"] - jnp.log(2.0 * p["scale"])


class Gumbel(Family):
    name = "Gumbel"
    args = (("loc", None), ("scale", None))
    arg_event_ndim = {"loc": 0, "scale": 0}
    support = "real"

    @classmethod
    def sample(cls, key, shape, p):
        return p["loc"] + p["scale"] * jax.random.gumbel(key, shape)

    @classmethod
    def log_prob(cls, x, p):
        z = (x - p["loc"]) / p["scale"]
        return -(z + jnp.exp(-z)) - jnp.log(p["scale"])


class Kumaraswamy(Family):
    name = "Kumaraswamy"
    args = (("concentration1", None), ("concentration0", None))
    arg_event_ndim = {"concentration1": 0, "concentration0": 0}
    support = "unit_interval"

    @classmethod
    def sample(cls, key, shape, p):
        a, b = p["concentration1"], p["concentration0"]
        u = _u(key, shape)
        return (1.0 - u ** (1.0 / b)) ** (1.0 / a)

    @classmethod
    def log_prob(cls, x, p):
        a, b = p["concentration1"], p["concentration0"]
        return (jnp.log(a) + jnp.log(b) + _xlogy(a - 1.0, x)
                + _xlogy(b - 1.0, 1.0 - x ** a))


class Pareto(Family):
    name = "Pareto"
    args = (("scale", None), ("alpha", None))
    arg_event_ndim = {"scale": 0, "alpha": 0}
    support = "positive"

    @classmethod
    def sample(cls, key, shape, p):
        u = _u(key, shape)
        return p["scale"] * u ** (-1.0 / p["alpha"])

    @classmethod
    def log_prob(cls, x, p):
        s, a = p["scale"], p["alpha"]
        lp = jnp.log(a) + a * jnp.log(s) - (a + 1.0) * jnp.log(x)
        return jnp.where(x >= s, lp, -jnp.inf)


class Weibull(Family):
    name = "Weibull"
    args = (("scale", None), ("concentration", None))
    arg_event_ndim = {"scale": 0, "concentration": 0}
    support = "positive"

    @classmethod
    def sample(cls, key, shape, p):
        u = _u(key, shape)
        return p["scale"] * (-jnp.log(u)) ** (1.0 / p["concentration"])

    @classmethod
    def log_prob(cls, x, p):
        s, k = p["scale"], p["concentration"]
        z = x / s
        return jnp.log(k / s) + _xlogy(k - 1.0, z) - z ** k


class FisherSnedecor(Family):
    name = "FisherSnedecor"
    args = (("df1", None), ("df2", None))
    arg_event_ndim = {"df1": 0, "df2": 0}
    support = "positive"

    @classmethod
    def sample(cls, key, shape, p):
        k1, k2 = jax.random.split(key)
        d1 = jnp.broadcast_to(jnp.asarray(p["df1"], jnp.float32), shape)
        d2 = jnp.broadcast_to(jnp.asarray(p["df2"], jnp.float32), shape)
        x1 = 2.0 * jax.random.gamma(k1, d1 / 2.0, shape)
        x2 = 2.0 * jax.random.gamma(k2, d2 / 2.0, shape)
        return (x1 / d1) / (x2 / d2)

    @classmethod
    def log_prob(cls, x, p):
        d1, d2 = p["df1"], p["df2"]
        return (0.5 * d1 * jnp.log(d1) + 0.5 * d2 * jnp.log(d2)
                + (0.5 * d1 - 1.0) * jnp.log(x)
                - 0.5 * (d1 + d2) * jnp.log(d2 + d1 * x)
                - (jsp.gammaln(d1 / 2.0) + jsp.gammaln(d2 / 2.0)
                   - jsp.gammaln((d1 + d2) / 2.0)))


class VonMises(Family):
    name = "VonMises"
    args = (("loc", None), ("concentration", None))
    arg_event_ndim = {"loc": 0, "concentration": 0}
    support = "circular"
    has_rsample = False

    @classmethod
    def sample(cls, key, shape, p):
        # Best-Fisher rejection, run a fixed number of rounds (compiled-friendly).
        kappa = jnp.broadcast_to(jnp.asarray(p["concentration"], jnp.float32), shape)
        tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa ** 2)
        rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kappa)
        r = (1.0 + rho ** 2) / (2.0 * rho)

        def body(c, k):
            accepted, val = c
            k1, k2, k3 = jax.random.split(k, 3)
            u1 = jax.random.uniform(k1, shape)
            u2 = jax.random.uniform(k2, shape)
            u3 = jax.random.uniform(k3, shape)
            z = jnp.cos(math.pi * u1)
            f = (1.0 + r * z) / (r + z)
            c_ = kappa * (r - f)
            accept = (c_ * (2.0 - c_) - u2 > 0) | (jnp.log(c_ / u2) + 1.0 - c_ >= 0)
            new_val = jnp.sign(u3 - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
            val = jnp.where(accepted, val, jnp.where(accept, new_val, val))
            accepted = accepted | accept
            return (accepted, val), None

        keys = jax.random.split(key, 32)
        (_, val), _ = jax.lax.scan(body, (jnp.zeros(shape, bool), jnp.zeros(shape)), keys)
        out = val + p["loc"]
        return jnp.arctan2(jnp.sin(out), jnp.cos(out))

    @classmethod
    def log_prob(cls, x, p):
        kappa = p["concentration"]
        return (kappa * jnp.cos(x - p["loc"]) - math.log(2.0 * math.pi)
                - jnp.log(jsp.i0e(kappa)) - kappa)


# --------------------------------------------------------------------------
# Discrete
# --------------------------------------------------------------------------

def _probs_logits(p):
    """Return (probs, logits) from a param dict with either given."""
    probs = p.get("probs")
    logits = p.get("logits")
    if (probs is None) == (logits is None):
        raise ValueError("provide exactly one of probs/logits")
    if probs is None:
        probs = jax.nn.sigmoid(logits)
    else:
        probs = jnp.asarray(probs, jnp.float32)
        logits = jnp.log(probs) - jnp.log1p(-probs)
    return probs, logits


class Bernoulli(Family):
    name = "Bernoulli"
    args = (("probs", None), ("logits", None))
    arg_event_ndim = {"probs": 0, "logits": 0}
    support = "boolean"
    discrete = True
    has_rsample = False

    @classmethod
    def sample(cls, key, shape, p):
        probs, _ = _probs_logits(p)
        return jax.random.bernoulli(key, jnp.broadcast_to(probs, shape), shape).astype(jnp.float32)

    @classmethod
    def log_prob(cls, x, p):
        _, logits = _probs_logits(p)
        return x * logits - jax.nn.softplus(logits)


class ContinuousBernoulli(Family):
    name = "ContinuousBernoulli"
    args = (("probs", None), ("logits", None))
    arg_event_ndim = {"probs": 0, "logits": 0}
    support = "unit_interval"
    discrete = False

    @classmethod
    def _log_norm(cls, probs):
        # log C(p); C(p) = 2 atanh(1-2p)/(1-2p) for p != .5, -> 2 at p=.5
        near_half = jnp.abs(probs - 0.5) < 1e-4
        safe = jnp.where(near_half, 0.4, probs)
        c = 2.0 * jnp.arctanh(1.0 - 2.0 * safe) / (1.0 - 2.0 * safe)
        taylor = 2.0 + (4.0 / 3.0) * (probs - 0.5) ** 2
        return jnp.log(jnp.where(near_half, taylor, c))

    @classmethod
    def sample(cls, key, shape, p):
        probs, logits = _probs_logits(p)
        u = _u(key, shape)
        near_half = jnp.abs(probs - 0.5) < 1e-4
        safe = jnp.where(near_half, 0.4, probs)
        # inverse CDF
        x = (jnp.log1p(u * (2.0 * safe - 1.0) / (1.0 - safe))
             / (jnp.log(safe) - jnp.log1p(-safe)))
        return jnp.where(near_half, u, x)

    @classmethod
    def log_prob(cls, x, p):
        probs, logits = _probs_logits(p)
        return x * logits + jnp.log1p(-probs) + cls._log_norm(probs)


class Binomial(Family):
    name = "Binomial"
    args = (("total_count", 1), ("probs", None), ("logits", None))
    arg_event_ndim = {"total_count": 0, "probs": 0, "logits": 0}
    support = "nonneg_int"
    discrete = True
    has_rsample = False

    @classmethod
    def sample(cls, key, shape, p):
        probs, _ = _probs_logits(p)
        n = jnp.broadcast_to(jnp.asarray(p["total_count"], jnp.float32), shape)
        return jax.random.binomial(key, n, jnp.broadcast_to(probs, shape), shape)

    @classmethod
    def log_prob(cls, x, p):
        probs, logits = _probs_logits(p)
        n = jnp.asarray(p["total_count"], jnp.float32)
        log_comb = jsp.gammaln(n + 1.0) - jsp.gammaln(x + 1.0) - jsp.gammaln(n - x + 1.0)
        return log_comb + x * logits - n * jax.nn.softplus(logits)


class Poisson(Family):
    name = "Poisson"
    args = (("rate", None),)
    arg_event_ndim = {"rate": 0}
    support = "nonneg_int"
    discrete = True
    has_rsample = False

    @classmethod
    def sample(cls, key, shape, p):
        lam = jnp.broadcast_to(jnp.asarray(p["rate"], jnp.float32), shape)
        return jax.random.poisson(key, lam, shape).astype(jnp.float32)

    @classmethod
    def log_prob(cls, x, p):
        lam = p["rate"]
        return _xlogy(x, lam) - lam - jsp.gammaln(x + 1.0)


class Geometric(Family):
    name = "Geometric"
    args = (("probs", None), ("logits", None))
    arg_event_ndim = {"probs": 0, "logits": 0}
    support = "nonneg_int"
    discrete = True
    has_rsample = False

    @classmethod
    def sample(cls, key, shape, p):
        probs, _ = _probs_logits(p)
        u = _u(key, shape)
        return jnp.floor(jnp.log(u) / jnp.log1p(-jnp.broadcast_to(probs, shape)))

    @classmethod
    def log_prob(cls, x, p):
        probs, _ = _probs_logits(p)
        return _xlogy(x, 1.0 - probs) + jnp.log(probs)


class NegativeBinomial(Family):
    name = "NegativeBinomial"
    args = (("total_count", None), ("probs", None), ("logits", None))
    arg_event_ndim = {"total_count": 0, "probs": 0, "logits": 0}
    support = "nonneg_int"
    discrete = True
    has_rsample = False

    @classmethod
    def sample(cls, key, shape, p):
        # Gamma-Poisson mixture; torch convention: probs = success prob,
        # pmf(x) ∝ (1-p)^r p^x  =>  lambda ~ Gamma(r, (1-p)/p).
        probs, _ = _probs_logits(p)
        r = jnp.broadcast_to(jnp.asarray(p["total_count"], jnp.float32), shape)
        k1, k2 = jax.random.split(key)
        lam = jax.random.gamma(k1, r, shape) * (jnp.broadcast_to(probs, shape) / (1.0 - jnp.broadcast_to(probs, shape)))
        return jax.random.poisson(k2, lam, shape).astype(jnp.float32)

    @classmethod
    def log_prob(cls, x, p):
        probs, _ = _probs_logits(p)
        r = jnp.asarray(p["total_count"], jnp.float32)
        return (jsp.gammaln(x + r) - jsp.gammaln(r) - jsp.gammaln(x + 1.0)
                + _xlogy(r, 1.0 - probs) + _xlogy(x, probs))


def _cat_probs_logits(p):
    probs = p.get("probs")
    logits = p.get("logits")
    if (probs is None) == (logits is None):
        raise ValueError("provide exactly one of probs/logits")
    if probs is None:
        logits = logits - jsp.logsumexp(logits, axis=-1, keepdims=True)
        probs = jnp.exp(logits)
    else:
        probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
        logits = jnp.log(probs)
    return probs, logits


class Categorical(Family):
    name = "Categorical"
    args = (("probs", None), ("logits", None))
    arg_event_ndim = {"probs": 1, "logits": 1}
    event_ndim = 0
    support = "int"
    discrete = True
    has_rsample = False

    @classmethod
    def sample(cls, key, shape, p):
        _, logits = _cat_probs_logits(p)
        logits = jnp.broadcast_to(logits, shape + logits.shape[-1:])
        return jax.random.categorical(key, logits, axis=-1).astype(jnp.float32)

    @classmethod
    def log_prob(cls, x, p):
        _, logits = _cat_probs_logits(p)
        xi = x.astype(jnp.int32)
        b = jnp.broadcast_shapes(xi.shape, logits.shape[:-1])
        logits = jnp.broadcast_to(logits, b + logits.shape[-1:])
        xi = jnp.broadcast_to(xi, b)
        return jnp.take_along_axis(logits, xi[..., None], axis=-1)[..., 0]


class OneHotCategorical(Family):
    name = "OneHotCategorical"
    args = (("probs", None), ("logits", None))
    arg_event_ndim = {"probs": 1, "logits": 1}
    event_ndim = 1
    support = "one_hot"
    discrete = True
    has_rsample = False

    @classmethod
    def sample(cls, key, shape, p):
        _, logits = _cat_probs_logits(p)
        n = shape[-1]
        logits = jnp.broadcast_to(logits, shape)
        idx = jax.random.categorical(key, logits, axis=-1)
        return jax.nn.one_hot(idx, n)

    @classmethod
    def log_prob(cls, x, p):
        _, logits = _cat_probs_logits(p)
        return jnp.sum(x * logits, axis=-1)


class Multinomial(Family):
    name = "Multinomial"
    args = (("total_count", 1), ("probs", None), ("logits", None))
    arg_event_ndim = {"total_count": 0, "probs": 1, "logits": 1}
    event_ndim = 1
    support = "multinomial"
    discrete = True
    has_rsample = False

    @classmethod
    def sample(cls, key, shape, p):
        probs, logits = _cat_probs_logits(p)
        n = int(p["total_count"])
        logits = jnp.broadcast_to(logits, shape)
        idx = jax.random.categorical(key, logits[..., None, :], axis=-1,
                                     shape=shape[:-1] + (n,))
        return jax.nn.one_hot(idx, shape[-1]).sum(-2)

    @classmethod
    def log_prob(cls, x, p):
        _, logits = _cat_probs_logits(p)
        n = jnp.sum(x, axis=-1)
        return (jsp.gammaln(n + 1.0) - jnp.sum(jsp.gammaln(x + 1.0), axis=-1)
                + jnp.sum(x * logits, axis=-1))


# --------------------------------------------------------------------------
# Multivariate continuous
# --------------------------------------------------------------------------

class Dirichlet(Family):
    name = "Dirichlet"
    args = (("concentration", None),)
    arg_event_ndim = {"concentration": 1}
    event_ndim = 1
    support = "simplex"

    @classmethod
    def sample(cls, key, shape, p):
        a = jnp.broadcast_to(jnp.asarray(p["concentration"], jnp.float32), shape)
        g = jax.random.gamma(key, a, shape)
        return g / jnp.sum(g, axis=-1, keepdims=True)

    @classmethod
    def log_prob(cls, x, p):
        a = p["concentration"]
        return (jnp.sum(_xlogy(a - 1.0, x), axis=-1)
                + jsp.gammaln(jnp.sum(a, axis=-1))
                - jnp.sum(jsp.gammaln(a), axis=-1))


class MultivariateNormal(Family):
    name = "MultivariateNormal"
    args = (("loc", None), ("covariance_matrix", None), ("precision_matrix", None),
            ("scale_tril", None))
    arg_event_ndim = {"loc": 1, "covariance_matrix": 2, "precision_matrix": 2,
                      "scale_tril": 2}
    event_ndim = 1
    support = "real_vector"

    @classmethod
    def _chol(cls, p):
        if p.get("scale_tril") is not None:
            return p["scale_tril"]
        if p.get("covariance_matrix") is not None:
            return jnp.linalg.cholesky(p["covariance_matrix"])
        if p.get("precision_matrix") is not None:
            prec_chol = jnp.linalg.cholesky(p["precision_matrix"])
            eye = jnp.eye(prec_chol.shape[-1], dtype=prec_chol.dtype)
            inv = jax.scipy.linalg.solve_triangular(prec_chol, eye, lower=True)
            return jnp.swapaxes(inv, -1, -2)
        raise ValueError("MultivariateNormal needs one of covariance_matrix/"
                         "precision_matrix/scale_tril")

    @classmethod
    def sample(cls, key, shape, p):
        L = cls._chol(p)
        eps = jax.random.normal(key, shape)
        return p["loc"] + jnp.einsum("...ij,...j->...i", jnp.broadcast_to(L, shape + L.shape[-1:]), eps)

    @classmethod
    def log_prob(cls, x, p):
        L = cls._chol(p)
        d = x.shape[-1]
        diff = x - p["loc"]
        bshape = jnp.broadcast_shapes(diff.shape[:-1], L.shape[:-2])
        Lb = jnp.broadcast_to(L, bshape + L.shape[-2:])
        diffb = jnp.broadcast_to(diff, bshape + diff.shape[-1:])
        sol = jax.scipy.linalg.solve_triangular(Lb, diffb[..., None], lower=True)[..., 0]
        maha = jnp.sum(sol * sol, axis=-1)
        logdet = jnp.sum(jnp.log(jnp.diagonal(Lb, axis1=-2, axis2=-1)), axis=-1)
        return -0.5 * maha - logdet - d * _HALF_LOG_2PI


class LowRankMultivariateNormal(Family):
    name = "LowRankMultivariateNormal"
    args = (("loc", None), ("cov_factor", None), ("cov_diag", None))
    arg_event_ndim = {"loc": 1, "cov_factor": 2, "cov_diag": 1}
    event_ndim = 1
    support = "real_vector"

    @classmethod
    def _cov(cls, p):
        W = p["cov_factor"]
        return W @ jnp.swapaxes(W, -1, -2) + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(p["cov_diag"])

    @classmethod
    def sample(cls, key, shape, p):
        return MultivariateNormal.sample(key, shape, {"loc": p["loc"], "covariance_matrix": cls._cov(p)})

    @classmethod
    def log_prob(cls, x, p):
        return MultivariateNormal.log_prob(x, {"loc": p["loc"], "covariance_matrix": cls._cov(p)})


# --------------------------------------------------------------------------
# Relaxed / reparameterised discrete
# --------------------------------------------------------------------------

class LogitRelaxedBernoulli(Family):
    name = "LogitRelaxedBernoulli"
    args = (("temperature", None), ("probs", None), ("logits", None))
    arg_event_ndim = {"temperature": 0, "probs": 0, "logits": 0}
    support = "real"

    @classmethod
    def sample(cls, key, shape, p):
        _, logits = _probs_logits(p)
        u = _u(key, shape)
        l = jnp.log(u) - jnp.log1p(-u)
        return (logits + l) / p["temperature"]

    @classmethod
    def log_prob(cls, x, p):
        _, logits = _probs_logits(p)
        t = p["temperature"]
        diff = logits - x * t
        return jnp.log(t) + diff - 2.0 * jax.nn.softplus(diff)


class RelaxedBernoulli(Family):
    name = "RelaxedBernoulli"
    args = (("temperature", None), ("probs", None), ("logits", None))
    arg_event_ndim = {"temperature": 0, "probs": 0, "logits": 0}
    support = "unit_interval"

    @classmethod
    def sample(cls, key, shape, p):
        return jax.nn.sigmoid(LogitRelaxedBernoulli.sample(key, shape, p))

    @classmethod
    def log_prob(cls, x, p):
        y = jnp.log(x) - jnp.log1p(-x)
        return LogitRelaxedBernoulli.log_prob(y, p) - jnp.log(x) - jnp.log1p(-x)


class RelaxedOneHotCategorical(Family):
    name = "RelaxedOneHotCategorical"
    args = (("temperature", None), ("probs", None), ("logits", None))
    arg_event_ndim = {"temperature": 0, "probs": 1, "logits": 1}
    event_ndim = 1
    support = "simplex"

    @classmethod
    def sample(cls, key, shape, p):
        _, logits = _cat_probs_logits(p)
        g = jax.random.gumbel(key, shape)
        return jax.nn.softmax((logits + g) / p["temperature"], axis=-1)

    @classmethod
    def log_prob(cls, x, p):
        _, logits = _cat_probs_logits(p)
        t = p["temperature"]
        n = x.shape[-1]
        score = logits - t * jnp.log(x)
        score = jnp.sum(score, axis=-1) - n * jsp.logsumexp(logits - t * jnp.log(x), axis=-1)
        return score + jsp.gammaln(jnp.asarray(float(n))) + (n - 1) * jnp.log(t)


class Wishart(Family):
    name = "Wishart"
    args = (("df", None), ("covariance_matrix", None), ("precision_matrix", None),
            ("scale_tril", None))
    arg_event_ndim = {"df": 0, "covariance_matrix": 2, "precision_matrix": 2,
                      "scale_tril": 2}
    event_ndim = 2
    support = "pos_def"

    @classmethod
    def sample(cls, key, shape, p):
        # Bartlett decomposition
        L = MultivariateNormal._chol({k: p.get(k) for k in
                                      ("covariance_matrix", "precision_matrix", "scale_tril")})
        d = shape[-1]
        df = jnp.asarray(p["df"], jnp.float32)
        k1, k2 = jax.random.split(key)
        diag_idx = jnp.arange(d)
        chi2 = 2.0 * jax.random.gamma(k1, jnp.broadcast_to((df - diag_idx) / 2.0, shape[:-1]), shape[:-1])
        A = jnp.tril(jax.random.normal(k2, shape), -1)
        A = A + jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(jnp.sqrt(chi2))
        LA = jnp.broadcast_to(L, shape) @ A
        return LA @ jnp.swapaxes(LA, -1, -2)

    @classmethod
    def log_prob(cls, x, p):
        L = MultivariateNormal._chol({k: p.get(k) for k in
                                      ("covariance_matrix", "precision_matrix", "scale_tril")})
        d = x.shape[-1]
        df = jnp.asarray(p["df"], jnp.float32)
        V = L @ jnp.swapaxes(L, -1, -2)
        Vinv_x = jnp.linalg.solve(jnp.broadcast_to(V, x.shape), x)
        tr = jnp.trace(Vinv_x, axis1=-2, axis2=-1)
        _, logdet_x = jnp.linalg.slogdet(x)
        logdet_V = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        lmg = (d * (d - 1) / 4.0) * math.log(math.pi) + jnp.sum(
            jsp.gammaln((df[..., None] + 1.0 - jnp.arange(1, d + 1)) / 2.0), axis=-1)
        return (0.5 * (df - d - 1.0) * logdet_x - 0.5 * tr
                - 0.5 * df * d * math.log(2.0) - 0.5 * df * logdet_V - lmg)


class LKJCholesky(Family):
    """Cholesky factor of an LKJ-distributed correlation matrix (onion
    construction; Lewandowski, Kurowicka & Joe 2009)."""
    name = "LKJCholesky"
    args = (("dim", None), ("concentration", 1.0))
    arg_event_ndim = {"dim": 0, "concentration": 0}
    event_ndim = 2
    support = "corr_cholesky"

    @classmethod
    def event_shape(cls, params):
        d = int(params["dim"])
        return (d, d)

    @classmethod
    def sample(cls, key, shape, p):
        d = shape[-1]
        eta = jnp.asarray(p["concentration"], jnp.float32)
        batch = shape[:-2]
        k1, k2 = jax.random.split(key)
        # onion method: row i (1-indexed) has a Beta-distributed squared norm
        L = jnp.zeros(shape, jnp.float32)
        L = L.at[..., 0, 0].set(1.0)
        for i in range(1, d):
            ki = jax.random.fold_in(k1, i)
            alpha = eta + (d - 1 - i) / 2.0
            y = jax.random.beta(ki, i / 2.0, jnp.broadcast_to(alpha, batch), batch)
            u = jax.random.normal(jax.random.fold_in(k2, i), batch + (i,))
            u = u / jnp.linalg.norm(u, axis=-1, keepdims=True)
            w = jnp.sqrt(y)[..., None] * u
            L = L.at[..., i, :i].set(w)
            L = L.at[..., i, i].set(jnp.sqrt(jnp.clip(1.0 - y, 1e-12)))
        return L

    @classmethod
    def log_prob(cls, x, p):
        d = x.shape[-1]
        eta = jnp.asarray(p["concentration"], jnp.float32)
        diag = jnp.diagonal(x, axis1=-2, axis2=-1)
        order = jnp.arange(2, d + 1, dtype=jnp.float32)
        lp = jnp.sum((d - order + 2.0 * eta - 2.0) * jnp.log(diag[..., 1:]), -1)
        # normalisation (Stan reference manual, lkj_corr_cholesky)
        alphas = eta + (d - 1.0 - jnp.arange(1, d, dtype=jnp.float32)) / 2.0
        halves = jnp.arange(1, d, dtype=jnp.float32) / 2.0
        log_norm = jnp.sum(halves * math.log(math.pi) + jsp.gammaln(alphas)
                           - jsp.gammaln(alphas + halves))
        return lp - log_norm


FAMILIES = {f.name: f for f in [
    Normal, HalfNormal, Cauchy, HalfCauchy, LogNormal, Uniform, Exponential,
    Gamma, Chi2, Beta, StudentT, Laplace, Gumbel, Kumaraswamy, Pareto, Weibull,
    FisherSnedecor, VonMises, Bernoulli, ContinuousBernoulli, Binomial, Poisson,
    Geometric, NegativeBinomial, Categorical, OneHotCategorical, Multinomial,
    Dirichlet, MultivariateNormal, LowRankMultivariateNormal,
    LogitRelaxedBernoulli, RelaxedBernoulli, RelaxedOneHotCategorical, Wishart,
    LKJCholesky,
]}
