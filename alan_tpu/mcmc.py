"""First-class gradient MCMC on the same model IR.

The reference only *compares against* external NUTS (PyMC / BlackJAX,
``examples/runner_moments_HMC.py``, ``runner_moments_blackjax.py``); per the
build target, the TPU framework provides its own sampler: automatic
unconstraining from the distribution supports, a vectorised-leapfrog HMC with
dual-averaging step-size and diagonal mass adaptation, chains batched with
``vmap`` so the whole sampler is one ``lax.scan``-driven XLA program.

Entry point: ``run_hmc(P, data, num_samples, num_warmup, num_chains, key)``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from .dims import DT, as_dt, dims_of, sum_pos, bind, expand_to
from .bound import BoundPlate
from .ir.plate import Plate, update_scope
from .ir.dist import Dist
from .ir.data import Data
from .ir.timeseries import Timeseries


# -- log joint over the P program (no K dims) ------------------------------

def _ts_log_prob_chain(ts: Timeseries, sample: DT, scope: dict, T_dim: str):
    """Markov-chain log-prob without particle dims (for MCMC)."""
    o = as_dt(sample).order(T_dim)
    ax = len(o.dims)
    body = jax.lax.slice_in_dim(o.data, 0, o.data.shape[ax] - 1, axis=ax)
    init = as_dt(scope[ts.init])
    init_arr = expand_to(init, o.dims)
    init_arr = jnp.broadcast_to(jnp.expand_dims(init_arr, ax),
                                body.shape[:ax] + (1,) + body.shape[ax + 1:])
    lagged = bind(DT(jnp.concatenate([init_arr, body], axis=ax), o.dims), T_dim)
    lp, _ = ts.trans.log_prob(sample, {**scope, "prev": lagged})
    return lp


def log_joint(P: BoundPlate, latents: dict, data: dict, state=None):
    """Σ log p(latents, data) under the P program.  ``latents``/``data`` are
    flat dicts of dimmed tensors (plate dims named)."""
    total = [jnp.zeros(())]

    def walk(plate: Plate, scope: dict, active: list):
        for name, node in plate.flat_prog.items():
            if isinstance(node, Plate):
                walk(node, dict(scope), active + [name])
            elif isinstance(node, Timeseries):
                x = latents[name]
                lp = _ts_log_prob_chain(node, x, scope, active[-1])
                total[0] = total[0] + _scalar(lp)
                scope[name] = x
            else:
                assert isinstance(node, Dist)
                if name in data:
                    lp, _ = node.log_prob(data[name], scope)
                else:
                    x = latents[name]
                    lp, _ = node.log_prob(x, scope)
                    scope[name] = x
                total[0] = total[0] + _scalar(lp)

    scope0 = dict(P.inputs_params_flat_named(state))
    walk(P.plate, scope0, [])
    return total[0]


def _scalar(lp):
    lp = sum_pos(as_dt(lp))
    if dims_of(lp):
        lp = lp.order(*lp.dims)
    return jnp.sum(lp.data) if hasattr(lp, "data") else jnp.sum(lp)


# -- automatic unconstraining ---------------------------------------------

_TRANSFORMS = {
    "real": ("id",), "real_vector": ("id",), "circular": ("id",),
    "positive": ("exp",),
    "unit_interval": ("sigmoid",),
    "simplex": ("stickbreak",),
    "corr_cholesky": ("corrchol",),
}


def _constrain(kind, u):
    if kind == "id":
        return u, jnp.zeros(())
    if kind == "exp":
        return jnp.exp(u), jnp.sum(u)
    if kind == "sigmoid":
        x = jax.nn.sigmoid(u)
        ld = jnp.sum(jax.nn.log_sigmoid(u) + jax.nn.log_sigmoid(-u))
        return x, ld
    if kind == "stickbreak":
        return _stickbreak_fwd(u)
    if kind == "corrchol":
        return _corrchol_fwd(u)
    raise ValueError(kind)


def _stickbreak_fwd(u):
    """Logistic stick-breaking: u (..., d-1) -> simplex x (..., d), with the
    Stan-style offset so u = 0 maps to the uniform simplex point."""
    dm1 = u.shape[-1]
    offsets = -jnp.log(jnp.arange(dm1, 0, -1, dtype=u.dtype))
    y = u + offsets
    z = jax.nn.sigmoid(y)

    def body(r, zy):
        z_k, y_k = zy
        x_k = z_k * r
        ld_k = jax.nn.log_sigmoid(y_k) + jax.nn.log_sigmoid(-y_k) + jnp.log(r)
        return r * (1.0 - z_k), (x_k, ld_k)

    # scan over the last axis
    zt = jnp.moveaxis(z, -1, 0)
    yt = jnp.moveaxis(y, -1, 0)
    r0 = jnp.ones(u.shape[:-1], u.dtype)
    r_last, (xs, lds) = jax.lax.scan(body, r0, (zt, yt))
    x = jnp.concatenate([jnp.moveaxis(xs, 0, -1), r_last[..., None]], axis=-1)
    return x, jnp.sum(lds)


def _corrchol_fwd(u):
    """Canonical-partial-correlation transform (Stan reference manual,
    cholesky_corr): u (..., d(d-1)/2) -> lower-triangular Cholesky factor of
    a correlation matrix (..., d, d), with log|det J|."""
    m = u.shape[-1]
    d = int((1 + (1 + 8 * m) ** 0.5) / 2)
    z = jnp.tanh(u)
    batch = u.shape[:-1]
    L = jnp.zeros(batch + (d, d), u.dtype)
    L = L.at[..., 0, 0].set(1.0)
    logdet = jnp.sum(jnp.log1p(-z * z))          # d tanh/du = 1 - z^2
    idx = 0
    for i in range(1, d):
        rem = jnp.ones(batch, u.dtype)           # remaining squared norm
        for j in range(i):
            x = z[..., idx] * jnp.sqrt(rem)
            L = L.at[..., i, j].set(x)
            # dx_ij/dz_ij = sqrt(rem): triangular Jacobian contribution
            logdet = logdet + 0.5 * jnp.sum(jnp.log(rem))
            rem = rem * (1.0 - z[..., idx] ** 2)
            idx += 1
        L = L.at[..., i, i].set(jnp.sqrt(jnp.clip(rem, 1e-12)))
    return L, logdet


def _corrchol_inv(L):
    """Inverse of _corrchol_fwd."""
    d = L.shape[-1]
    batch = L.shape[:-2]
    us = []
    for i in range(1, d):
        rem = jnp.ones(batch, L.dtype)
        for j in range(i):
            z = jnp.clip(L[..., i, j] / jnp.sqrt(jnp.clip(rem, 1e-12)),
                         -1 + 1e-6, 1 - 1e-6)
            us.append(jnp.arctanh(z))
            rem = rem * (1.0 - z ** 2)
    return jnp.stack(us, axis=-1) if us else jnp.zeros(batch + (0,), L.dtype)


def _stickbreak_inv(x):
    """Inverse stick-breaking: simplex x (..., d) -> u (..., d-1)."""
    x = jnp.clip(x, 1e-6, 1.0)
    dm1 = x.shape[-1] - 1
    cum = jnp.cumsum(x[..., :-1], axis=-1)
    r = jnp.concatenate([jnp.ones_like(x[..., :1]),
                         1.0 - cum[..., :-1]], axis=-1) if dm1 > 1 else         jnp.ones_like(x[..., :1])
    r = jnp.clip(r, 1e-6, 1.0)
    z = jnp.clip(x[..., :-1] / r, 1e-6, 1 - 1e-6)
    offsets = -jnp.log(jnp.arange(dm1, 0, -1, dtype=x.dtype))
    return jnp.log(z) - jnp.log1p(-z) - offsets


def _latent_specs(P: BoundPlate, data: dict):
    """(varname, dims, shape, transform) for each non-observed variable."""
    specs = []
    gvn2plates = P.plate.groupvarname2platenames()
    v2g = P.plate.varname2groupvarname()

    def walk(plate, active):
        for name, node in plate.flat_prog.items():
            if isinstance(node, Plate):
                walk(node, active + [name])
                continue
            if name in data:
                continue
            fam = node.trans.family if isinstance(node, Timeseries) else node.family
            if fam.discrete:
                raise ValueError(
                    f"{name} is discrete ({fam.name}); HMC needs continuous "
                    f"latents — marginalise it or use SMC/MP inference")
            sup = fam.support
            if sup not in _TRANSFORMS:
                raise ValueError(f"no unconstraining transform for support {sup!r} ({name})")
            specs.append((name, tuple(active), _TRANSFORMS[sup][0]))
    walk(P.plate, [])
    return specs


def _init_from_prior(P: BoundPlate, data: dict, key):
    flat = P.sample(key=key)
    return {k: v for k, v in flat.items() if k not in data}


def make_logpost(P: BoundPlate, data: dict):
    """Returns ``(logpost(theta_vec), theta0_vec, unravel, constrain_dict)``
    operating on one flat unconstrained vector."""
    data = {k: as_dt(v) for k, v in data.items()}
    specs = _latent_specs(P, data)
    name2trans = {name: trans for name, _, trans in specs}

    init_latents = _init_from_prior(P, data, jax.random.key(0))
    # to unconstrained space
    u0 = {}
    dims_by_name = {}
    for name, v in init_latents.items():
        v = as_dt(v)
        dims_by_name[name] = v.dims
        tr = name2trans[name]
        if tr == "exp":
            u0[name] = jnp.log(jnp.clip(v.data, min=1e-6))
        elif tr == "sigmoid":
            p = jnp.clip(v.data, 1e-6, 1 - 1e-6)
            u0[name] = jnp.log(p) - jnp.log1p(-p)
        elif tr == "stickbreak":
            u0[name] = _stickbreak_inv(v.data)
        elif tr == "corrchol":
            u0[name] = _corrchol_inv(v.data)
        else:
            u0[name] = v.data
    theta0, unravel = ravel_pytree(u0)

    def constrain_dict(theta):
        u = unravel(theta)
        out, logdet = {}, jnp.zeros(())
        for name, arr in u.items():
            x, ld = _constrain(name2trans[name], arr)
            out[name] = DT(x, dims_by_name[name])
            logdet = logdet + ld
        return out, logdet

    def logpost(theta):
        latents, logdet = constrain_dict(theta)
        return log_joint(P, latents, data) + logdet

    return logpost, theta0, unravel, constrain_dict


# -- HMC ------------------------------------------------------------------

def _leapfrog(logpost_grad, theta, m, eps, inv_mass, n_steps):
    def body(carry, _):
        th, mm = carry
        g = logpost_grad(th)[1]
        mm = mm + 0.5 * eps * g
        th = th + eps * inv_mass * mm
        g = logpost_grad(th)[1]
        mm = mm + 0.5 * eps * g
        return (th, mm), None
    (theta, m), _ = jax.lax.scan(body, (theta, m), None, length=n_steps)
    return theta, m


def run_hmc(P: BoundPlate, data: dict, num_samples=1000, num_warmup=1000,
            num_chains=4, num_leapfrog=16, target_accept=0.8, key=None):
    """Adaptive HMC: dual-averaging step size (warmup), diagonal mass from
    warmup variance, chains vectorised with vmap.  Returns
    ``(samples: dict varname -> DT with a leading 'chain' and 'draw' dim,
    diagnostics)``."""
    if key is None:
        key = jax.random.key(0)

    logpost, theta0, unravel, constrain_dict = make_logpost(P, data)
    vg = jax.value_and_grad(logpost)
    logpost_grad = lambda th: vg(th)

    D = theta0.shape[0]
    k_init, k_run = jax.random.split(key)
    theta_init = theta0[None, :] + 0.1 * jax.random.normal(k_init, (num_chains, D))

    # step-size dual averaging state
    mu = jnp.log(10 * 0.1)

    def hmc_step(theta, eps, inv_mass, k):
        k1, k2 = jax.random.split(k)
        m = jax.random.normal(k1, theta.shape) / jnp.sqrt(inv_mass)
        lp0, _ = vg(theta)
        ke0 = 0.5 * jnp.sum(inv_mass * m * m)
        theta_new, m_new = _leapfrog(logpost_grad, theta, m, eps, inv_mass,
                                     num_leapfrog)
        lp1, _ = vg(theta_new)
        ke1 = 0.5 * jnp.sum(inv_mass * m_new * m_new)
        log_accept = jnp.minimum(0.0, (lp1 - ke1) - (lp0 - ke0))
        log_accept = jnp.where(jnp.isnan(log_accept), -jnp.inf, log_accept)
        accept = jnp.log(jax.random.uniform(k2)) < log_accept
        theta = jnp.where(accept, theta_new, theta)
        return theta, jnp.exp(log_accept)

    v_hmc = jax.vmap(hmc_step, in_axes=(0, None, None, 0))

    def warmup_body(carry, i):
        theta, log_eps, log_eps_bar, h_bar, welford = carry
        ks = jax.random.split(jax.random.fold_in(k_run, i), num_chains)
        theta, p_acc = v_hmc(theta, jnp.exp(log_eps), inv_mass0, ks)
        # dual averaging (Hoffman & Gelman 2014)
        a = jnp.mean(p_acc)
        t_ = i + 1.0 + 10.0
        h_bar = (1 - 1 / t_) * h_bar + (target_accept - a) / t_
        log_eps = mu - jnp.sqrt(i + 1.0) / 0.05 * h_bar
        w = (i + 1.0) ** -0.75
        log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        # batched Welford over all chain observations (Chan et al.)
        n, mean_, m2 = welford
        x = theta.reshape(-1, D)
        m_obs = x.shape[0]
        bmean = jnp.mean(x, 0)
        bm2 = jnp.sum((x - bmean) ** 2, 0)
        n1 = n + m_obs
        delta = bmean - mean_
        mean_ = mean_ + delta * (m_obs / n1)
        m2 = m2 + bm2 + delta ** 2 * (n * m_obs / n1)
        return (theta, log_eps, log_eps_bar, h_bar, (n1, mean_, m2)), None

    inv_mass0 = jnp.ones(D)
    welford0 = (0.0, jnp.zeros(D), jnp.zeros(D))
    init = (theta_init, jnp.log(0.1), jnp.log(0.1), 0.0, welford0)
    (theta, log_eps, log_eps_bar, _, (n, mean_, m2)), _ = jax.lax.scan(
        warmup_body, init, jnp.arange(num_warmup))

    eps = jnp.exp(log_eps_bar)
    var = m2 / jnp.maximum(n - 1, 1.0)
    inv_mass = jnp.clip(var, 1e-4, 1e4)

    def sample_body(theta, i):
        ks = jax.random.split(jax.random.fold_in(jax.random.fold_in(k_run, 777), i),
                              num_chains)
        theta, p_acc = v_hmc(theta, eps, inv_mass, ks)
        return theta, (theta, jnp.mean(p_acc))

    _, (thetas, p_accs) = jax.lax.scan(sample_body, theta, jnp.arange(num_samples))
    # thetas: (draws, chains, D)

    def per_theta(th):
        latents, _ = constrain_dict(th)
        return {k: v.data for k, v in latents.items()}

    raw = jax.vmap(jax.vmap(per_theta))(thetas)
    _, _, _, cdict = logpost, theta0, unravel, constrain_dict
    latents_template, _ = constrain_dict(theta0)
    samples = {}
    for name, v in latents_template.items():
        samples[name] = DT(raw[name], ("draw", "chain") + v.dims)

    diagnostics = {"mean_accept": float(jnp.mean(p_accs)),
                   "step_size": float(eps)}
    return samples, diagnostics
