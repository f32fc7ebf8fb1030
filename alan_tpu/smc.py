"""Sequential Monte Carlo with adaptive likelihood tempering.

Per the build target (BASELINE north star), SMC is first-class: particles in
unconstrained space, adaptive temperature schedule (bisection to hold the
incremental ESS at N/2), systematic resampling, HMC mutation moves — all
vectorised so a full run is one compiled program per stage.  Also yields a
model-evidence (log Z) estimate, complementing the MP ELBO.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .dims import DT, as_dt, dims_of
from .bound import BoundPlate
from .ir.plate import Plate
from .ir.dist import Dist
from .ir.timeseries import Timeseries
from .mcmc import (_ts_log_prob_chain, _scalar, make_logpost, _latent_specs,
                   _constrain)


def log_prior_lik(P: BoundPlate, latents: dict, data: dict):
    """(log prior, log likelihood) of the P program."""
    lp_prior = [jnp.zeros(())]
    lp_lik = [jnp.zeros(())]

    def walk(plate: Plate, scope: dict, active: list):
        for name, node in plate.flat_prog.items():
            if isinstance(node, Plate):
                walk(node, dict(scope), active + [name])
            elif isinstance(node, Timeseries):
                x = latents[name]
                lp_prior[0] = lp_prior[0] + _scalar(
                    _ts_log_prob_chain(node, x, scope, active[-1]))
                scope[name] = x
            else:
                assert isinstance(node, Dist)
                if name in data:
                    lp, _ = node.log_prob(data[name], scope)
                    lp_lik[0] = lp_lik[0] + _scalar(lp)
                else:
                    x = latents[name]
                    lp, _ = node.log_prob(x, scope)
                    lp_prior[0] = lp_prior[0] + _scalar(lp)
                    scope[name] = x

    walk(P.plate, dict(P.inputs_params_flat_named()), [])
    return lp_prior[0], lp_lik[0]


def _systematic_resample(key, logw, n):
    w = jax.nn.softmax(logw)
    positions = (jax.random.uniform(key) + jnp.arange(n)) / n
    cumsum = jnp.cumsum(w)
    return jnp.searchsorted(cumsum, positions)


def run_smc(P: BoundPlate, data: dict, num_particles=512, mutation_steps=4,
            step_size=0.1, ess_threshold=0.5, max_stages=50, key=None):
    """Returns ``(samples: dict varname -> DT('particle', *plates), info)``
    with ``info['log_Z']`` the evidence estimate."""
    if key is None:
        key = jax.random.key(0)
    data = {k: as_dt(v) for k, v in data.items()}

    logpost, theta0, unravel, constrain_dict = make_logpost(P, data)
    specs = _latent_specs(P, data)
    name2trans = {name: tr for name, _, tr in specs}

    def split_logp(theta):
        u = unravel(theta)
        latents, logdet = {}, jnp.zeros(())
        template, _ = constrain_dict(theta0)
        for name, arr in u.items():
            x, ld = _constrain(name2trans[name], arr)
            latents[name] = DT(x, template[name].dims)
            logdet = logdet + ld
        pri, lik = log_prior_lik(P, latents, data)
        return pri + logdet, lik

    v_split = jax.vmap(split_logp)

    # init particles from the prior (unconstrained)
    D = theta0.shape[0]
    keys = jax.random.split(key, 4)

    def prior_draw(k):
        flat = {}
        from .sampler import PermutationSampler
        sample = P.sample(key=k)
        u = {}
        for name, tr in name2trans.items():
            v = as_dt(sample[name]).data
            if tr == "exp":
                u[name] = jnp.log(jnp.clip(v, min=1e-6))
            elif tr == "sigmoid":
                p = jnp.clip(v, 1e-6, 1 - 1e-6)
                u[name] = jnp.log(p) - jnp.log1p(-p)
            else:
                u[name] = v
        from jax.flatten_util import ravel_pytree
        return ravel_pytree(u)[0]

    thetas = jnp.stack([prior_draw(k)
                        for k in jax.random.split(keys[0], num_particles)])

    lam = 0.0
    log_Z = 0.0
    stages = 0
    k_loop = keys[1]

    tempered = lambda th, l: split_logp(th)[0] + l * split_logp(th)[1]

    for stage in range(max_stages):
        pri, lik = v_split(thetas)

        # adaptive next temperature by bisection on incremental ESS
        def ess_at(l_new):
            lw = (l_new - lam) * lik
            lw = lw - jax.scipy.special.logsumexp(lw)
            return jnp.exp(-jax.scipy.special.logsumexp(2 * lw)) / num_particles

        lo, hi = lam, 1.0
        if float(ess_at(1.0)) >= ess_threshold:
            lam_new = 1.0
        else:
            for _ in range(30):
                mid = 0.5 * (lo + hi)
                if float(ess_at(mid)) >= ess_threshold:
                    lo = mid
                else:
                    hi = mid
            lam_new = lo

        lw = (lam_new - lam) * lik
        log_Z += float(jax.scipy.special.logsumexp(lw) - jnp.log(num_particles))

        k_loop, k_rs, k_mut = jax.random.split(k_loop, 3)
        idx = _systematic_resample(k_rs, lw, num_particles)
        thetas = thetas[idx]
        lam = lam_new
        stages += 1

        # mutation: random-walk Metropolis steps targeting the tempered target
        def tempered_lp(th):
            p, l = split_logp(th)
            return p + lam * l

        v_tlp = jax.vmap(tempered_lp)

        def mut_body(carry, k):
            th, lp = carry
            k1, k2 = jax.random.split(k)
            prop = th + step_size * jax.random.normal(k1, th.shape)
            lp_prop = v_tlp(prop)
            log_a = lp_prop - lp
            acc = jnp.log(jax.random.uniform(k2, (num_particles,))) < log_a
            th = jnp.where(acc[:, None], prop, th)
            lp = jnp.where(acc, lp_prop, lp)
            return (th, lp), jnp.mean(acc)

        (thetas, _), accs = jax.lax.scan(
            mut_body, (thetas, v_tlp(thetas)),
            jax.random.split(k_mut, mutation_steps))

        if lam >= 1.0:
            break

    template, _ = constrain_dict(theta0)

    def per_theta(th):
        u = unravel(th)
        return {name: _constrain(name2trans[name], arr)[0]
                for name, arr in u.items()}

    raw = jax.vmap(per_theta)(thetas)
    samples = {name: DT(raw[name], ("particle",) + template[name].dims)
               for name in raw}
    info = {"log_Z": log_Z, "stages": stages, "final_lambda": lam,
            "mean_mutation_accept": float(jnp.mean(accs))}
    return samples, info
