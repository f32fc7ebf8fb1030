"""No-U-Turn Sampler (iterative, multinomial) on the model IR.

The reference compares against external NUTS (PyMC/BlackJAX baselines,
``examples/runner_moments_HMC.py``); here NUTS is first-class and
TPU-shaped: the doubling procedure is a *static* unroll over tree depths,
each subtree is one ``lax.scan`` of leapfrog steps with the iterative
(checkpoint-stack) U-turn test, chains are vmapped, and the whole sampler
compiles to a single XLA program.

Checkpoint-stack U-turn bookkeeping (derivation in comments): within a
subtree, even leaves are stored at slot ``ctz(leaf)``; at odd leaf ``i``,
for each ``j`` in 1..trailing_ones(i) the completed size-2^j subtree's left
endpoint is leaf ``i+1-2^j`` whose slot is free of collisions because
intermediate leaves have strictly smaller ctz.

Entry point: ``run_nuts(P, data, ...)`` (same contract as ``run_hmc``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .dims import DT
from .mcmc import make_logpost


def _ctz(i, cap):
    """count-trailing-zeros for int32 scalar, capped (ctz(0) -> cap)."""
    def body(state):
        n, c = state
        return n >> 1, c + 1
    def cond(state):
        n, c = state
        return jnp.logical_and(n % 2 == 0, c < cap)
    _, c = jax.lax.while_loop(cond, body, (jnp.maximum(i, 0), 0))
    return jnp.where(i == 0, cap, c)


def _trailing_ones(i, cap):
    def body(state):
        n, c = state
        return n >> 1, c + 1
    def cond(state):
        n, c = state
        return jnp.logical_and(n % 2 == 1, c < cap)
    _, c = jax.lax.while_loop(cond, body, (i, 0))
    return c


def _turning(z_l, r_l, z_r, r_r, inv_mass):
    dz = z_r - z_l
    return jnp.logical_or(jnp.dot(dz, inv_mass * r_l) < 0,
                          jnp.dot(dz, inv_mass * r_r) < 0)


def run_nuts(P, data, num_samples=1000, num_warmup=1000, num_chains=4,
             max_depth=8, target_accept=0.8, key=None):
    """Adaptive NUTS.  Returns (samples dict varname -> DT('draw','chain',
    *plates), diagnostics)."""
    if key is None:
        key = jax.random.key(0)

    logpost, theta0, unravel, constrain_dict = make_logpost(P, data)
    vg = jax.value_and_grad(logpost)
    D = theta0.shape[0]
    MD = max_depth

    def leapfrog(z, r, g, eps, inv_mass, direction):
        e = eps * direction
        r = r + 0.5 * e * g
        z = z + e * inv_mass * r
        lp, g = vg(z)
        r = r + 0.5 * e * g
        return z, r, g, lp

    def build_subtree(z0, r0, g0, n_leaves_log2, direction, eps, inv_mass,
                      H0, key):
        """Leapfrog 2^n steps from (z0, r0); returns endpoint, multinomial
        proposal, total log-weight, turning/diverging flags, accept stats."""
        n_steps = 2 ** n_leaves_log2

        ckpt_z0 = jnp.zeros((MD + 1, D))
        ckpt_r0 = jnp.zeros((MD + 1, D))

        def step(carry, i):
            (z, r, g, z_prop, logw, turning, diverging, ck_z, ck_r,
             sum_acc, k) = carry
            k, k1 = jax.random.split(k)
            z_n, r_n, g_n, lp_n = leapfrog(z, r, g, eps, inv_mass, direction)
            delta = lp_n - 0.5 * jnp.sum(inv_mass * r_n * r_n) + H0
            delta = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
            div_n = delta < -1000.0
            sum_acc = sum_acc + jnp.minimum(1.0, jnp.exp(delta))

            # multinomial proposal within the subtree
            new_logw = jnp.logaddexp(logw, delta)
            take = jnp.log(jax.random.uniform(k1)) < (delta - new_logw)
            z_prop_n = jnp.where(take, z_n, z_prop)

            # iterative turning checks
            def check(j, turn):
                active = (j >= 1) & (j <= _trailing_ones(i, MD)) & (i % 2 == 1)
                l = i + 1 - (1 << j)
                slot = _ctz(l, MD)
                t = _turning(ck_z[slot], ck_r[slot], z_n, r_n, inv_mass)
                return turn | (active & t)

            turn_here = jax.lax.fori_loop(1, MD + 1, check, jnp.array(False))

            # store even leaves
            slot = _ctz(i, MD)
            store = (i % 2 == 0)
            ck_z = jnp.where(store, ck_z.at[slot].set(z_n), ck_z)
            ck_r = jnp.where(store, ck_r.at[slot].set(r_n), ck_r)

            stop = turning | diverging
            # freeze once stopped
            z_o = jnp.where(stop, z, z_n)
            r_o = jnp.where(stop, r, r_n)
            g_o = jnp.where(stop, g, g_n)
            z_prop_o = jnp.where(stop, z_prop, z_prop_n)
            logw_o = jnp.where(stop, logw, new_logw)
            turning = turning | (~stop & turn_here)
            diverging = diverging | (~stop & div_n)
            return (z_o, r_o, g_o, z_prop_o, logw_o, turning, diverging,
                    ck_z, ck_r, sum_acc, k), None

        init = (z0, r0, g0, z0, -jnp.inf, jnp.array(False), jnp.array(False),
                ckpt_z0, ckpt_r0, jnp.zeros(()), key)
        (z, r, g, z_prop, logw, turning, diverging, _, _, sum_acc, _), _ = \
            jax.lax.scan(step, init, jnp.arange(n_steps))
        return z, r, g, z_prop, logw, turning, diverging, sum_acc, n_steps

    def draw(z, key, eps, inv_mass):
        k_mom, k_loop = jax.random.split(key)
        r0 = jax.random.normal(k_mom, (D,)) / jnp.sqrt(inv_mass)
        lp0, g0 = vg(z)
        H0 = -(lp0) + 0.5 * jnp.sum(inv_mass * r0 * r0)

        # trajectory state
        zl = zr = z
        rl = rr = r0
        gl = gr = g0
        z_prop = z
        logw = jnp.zeros(())   # weight of initial point: exp(lp0 - KE - (-H0)) = 1
        done = jnp.array(False)
        sum_acc = jnp.zeros(())
        n_acc = jnp.zeros(())

        state = (zl, rl, gl, zr, rr, gr, z_prop, logw, done, sum_acc, n_acc)

        for d in range(max_depth):
            (zl, rl, gl, zr, rr, gr, z_prop, logw, done, sum_acc, n_acc) = state
            kd, ks, k_loop = jax.random.split(jax.random.fold_in(k_loop, d), 3)
            direction = jnp.where(jax.random.bernoulli(kd), 1.0, -1.0)
            z0 = jnp.where(direction > 0, zr, zl)
            r0 = jnp.where(direction > 0, rr, rl)
            g0 = jnp.where(direction > 0, gr, gl)

            (z_e, r_e, g_e, z_p, lw, turning, diverging, s_acc, n_steps) = \
                build_subtree(z0, r0, g0, d, direction, eps, inv_mass, H0,
                              jax.random.fold_in(ks, 1))

            ok = ~(turning | diverging) & ~done
            # merge proposal (multinomial across subtrees)
            total = jnp.logaddexp(logw, lw)
            take = jnp.log(jax.random.uniform(jax.random.fold_in(ks, 2))) < (lw - total)
            z_prop = jnp.where(ok & take, z_p, z_prop)
            logw = jnp.where(ok, total, logw)
            sum_acc = sum_acc + jnp.where(done, 0.0, s_acc)
            n_acc = n_acc + jnp.where(done, 0.0, float(n_steps))

            # update ends
            zl_n = jnp.where(direction > 0, zl, z_e)
            rl_n = jnp.where(direction > 0, rl, r_e)
            gl_n = jnp.where(direction > 0, gl, g_e)
            zr_n = jnp.where(direction > 0, z_e, zr)
            rr_n = jnp.where(direction > 0, r_e, rr)
            gr_n = jnp.where(direction > 0, g_e, gr)
            zl = jnp.where(ok, zl_n, zl); rl = jnp.where(ok, rl_n, rl)
            gl = jnp.where(ok, gl_n, gl)
            zr = jnp.where(ok, zr_n, zr); rr = jnp.where(ok, rr_n, rr)
            gr = jnp.where(ok, gr_n, gr)

            glob_turn = _turning(zl, rl, zr, rr, inv_mass)
            done = done | turning | diverging | glob_turn
            state = (zl, rl, gl, zr, rr, gr, z_prop, logw, done, sum_acc, n_acc)

        (_, _, _, _, _, _, z_prop, _, _, sum_acc, n_acc) = state
        accept_stat = sum_acc / jnp.maximum(n_acc, 1.0)
        accept_stat = jnp.where(jnp.isnan(accept_stat), 0.0, accept_stat)
        return z_prop, accept_stat

    v_draw = jax.vmap(draw, in_axes=(0, 0, None, None))

    k_init, k_run = jax.random.split(key)
    thetas = theta0[None, :] + 0.1 * jax.random.normal(k_init, (num_chains, D))

    # warmup: dual averaging + Welford diagonal mass
    mu = jnp.log(10 * 0.1)
    inv_mass0 = jnp.ones(D)

    def warm_body(carry, i):
        th, log_eps, log_eps_bar, h_bar, (n, mean_, m2) = carry
        ks = jax.random.split(jax.random.fold_in(k_run, i), num_chains)
        th, acc = v_draw(th, ks, jnp.exp(log_eps), inv_mass0)
        a = jnp.mean(acc)
        t_ = i + 1.0 + 10.0
        h_bar = (1 - 1 / t_) * h_bar + (target_accept - a) / t_
        log_eps = mu - jnp.sqrt(i + 1.0) / 0.05 * h_bar
        w = (i + 1.0) ** -0.75
        log_eps_bar = w * log_eps + (1 - w) * log_eps_bar
        x = th.reshape(-1, D)
        m_obs = x.shape[0]
        bmean = jnp.mean(x, 0)
        bm2 = jnp.sum((x - bmean) ** 2, 0)
        n1 = n + m_obs
        delta = bmean - mean_
        mean_ = mean_ + delta * (m_obs / n1)
        m2 = m2 + bm2 + delta ** 2 * (n * m_obs / n1)
        return (th, log_eps, log_eps_bar, h_bar, (n1, mean_, m2)), None

    welford0 = (0.0, jnp.zeros(D), jnp.zeros(D))
    (thetas, _, log_eps_bar, _, (n, mean_, m2)), _ = jax.lax.scan(
        warm_body, (thetas, jnp.log(0.1), jnp.log(0.1), 0.0, welford0),
        jnp.arange(num_warmup))
    eps = jnp.exp(log_eps_bar)
    inv_mass = jnp.clip(m2 / jnp.maximum(n - 1, 1.0), 1e-4, 1e4)

    def sample_body(th, i):
        ks = jax.random.split(jax.random.fold_in(jax.random.fold_in(k_run, 999), i),
                              num_chains)
        th, acc = v_draw(th, ks, eps, inv_mass)
        return th, (th, jnp.mean(acc))

    _, (draws, accs) = jax.lax.scan(sample_body, thetas, jnp.arange(num_samples))

    def per_theta(th):
        latents, _ = constrain_dict(th)
        return {k: v.data for k, v in latents.items()}

    raw = jax.vmap(jax.vmap(per_theta))(draws)
    template, _ = constrain_dict(theta0)
    samples = {name: DT(raw[name], ("draw", "chain") + v.dims)
               for name, v in template.items()}
    diagnostics = {"mean_accept": float(jnp.mean(accs)),
                   "step_size": float(eps)}
    return samples, diagnostics
