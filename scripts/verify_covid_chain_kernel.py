"""Prove or refute the covid lanes chain kernel at the headline shape
(VERDICT r3 #1: the committed 3.86x covid win shipped with a 45% ELBO
divergence after 80 QEM steps, unexplained).

Four measurements, all on the real TPU:

1. **Direct kernel forward equality** at the full covid chain shape
   (B=2760 lanes, T=137, K=30) with covid-scale log-prob magnitudes:
   ``chain_logmmexp_lanes`` vs the dense ``chain_logmmexp``
   (``ALAN_TPU_NO_SMALLK_CHAIN=1`` semantics).
2. **Direct gradient equality** of ``sum(chain(ms))`` w.r.t. ``ms`` at the
   same shape (custom VJP vs XLA autodiff of the dense path).
3. **Single-step ELBO equality** on the real full covid problem: one QEM
   step from the same state and key, lanes on vs off.
4. **Chaos control**: the dense path against itself from a 1e-6-perturbed
   init, 80 QEM steps — if covid's QEM trajectory amplifies FMA-level noise,
   dense-vs-dense diverges as much as lanes-vs-dense does.

Writes results/covid_chain_kernel_verify.json.

Reference semantics being preserved: ``/root/reference/src/alan/utils.py``
478-510 (chain_logmmexp).
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "models"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np


def _dense_chain(ms):
    os.environ["ALAN_TPU_NO_SMALLK_CHAIN"] = "1"
    try:
        from alan_tpu.ops.logmmexp import chain_logmmexp
        return chain_logmmexp(ms)
    finally:
        del os.environ["ALAN_TPU_NO_SMALLK_CHAIN"]


def kernel_direct(B=2760, T=137, K=30, scale=40.0, offset=-60.0, seed=0):
    """Fwd + grad equality at the covid shape with covid-like magnitudes
    (per-step NegBinomial/Normal log-probs are O(-10..-100); rows carry a
    shared shift so the max-subtraction actually matters)."""
    from alan_tpu.ops.logmmexp import chain_logmmexp
    from alan_tpu.ops.pallas_smallk import chain_logmmexp_lanes

    # generate ON the TPU: a 1.4 GB host array would crawl through the
    # remote-device tunnel for an hour
    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        return jnp.asarray(
            scale * jax.random.normal(k1, (B, T, K, K))
            + offset
            + 30.0 * jax.random.normal(k2, (B, T, 1, 1)),   # row shifts
            jnp.float32)
    ms = gen(jax.random.key(seed))
    jax.block_until_ready(ms)

    # errors computed ON device (a 340 MB gradient fetch would crawl
    # through the tunnel); only scalars come back
    @jax.jit
    def fwd_err(x):
        out_l = chain_logmmexp_lanes(x)
        out_d = _dense_chain(x)
        return jnp.max(jnp.abs(out_l - out_d)
                       / jnp.maximum(jnp.abs(out_d), 1.0))
    fwd_rel = float(fwd_err(ms))

    # grad at B=690 (one covid region-block): the DENSE path's backward
    # stores every tree level and OOMs v5e HBM at the full B=2760 — itself
    # evidence for the lanes kernel, whose custom VJP recomputes.
    Bg = min(B, 690)

    @jax.jit
    def grad_err(x):
        gl = jax.grad(lambda y: jnp.sum(chain_logmmexp_lanes(y)))(x)
        gd = jax.grad(lambda y: jnp.sum(_dense_chain(y)))(x)
        fin = jnp.isfinite(gl) & jnp.isfinite(gd)
        diff = jnp.where(fin, jnp.abs(gl - gd), 0.0)
        return (jnp.max(diff),
                jnp.maximum(jnp.max(jnp.where(fin, jnp.abs(gd), 0.0)),
                            1e-30),
                jnp.mean(jnp.isfinite(gl)), jnp.mean(jnp.isfinite(gd)))
    d, dmax, fin_l, fin_d = grad_err(ms[:Bg])
    return {"B": B, "T": T, "K": K, "grad_B": Bg,
            "fwd_max_rel_err": fwd_rel,
            "grad_max_rel_err_vs_maxgrad": float(d) / float(dmax),
            "grad_finite_frac_lanes": float(fin_l),
            "grad_finite_frac_dense": float(fin_d)}


def _covid_problem():
    import covid
    with jax.default_device(jax.devices("cpu")[0]):
        problem, _, _, _ = covid.load_and_generate_problem(
            key=jax.random.key(0), Q_param_type="qem")
    return problem


def single_step_elbo(K=30):
    """One QEM step from the same state/key: lanes on vs off."""
    from alan_tpu import train
    problem = _covid_problem()
    key = jax.random.key(7)

    def one(step_env):
        if step_env:
            os.environ["ALAN_TPU_NO_SMALLK_CHAIN"] = "1"
        try:
            step, state0 = train.qem(problem, K, lr=0.1)
            state1, elbo1 = step(state0, key)
            # a second step exposes divergence amplified through the
            # QEM moment update as well
            _, elbo2 = step(state1, jax.random.fold_in(key, 1))
            return float(elbo1), float(elbo2)
        finally:
            if step_env:
                del os.environ["ALAN_TPU_NO_SMALLK_CHAIN"]

    e_on = one(False)
    e_off = one(True)
    return {
        "elbo_step1_lanes": e_on[0], "elbo_step1_dense": e_off[0],
        "rel_diff_step1": abs(e_on[0] - e_off[0]) / abs(e_off[0]),
        "elbo_step2_lanes": e_on[1], "elbo_step2_dense": e_off[1],
        "rel_diff_step2": abs(e_on[1] - e_off[1]) / abs(e_off[1]),
    }


def chaos_control(K=30, n=80, eps=1e-6):
    """Dense vs dense from an eps-perturbed init over the same n QEM steps
    the round-3 record used: measures covid QEM's intrinsic sensitivity."""
    from alan_tpu import train
    problem = _covid_problem()
    key = jax.random.key(7)
    os.environ["ALAN_TPU_NO_SMALLK_CHAIN"] = "1"
    try:
        step, state0 = train.qem(problem, K, lr=0.1)
        run = train.scan_steps(step, n)
        _, elbos_a = run(state0, key)
        state0p = jax.tree.map(
            lambda x: x + eps if jnp.issubdtype(jnp.asarray(x).dtype,
                                                jnp.floating) else x,
            state0)
        _, elbos_b = run(state0p, key)
        ea = float(np.asarray(elbos_a[-1]))
        eb = float(np.asarray(elbos_b[-1]))
    finally:
        del os.environ["ALAN_TPU_NO_SMALLK_CHAIN"]
    return {"n_steps": n, "eps": eps,
            "elbo_dense": ea, "elbo_dense_perturbed": eb,
            "rel_diff": abs(ea - eb) / abs(ea)}


def main():
    out = {"device": jax.devices()[0].device_kind}
    out["kernel_direct_covid_shape"] = kernel_direct()
    print("direct:", json.dumps(out["kernel_direct_covid_shape"]), flush=True)
    out["single_step_elbo"] = single_step_elbo()
    print("single-step:", json.dumps(out["single_step_elbo"]), flush=True)
    out["chaos_control_dense_vs_dense"] = chaos_control()
    print("chaos:", json.dumps(out["chaos_control_dense_vs_dense"]),
          flush=True)
    path = os.path.join(ROOT, "results", "covid_chain_kernel_verify.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
