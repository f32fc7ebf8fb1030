"""Lazy factored cross-K log-densities + the fused Pallas contraction.

The lazy path (``ops/lowrank.LowRankDT`` consumed by
``ops/pallas_lowrank.lowrank_logsumexp``) must reproduce the dense
evaluation: the same ELBO, moments, QEM updates, and importance samples,
with the K²·plate cross product never materialised.  Kernels run in Pallas
interpret mode on the CPU test mesh.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
sys.path.insert(0, os.path.join(EXAMPLES, "models"))


class _Env:
    def __init__(self, **kv): self.kv = kv

    def __enter__(self):
        self.old = {k: os.environ.get(k) for k in self.kv}
        os.environ.update({k: str(v) for k, v in self.kv.items()})

    def __exit__(self, *a):
        for k, v in self.old.items():
            os.environ.pop(k, None)
            if v is not None:
                os.environ[k] = v


_LAZY = dict(ALAN_TPU_LOWRANK_MIN="1", ALAN_TPU_LAZY_LOWRANK_INTERPRET="1")
_DENSE = dict(ALAN_TPU_NO_LOWRANK_LOGPROB="1")


# ---- kernel vs dense reference ----------------------------------------------

@pytest.mark.parametrize("shape", [
    (1, 20, 300, 40, 6),    # single i-tile
    (2, 9, 1300, 130, 4),   # i-tiled + overhang on every axis
    (1, 3, 50, 7, 36),      # tiny j (full-J block)
    (1, 1, 257, 1, 2),      # degenerate plate/parent
])
def test_kernel_matches_reference(shape):
    from alan_tpu.ops.pallas_lowrank import (lowrank_logsumexp,
                                             reference_lowrank_logsumexp)
    S, P, I, J, F = shape
    k1, k2, k3, k4 = jax.random.split(jax.random.key(0), 4)
    U = jax.random.normal(k1, (S, P, I, F)) * 0.5
    V = jax.random.normal(k2, (S, J, F)) * 0.5
    D = jax.random.normal(k3, (S, P, I)) * 2.0
    ref = reference_lowrank_logsumexp(U, V, D)
    got = lowrank_logsumexp(U, V, D, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    g = jax.random.normal(k4, ref.shape)
    gr = jax.grad(lambda u, v, d: jnp.sum(
        reference_lowrank_logsumexp(u, v, d) * g), argnums=(0, 1, 2))(U, V, D)
    gg = jax.grad(lambda u, v, d: jnp.sum(
        lowrank_logsumexp(u, v, d, True) * g), argnums=(0, 1, 2))(U, V, D)
    for a, b in zip(gr, gg):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_kernel_inf_bias():
    """-inf bias cells (zero-probability co-factors) don't poison the sum."""
    from alan_tpu.ops.pallas_lowrank import (lowrank_logsumexp,
                                             reference_lowrank_logsumexp)
    key = jax.random.key(1)
    U = jax.random.normal(key, (1, 4, 64, 3))
    V = jax.random.normal(key, (1, 5, 3))
    D = jnp.where(jax.random.bernoulli(key, 0.3, (1, 4, 64)), -jnp.inf, 0.0)
    ref = reference_lowrank_logsumexp(U, V, D)
    got = lowrank_logsumexp(U, V, D, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(got)))


# ---- LowRankDT object semantics ---------------------------------------------

def _lazy_normal():
    from alan_tpu.ops.lowrank import lowrank_logprob_lazy
    from alan_tpu.dims import DT
    key = jax.random.key(2)
    x = DT(jax.random.normal(key, (40, 7, 3)), ("K_z", "p"))      # pos (3,)
    loc = DT(jax.random.normal(jax.random.fold_in(key, 1), (20, 3)) * 0.3,
             ("K_g",))
    scale = DT(jnp.exp(jax.random.normal(
        jax.random.fold_in(key, 2), (20, 3)) * 0.2), ("K_g",))
    return x, {"loc": loc, "scale": scale}


def test_lazy_materialize_matches_dense():
    from alan_tpu.ops.lowrank import lowrank_logprob, lowrank_logprob_lazy
    x, params = _lazy_normal()
    dense = lowrank_logprob("Normal", x, params)
    lazy = lowrank_logprob_lazy("Normal", x, params).materialize()
    assert set(dense.dims) == set(lazy.dims)
    np.testing.assert_allclose(
        np.asarray(lazy.with_dims_front(list(dense.dims)).data),
        np.asarray(dense.data), rtol=1e-5, atol=1e-5)


def test_lazy_absorb_and_contract():
    from alan_tpu.dims import DT, logsumexp_dims
    from alan_tpu.ops.lowrank import lowrank_logprob_lazy
    x, params = _lazy_normal()
    lazy = lowrank_logprob_lazy("Normal", x, params)
    xterm = DT(jax.random.normal(jax.random.key(3), (40, 7)), ("K_z", "p"))
    pterm = DT(jax.random.normal(jax.random.key(4), (20,)), ("K_g",))
    lz = lazy + xterm - 1.7 + pterm
    assert getattr(lz, "__lazy_dt__", False)

    dense = lz.materialize()
    with _Env(ALAN_TPU_LAZY_LOWRANK_INTERPRET="1"):
        fused = lz.contract(("K_z",), [])
    assert fused is not None
    ref = logsumexp_dims(dense, ("K_z",))
    np.testing.assert_allclose(
        np.asarray(fused.with_dims_front(list(ref.dims)).data),
        np.asarray(ref.data), rtol=1e-5, atol=1e-5)

    # a mixed-dims co-factor can't fuse -> caller falls back
    mixed = DT(jnp.zeros((40, 20)), ("K_z", "K_g"))
    assert lz.contract(("K_z",), [mixed]) is None
    dense2 = (lz + mixed).materialize() if hasattr(lz + mixed, "materialize") \
        else (lz + mixed)
    assert not getattr(dense2, "__lazy_dt__", False)


def test_lazy_contract_param_side():
    """Reduction over the parameter-side K (observation-factor pattern)."""
    from alan_tpu.dims import DT, logsumexp_dims
    from alan_tpu.ops.lowrank import lowrank_logprob_lazy
    key = jax.random.key(9)
    # x = data (plates only), params carry the parent K-dim
    x = DT(jax.random.normal(key, (50, 4)), ("p",))               # pos (4,)
    loc = DT(jax.random.normal(jax.random.fold_in(key, 1), (30, 4)) * 0.3,
             ("K_w",))
    scale = DT(jnp.exp(jax.random.normal(
        jax.random.fold_in(key, 2), (30, 4)) * 0.1), ("K_w",))
    lazy = lowrank_logprob_lazy("Normal", x, {"loc": loc, "scale": scale})
    co = DT(jax.random.normal(jax.random.fold_in(key, 3), (30,)), ("K_w",))
    lz = lazy + co
    dense = logsumexp_dims(lz.materialize(), ("K_w",))
    with _Env(ALAN_TPU_LAZY_LOWRANK_INTERPRET="1"):
        fused = lz.contract(("K_w",), [])
    assert fused is not None
    np.testing.assert_allclose(
        np.asarray(fused.with_dims_front(list(dense.dims)).data),
        np.asarray(dense.data), rtol=1e-5, atol=1e-5)


# ---- end-to-end: the movielens workload --------------------------------------

def _movielens_problem():
    import movielens
    problem, _, _, _ = movielens.load_and_generate_problem(
        key=jax.random.key(0), Q_param_type="qem")
    return problem


def _elbo_and_moments(env):
    from alan_tpu.moments import mean, mean2
    with _Env(**env):
        problem = _movielens_problem()
        s = problem.sample(30, key=jax.random.key(5))
        elbo = float(s.elbo_nograd())
        moms = s.moments([("z", mean), ("z", mean2), ("mu_z", mean)])
        return elbo, [np.asarray(m.data) for m in moms]


def test_end_to_end_elbo_and_moments_match_dense():
    e_dense, m_dense = _elbo_and_moments(_DENSE)
    e_lazy, m_lazy = _elbo_and_moments(_LAZY)
    assert abs(e_lazy - e_dense) < 1e-3 * abs(e_dense)
    for a, b in zip(m_dense, m_lazy):
        np.testing.assert_allclose(b, a, atol=5e-4)


def test_qem_step_matches_dense():
    from alan_tpu import train

    def steps(env):
        with _Env(**env):
            problem = _movielens_problem()
            step, state = train.qem(problem, 30, lr=0.5)
            for i in range(2):
                state, elbo = step(state, jax.random.fold_in(
                    jax.random.key(6), i))
            return float(elbo), jax.tree.map(np.asarray, state)

    e_d, st_d = steps(_DENSE)
    e_l, st_l = steps(_LAZY)
    assert abs(e_l - e_d) < 1e-3 * abs(e_d)
    flat_d, _ = jax.tree.flatten(st_d)
    flat_l, _ = jax.tree.flatten(st_l)
    for a, b in zip(flat_d, flat_l):
        if np.asarray(a).dtype.kind == "f":
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-3, atol=1e-3)


def test_importance_sample_with_lazy_active():
    """Reverse-replay posterior sampling materialises lazy factors."""
    with _Env(**_LAZY):
        problem = _movielens_problem()
        s = problem.sample(10, key=jax.random.key(7))
        isample = s.importance_sample(8, key=jax.random.key(8))
        z = isample.dump()["z"]
        assert np.all(np.isfinite(np.asarray(z.data)))
