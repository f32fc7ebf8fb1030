"""Kernel-level op tests: log-space matmul contraction, chain reduce, and
the Pallas kernel (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alan_tpu.dims import DT, logsumexp_dims
from alan_tpu.ops.contraction import pairwise_logsumexp_contract
from alan_tpu.ops.logmmexp import logmmexp, chain_logmmexp
from alan_tpu.ops.pallas_logmmexp import logmmexp_pallas

rng = np.random.default_rng(0)


def test_pairwise_contract_matches_naive():
    cases = [
        (("K_x", "p"), (3, 4), ("K_x", "K_y", "p"), (3, 5, 4), ("K_x",)),
        (("K_x",), (3,), ("K_y",), (5,), ("K_x", "K_y")),
        (("K_x", "K_y"), (3, 5), ("K_y", "K_z"), (5, 7), ("K_y",)),
        (("p", "K_x"), (4, 3), ("K_x",), (3,), ("K_x",)),
        (("K_x", "p"), (3, 4), ("p",), (4,), ()),
        (("K_a", "K_b", "T"), (3, 3, 6), ("K_b", "T"), (3, 6), ("K_b",)),
        # adversarial scale separation (the old eps-floor failure mode)
        (("K_x",), (3,), ("K_x",), (3,), ("K_x",)),
    ]
    # scale 15 keeps row/col-max misalignment inside the f32 exp range (~87
    # nats) that the per-factor-shift matmul formulation supports; the
    # reference's own logmmexp (eps floor 1e-7) degrades ~5x earlier.
    for ad, ash, bd, bsh, Ks in cases:
        A = DT(jnp.asarray(rng.standard_normal(ash) * 15, jnp.float32), ad)
        B = DT(jnp.asarray(rng.standard_normal(bsh) * 15, jnp.float32), bd)
        naive = logsumexp_dims(A + B, Ks, ignore_extra_dims=True)
        mm = pairwise_logsumexp_contract(A, B, Ks).with_dims_front(naive.dims)
        assert np.allclose(np.asarray(naive.data), np.asarray(mm.data),
                           rtol=1e-5, atol=1e-4), (ad, bd, Ks)


def test_chain_logmmexp_matches_sequential():
    T, K = 7, 5
    ms = jnp.asarray(rng.standard_normal((2, T, K, K)), jnp.float32)
    tree = chain_logmmexp(ms)
    seq = ms[:, 0]
    for t in range(1, T):
        seq = logmmexp(seq, ms[:, t], allow_pallas=False)
    assert np.allclose(np.asarray(tree), np.asarray(seq), rtol=1e-4, atol=1e-4)


def test_pallas_logmmexp_interpret():
    A = jnp.asarray(rng.standard_normal((3, 128, 128)) * 3, jnp.float32)
    B = jnp.asarray(rng.standard_normal((3, 128, 128)) * 3, jnp.float32)
    r1 = logmmexp(A, B, allow_pallas=False)
    r2 = logmmexp_pallas(A, B, interpret=True)
    assert np.allclose(np.asarray(r1), np.asarray(r2), rtol=1e-5, atol=1e-5)


class _Env:
    def __init__(self, **kv): self.kv = kv
    def __enter__(self):
        import os
        self.old = {k: os.environ.get(k) for k in self.kv}
        os.environ.update({k: str(v) for k, v in self.kv.items()})
    def __exit__(self, *a):
        import os
        for k, v in self.old.items():
            os.environ.pop(k, None)
            if v is not None:
                os.environ[k] = v


@pytest.mark.parametrize("case", [
    # (x dims/pos, loc dims/pos, scale dims/pos)
    ((("K_z", "p"), (4,)), (("K_g",), (4,)), (("K_g",), (4,))),   # grouped-movielens shape
    ((("K_z",), ()), (("K_g", "p"), ()), ((), ())),               # shared plate on params, scalar scale
    ((("K_z",), (2, 3)), (("K_g",), (3,)), (("K_g",), ())),       # pos broadcast
    ((("K_z", "q"), ()), (("K_g", "K_h"), ()), (("K_h",), ())),   # two param K-dims
])
def test_lowrank_normal_logprob_matches_elementwise(case):
    from alan_tpu.ops.lowrank import normal_lowrank_logprob
    from alan_tpu.distributions.dimdist import DimDist
    from alan_tpu.distributions.families import Normal as NormalFam
    sizes = {"K_z": 6, "K_g": 5, "K_h": 4, "p": 3, "q": 2}
    (xd, xp), (ld, lp_), (sd, sp) = case
    mk = lambda ds, ps, scale=1.0, loc=0.0: DT(
        jnp.asarray(loc + scale * rng.standard_normal(
            tuple(sizes[d] for d in ds) + ps), jnp.float32), ds)
    x = mk(xd, xp, 2.0, 1.0)
    loc = mk(ld, lp_, 2.0, 1.0)
    scale = mk(sd, sp).exp() * 0.7

    got = normal_lowrank_logprob(x, {"loc": loc, "scale": scale})
    with _Env(ALAN_TPU_NO_LOWRANK_LOGPROB=1):
        want = DimDist(NormalFam, loc=loc, scale=scale).log_prob(x)
    want = want.with_dims_front(got.dims)
    assert got.dims == want.dims
    np.testing.assert_allclose(np.asarray(got.data), np.asarray(want.data),
                               rtol=2e-4, atol=2e-4)


def test_lowrank_normal_logprob_grads_match():
    from alan_tpu.distributions.dimdist import DimDist
    from alan_tpu.distributions.families import Normal as NormalFam
    x = DT(jnp.asarray(rng.standard_normal((6, 3, 4)) * 2 + 1, jnp.float32),
           ("K_z", "p"))
    loc0 = jnp.asarray(rng.standard_normal((5, 4)) + 1, jnp.float32)
    ls0 = jnp.asarray(rng.standard_normal((5, 4)) * 0.3, jnp.float32)

    def lp_sum(loc, ls, lowrank):
        env = {} if lowrank else {"ALAN_TPU_NO_LOWRANK_LOGPROB": 1}
        with _Env(ALAN_TPU_LOWRANK_MIN=1, **env):
            dd = DimDist(NormalFam, loc=DT(loc, ("K_g",)),
                         scale=DT(jnp.exp(ls), ("K_g",)))
            out = dd.log_prob(x)
        return jnp.sum(out.data * 0.01)

    g1 = jax.grad(lp_sum, argnums=(0, 1))(loc0, ls0, True)
    g0 = jax.grad(lp_sum, argnums=(0, 1))(loc0, ls0, False)
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-3,
                                   atol=1e-4)


def test_lowrank_routing_thresholds():
    from alan_tpu.ops.lowrank import normal_lowrank_applicable
    x = DT(jnp.zeros((4, 3)), ("K_z",))
    params = {"loc": DT(jnp.zeros((5, 3)), ("K_g",)),
              "scale": DT(jnp.ones((5, 3)), ("K_g",))}
    # big threshold: not routed; tiny threshold: routed
    with _Env(ALAN_TPU_LOWRANK_MIN=1):
        assert normal_lowrank_applicable(x, params, ("K_g",))
    with _Env(ALAN_TPU_LOWRANK_MIN=10**9):
        assert not normal_lowrank_applicable(x, params, ("K_g",))
    # no cross product -> never routed
    with _Env(ALAN_TPU_LOWRANK_MIN=1):
        assert not normal_lowrank_applicable(
            x, {"loc": DT(jnp.zeros(3)), "scale": DT(jnp.ones(3))}, ())


@pytest.mark.parametrize("family", ["LogNormal", "Exponential", "Gamma", "Beta"])
def test_lowrank_expfamily_matches_elementwise(family):
    from alan_tpu.ops.lowrank import lowrank_logprob
    from alan_tpu.distributions import families as fam
    from alan_tpu.distributions.dimdist import DimDist
    F = getattr(fam, family)
    pos = (4,)
    positive = lambda ds, s=1.0: DT(jnp.asarray(np.abs(
        rng.standard_normal(tuple({"K_z": 6, "K_g": 5}[d] for d in ds) + pos))
        * s + 0.3, jnp.float32), ds)
    if family == "LogNormal":
        x = positive(("K_z",), 2.0)
        params = {"loc": DT(jnp.asarray(rng.standard_normal((5,) + pos),
                                        jnp.float32), ("K_g",)),
                  "scale": positive(("K_g",), 0.5)}
    elif family == "Exponential":
        x = positive(("K_z",))
        params = {"rate": positive(("K_g",))}
    elif family == "Gamma":
        x = positive(("K_z",))
        params = {"concentration": positive(("K_g",)),
                  "rate": positive(("K_g",))}
    else:  # Beta
        u = positive(("K_z",))
        x = u / (u + 1.2)
        params = {"concentration1": positive(("K_g",)),
                  "concentration0": positive(("K_g",))}

    got = lowrank_logprob(family, x, params)
    with _Env(ALAN_TPU_NO_LOWRANK_LOGPROB=1):
        want = DimDist(F, **params).log_prob(x)
    want = want.with_dims_front(got.dims)
    assert got.dims == want.dims
    np.testing.assert_allclose(np.asarray(got.data), np.asarray(want.data),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("shape", [
    (35, 5, 30),     # covid-like K, small batch, odd T
    (300, 4, 7),     # batch forces lane padding (300 -> 2x256)
    (130, 8, 2),     # K=2, power-of-two T
    (128, 3, 33),    # odd K > 32 sublanes
])
def test_pallas_smallk_chain_interpret(shape):
    """Batch-in-lanes chain kernel matches the jnp tree (same reduction
    order and shift/tiny numerics; only FMA/vectorisation noise differs)."""
    from alan_tpu.ops.pallas_smallk import chain_logmmexp_lanes
    B, T, K = shape
    ms = jnp.asarray(rng.standard_normal((B, T, K, K)) * 2 - 1, jnp.float32)
    want = chain_logmmexp(ms)
    got = chain_logmmexp_lanes(ms, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_smallk_chain_multi_batch_dims_interpret():
    from alan_tpu.ops.pallas_smallk import chain_logmmexp_lanes
    ms = jnp.asarray(rng.standard_normal((5, 7, 9, 13, 13)), jnp.float32)
    want = chain_logmmexp(ms)
    got = chain_logmmexp_lanes(ms, interpret=True)
    assert got.shape == want.shape == (5, 7, 13, 13)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_smallk_chain_grad_interpret():
    from alan_tpu.ops.pallas_smallk import chain_logmmexp_lanes
    ms = jnp.asarray(rng.standard_normal((40, 6, 11, 11)) * 2, jnp.float32)
    W = jnp.asarray(rng.standard_normal((40, 11, 11)), jnp.float32)
    g_new = jax.grad(lambda m: jnp.sum(
        chain_logmmexp_lanes(m, True) * W))(ms)
    g_ref = jax.grad(lambda m: jnp.sum(chain_logmmexp(m) * W))(ms)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=3e-3, atol=1e-5)


def test_pallas_smallk_chain_inf_interpret():
    """-inf transition entries (masked states) match the jnp path exactly."""
    from alan_tpu.ops.pallas_smallk import chain_logmmexp_lanes
    ms = jnp.asarray(rng.standard_normal((20, 5, 8, 8)), jnp.float32)
    ms = ms.at[:, 2, :, 3].set(-jnp.inf).at[:, 3, 1, :].set(-jnp.inf)
    want = np.asarray(chain_logmmexp(ms))
    got = np.asarray(chain_logmmexp_lanes(ms, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_smallk_chain_routing():
    from alan_tpu.ops.logmmexp import _use_smallk_lanes
    big = jnp.zeros((200, 4, 30, 30), jnp.float32)
    # off-TPU: only the force flag routes
    with _Env(ALAN_TPU_SMALLK_CHAIN=1):
        assert _use_smallk_lanes(big)
    with _Env(ALAN_TPU_SMALLK_CHAIN=1, ALAN_TPU_NO_SMALLK_CHAIN=1):
        assert not _use_smallk_lanes(big)
    if jax.devices()[0].platform != "tpu":
        assert not _use_smallk_lanes(big)
        # forced end-to-end routing falls back to interpret mode off-TPU
        small = jnp.asarray(rng.standard_normal((130, 3, 5, 5)), jnp.float32)
        with _Env(ALAN_TPU_SMALLK_CHAIN=1):
            routed = chain_logmmexp(small)
        np.testing.assert_allclose(np.asarray(routed),
                                   np.asarray(chain_logmmexp(small)),
                                   rtol=1e-5, atol=1e-5)


def test_smallk_lane_block_vmem_scaling():
    """Auto-route only admits K whose fwd AND bwd lane blocks fit the VMEM
    footprint model (ADVICE r2: the old flat K<=100 cap admitted blocks the
    bwd kernel could not compile)."""
    from alan_tpu.ops.pallas_smallk import _block_lanes, _C_BWD, fits_vmem
    # the calibrated configuration (covid: K=30) keeps its measured blocks
    assert _block_lanes(2760, 30) == 256
    assert _block_lanes(2760, 30, cap=128, coeff=_C_BWD) == 128
    assert fits_vmem(30, 2760)
    # footprint ~K^2*bl: large K has no fitting 128-multiple block
    assert not fits_vmem(50, 2760)
    assert not fits_vmem(100, 2760)
    # the forced path raises loudly instead of failing in the compiler
    from alan_tpu.ops.pallas_smallk import chain_logmmexp_lanes
    big = jnp.zeros((200, 3, 100, 100), jnp.float32)
    with pytest.raises(ValueError, match="VMEM"):
        chain_logmmexp_lanes(big, interpret=True)
    # non-float32 chains raise instead of silently downcasting
    with pytest.raises(TypeError, match="float32"):
        chain_logmmexp_lanes(jnp.zeros((130, 3, 5, 5), jnp.bfloat16),
                             interpret=True)


def test_logsumexp_sum_multi_factor_matches_fallback():
    """n>=3-factor contraction steps stage onto the pairwise MXU path by
    absorbing small factors into the two largest (VERDICT r2 #5: no
    hard-coded len(lps)==2); result must equal the broadcast-add fallback."""
    import alan_tpu.reduce_ks as rk
    from alan_tpu.dims import as_dt

    def factors():
        return [
            DT(jnp.asarray(rng.standard_normal((3, 4)) * 5, jnp.float32),
               ("K_x", "p")),
            DT(jnp.asarray(rng.standard_normal((3, 5, 4)) * 5, jnp.float32),
               ("K_x", "K_y", "p")),
            DT(jnp.asarray(rng.standard_normal((5,)) * 5, jnp.float32),
               ("K_y",)),
            DT(jnp.asarray(rng.standard_normal((4,)) * 5, jnp.float32),
               ("p",)),
        ]

    for Ks in [("K_x",), ("K_x", "K_y"), ("K_y",)]:
        lps = factors()
        import os
        old = rk._MATMUL_MIN_K
        os.environ["ALAN_TPU_MATMUL_MIN_MN"] = "1"   # relax the shape gate
        try:
            rk._MATMUL_MIN_K = 1               # force the MXU route on CPU
            mm = rk.logsumexp_sum(Ks, *lps)
            rk._MATMUL_MIN_K = 1 << 30         # force the fallback
            ref = rk.logsumexp_sum(Ks, *lps)
        finally:
            rk._MATMUL_MIN_K = old
            del os.environ["ALAN_TPU_MATMUL_MIN_MN"]
        mm = as_dt(mm).with_dims_front(as_dt(ref).dims)
        assert mm.dims == as_dt(ref).dims
        np.testing.assert_allclose(np.asarray(mm.data),
                                   np.asarray(as_dt(ref).data),
                                   rtol=1e-5, atol=1e-4)


def test_analytic_flops_counts_chain():
    """The analytic FLOP model (perf.analytic_flops) counts the chain's
    log-matmul tree exactly: a T-chain is T-1 products of 2*B*K^3 matmul
    FLOPs each, x1 for forward-only, x3 with a grad."""
    from alan_tpu import perf
    B, T, K = 4, 8, 6
    ms = jnp.asarray(rng.standard_normal((B, T, K, K)), jnp.float32)
    fwd = perf.analytic_flops(lambda m: chain_logmmexp(m), (ms,), grad=False)
    want = 2.0 * B * K ** 3 * (T - 1)
    assert fwd["matmul_flops"] == want
    g = perf.analytic_flops(
        lambda m: jnp.sum(chain_logmmexp(m)), (ms,), grad=True)
    assert g["matmul_flops"] == 3 * want
    # no counting outside an active trace
    assert not perf.counting_active()
