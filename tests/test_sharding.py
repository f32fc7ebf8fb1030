"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4's gap-fill: the reference has no multi-device story at all).

Checks that the fused training step under K-particle x plate sharding
produces the same ELBO as the unsharded step (same seed => same numbers,
within float tolerance of collective reduction reordering).
"""
import os

import jax
import numpy as np
import pytest

from alan_tpu import train
from alan_tpu.parallel.mesh import make_mesh, MeshPlan


def _tiny_problem():
    import jax.numpy as jnp
    from alan_tpu import Normal, Plate, BoundPlate, Problem, Data, QEMParam, named
    P = Plate(
        mu=Normal(0., 1.),
        plate_1=Plate(
            z=Normal('mu', 1.),
            plate_2=Plate(obs=Normal('z', 1.)),
        ),
    )
    Q = Plate(
        mu=Normal(QEMParam(0.), QEMParam(1.)),
        plate_1=Plate(
            z=Normal(QEMParam(0.), QEMParam(1.)),
            plate_2=Plate(obs=Data()),
        ),
    )
    ps = {'plate_1': 16, 'plate_2': 4}
    Pb, Qb = BoundPlate(P, ps), BoundPlate(Q, ps)
    rng = np.random.default_rng(0)
    data = {'obs': named(jnp.asarray(rng.standard_normal((16, 4)), jnp.float32),
                         'plate_1', 'plate_2')}
    return Problem(Pb, Qb, data)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_qem_step_matches_unsharded():
    problem = _tiny_problem()
    K = 8

    step_plain, state_plain = train.qem(problem, K, lr=0.1)
    (sP0, sQ0), elbo_plain = step_plain(state_plain, jax.random.key(0))

    mesh = make_mesh({"k": 2, "p": 4})
    plan = MeshPlan(mesh, {"plate_1": "p"}).with_all_K("k")
    step_sh, state_sh = train.qem(problem, K, lr=0.1, mesh_plan=plan)
    with mesh:
        (sP1, sQ1), elbo_sh = step_sh(state_sh, jax.random.key(0))

    assert np.isclose(float(elbo_plain), float(elbo_sh), rtol=1e-4, atol=1e-4)
    for k in sQ0["qem_params"]:
        a = np.asarray(sQ0["qem_params"][k].data)
        b = np.asarray(sQ1["qem_params"][k].data)
        assert np.allclose(a, b, rtol=1e-4, atol=1e-4), k


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_vi_step_matches_unsharded():
    problem = _tiny_problem()
    K = 8
    step_plain, state_plain = train.vi(problem, K, lr=0.01)
    _, elbo_plain = step_plain(state_plain, jax.random.key(0))

    mesh = make_mesh({"k": 2, "p": 4})
    plan = MeshPlan(mesh, {"plate_1": "p"}).with_all_K("k")
    step_sh, state_sh = train.vi(problem, K, lr=0.01, mesh_plan=plan)
    with mesh:
        _, elbo_sh = step_sh(state_sh, jax.random.key(0))
    assert np.isclose(float(elbo_plain), float(elbo_sh), rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sequence_sharded_chain_matches():
    """T-sharded timeseries chain == unsharded chain (SP story)."""
    import jax.numpy as jnp
    from alan_tpu.ops.logmmexp import chain_logmmexp
    from alan_tpu.parallel.seq import chain_logmmexp_sharded
    from alan_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    ms = jnp.asarray(rng.standard_normal((2, 32, 8, 8)), jnp.float32)
    ref = chain_logmmexp(ms)
    mesh = make_mesh({"t": 8})
    out = chain_logmmexp_sharded(ms, mesh, "t")
    assert np.allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_qem_step_matmul_contraction():
    """Sharded == unsharded also when the MXU matmul-contraction path is
    forced (the path real TPU runs use)."""
    import alan_tpu.reduce_ks as rk
    old = rk._MATMUL_MIN_K
    rk._MATMUL_MIN_K = 2
    os.environ["ALAN_TPU_MATMUL_MIN_MN"] = "1"   # relax the shape gate
    try:
        problem = _tiny_problem()
        K = 8
        step_plain, state_plain = train.qem(problem, K, lr=0.1)
        _, elbo_plain = step_plain(state_plain, jax.random.key(0))
        mesh = make_mesh({"k": 2, "p": 4})
        plan = MeshPlan(mesh, {"plate_1": "p"}).with_all_K("k")
        step_sh, state_sh = train.qem(problem, K, lr=0.1, mesh_plan=plan)
        with mesh:
            _, elbo_sh = step_sh(state_sh, jax.random.key(0))
        assert np.isclose(float(elbo_plain), float(elbo_sh), rtol=1e-4, atol=1e-4)
    finally:
        rk._MATMUL_MIN_K = old
        del os.environ["ALAN_TPU_MATMUL_MIN_MN"]


def test_meshplan_warns_on_undividable_dim():
    """A planned dim that doesn't divide the mesh axis must warn (not
    silently run unsharded) — VERDICT r1 weak #4."""
    import warnings
    import jax.numpy as jnp
    from alan_tpu.dims import DT

    mesh = make_mesh({"k": 4})
    plan = MeshPlan(mesh, {"K_z": "k"})
    x = DT(jnp.zeros((6, 3)), ("K_z",))  # 6 % 4 != 0
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = plan.constrain(x)
        assert any("does not divide" in str(wi.message) for wi in w)
    assert out.dims == x.dims
    # deduplicated: second call does not re-warn
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        plan.constrain(x)
        assert not any("does not divide" in str(wi.message) for wi in w)


def test_meshplan_strict_raises_on_undividable_dim():
    import jax.numpy as jnp
    from alan_tpu.dims import DT

    mesh = make_mesh({"k": 4})
    plan = MeshPlan(mesh, {"K_z": "k"}, strict=True)
    x = DT(jnp.zeros((6, 3)), ("K_z",))
    with pytest.raises(ValueError, match="does not divide"):
        plan.constrain(x)


def test_split_on_timeseries_plate_raises():
    """Splitting a plate that carries a Timeseries must fail with the
    explicit error (parity: reference Timeseries.py:59)."""
    import jax
    import jax.numpy as jnp
    from alan_tpu import (Normal, Timeseries, Plate, BoundPlate, Problem,
                          Data, Split, named)

    P = Plate(
        init=Normal(0., 1.),
        T=Plate(
            ts=Timeseries("init", Normal(lambda prev: 0.9 * prev, 0.1)),
            obs=Normal('ts', 1.),
        ),
    )
    Q = Plate(
        init=Normal(0., 1.),
        T=Plate(ts=Normal(0., 1.), obs=Data()),
    )
    ps = {'T': 8}
    prob = Problem(BoundPlate(P, ps), BoundPlate(Q, ps),
                   {'obs': named(jnp.zeros(8), 'T')})
    s = prob.sample(4, key=jax.random.key(0))
    with pytest.raises(ValueError, match="can't Split along plate 'T'"):
        s.elbo_vi(computation_strategy=Split('T', 4))


def _covid_shaped_problem(R=4, T=16, param="qem"):
    """Regions x T plate with a latent AR(1) timeseries — the covid shape."""
    import jax.numpy as jnp
    from alan_tpu import (Normal, Timeseries, Plate, BoundPlate, Problem,
                          Data, QEMParam, OptParam, named)
    Par = QEMParam if param == "qem" else OptParam
    P = Plate(
        mu=Normal(0., 1.),
        regions=Plate(
            init=Normal('mu', 1.),
            T=Plate(
                ts=Timeseries('init', Normal(lambda prev: 0.9 * prev, 0.3)),
                obs=Normal('ts', 1.),
            ),
        ),
    )
    Q = Plate(
        mu=Normal(Par(0.), Par(1.)),
        regions=Plate(
            init=Normal(Par(0.), Par(1.)),
            T=Plate(
                ts=Normal(Par(0.), Par(1.)),
                obs=Data(),
            ),
        ),
    )
    ps = {'regions': R, 'T': T}
    rng = np.random.default_rng(3)
    data = {'obs': named(jnp.asarray(rng.standard_normal((R, T)), jnp.float32),
                         'regions', 'T')}
    return Problem(BoundPlate(P, ps), BoundPlate(Q, ps), data)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_timeseries_T_sharded_training_matches_unsharded(monkeypatch):
    """A covid-shaped model trains with the T dim sharded over the mesh and
    the chain contraction routed to chain_logmmexp_sharded; results match
    the unsharded step (VERDICT r1 next-step #2)."""
    import alan_tpu.parallel.seq as seq
    calls = []
    orig = seq.chain_logmmexp_sharded
    monkeypatch.setattr(seq, "chain_logmmexp_sharded",
                        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])

    problem = _covid_shaped_problem()
    K = 8
    step_plain, state_plain = train.qem(problem, K, lr=0.1)
    (sP0, sQ0), elbo_plain = step_plain(state_plain, jax.random.key(0))

    mesh = make_mesh({"t": 8})
    plan = MeshPlan(mesh, {"T": "t"})
    step_sh, state_sh = train.qem(problem, K, lr=0.1, mesh_plan=plan)
    with mesh:
        (sP1, sQ1), elbo_sh = step_sh(state_sh, jax.random.key(0))

    assert calls, "sharded chain contraction was not routed"
    assert np.isclose(float(elbo_plain), float(elbo_sh), rtol=1e-4, atol=1e-4)
    for k in sQ0["qem_params"]:
        a = np.asarray(sQ0["qem_params"][k].data)
        b = np.asarray(sQ1["qem_params"][k].data)
        assert np.allclose(a, b, rtol=1e-3, atol=1e-4), k


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_timeseries_T_sharded_vi_grads_match(monkeypatch):
    """Gradients flow through the T-sharded chain: one VI step sharded ==
    unsharded."""
    problem = _covid_shaped_problem(R=2, T=8, param="opt")
    K = 4
    step_plain, state_plain = train.vi(problem, K, lr=0.01)
    (sP0, sQ0, _), elbo_plain = step_plain(state_plain, jax.random.key(1))

    mesh = make_mesh({"t": 8})
    plan = MeshPlan(mesh, {"T": "t"})
    step_sh, state_sh = train.vi(problem, K, lr=0.01, mesh_plan=plan)
    with mesh:
        (sP1, sQ1, _), elbo_sh = step_sh(state_sh, jax.random.key(1))
    assert np.isclose(float(elbo_plain), float(elbo_sh), rtol=1e-4, atol=1e-4)
    for k in sQ0["opt"]:
        a = np.asarray(sQ0["opt"][k].data)
        b = np.asarray(sQ1["opt"][k].data)
        assert np.allclose(a, b, rtol=1e-3, atol=1e-4), k


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sequence_sharded_ring_matches():
    """ppermute-ring boundary exchange == all_gather == unsharded."""
    import jax.numpy as jnp
    from alan_tpu.ops.logmmexp import chain_logmmexp
    from alan_tpu.parallel.seq import chain_logmmexp_sharded

    rng = np.random.default_rng(5)
    ms = jnp.asarray(rng.standard_normal((2, 32, 8, 8)), jnp.float32)
    ref = chain_logmmexp(ms)
    mesh = make_mesh({"t": 8})
    out = chain_logmmexp_sharded(ms, mesh, "t", method="ring")
    assert np.allclose(np.asarray(ref), np.asarray(out), rtol=1e-4, atol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sequence_sharded_butterfly_bitexact():
    """The recursive-doubling compose pairs blocks exactly like the balanced
    pairwise tree, so with a power-of-two local T it is BIT-exact vs the
    single-chip chain (and it is the default for power-of-two meshes)."""
    import jax.numpy as jnp
    from alan_tpu.ops.logmmexp import chain_logmmexp
    from alan_tpu.parallel.seq import chain_logmmexp_sharded

    rng = np.random.default_rng(6)
    ms = jnp.asarray(rng.standard_normal((3, 32, 8, 8)) * 4 - 2, jnp.float32)
    ref = chain_logmmexp(ms)
    mesh = make_mesh({"t": 8})
    out_b = chain_logmmexp_sharded(ms, mesh, "t", method="butterfly")
    out_auto = chain_logmmexp_sharded(ms, mesh, "t")
    assert np.array_equal(np.asarray(ref), np.asarray(out_b))
    assert np.array_equal(np.asarray(out_b), np.asarray(out_auto))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_collective_inventory_and_scaling_model():
    """The compiled sharded step carries the expected collectives (and the
    unsharded step carries none); the audited byte counts feed the
    comm-vs-compute model (VERDICT r2 next-step #4)."""
    from alan_tpu.parallel.hlo_audit import (audit_compiled,
                                             collective_inventory,
                                             scaling_report)
    problem = _tiny_problem()
    K = 8

    mesh = make_mesh({"k": 2, "p": 4})
    plan = MeshPlan(mesh, {"plate_1": "p"}).with_all_K("k")
    step_sh, state_sh = train.qem(problem, K, lr=0.1, mesh_plan=plan)
    with mesh:
        compiled = step_sh.lower(state_sh, jax.random.key(0)).compile()
    inv = audit_compiled(compiled, expect=("all-reduce",))
    assert inv["all-reduce"]["count"] >= 1
    assert inv["all-reduce"]["bytes"] > 0

    step_plain, state_plain = train.qem(problem, K, lr=0.1)
    compiled_plain = step_plain.lower(state_plain, jax.random.key(0)).compile()
    audit_compiled(compiled_plain,
                   forbid=("all-reduce", "all-gather", "reduce-scatter",
                           "collective-permute", "all-to-all"))

    rep = scaling_report(1e9, inv, chip_counts=(8, 16, 64))
    effs = [rep[str(n)]["efficiency"] for n in (8, 16, 64)]
    assert all(0.0 < e <= 1.0 for e in effs)
    # fixed-payload collectives: efficiency decreases as compute thins out
    assert effs[0] >= effs[1] >= effs[2]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_collective_inventory_t_sharded_chain():
    """The T-sharded timeseries step's compiled HLO contains the boundary
    operator exchange (all-gather or collective-permute)."""
    from alan_tpu.parallel.hlo_audit import audit_compiled
    problem = _covid_shaped_problem()
    K = 8
    mesh = make_mesh({"t": 8})
    plan = MeshPlan(mesh, {"T": "t"})
    step_sh, state_sh = train.qem(problem, K, lr=0.1, mesh_plan=plan)
    with mesh:
        compiled = step_sh.lower(state_sh, jax.random.key(0)).compile()
    inv = audit_compiled(compiled)
    assert ("all-gather" in inv) or ("collective-permute" in inv), inv


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_split_meshplan_composition():
    """Split chunked-scan over one plate composes with mesh sharding of the
    other dims in the same step; results match the plain step exactly
    (VERDICT r2 next-step #4)."""
    from alan_tpu import Split
    problem = _tiny_problem()
    K = 8

    step_plain, state_plain = train.qem(problem, K, lr=0.1)
    (sP0, sQ0), elbo_plain = step_plain(state_plain, jax.random.key(0))

    mesh = make_mesh({"k": 2, "p": 4})
    plan = MeshPlan(mesh, {"plate_2": "p"}).with_all_K("k")
    step_sh, state_sh = train.qem(problem, K, lr=0.1,
                                  computation_strategy=Split("plate_1", 8),
                                  mesh_plan=plan)
    with mesh:
        (sP1, sQ1), elbo_sh = step_sh(state_sh, jax.random.key(0))

    assert np.isclose(float(elbo_plain), float(elbo_sh), rtol=1e-4, atol=1e-4)
    for k in sQ0["qem_params"]:
        a = np.asarray(sQ0["qem_params"][k].data)
        b = np.asarray(sQ1["qem_params"][k].data)
        assert np.allclose(a, b, rtol=1e-3, atol=1e-4), k


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_no_fullplate_gather_in_headline_compile():
    """Regression guard for the GSPMD merge-gather class (round 4): a
    reshape merging a sharded dim in non-major position silently inserts a
    full-plate all-gather.  The 8-device headline compile must keep every
    all-gather payload below the full-plate z*x broadcast size (two 1.6 MB
    gathers/step before the pos_op/contraction/lowrank fixes)."""
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "examples", "models"))
    import movielens
    from alan_tpu.parallel.hlo_audit import collective_inventory

    problem, _, _, _ = movielens.load_and_generate_problem(
        key=jax.random.key(0), Q_param_type="qem")
    mesh = make_mesh({"k": 2, "p": 4})
    plan = MeshPlan(mesh, {"plate_1": "p"}).with_all_K("k")
    step, state = train.qem(problem, 30, lr=0.1, mesh_plan=plan)
    with mesh:
        compiled = step.lower(state, jax.random.key(4)).compile()
    inv = collective_inventory(compiled.as_text())
    ag = inv.get("all-gather", {"count": 0, "bytes": 0})
    # full-plate gather of the K/4-sharded z*x broadcast = 15*300*5*18*4
    # = 1.62 MB; legitimate cross-K gathers total ~0.19 MB
    assert ag["bytes"] < 1_000_000, inv


# ---- all-models sharded-compile collective budgets (VERDICT r5 #7) ---------
# The GSPMD merge-gather bug class produced three instances in round 4 on
# just two audited models, and the round-5 all-models audit immediately
# caught a fourth: with_all_K left covid's K x K chain operators k-sharded,
# so GSPMD gathered + reduced at EVERY level of the chain tree (~573 MB of
# collectives per step; fixed by logpq._constrain_chain_operand -> ~15 MB).
# Budgets are ~3-10x the audited post-fix inventories
# (results/sharded_audit_all_models.json) — loose enough for benign compiler
# drift, tight enough that any full-plate or per-tree-level gather trips.
_AUDIT_BUDGETS = {
    # model: (mesh axes, dim2axis, all-gather byte cap, all-reduce byte cap)
    "bus_breakdown": ({"k": 2, "p": 2}, {"plate_ID": "p"}, 300_000, 200_000),
    "chimpanzees": ({"k": 2, "p": 2}, {"plate_blocks": "p"}, 200_000, 200_000),
    "occupancy": ({"k": 2, "p": 4}, {"plate_Ids": "p"}, 8_000_000, 2_000_000),
    "radon": ({"k": 2, "p": 4}, {"States": "p"}, 1_000_000, 200_000),
    "covid": ({"k": 2, "p": 4}, {"nRs": "p"}, 30_000_000, 5_000_000),
}


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("model_name", sorted(_AUDIT_BUDGETS))
def test_sharded_compile_collective_budget(model_name):
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "examples", "models"))
    from alan_tpu.parallel.hlo_audit import collective_inventory

    axes, shards, ag_cap, ar_cap = _AUDIT_BUDGETS[model_name]
    mod = __import__(model_name)
    problem, *_ = mod.load_and_generate_problem(
        key=jax.random.key(0), Q_param_type="qem")
    mesh = make_mesh(axes)
    plan = MeshPlan(mesh, shards).with_all_K("k")
    step, state = train.qem(problem, 30, lr=0.1, mesh_plan=plan)
    with mesh:
        compiled = step.lower(state, jax.random.key(4)).compile()
    inv = collective_inventory(compiled.as_text())
    ag = inv.get("all-gather", {"count": 0, "bytes": 0})
    ar = inv.get("all-reduce", {"count": 0, "bytes": 0})
    assert ag["bytes"] < ag_cap, inv
    assert ar["bytes"] < ar_cap, inv
