"""Smoke tests keeping the example models and runner green (tiny configs)."""
import os
import subprocess
import sys

import jax
import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
sys.path.insert(0, os.path.join(EXAMPLES, "models"))
sys.path.insert(0, EXAMPLES)


@pytest.mark.parametrize("name,qtype", [
    ("movielens", "qem"), ("movielens", "opt"),
    ("bus_breakdown", "qem"), ("chimpanzees", "opt"),
    ("radon", "qem"), ("occupancy", "qem"),
    ("synthetic_model", "qem"),
    ("movielens_reparam", "qem"), ("bus_breakdown_reparam", "opt"),
    ("occupancy_reparam", "qem"), ("radon_reparam", "qem"),
])
def test_model_elbo(name, qtype):
    mod = __import__(name)
    problem, all_data, all_cov, all_ps = mod.load_and_generate_problem(
        key=jax.random.key(0), Q_param_type=qtype)
    s = problem.sample(K=3, reparam=False)
    assert np.isfinite(float(s.elbo_nograd()))


def test_covid_timeseries_elbo():
    import covid
    # shrink the model for test speed
    platesizes, all_ps, data, all_data, cov, all_cov = covid.load_data_covariates(
        key=jax.random.key(0), nRs=4, nDs=16)
    problem = covid.generate_problem(platesizes, data, cov, "opt")
    s = problem.sample(K=3, reparam=False)
    assert np.isfinite(float(s.elbo_nograd()))


def test_covid_reparam_elbo():
    import covid_reparam
    platesizes, all_ps, data, all_data, cov, all_cov = \
        covid_reparam.load_data_covariates(key=jax.random.key(0), nRs=4, nDs=16)
    problem = covid_reparam.generate_problem(platesizes, data, cov, "opt")
    s = problem.sample(K=3, reparam=False)
    assert np.isfinite(float(s.elbo_nograd()))


def test_covid_importance_sample_ffbs():
    import covid
    platesizes, all_ps, data, all_data, cov, all_cov = covid.load_data_covariates(
        key=jax.random.key(0), nRs=3, nDs=10)
    problem = covid.generate_problem(platesizes, data, cov, "opt")
    s = problem.sample(K=3, reparam=False)
    isamp = s.importance_sample(N=5)
    li = isamp.samples_flatdict["log_infected"]
    assert set(li.dims) == {"N", "nRs", "nDs"}
    assert np.all(np.isfinite(np.asarray(li.data)))


def test_runner_cli():
    import runner
    r = runner.run("movielens", method="qem", K=3, iters=3)
    assert np.isfinite(r["elbo_end"])


def test_timeseries_proposal_in_Q():
    """Q may itself contain a Timeseries proposal (reference checking.py:90-96)."""
    import jax.numpy as jnp
    from alan_tpu import Normal, Plate, BoundPlate, Problem, Timeseries, Data, named
    P = Plate(
        init=Normal(0., 1.),
        T=Plate(
            ts=Timeseries('init', Normal(lambda prev: 0.9 * prev, 0.1)),
            obs=Normal('ts', 1.),
        ),
    )
    Q = Plate(
        init=Normal(0., 1.),
        T=Plate(
            ts=Timeseries('init', Normal(lambda prev: 0.9 * prev, 0.2)),
            obs=Data(),
        ),
    )
    bP, bQ = BoundPlate(P, {'T': 5}), BoundPlate(Q, {'T': 5})
    data = {'obs': named(jnp.asarray(np.random.default_rng(0).standard_normal(5),
                                     jnp.float32), 'T')}
    prob = Problem(bP, bQ, data)
    s = prob.sample(K=4, reparam=True, key=jax.random.key(0))
    assert np.isfinite(float(s.elbo_vi()))


def test_covid_extend_predictive():
    """Timeseries roll-forward extension + predictive LL end to end."""
    import covid
    platesizes, all_ps, data, all_data, cov, all_cov = covid.load_data_covariates(
        key=jax.random.key(0), nRs=3, nDs=10)
    problem = covid.generate_problem(platesizes, data, cov, "opt")
    s = problem.sample(K=3, reparam=False, key=jax.random.key(1))
    ext = s.importance_sample(N=5).extend(dict(all_ps), extended_inputs=all_cov)
    li = ext.samples_flatdict['log_infected']
    assert li.dim_size('nDs') == all_ps['nDs']
    pll = ext.predictive_ll({'obs': all_data['obs']})
    assert np.isfinite(float(pll['obs'].data))


SIMPLE_EXAMPLES = sorted(
    f[:-3] for f in os.listdir(os.path.join(EXAMPLES, "simple_examples"))
    if f.endswith(".py"))


@pytest.mark.parametrize("name", SIMPLE_EXAMPLES)
def test_simple_example_runs(name):
    """Every simple example runs end-to-end (parity: reference
    examples/simple_examples/*.py, incl. linear_gaussian{,_plated})."""
    path = os.path.join(EXAMPLES, "simple_examples", name + ".py")
    prog = ("import jax; jax.config.update('jax_platforms','cpu'); "
            f"import runpy; runpy.run_path({path!r}, run_name='__main__')")
    res = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                         text=True, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]


def test_gridspec_expand(tmp_path):
    """Declarative grid schema expands methods x Ks_lrs x seeds into runner
    argv lists and alan-grid command lines (reference conf.yaml analog)."""
    import gridspec
    spec_text = """
defaults:
  iters: 5
  out_dir: res
jobs:
  - model: movielens
    methods: [qem, vi]
    Ks_lrs: {3: [0.1, 0.01], 10: [0.1]}
    seeds: [0, 1]
  - model: covid
    methods: [rws]
    Ks_lrs: {3: [0.01]}
    split: {plate: nRs, size: 23}
    mesh: k=2
    shard_all_k: k
    devices: 2
"""
    p = tmp_path / "spec.yaml"
    p.write_text(spec_text)
    spec = gridspec.load_spec(str(p))
    jobs = gridspec.expand(spec)
    # movielens: 2 methods x 3 (K,lr) x 2 seeds = 12; covid: 1
    assert len(jobs) == 13
    first = jobs[0]
    assert first[:4] == ["--model", "movielens", "--method", "qem"]
    assert "--iters" in first and first[first.index("--iters") + 1] == "5"
    assert first[first.index("--out") + 1] == "res/movielens_qem_K3_lr0.1_s0.json"
    cov = jobs[-1]
    i = cov.index("--split")
    assert cov[i + 1:i + 3] == ["nRs", "23"]
    assert cov[cov.index("--mesh") + 1] == "k=2"
    assert cov[cov.index("--shard-all-k") + 1] == "k"
    lines = gridspec.command_lines(spec)
    assert len(lines) == 13
    assert lines[0].startswith("python examples/runner.py --model movielens")

    # JSON round-trip of the same schema
    import json
    pj = tmp_path / "spec.json"
    pj.write_text(json.dumps(spec))
    assert gridspec.expand(gridspec.load_spec(str(pj))) == jobs

    # unknown fields are rejected loudly
    import pytest as _pytest
    bad = tmp_path / "bad.yaml"
    bad.write_text("jobs:\n  - model: m\n    nonsense: 1\n")
    with _pytest.raises(ValueError, match="nonsense"):
        gridspec.load_spec(str(bad))


def test_gridspec_axis_shadows_scalar_default():
    """A scalar lr/K/method/seed in defaults must not be re-emitted when a
    job uses the axis form: argparse last-wins would silently override
    every axis value (ADVICE r3)."""
    import gridspec
    spec = {"defaults": {"lr": 0.9, "K": 99, "method": "vi", "seed": 7,
                         "iters": 3},
            "jobs": [{"model": "movielens", "methods": ["qem", "rws"],
                      "Ks_lrs": {30: [0.1, 0.05]}, "seeds": [0, 1]}]}
    jobs = gridspec.expand(spec)
    assert len(jobs) == 8
    for argv in jobs:
        for flag in ("--lr", "--K", "--method", "--seed"):
            assert argv.count(flag) == 1, (flag, argv)
        assert argv[argv.index("--K") + 1] == "30"
        assert argv[argv.index("--lr") + 1] in ("0.1", "0.05")
        assert argv[argv.index("--method") + 1] in ("qem", "rws")
        assert argv[argv.index("--seed") + 1] in ("0", "1")


def test_runner_grid_mode(tmp_path):
    """`runner.py --grid spec.yaml` runs every expanded job in-process."""
    spec = tmp_path / "g.yaml"
    out1 = tmp_path / "a.json"
    spec.write_text(
        "jobs:\n"
        "  - model: movielens\n"
        "    methods: [qem]\n"
        "    Ks_lrs: {3: [0.1]}\n"
        f"    iters: 2\n    out: {out1}\n")
    res = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, "runner.py"),
         "--grid", str(spec)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert res.returncode == 0, res.stderr[-2000:]
    import json
    r = json.loads(out1.read_text())
    assert np.isfinite(r["elbos"][-1])
