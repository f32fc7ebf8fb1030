"""Infrastructure tests: checkpoint/resume, native path planner, grid
executor."""
import os
import subprocess

import jax
import numpy as np

import model_model1 as m
from alan_tpu import train
from alan_tpu.checkpointing import save_problem, load_problem


def test_checkpoint_resume(tmp_path):
    prob = m.tp.problem
    train.fit(prob, method="qem", K=5, iters=3)
    p = str(tmp_path / "ck")
    save_problem(p, prob, extra={"step": 3})

    prob2 = m.tp.problem
    extra = load_problem(p, prob2)
    assert extra == {"step": 3}
    for k, v in prob.Q.qem_means().items():
        w = prob2.Q.qem_means()[k]
        assert v.dims == w.dims
        assert np.allclose(np.asarray(v.data), np.asarray(w.data))

    # resumed run continues deterministically from the same state
    # (prob and prob2 share the module-level BoundPlates, so restore the
    # checkpoint between the two runs)
    e1 = train.fit(prob, method="qem", K=5, iters=2, key=jax.random.key(9))
    load_problem(p, prob2)
    e2 = train.fit(prob2, method="qem", K=5, iters=2, key=jax.random.key(9))
    assert np.allclose(np.asarray(e1), np.asarray(e2))


def test_native_planner_matches_fallback():
    import alan_tpu.ops.pathopt as po
    if po._load() is None:
        import pytest
        pytest.skip("native planner not built")
    prob = m.tp.problem
    s = prob.sample(K=5, key=jax.random.key(3))
    e1 = float(s.elbo_nograd())
    po._LIB = None
    po.plan_path.cache_clear()
    e2 = float(s.elbo_nograd())
    po._TRIED = False
    po._load()
    assert abs(e1 - e2) < 1e-4


def test_grid_executor(tmp_path):
    exe = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "alan_tpu", "_native", "alan-grid")
    if not os.path.exists(exe):
        import pytest
        pytest.skip("alan-grid not built")
    cmds = tmp_path / "cmds.txt"
    out = tmp_path / "out"
    cmds.write_text(f"true\ntrue\necho hi > {out}\n")
    status = tmp_path / "status.tsv"
    r = subprocess.run([exe, "-j", "2", "-t", "30", "-s", str(status), str(cmds)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert out.read_text().strip() == "hi"
    lines = [l for l in status.read_text().splitlines() if "\tok\t" in l]
    assert len(lines) == 3
    # resume: all jobs marked ok are skipped
    r2 = subprocess.run([exe, "-j", "2", "-s", str(status), str(cmds)],
                        capture_output=True, text=True)
    assert r2.returncode == 0


def test_native_planner_path_quality():
    """The exact DP should never be worse than a left-to-right fold on a
    chain-structured network (and typically much better)."""
    import alan_tpu.ops.pathopt as po
    if po._load() is None:
        import pytest
        pytest.skip("native planner not built")
    # chain: f0(a,b) f1(b,c) f2(c,d) f3(d,e) with big end dims
    factor_dims = (("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    sizes = (("a", 2), ("b", 100), ("c", 100), ("d", 100), ("e", 2))
    path = po.plan_path(factor_dims, sizes, ("a", "e"))
    assert len(path) == 3
    # every step is a pair
    for step in path:
        assert len(step) in (1, 2)


def test_grid_executor_consumes_gridspec(tmp_path):
    """Declarative spec -> gridspec expansion -> native alan-grid execution
    (the run_grid.sh path), end-to-end on a tiny 2-job grid."""
    import sys
    root = os.path.dirname(os.path.dirname(__file__))
    exe = os.path.join(root, "alan_tpu", "_native", "alan-grid")
    if not os.path.exists(exe):
        import pytest
        pytest.skip("alan-grid not built")
    sys.path.insert(0, os.path.join(root, "examples"))
    import gridspec

    spec = tmp_path / "spec.yaml"
    out_dir = tmp_path / "res"
    out_dir.mkdir()
    spec.write_text(
        "defaults:\n"
        "  iters: 2\n"
        "  platform: cpu\n"
        f"  out_dir: {out_dir}\n"
        "jobs:\n"
        "  - model: movielens\n"
        "    methods: [qem, rws]\n"
        "    Ks_lrs: {3: [0.1]}\n")
    lines = gridspec.command_lines(
        gridspec.load_spec(str(spec)),
        runner=os.path.join(root, "examples", "runner.py"),
        python=sys.executable)
    cmds = tmp_path / "cmds.txt"
    cmds.write_text("\n".join(lines) + "\n")
    status = tmp_path / "status.tsv"
    r = subprocess.run([exe, "-j", "2", "-t", "600", "-s", str(status),
                       str(cmds)], capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, (r.stdout[-500:], r.stderr[-1000:])
    import json
    outs = sorted(out_dir.glob("*.json"))
    assert len(outs) == 2, outs
    for p in outs:
        rec = json.loads(p.read_text())
        assert np.isfinite(rec["elbos"][-1]), p


def test_checkpoint_scheduled_qem_state(tmp_path):
    """The qem lr-schedule state ((stateP, stateQ), t) round-trips through
    save/load_checkpoint and resumes bit-exactly."""
    from alan_tpu.checkpointing import save_checkpoint, load_checkpoint
    prob = m.tp.problem
    step, state = train.qem(prob, 5, lr="0.1/t@2")
    for i in range(3):
        state, _ = step(state, jax.random.fold_in(jax.random.key(4), i))
    p = str(tmp_path / "sched_ck")
    save_checkpoint(p, state)
    state2 = load_checkpoint(p)
    assert float(state2[1]) == float(state[1]) == 3.0
    s_a, _ = step(state, jax.random.key(5))
    s_b, _ = step(state2, jax.random.key(5))
    fa = jax.tree.map(np.asarray, jax.tree.leaves(s_a))
    fb = jax.tree.map(np.asarray, jax.tree.leaves(s_b))
    for a, b in zip(fa, fb):
        assert np.array_equal(a, b)
