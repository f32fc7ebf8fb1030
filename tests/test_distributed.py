"""Multi-host launch validation (STATUS.md gap #2).

Spawns a real 2-process ``jax.distributed`` cluster on localhost (2 CPU
devices per process -> 4 global devices) and runs one K+plate-sharded QEM
step over the global mesh, with GSPMD placing the cross-process collectives.
Asserts the distributed result matches the single-process reference exactly
(same seed => same numbers within collective-reordering float tolerance) and
that both processes agree.

This is the JAX-native analog of a fake distributed backend test
(SURVEY.md §4 gap-fill; the reference has no multi-host story at all).
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

from alan_tpu import train
from alan_tpu.parallel.mesh import make_mesh, MeshPlan

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "_distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _reference_result():
    """Unsharded single-process reference (same seed, same program, no
    mesh plan) to compare the 2-process cluster result against."""
    from tests._distributed_worker import tiny_problem, ts_problem
    problem = tiny_problem()
    step, state0 = train.qem(problem, 8, lr=0.1)
    (sP, sQ), elbo = step(state0, jax.random.key(0))
    summaries = {k: [float(np.mean(np.asarray(v.data))),
                     float(np.sum(np.asarray(v.data) ** 2))]
                 for k, v in sQ["qem_params"].items()}
    step_t, state_t0 = train.qem(ts_problem(), 4, lr=0.1)
    _, elbo_t = step_t(state_t0, jax.random.key(1))
    return float(elbo), summaries, float(elbo_t)


def _spawn_cluster(tmp_path, nproc, attempt):
    """Launch the loopback cluster once; returns (procs, logs, outs)."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    env["PYTHONPATH"] = _REPO
    outs = [str(tmp_path / f"out{attempt}_{i}.json") for i in range(nproc)]
    procs = [subprocess.Popen(
        [sys.executable, _WORKER, str(i), str(nproc), str(port), outs[i]],
        env=env, cwd=_REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(nproc)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        logs.append(out.decode(errors="replace"))
    return procs, logs, outs


@pytest.mark.skipif(sys.platform != "linux", reason="loopback cluster test")
def test_two_process_cluster_matches_single_process(tmp_path):
    nproc = 2
    # _free_port() hands the port to the coordinator process only after
    # closing it (TOCTOU); retry the whole spawn if another process stole it.
    for attempt in range(3):
        procs, logs, outs = _spawn_cluster(tmp_path, nproc, attempt)
        if all(p.returncode == 0 for p in procs):
            break
        bind_race = any("address already in use" in log.lower()
                        or "failed to bind" in log.lower() for log in logs)
        if not bind_race:
            break
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    assert all(r["n_global_devices"] == 2 * nproc for r in results)

    # both processes computed the same global program; tight tolerance
    # (rather than ==) guards against nondeterministic collective scheduling
    assert results[0]["elbo"] == pytest.approx(results[1]["elbo"], abs=1e-5)
    for k, pair in results[0]["qem_params"].items():
        assert pair == pytest.approx(results[1]["qem_params"][k],
                                     rel=1e-7, abs=1e-9), k

    # distributed == single-process (collective reordering tolerance)
    elbo_ref, summ_ref, elbo_t_ref = _reference_result()
    assert results[0]["elbo"] == pytest.approx(elbo_ref, rel=1e-4, abs=1e-4)
    # T-sharded timeseries chain across the process boundary
    assert results[0]["ts_elbo"] == pytest.approx(elbo_t_ref,
                                                  rel=1e-4, abs=1e-4)
    assert results[0]["ts_elbo"] == pytest.approx(results[1]["ts_elbo"],
                                                  abs=1e-5)
    for k, (m, s2) in summ_ref.items():
        dm, ds2 = results[0]["qem_params"][k]
        assert dm == pytest.approx(m, rel=1e-4, abs=1e-4), k
        assert ds2 == pytest.approx(s2, rel=1e-4, abs=1e-4), k
