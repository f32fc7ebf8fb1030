"""Secondary benchmarks: throughput vs K, and sharding scaling on the
virtual mesh.  Writes results to ``BENCH_DETAIL.json`` (the headline driver
metric stays in ``bench.py``).

  python bench_scaling.py            # K sweep on the default backend
  python bench_scaling.py --mesh     # sharded-vs-unsharded on 8 CPU devices
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "examples", "models"))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def time_step(step, state, n=10):
    """Per-step time by the slope between two loop lengths, each ended by a
    host *fetch* of the result.  In this environment device buffers travel a
    remote tunnel whose ``block_until_ready`` can return before execution
    finishes — only a value transfer is a reliable completion barrier; the
    two-length slope cancels the constant fetch/dispatch overhead."""
    import numpy as np
    state0 = state
    state, elbo = step(state0, jax.random.key(0))
    float(np.asarray(elbo))                      # compile + settle
    totals = {}
    for N in (n, 4 * n):
        state = state0
        t0 = time.perf_counter()
        for i in range(N):
            state, elbo = step(state, jax.random.key(i + 1))
        v = float(np.asarray(elbo))
        totals[N] = time.perf_counter() - t0
    return (totals[4 * n] - totals[n]) / (3 * n), v


def _grouped_movielens():
    """movielens with mu_z/psi_z grouped: cuts the z-factor from
    K^3 x plate to K^2 x plate (the reference Group rationale,
    ``Group.py:13-45``), enabling K >= 300."""
    import jax.numpy as jnp
    import movielens
    from alan_tpu import (Normal, Bernoulli, Plate, BoundPlate, Problem, Data,
                          QEMParam, Group)
    platesizes, all_ps, data, all_data, cov, all_cov = \
        movielens.load_data_covariates(key=jax.random.key(0))
    d_z = movielens.d_z
    P = movielens.get_P(platesizes, cov)
    Q = Plate(
        g=Group(
            mu_z=Normal(QEMParam(jnp.zeros(d_z)), QEMParam(jnp.ones(d_z))),
            psi_z=Normal(QEMParam(jnp.zeros(d_z)), QEMParam(jnp.ones(d_z))),
        ),
        plate_1=Plate(
            z=Normal(QEMParam(jnp.zeros(d_z)), QEMParam(jnp.ones(d_z))),
            plate_2=Plate(obs=Data()),
        ),
    )
    Q = BoundPlate(Q, platesizes, inputs=cov)
    return Problem(P, Q, data)


def k_sweep(Ks=(10, 30, 100), grouped_Ks=(100, 300, 1000)):
    import movielens
    from alan_tpu import train
    with jax.default_device(jax.devices("cpu")[0]):
        problem, _, _, _ = movielens.load_and_generate_problem(
            key=jax.random.key(0), Q_param_type="qem")
        grouped = _grouped_movielens()
    out = {}
    for tag, prob, ks in [("ungrouped", problem, Ks),
                          ("grouped", grouped, grouped_Ks)]:
        for K in ks:
            step, state = train.qem(prob, K, lr=0.1)
            dt, elbo = time_step(step, state)
            out[f"{tag}_K{K}"] = {"step_s": dt,
                                  "samples_per_s": K * (2 + movielens.M) / dt,
                                  "elbo": elbo}
            print(f"{tag} K={K:5d}: {dt*1e3:8.2f} ms/step  "
                  f"{out[f'{tag}_K{K}']['samples_per_s']:.3e} samples/s",
                  flush=True)
    return out


def mesh_scaling(K=64):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")
    import movielens
    from alan_tpu import train
    from alan_tpu.parallel.mesh import make_mesh, MeshPlan
    n = len(jax.devices())
    platesizes, all_ps, data, all_data, cov, all_cov = \
        movielens.load_data_covariates(key=jax.random.key(0), M=256, N=4)
    problem = movielens.generate_problem(platesizes, data, cov, "qem")

    out = {}
    step, state = train.qem(problem, K, lr=0.1)
    dt, _ = time_step(step, state, n=5)
    out["1dev"] = dt
    for p in [2, 4, 8]:
        if p > n:
            continue
        mesh = make_mesh({"p": p})
        plan = MeshPlan(mesh, {"plate_1": "p"})
        step, state = train.qem(problem, K, lr=0.1, mesh_plan=plan)
        with mesh:
            dt, _ = time_step(step, state, n=5)
        out[f"{p}dev"] = dt
        print(f"devices={p}: {dt*1e3:.1f} ms/step (1dev {out['1dev']*1e3:.1f})")
    return out


def grid_throughput(K=30, Rs=(1, 4, 8), n=20):
    """Batched seed-grid throughput: R independent runs x n iters fused into
    one program via ``train.vmap_runs`` (slope timing over two scan lengths,
    best of 3)."""
    import numpy as np
    import movielens
    from alan_tpu import train
    with jax.default_device(jax.devices("cpu")[0]):
        problem, _, _, _ = movielens.load_and_generate_problem(
            key=jax.random.key(0), Q_param_type="qem")
    step, state0 = train.qem(problem, K, lr=0.1)
    key = jax.random.key(7)
    out = {}
    for R in Rs:
        runs = {N: train.vmap_runs(step, N, R) for N in (n, 4 * n)}
        for r in runs.values():             # compile + settle
            _, e = r(state0, key)
            float(np.asarray(e).ravel()[-1])
        best = None
        for _ in range(3):
            t = {}
            for N, r in runs.items():
                t0 = time.perf_counter()
                _, e = r(state0, key)
                float(np.asarray(e).ravel()[-1])
                t[N] = time.perf_counter() - t0
            dt = (t[4 * n] - t[n]) / (3 * n)
            best = dt if best is None else min(best, dt)
        out[f"R{R}"] = {"iter_s": best, "run_iter_s": best / R}
        print(f"R={R}: {best*1e3:.3f} ms/iter ({best/R*1e3:.3f} ms/run-iter)",
              flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--grid", action="store_true")
    args = ap.parse_args()
    if args.mesh:
        result = {"mesh": mesh_scaling()}
    elif args.grid:
        result = {"grid_throughput_movielens_K30": grid_throughput()}
    else:
        result = {"k_sweep": k_sweep()}
    path = "BENCH_DETAIL.json"
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    prev.update(result)
    with open(path, "w") as f:
        json.dump(prev, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
