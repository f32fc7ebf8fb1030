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
import numpy as np

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
    # warm up chained calls until the state aval reaches a fixpoint: the
    # returned state can differ from the input in weak_type, dtype or
    # sharding for the first call or two, and each distinct signature
    # compiles separately — any compile left inside the first timed loop
    # turns the slope negative
    def sig(tree):
        return [(getattr(x, "shape", None), getattr(x, "dtype", None),
                 getattr(getattr(x, "aval", None), "weak_type", None),
                 str(getattr(x, "sharding", None)))
                for x in jax.tree.leaves(tree)]
    state, elbo = step(state0, jax.random.key(0))
    for _ in range(4):
        prev_sig = sig(state)
        state, elbo = step(state, jax.random.key(0))
        if sig(state) == prev_sig:
            break
    float(np.asarray(elbo))                      # compile + settle
    # best-of-reps with positive-only selection: the remote tunnel adds
    # occasional multi-second stalls that can turn a single slope negative
    best, v = None, None
    for _ in range(2):
        totals = {}
        for N in (n, 4 * n):
            state = state0
            t0 = time.perf_counter()
            for i in range(N):
                state, elbo = step(state, jax.random.key(i + 1))
            v = float(np.asarray(elbo))
            totals[N] = time.perf_counter() - t0
        dt = (totals[4 * n] - totals[n]) / (3 * n)
        if dt > 0 and (best is None or dt < best):
            best = dt
    return (best if best is not None else dt), v


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


def pod_scaling(K=64, base_M=128, N=4, ts_K=128, ts_T=512):
    """Weak-scaling harness for real multi-chip hardware (VERDICT r1 #6) —
    one command produces the 1-chip → n-chip efficiency table the
    BASELINE.md ≥80% target needs; runs unchanged on a pod (it uses
    whatever ``jax.devices()`` offers; on the CPU virtual mesh the devices
    share cores, so efficiency there is a correctness smoke only).

    Two measurements per device count n:
      * weak-scaled data-parallel QEM: movielens with plate_1 = base_M·n,
        plate sharded over n devices — ``samples_per_s`` should grow ∝ n
        (efficiency = rate_n / (n · rate_1)).
      * T-sharded timeseries boundary exchange: chain_logmmexp over
        [ts_T, ts_K, ts_K] with T sharded, all_gather vs ppermute-ring —
        plus the same chain WITHOUT the collective (local product only),
        isolating collective time without a profiler dependency.
    """
    import movielens
    from alan_tpu import train
    from alan_tpu.parallel.mesh import make_mesh, MeshPlan
    from alan_tpu.parallel.seq import chain_logmmexp_sharded
    from alan_tpu.ops.logmmexp import chain_logmmexp
    import jax.numpy as jnp

    devs = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32, 64, 128, 256)
              if n <= len(devs)]
    out = {"device_kind": getattr(devs[0], "device_kind", devs[0].platform),
           "n_devices_available": len(devs)}

    # -- weak-scaled DP QEM ------------------------------------------------
    dp = {}
    rate1 = None
    for n in counts:
        M = base_M * n
        platesizes, _, data, _, cov, _ = movielens.load_data_covariates(
            key=jax.random.key(0), M=M, N=4)
        problem = movielens.generate_problem(platesizes, data, cov, "qem")
        if n == 1:
            step, state = train.qem(problem, K, lr=0.1)
            dt, _ = time_step(step, state, n=5)
        else:
            mesh = make_mesh({"p": n})
            plan = MeshPlan(mesh, {"plate_1": "p"})
            step, state = train.qem(problem, K, lr=0.1, mesh_plan=plan)
            with mesh:
                dt, _ = time_step(step, state, n=5)
        rate = K * (2 + M) / dt
        if rate1 is None:
            rate1 = rate / 1  # per-device base
        eff = rate / (n * rate1)
        dp[f"{n}dev"] = {"M": M, "step_s": dt, "samples_per_s": rate,
                         "efficiency": eff}
        print(f"[dp]  n={n:3d}  M={M:6d}  {dt*1e3:8.2f} ms/step  "
              f"samples/s={rate:.3e}  eff={eff:.2f}", flush=True)
    out["weak_scaling_dp"] = dp

    # -- T-sharded chain: collective breakdown ------------------------------
    rng = np.random.default_rng(0)
    sp = {}
    for n in counts:
        T = ts_T * n                         # weak scaling in T
        ms = jnp.asarray(rng.standard_normal((T, ts_K, ts_K)) * 0.1,
                         jnp.float32)
        row = {}
        if n == 1:
            f_local = jax.jit(chain_logmmexp)
            row["local_s"] = time_fn(f_local, ms)
        else:
            mesh = make_mesh({"t": n})
            for method in ("all_gather", "ring"):
                f = jax.jit(lambda m, method=method, mesh=mesh:
                            chain_logmmexp_sharded(m, mesh, "t",
                                                   method=method))
                with mesh:
                    row[f"{method}_s"] = time_fn(f, ms)
            # the same chain with NO boundary exchange: an embarrassingly
            # sharded batch of independent local chains (lower bound)
            ms_b = ms.reshape(n, T // n, ts_K, ts_K)
            mesh = make_mesh({"t": n})
            from jax.sharding import NamedSharding, PartitionSpec as PS
            ms_b = jax.device_put(ms_b, NamedSharding(mesh, PS("t")))
            f_nb = jax.jit(chain_logmmexp)
            with mesh:
                row["local_only_s"] = time_fn(f_nb, ms_b)
            for method in ("all_gather", "ring"):
                row[f"{method}_collective_overhead_s"] = (
                    row[f"{method}_s"] - row["local_only_s"])
        sp[f"{n}dev"] = {"T": T, **row}
        print(f"[sp]  n={n:3d}  T={T:6d}  " + "  ".join(
            f"{k}={v*1e3:.2f}ms" for k, v in row.items()), flush=True)
    out["weak_scaling_seq"] = sp
    return out


def time_fn(f, *args, n=5):
    """Seconds per call of a jitted fn, fetch-ended slope timing."""
    r = f(*args)
    float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
    totals = {}
    for N in (n, 4 * n):
        t0 = time.perf_counter()
        for _ in range(N):
            r = f(*args)
        float(np.asarray(jax.tree.leaves(r)[0]).ravel()[0])
        totals[N] = time.perf_counter() - t0
    return (totals[4 * n] - totals[n]) / (3 * n)


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


def canonical_models(K=30):
    """Fused-training-step time for every canonical workload (BASELINE.md
    model table) at K=30.  Every model is benchmarked with QEM (all six,
    covid included, support ``Q_param_type='qem'`` — as in the reference's
    covid.py:113); the RWS entry is only a fallback should a model's QEM
    step fail at runtime."""
    from alan_tpu import train
    out = {}
    for name in ("movielens", "bus_breakdown", "chimpanzees", "occupancy",
                 "radon", "covid"):
        model = __import__(name)
        for qtype, maker, kw in (("qem", train.qem, {"lr": 0.1}),
                                 ("opt", train.rws, {"lr": 0.01})):
            try:
                with jax.default_device(jax.devices("cpu")[0]):
                    problem, *_ = model.load_and_generate_problem(
                        key=jax.random.key(0), Q_param_type=qtype)
                step, state = maker(problem, K, **kw)
                dt, elbo = time_step(step, state, n=5)
            except Exception as e:
                out[name] = {"error": f"{qtype}: {type(e).__name__}: {e}"}
                continue
            n_sites = sum(int(np.prod([problem.all_platedims[p]
                                       for p in pl], dtype=np.int64))
                          for _, pl in _latent_sites(problem))
            out[name] = {"method": "qem" if qtype == "qem" else "rws",
                         "step_s": dt, "elbo": elbo,
                         "latent_site_copies": n_sites,
                         "samples_per_s": K * n_sites / dt}
            print(f"{name:14s} [{out[name]['method']}] K={K}: "
                  f"{dt*1e3:8.2f} ms/step  "
                  f"{out[name]['samples_per_s']:.3e} samples/s", flush=True)
            break
    return out


def _latent_sites(problem):
    """(varname, enclosing platenames) for every latent site in Q
    (``flat_prog`` already flattens Groups into their member dists)."""
    sites = []

    def walk(plate, platenames):
        from alan_tpu.ir.plate import Plate as IRPlate
        from alan_tpu.ir.data import Data as IRData
        for name, node in plate.flat_prog.items():
            if isinstance(node, IRPlate):
                walk(node, platenames + [name])
            elif not isinstance(node, IRData):
                sites.append((name, platenames))

    walk(problem.Q.plate, [])
    return sites


def _flat_qem_means(stateQ):
    import jax.numpy as jnp
    return jnp.concatenate([jnp.ravel(v.data)
                            for _, v in sorted(stateQ["qem_means"].items())])


def _gold_moments(problem, gold_K, gold_seeds, gold_iters, lr):
    """Converged-Q gold moments (see time_to_moment_error docstring)."""
    import jax.numpy as jnp
    from alan_tpu import train
    gold_step, gold_state0 = train.qem(problem, gold_K, lr=lr)
    gold_read, _ = train.qem(problem, gold_K, lr=1.0)

    @jax.jit
    def gold_fn(key):
        def one(k):
            def body(s, i):
                s2, _ = gold_step(s, jax.random.fold_in(k, i))
                return s2, None
            s, _ = jax.lax.scan(body, gold_state0, jnp.arange(gold_iters))
            (_, sQ), _ = gold_read(s, jax.random.fold_in(k, gold_iters))
            return _flat_qem_means(sQ)
        # sequential over seeds (lax.map, body compiled once): vmapping all
        # seeds multiplies the cross-K factor tensors by gold_seeds and at
        # K>=300 the backend compiler aborts on a >2^31-byte reshape
        # (jellyfish windowing_util CouldLeS32 check)
        return jnp.mean(jax.lax.map(one, jax.random.split(key, gold_seeds)),
                        0)

    gold = gold_fn(jax.random.key(123))
    return gold, jnp.mean(gold ** 2)


def _tte_row(problem, K, gold, gold_norm, iters, lr):
    """Error trajectory + timed step for one K; thresholds vs initial error."""
    import jax.numpy as jnp
    from alan_tpu import train
    step, state0 = train.qem(problem, K, lr=lr)

    @jax.jit
    def traj(state, key):
        def body(s, i):
            s2, _ = step(s, jax.random.fold_in(key, i))
            (_, sQ) = s2
            err = jnp.mean((_flat_qem_means(sQ) - gold) ** 2) / gold_norm
            return s2, err
        _, errs = jax.lax.scan(body, state, jnp.arange(iters))
        return errs

    errs = np.asarray(traj(state0, jax.random.key(7)))
    step_s, _ = time_step(step, state0, n=10)
    err0 = float(errs[0])
    out = {"K": K, "step_s": step_s, "err_iter1": err0,
           "err_final": float(errs[-1]), "iters": iters,
           "err_min_frac": float(np.min(errs) / err0),
           "iters_to_min": int(np.argmin(errs)) + 1}
    for frac in (0.3, 0.1, 0.03):
        hit = np.nonzero(errs <= frac * err0)[0]
        it = int(hit[0]) + 1 if hit.size else None
        out[f"iters_to_{int(frac*100)}pct"] = it
        out[f"time_to_{int(frac*100)}pct_s"] = (
            it * step_s if it is not None else None)
    return out


def tte_by_K(Ks=(30, 100, 300), iters=300, lr=0.1, gold_K=1000,
             gold_seeds=8, gold_iters=250):
    """Time-to-moment-error across K (VERDICT r3 #7: the finite-K proposal
    bias floor should drop with K, taking the BASELINE 3% row non-null at
    some K — the claim that makes the MP method interesting).  One shared
    high-K converged-Q gold; per-K error trajectories against it.

    Uses the GROUPED movielens (mu_z/psi_z share one K-dim): the ungrouped
    model's z-factor carries THREE parent K-dims, so K=300 means a
    300x500^3-class K^3 tensor (~100 GB) no backend can hold — the exact
    blowup the reference's Group exists to avoid (``Group.py:13-45``).
    Grouped, the factor is K^2 and K=1000 is measured at 8.3 ms/step, so
    the gold runs at K=1000 with seeds sequential (``lax.map``; vmapping
    seeds at K>=300 also dies on a >2^31-byte reshape in the backend).

    Reference machinery analog: moments-vs-K sweeps in
    ``examples/moments_paper_plots/moments_paper_plots.py:47-116``."""
    with jax.default_device(jax.devices("cpu")[0]):
        problem = _grouped_movielens()
    gold, gold_norm = _gold_moments(problem, gold_K, gold_seeds, gold_iters,
                                    lr)
    out = {"model": "grouped_movielens", "gold_K": gold_K,
           "gold_seeds": gold_seeds, "lr": lr}
    for K in Ks:
        out[f"K{K}"] = _tte_row(problem, K, gold, gold_norm, iters, lr)
        print(f"K={K}:", json.dumps(out[f"K{K}"]), flush=True)
    return out


def time_to_moment_error(K=30, iters=300, lr=0.1, gold_K=100, gold_seeds=8,
                         gold_iters=250):
    """Time-to-moment-error, the second half of the BASELINE.md headline
    metric (MovieLens, K=30).

    QEM's state *is* a posterior-moment estimate (the EMA'd sufficient
    stats), so the error trajectory falls out of the training scan directly.
    Gold = posterior moments from *converged* QEM at ``gold_K``: train
    ``gold_iters`` steps (so the proposal Q is the trained one — a raw
    high-K estimate under the INITIAL Q is biased by the bad proposal and
    the trained trajectory moves away from it), then one lr=1.0 step whose
    EMA write-through is the raw moment estimate under that converged Q;
    averaged over ``gold_seeds`` independent seeds.  Error(t) = MSE over all
    sufficient-stat coordinates, normalised by the gold second moment;
    reported are the wall-clock times to reach 30%/10%/3% of the
    *initial* error (the error after one step from init).  The fixed-lr EMA
    noise floor shows up as ``err_min_frac``: thresholds below it are null,
    honestly, rather than read off noise (see ``tte_by_K`` for the floor
    dropping with K).
    """
    import movielens
    with jax.default_device(jax.devices("cpu")[0]):
        problem, *_ = movielens.load_and_generate_problem(
            key=jax.random.key(0), Q_param_type="qem")
    gold, gold_norm = _gold_moments(problem, gold_K, gold_seeds, gold_iters,
                                    lr)
    out = _tte_row(problem, K, gold, gold_norm, iters, lr)
    out.update(gold_K=gold_K, gold_seeds=gold_seeds)
    print(json.dumps(out, indent=1), flush=True)
    return out

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--grid", action="store_true")
    ap.add_argument("--models", action="store_true")
    ap.add_argument("--tte", action="store_true")
    ap.add_argument("--tte-by-k", action="store_true",
                    help="TTE at K=30/100/300 vs a shared high-K gold "
                         "(the finite-K error floor dropping with K)")
    ap.add_argument("--pod", action="store_true",
                    help="weak-scaling + collective breakdown on all devices")
    args = ap.parse_args()
    if args.pod:
        result = {"pod_scaling": pod_scaling()}
    elif args.mesh:
        result = {"mesh": mesh_scaling()}
    elif args.grid:
        result = {"grid_throughput_movielens_K30": grid_throughput()}
    elif args.models:
        result = {"canonical_models_K30": canonical_models()}
    elif args.tte:
        result = {"time_to_moment_error_movielens_K30": time_to_moment_error()}
    elif args.tte_by_k:
        result = {"tte_by_K": tte_by_K()}
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
