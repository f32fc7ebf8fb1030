"""Experiment runner — the framework's CLI (parity: reference
``examples/runner.py`` / ``basic_runner.py``, argparse+json instead of hydra).

    python examples/runner.py --model movielens --method qem --K 30 \
        --iters 100 --lr 0.1 --predll-N 100

Runs the training grid with the fused jitted step, records per-iteration
ELBOs and wall-clock (post-sync, mirroring ``runner.py:13-16``), optionally
evaluates predictive log-likelihood on the extended data, and writes metrics
to JSON.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "models"))

import jax
import jax.numpy as jnp


def _pq_of(state, method):
    if method in ("vi", "rws", "global_vi", "global_rws"):
        stateP, stateQ, _ = state
    else:
        if len(state) == 2 and not hasattr(state[1], "keys"):
            state, _ = state          # qem lr schedule: ((sP, sQ), t)
        stateP, stateQ = state
    return stateP, stateQ


def run(model_name, method="qem", K=30, iters=100, lr=None, predll_N=0,
        Q_param_type=None, split=None, seed=0, out=None, predll_every=0,
        fuse_iters=False, runs=1, data_dir=None, mesh_spec=None,
        shard_spec=None, shard_all_k=None):
    import contextlib
    from alan_tpu import train, Split, no_checkpoint

    model = __import__(model_name)
    qtype = Q_param_type or ("opt" if "vi" in method or "rws" in method else "qem")
    if ("vi" in method or "rws" in method) and qtype == "qem":
        qtype = "opt"
    lg_kwargs = {"fake_data": False, "data_dir": data_dir} if data_dir else {}
    problem, all_data, all_covariates, all_platesizes = \
        model.load_and_generate_problem(key=jax.random.key(seed),
                                        Q_param_type=qtype, **lg_kwargs)

    strategy = Split(*split) if split else no_checkpoint
    defaults = {"vi": 0.01, "rws": 0.01, "qem": 0.1,
                "global_vi": 0.01, "global_rws": 0.01, "global_qem": 0.1}
    lr = lr if lr is not None else defaults[method]

    # optional multi-chip sharding: --mesh k=2,p=4 --shard plate_1=p,T=t
    # [--shard-all-k k] maps dim names onto a device mesh (timeseries plate
    # dims route the chain contraction to its T-sharded implementation)
    mesh_ctx = contextlib.nullcontext()
    mesh_plan = None
    if mesh_spec:
        from alan_tpu.parallel.mesh import make_mesh, MeshPlan
        axes = {k: int(v) for k, v in
                (kv.split("=") for kv in mesh_spec.split(","))}
        mesh = make_mesh(axes)
        dim2axis = {} if not shard_spec else dict(
            kv.split("=") for kv in shard_spec.split(","))
        mesh_plan = MeshPlan(mesh, dim2axis)
        if shard_all_k:
            mesh_plan = mesh_plan.with_all_K(shard_all_k)
        mesh_ctx = mesh

    factory = {"vi": train.vi, "rws": train.rws, "qem": train.qem,
               "global_vi": train.global_vi, "global_rws": train.global_rws,
               "global_qem": train.global_qem}[method]
    if method.startswith("global"):
        if mesh_plan is not None:
            raise ValueError("--mesh is not supported for global_* methods")
        kwargs = {}
    else:
        kwargs = {"computation_strategy": strategy, "mesh_plan": mesh_plan}
    step, state = factory(problem, K, lr=lr, **kwargs)

    # optional predictive-LL *trajectory* (reference records per-iteration
    # p_lls with their evaluation time excluded from iter_times,
    # ``runner.py:94,187``); built before training so compile time is not
    # charged to any iteration.
    pll_f = None
    if predll_N and predll_every:
        from alan_tpu.predict import predictive_ll_fn
        pll_f = predictive_ll_fn(problem, K=K, N=predll_N,
                                 extended_platesizes=dict(all_platesizes))
    p_lls, predll_iters = [], []

    def eval_pll(i, state):
        if pll_f is None or i % predll_every:
            return
        stateP, stateQ = _pq_of(state, method)
        pll = pll_f(stateP, stateQ, all_covariates, all_data,
                    jax.random.fold_in(jax.random.key(seed + 2), i))
        jax.block_until_ready(pll)
        p_lls.append(float(sum(float(v) for v in pll.values())))
        predll_iters.append(i)

    key = jax.random.key(seed + 1)
    per_run_elbos = None
    _stack = contextlib.ExitStack()
    _stack.enter_context(mesh_ctx)
    if fuse_iters or runs > 1:
        # whole-loop fusion: all iterations (x all runs) compile into ONE
        # XLA program — no per-iteration host dispatch, and independent
        # seed-grid runs batch onto the chip (train.scan_steps / vmap_runs).
        if predll_every:
            raise ValueError("--predll-every needs the eager per-iteration "
                             "loop; drop --fuse-iters/--runs")
        state0 = state
        loop = (train.vmap_runs(step, iters, runs) if runs > 1
                else train.scan_steps(step, iters))
        t0 = time.time()
        state, elbos_arr = loop(state0, key)
        jax.block_until_ready(elbos_arr)
        compile_time = time.time() - t0
        t0 = time.time()
        state, elbos_arr = loop(state0, key)
        jax.block_until_ready(elbos_arr)
        total = time.time() - t0
        compile_time -= total
        iter_times = [total / (iters * runs)] * iters
        import numpy as _np
        e = _np.asarray(elbos_arr)
        if runs > 1:
            per_run_elbos = e.tolist()
            best = int(e[:, -1].argmax())
            state = jax.tree.map(lambda x: x[best], state)
            elbos = e[best].tolist()
        else:
            elbos = e.tolist()
    else:
        elbos, iter_times = [], []
        # warm-up / compile
        t0 = time.time()
        state, elbo = step(state, jax.random.fold_in(key, 0))
        jax.block_until_ready(elbo)
        compile_time = time.time() - t0
        elbos.append(float(elbo))
        iter_times.append(0.0)
        eval_pll(0, state)

        for i in range(1, iters):
            t0 = time.time()
            state, elbo = step(state, jax.random.fold_in(key, i))
            jax.block_until_ready(elbo)
            iter_times.append(time.time() - t0)
            elbos.append(float(elbo))
            eval_pll(i, state)

    _stack.close()

    # write trained state back
    stateP, stateQ = _pq_of(state, method)
    problem.P.set_state(stateP)
    problem.Q.set_state(stateQ)

    result = {
        "model": model_name, "method": method, "K": K, "lr": lr,
        "iters": iters, "compile_time_s": compile_time,
        "mean_iter_time_s": float(jnp.mean(jnp.array(iter_times[1:]))) if iters > 1 else None,
        "elbo_start": elbos[0], "elbo_end": elbos[-1],
        "elbos": elbos, "iter_times": iter_times, "seed": seed,
    }
    if runs > 1:
        result["runs"] = runs
        result["per_run_elbos"] = per_run_elbos
    if fuse_iters or runs > 1:
        result["fused_loop"] = True
    if p_lls:
        result["p_lls"] = p_lls
        result["predll_iters"] = predll_iters

    if predll_N:
        from alan_tpu.predict import predictive_ll_fn
        t0 = time.time()
        f = predictive_ll_fn(problem, K=K, N=predll_N,
                             extended_platesizes=dict(all_platesizes))
        pll = f(problem.P.state(), problem.Q.state(), all_covariates, all_data,
                jax.random.key(seed + 2))
        jax.block_until_ready(pll)
        result["predictive_ll"] = {k: float(v) for k, v in pll.items()}
        result["predll_time_s"] = time.time() - t0

    if out:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
    return result


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--grid", default=None, metavar="SPEC",
                    help="declarative YAML/JSON grid spec "
                         "(examples/gridspec.py schema; reference "
                         "examples/config/conf.yaml analog): expand and run "
                         "every job sequentially in-process, ignoring the "
                         "other flags")
    ap.add_argument("--platform", default=None, help="jax platform override (e.g. cpu)")
    ap.add_argument("--model", required=False)
    ap.add_argument("--method", default="qem", choices=["vi", "rws", "qem", "global_vi", "global_rws", "global_qem"])
    ap.add_argument("--K", type=int, default=30)
    ap.add_argument("--iters", type=int, default=100)
    def _lr(v):
        try:
            return float(v)
        except ValueError:
            return v          # qem schedule string, e.g. "0.1/t@200"
    ap.add_argument("--lr", type=_lr, default=None,
                    help="learning rate; for --method qem also a schedule "
                         "string: '1/t' or '<lr0>/t@<T0>' (delayed "
                         "averaging, fixes fixed-lr QEM drift)")
    ap.add_argument("--predll-N", type=int, default=0)
    ap.add_argument("--predll-every", type=int, default=0,
                    help="record a predictive-LL trajectory every E iters "
                         "(time excluded from iter_times)")
    ap.add_argument("--Q-param-type", default=None, choices=[None, "opt", "qem"])
    ap.add_argument("--split", nargs=2, metavar=("PLATE", "SIZE"), default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--fuse-iters", action="store_true",
                    help="compile the whole training loop into one XLA "
                         "program (lax.scan over iterations)")
    ap.add_argument("--runs", type=int, default=1,
                    help="batch this many independent seed-runs into one "
                         "program (vmap over runs; implies --fuse-iters)")
    ap.add_argument("--data-dir", default=None,
                    help="load the real dataset from this directory "
                         "(reference .pt file-name contract; default: "
                         "fake data generated from the prior)")
    ap.add_argument("--mesh", default=None, metavar="AXIS=N,...",
                    help="device mesh axes, e.g. k=2,p=4")
    ap.add_argument("--shard", default=None, metavar="DIM=AXIS,...",
                    help="map dim names to mesh axes, e.g. plate_1=p,T=t")
    ap.add_argument("--shard-all-k", default=None, metavar="AXIS",
                    help="additionally shard every K-dim over this axis")
    ap.add_argument("--devices", type=int, default=None,
                    help="force this many virtual host-platform devices "
                         "(CPU testing of --mesh)")
    args = ap.parse_args()
    if args.grid:
        import gridspec
        spec = gridspec.load_spec(args.grid)
        jobs = [ap.parse_args(argv) for argv in gridspec.expand(spec)]
        # platform/devices must be applied BEFORE the first jax use and
        # cannot change mid-process: honor a single consistent setting
        # across the grid, reject mixed requests loudly.
        platforms = {j.platform for j in jobs if j.platform}
        devicess = {j.devices for j in jobs if j.devices}
        if len(platforms) > 1 or len(devicess) > 1:
            ap.error(f"--grid jobs request conflicting platform/devices "
                     f"(platforms={sorted(platforms)}, "
                     f"devices={sorted(devicess)}); these are process-wide "
                     f"in-process — run mixed specs through alan-grid "
                     f"(one process per job) instead")
        if devicess:
            flags = os.environ.get("XLA_FLAGS", "")
            if "host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + " --xla_force_host_platform_device_count="
                    f"{devicess.pop()}").strip()
        if platforms:
            jax.config.update("jax_platforms", platforms.pop())
        for i, (argv, sub) in enumerate(zip(gridspec.expand(spec), jobs)):
            print(f"[grid {i + 1}] runner.py " + " ".join(argv),
                  file=sys.stderr)
            split_ = (sub.split[0], int(sub.split[1])) if sub.split else None
            run(sub.model, sub.method, sub.K, sub.iters, sub.lr,
                sub.predll_N, sub.Q_param_type, split_, sub.seed, sub.out,
                predll_every=sub.predll_every, fuse_iters=sub.fuse_iters,
                runs=sub.runs, data_dir=sub.data_dir, mesh_spec=sub.mesh,
                shard_spec=sub.shard, shard_all_k=sub.shard_all_k)
        return
    if args.model is None:
        ap.error("--model is required (unless --grid is given)")
    if args.devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()
    if getattr(args, "platform", None):
        jax.config.update("jax_platforms", args.platform)
    split = (args.split[0], int(args.split[1])) if args.split else None
    result = run(args.model, args.method, args.K, args.iters, args.lr,
                 args.predll_N, args.Q_param_type, split, args.seed, args.out,
                 predll_every=args.predll_every, fuse_iters=args.fuse_iters,
                 runs=args.runs, data_dir=args.data_dir, mesh_spec=args.mesh,
                 shard_spec=args.shard, shard_all_k=args.shard_all_k)
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("elbos", "iter_times", "p_lls",
                                   "per_run_elbos")}, indent=1))


if __name__ == "__main__":
    main()
