"""Measure lax.scan unroll on the headline fused QEM loop (VERDICT r3 #3):
the movielens K=30 step is dispatch/latency-bound (~0.2 ms, XLA MFU ~2%),
so while-loop per-iteration overhead is a real fraction — unrolling the
scan body amortises it.  Writes results/scan_unroll_bench.json.
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

import numpy as np
import time


def main():
    import movielens
    from alan_tpu import train

    with jax.default_device(jax.devices("cpu")[0]):
        problem, _, _, _ = movielens.load_and_generate_problem(
            key=jax.random.key(0), Q_param_type="qem")

    step, state0 = train.qem(problem, 30, lr=0.1)
    key = jax.random.key(7)
    out = {"device": jax.devices()[0].device_kind, "K": 30}
    for unroll in (1, 2, 4, 8):
        n = 20
        run_s = train.scan_steps(step, n, unroll=unroll)
        run_l = train.scan_steps(step, 4 * n, unroll=unroll)
        for run in (run_s, run_l):
            _, e = run(state0, key)
            float(np.asarray(e[-1]))
        dts = []
        for _ in range(3):
            totals = {}
            for N, run in ((n, run_s), (4 * n, run_l)):
                t0 = time.perf_counter()
                _, e = run(state0, key)
                float(np.asarray(e[-1]))
                totals[N] = time.perf_counter() - t0
            dts.append((totals[4 * n] - totals[n]) / (3 * n))
        pos = [d for d in dts if d > 0]
        out[f"unroll{unroll}_step_s"] = min(pos) if pos else None
        print(f"unroll={unroll}: "
              f"{(min(pos) * 1e6 if pos else float('nan')):.1f} us/step",
              flush=True)
    path = os.path.join(ROOT, "results", "scan_unroll_bench.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
