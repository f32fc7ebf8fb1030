"""Measure the low-rank dot precision trade (VERDICT r3 #3: move real
utilization): grouped movielens K=1000 fused QEM step with the factored
log-density dots at HIGHEST (bf16x6 — the conservative default) vs HIGH
(bf16x3) vs DEFAULT (bf16x1), plus the single-evaluation ELBO deviation of
each faster mode from HIGHEST on the same sample.

Writes results/lowrank_precision_bench.json.
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

from _timing import robust_scan_slope

K = 1000


def main():
    # latch the PALLAS kernel's own precision mode (read at module import,
    # default bf16x3) BEFORE touching the env var — otherwise the first
    # env setting leaks into the kernel, whose bf16x6 variant overflows
    # scoped VMEM at (P=300, I=1000, F=36).  This script probes the XLA
    # (non-fused) dots only.
    import alan_tpu.ops.pallas_lowrank  # noqa: F401
    from bench_scaling import _grouped_movielens
    from alan_tpu import train

    with jax.default_device(jax.devices("cpu")[0]):
        problem = _grouped_movielens()

    out = {"device": jax.devices()[0].device_kind, "K": K}
    elbos = {}
    for mode in ("highest", "high", "default"):
        os.environ["ALAN_TPU_LOWRANK_PRECISION"] = mode
        try:
            step, state0 = train.qem(problem, K, lr=0.1)
            # single evaluation on a FIXED key for the accuracy comparison
            # (via a 1-step scan: the BARE jitted step picks operand
            # layouts under which the fused lowrank kernel's stack
            # allocation exceeds scoped VMEM and the backend refuses to
            # compile — the scanned form is also what every real run uses)
            _, elbo1 = train.scan_steps(step, 1)(state0, jax.random.key(42))
            elbos[mode] = float(elbo1[-1])
            dt, _ = robust_scan_slope(step, state0, n=5)
        finally:
            del os.environ["ALAN_TPU_LOWRANK_PRECISION"]
        out[mode] = {"step_s": dt, "elbo_single_eval": elbos[mode]}
        if mode != "highest":
            out[mode]["elbo_rel_dev_vs_highest"] = (
                abs(elbos[mode] - elbos["highest"])
                / abs(elbos["highest"]))
            out[mode]["speedup_vs_highest"] = (
                out["highest"]["step_s"] / dt)
        print(mode, json.dumps(out[mode]), flush=True)

    path = os.path.join(ROOT, "results", "lowrank_precision_bench.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
