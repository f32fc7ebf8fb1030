"""Measure the MXU log-matmul contraction win on the deeper-hierarchy models
(VERDICT r2 #5: bus_breakdown/occupancy shapes) and the covid small-K chain
kernel win, on the real TPU.

Compares the fused QEM step with the MXU pairwise-contraction path on
(default) vs off (``reduce_ks._USE_MATMUL_CONTRACT`` flipped in-process —
the flag is consulted at trace time), and covid with/without the
batch-in-lanes chain kernel (``ALAN_TPU_NO_SMALLK_CHAIN``).

Writes scripts/../results/mxu_contract_bench.json.
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "models"))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np


from _timing import timed_scan_step  # best-of-3 positive-only slopes


def load(name):
    mod = __import__(name)
    with jax.default_device(jax.devices("cpu")[0]):
        problem, _, _, _ = mod.load_and_generate_problem(
            key=jax.random.key(0), Q_param_type="qem")
    return problem


def main():
    from alan_tpu import reduce_ks
    out = {"device": jax.devices()[0].device_kind}

    for name, K in (("bus_breakdown", 30), ("occupancy", 30)):
        problem = load(name)
        dt_on, elbo_on = timed_scan_step(problem, K)
        reduce_ks._USE_MATMUL_CONTRACT = False
        try:
            dt_off, elbo_off = timed_scan_step(problem, K)
        finally:
            reduce_ks._USE_MATMUL_CONTRACT = True
        out[name] = {
            "K": K, "mxu_on_step_s": dt_on, "mxu_off_step_s": dt_off,
            "speedup": dt_off / dt_on,
            "elbo_on": elbo_on, "elbo_off": elbo_off,
        }
        print(name, json.dumps(out[name]), flush=True)

    # covid: lanes chain kernel vs dense chain (the chain is ~93% of the
    # step; the packed-G transform experiment is superseded by this kernel)
    problem = load("covid")
    dt_on, elbo_on = timed_scan_step(problem, 30)
    os.environ["ALAN_TPU_NO_SMALLK_CHAIN"] = "1"
    try:
        dt_off, elbo_off = timed_scan_step(problem, 30)
    finally:
        del os.environ["ALAN_TPU_NO_SMALLK_CHAIN"]
    out["covid_chain"] = {
        "K": 30, "lanes_on_step_s": dt_on, "lanes_off_step_s": dt_off,
        "speedup": dt_off / dt_on,
        "elbo_on": elbo_on, "elbo_off": elbo_off,
    }
    print("covid", json.dumps(out["covid_chain"]), flush=True)

    path = os.path.join(ROOT, "results", "mxu_contract_bench.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
