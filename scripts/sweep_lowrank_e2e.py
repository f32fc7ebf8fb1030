"""End-to-end arbitration of the backward-kernel levers: grouped-movielens
K=1000 fused QEM step time (the VERDICT r5 #1 metric) per kernel config,
with the hardened median-slope timer.  The micro sweep
(results/lowrank_bwd_sweep.json) showed concat-k + a 64 MB scoped-VMEM
ceiling with forward-sized backward tiles cutting the fused grad 8.7 -> 5.3
ms, but its device_loop_time numbers carry tunnel-stall noise; this is the
committed arbiter.  Writes results/lowrank_e2e_sweep.json.
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "r4_highsplit": {"ALAN_TPU_LOWRANK_PRECISION": "highsplit"},
    "packed_default": {},
    "packed_vmem64_bp16": {
        "ALAN_TPU_LOWRANK_VMEM_MB": "64",
        "ALAN_TPU_LOWRANK_BP_BWD": "16",
        "ALAN_TPU_LOWRANK_SCORE_BWD": str(1024 * 1024)},
}


def child():
    sys.path.insert(0, ROOT)
    sys.path.insert(0, os.path.join(ROOT, "examples", "models"))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    from bench_scaling import _grouped_movielens
    from alan_tpu import train
    from _timing import robust_scan_slope

    with jax.default_device(jax.devices("cpu")[0]):
        problem = _grouped_movielens()
    step, state0 = train.qem(problem, 1000, lr=0.1)
    dt, elbo = robust_scan_slope(step, state0, n=5, rounds=4, tries=5)
    print("RESULT " + json.dumps({"step_s": dt, "elbo": elbo}), flush=True)


def main():
    results = {}
    for name, env in CONFIGS.items():
        e = dict(os.environ, **env)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=e, capture_output=True, text=True, timeout=3000)
        rec = None
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                rec = json.loads(line[7:])
        if rec is None:
            rec = {"error": (p.stderr.strip().splitlines() or ["?"])[-1]}
        rec["env"] = env
        results[name] = rec
        print(name, json.dumps({k: v for k, v in rec.items() if k != "env"}),
              flush=True)
    path = os.path.join(ROOT, "results", "lowrank_e2e_sweep.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("->", path)


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main()
