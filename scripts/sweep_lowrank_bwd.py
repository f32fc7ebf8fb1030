"""Backward-kernel optimization sweep for the fused low-rank contraction
(VERDICT r5 #1): the grouped-K=1000 QEM step spends 71% of its 8.3 ms in
``_pallas_bwd`` (results/grouped_k1000_profile.json).  Levers swept here:

* concat-k bf16x3 ("high"): one k=3F MXU dot instead of three k=F dots
  (F=36 runs the 128-deep MXU at 28% fill; 3F=108 at 84%)
* raised Mosaic scoped-VMEM ceiling (ALAN_TPU_LOWRANK_VMEM_MB) + bigger
  backward tiles (the 16 MB default forced bp=8/bi=256 — 4x the forward's
  grid steps)
* DEFAULT-precision gradient dots (dU/dV tolerate bf16 noise; scores keep
  bf16x3 so the softmax weights stay exact)

Each config runs in a subprocess (the knobs are import-time env vars);
numbers are device-side scan-loop slopes (tunnel-safe).  Writes
results/lowrank_bwd_sweep.json.
"""
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "baseline_r4": {"ALAN_TPU_LOWRANK_PRECISION": "highsplit"},
    "concat_k": {},
    "concat_k_vmem64_bp16_score1m": {
        "ALAN_TPU_LOWRANK_VMEM_MB": "64",
        "ALAN_TPU_LOWRANK_BP_BWD": "16",
        "ALAN_TPU_LOWRANK_SCORE_BWD": str(1024 * 1024)},
    "concat_k_vmem100_bp16_score2m": {
        "ALAN_TPU_LOWRANK_VMEM_MB": "100",
        "ALAN_TPU_LOWRANK_BP_BWD": "16",
        "ALAN_TPU_LOWRANK_SCORE_BWD": str(2 * 1024 * 1024)},
    "concat_k_graddefault": {
        "ALAN_TPU_LOWRANK_GRAD_PRECISION": "default"},
    "concat_k_vmem64_big_graddefault": {
        "ALAN_TPU_LOWRANK_VMEM_MB": "64",
        "ALAN_TPU_LOWRANK_BP_BWD": "16",
        "ALAN_TPU_LOWRANK_SCORE_BWD": str(1024 * 1024),
        "ALAN_TPU_LOWRANK_GRAD_PRECISION": "default"},
}


def child(K=1000):
    sys.path.insert(0, ROOT)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    import numpy as np
    from bench_lowrank_kernel import device_loop_time
    from alan_tpu.ops.pallas_lowrank import (
        lowrank_logsumexp, reference_lowrank_logsumexp, _tiles)

    S, P, F = 1, 300, 36
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((S, P, K, F)) * 0.3, jnp.float32)
    V = jnp.asarray(rng.standard_normal((S, K, F)) * 0.3, jnp.float32)
    D = jnp.asarray(rng.standard_normal((S, P, K)), jnp.float32)

    def make_grad(f):
        return jax.grad(lambda u, v, d: f(u, v, d).sum(), argnums=(0, 1, 2))

    out = {"K": K, "tiles_fwd": _tiles(P, K, K, F),
           "tiles_bwd": _tiles(P, K, K, F, bwd=True)}
    fused = lambda u, v, d: lowrank_logsumexp(u, v, d)
    a = jax.jit(fused)(U, V, D)
    b = jax.jit(reference_lowrank_logsumexp)(U, V, D)
    out["max_abs_err_fwd"] = float(jnp.max(jnp.abs(a - b)))
    ga = jax.jit(make_grad(fused))(U, V, D)
    gb = jax.jit(make_grad(reference_lowrank_logsumexp))(U, V, D)
    out["max_abs_err_grad"] = float(max(jnp.max(jnp.abs(x - y))
                                        for x, y in zip(ga, gb)))
    out["fused_fwd_s"] = device_loop_time(fused, (U, V, D))
    out["fused_grad_s"] = device_loop_time(make_grad(fused), (U, V, D))
    print("RESULT " + json.dumps(out), flush=True)


def main():
    results = {}
    for name, env in CONFIGS.items():
        e = dict(os.environ, **env)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=e, capture_output=True, text=True, timeout=2400)
        rec = None
        for line in p.stdout.splitlines():
            if line.startswith("RESULT "):
                rec = json.loads(line[7:])
        if rec is None:
            rec = {"error": (p.stderr.strip().splitlines() or ["no output"])[-1]}
        rec["env"] = env
        results[name] = rec
        print(name, json.dumps({k: v for k, v in rec.items() if k != "env"}),
              flush=True)
    path = os.path.join(ROOT, "results", "lowrank_bwd_sweep.json")
    with open(path, "w") as fh:
        json.dump(results, fh, indent=1)
    print("->", path)


if __name__ == "__main__":
    if "--child" in sys.argv:
        child()
    else:
        main()
