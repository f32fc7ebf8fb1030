"""Device-trace breakdown of the grouped-movielens K=1000 QEM step
(VERDICT r4 next #1: the one workload with real single-chip headroom —
8.24 ms/step vs a 0.56 ms bandwidth floor — frozen for three rounds with no
profile showing where the time goes).

Captures a ``jax.profiler`` trace of the fused scan, parses the XProf
trace.json.gz, and aggregates device-side op durations into a top-op table
(written to results/grouped_k1000_profile.json).
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "models"))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np


def capture(K=1000, n=20, logdir="/tmp/k1000_trace"):
    from bench_scaling import _grouped_movielens
    from alan_tpu import train

    with jax.default_device(jax.devices("cpu")[0]):
        problem = _grouped_movielens()
    step, state0 = train.qem(problem, K, lr=0.1)
    run = train.scan_steps(step, n)
    key = jax.random.key(7)
    _, e = run(state0, key)                      # compile + warm
    float(np.asarray(e[-1]))
    jax.profiler.start_trace(logdir)
    _, e = run(state0, key)
    float(np.asarray(e[-1]))
    jax.profiler.stop_trace()
    return logdir, n


def parse(logdir, n_steps):
    """Aggregate device-track op durations from the XProf trace."""
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {logdir}")
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])

    # pid -> process name; device tracks are named like "/device:TPU:0 ..."
    pids = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pids[ev["pid"]] = ev["args"].get("name", "")
    dev_pids = {p for p, name in pids.items()
                if "TPU" in name or "device" in name.lower()}

    agg = defaultdict(lambda: {"dur_us": 0.0, "count": 0, "example_args": None})
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        dur = float(ev.get("dur", 0.0))
        a = agg[name]
        a["dur_us"] += dur
        a["count"] += 1
        if a["example_args"] is None and ev.get("args"):
            a["example_args"] = {k: str(v)[:200]
                                 for k, v in ev["args"].items()}
        total += dur
    top = sorted(agg.items(), key=lambda kv: -kv[1]["dur_us"])[:40]
    return {
        "trace_file": paths[-1],
        "n_steps": n_steps,
        "device_tracks": sorted(pids[p] for p in dev_pids),
        "total_device_us": total,
        "per_step_device_us": total / n_steps,
        "top_ops": [
            {"name": k, "dur_us_total": round(v["dur_us"], 1),
             "dur_us_per_step": round(v["dur_us"] / n_steps, 2),
             "pct": round(100 * v["dur_us"] / total, 2) if total else None,
             "count": v["count"], "args": v["example_args"]}
            for k, v in top],
    }


def main():
    logdir, n = capture()
    out = parse(logdir, n)
    path = os.path.join(ROOT, "results", "grouped_k1000_profile.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"device total {out['total_device_us']:.0f} us over {n} steps "
          f"({out['per_step_device_us']:.0f} us/step)")
    for row in out["top_ops"][:15]:
        print(f"{row['pct']:6.2f}%  {row['dur_us_per_step']:10.1f} us/step  "
              f"x{row['count']:4d}  {row['name'][:80]}")
    print("->", path)


if __name__ == "__main__":
    main()
