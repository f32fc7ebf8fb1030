"""Shared tunnel-robust timing for the bench scripts.

Per-step time = slope between two fetch-ended scan lengths (m vs 4m
applications; CLAUDE.md).  Host/tunnel stalls can make an individual slope
NEGATIVE — a negative step time must never be recorded (VERDICT r3 weak #1):
measure best-of-3 positive-only slopes and re-measure (bounded) if a whole
round comes out non-positive, raising instead of returning garbage.
"""
import time

import numpy as np

import jax


def robust_scan_slope(step, state0, n=20, key=None, rounds=3, tries=3,
                      unroll=None):
    """(per-step seconds, final elbo) for a fused training ``step`` via the
    MEDIAN positive m-vs-4m scan slope.

    Median, not min: a tunnel stall during the SHORT run deflates that
    round's slope toward zero (measured: 1.1 µs/step for a full QEM step),
    so min-positive selection is biased low under stall noise on either
    arm; the median of ≥3 positive slopes lands on the sane middle.
    Raises if every slope is non-positive.
    """
    from alan_tpu import train

    key = key if key is not None else jax.random.key(7)
    kw = {} if unroll is None else {"unroll": unroll}
    run_short = train.scan_steps(step, n, **kw)
    run_long = train.scan_steps(step, 4 * n, **kw)
    for run in (run_short, run_long):          # compile + warm up
        _, elbos = run(state0, key)
        float(np.asarray(elbos[-1]))

    dts = []
    pos = []
    elbo = None
    for _ in range(rounds):
        for _ in range(tries):
            totals = {}
            for N, run in ((n, run_short), (4 * n, run_long)):
                t0 = time.perf_counter()
                _, elbos = run(state0, key)
                elbo = float(np.asarray(elbos[-1]))
                totals[N] = time.perf_counter() - t0
            dts.append((totals[4 * n] - totals[n]) / (3 * n))
        pos = [d for d in dts if d > 0]
        if len(pos) >= max(2, tries - 1):
            return float(np.median(pos)), elbo
    if len(pos) >= 2:               # same >=2 bar as the in-loop exit
        return float(np.median(pos)), elbo
    raise RuntimeError(
        f"fewer than 2 positive slopes in {len(dts)} measurements ({dts}); "
        f"remote-TPU tunnel is stalling — re-run")


def timed_scan_step(problem, K, lr=0.1, n=20):
    """Hardened replacement for the scripts' old single-slope timer."""
    from alan_tpu import train
    step, state0 = train.qem(problem, K, lr=lr)
    return robust_scan_slope(step, state0, n=n)
