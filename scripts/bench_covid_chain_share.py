"""Ablation: what fraction of covid's fused QEM step is the timeseries chain
contraction (fwd+bwd)?  Times the real step, then the same step with
``logpq._chain`` monkeypatched to a cheap shape-compatible mock (logsumexp
over T — wrong semantics, same output shape), on the active backend.
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "examples", "models"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from bench_lowrank_kernel import device_loop_time  # noqa: E402


def covid_step():
    import covid
    from alan_tpu import train
    with jax.default_device(jax.devices("cpu")[0]):
        problem, _, _, _ = covid.load_and_generate_problem(
            key=jax.random.key(0), Q_param_type="qem")
    step, state = train.qem(problem, 30, lr=0.1)
    return step, state


def time_step(step, state, n=4):
    """Per-step seconds via slope between n- and 4n-step fused scans
    (bench.py's fetch-ended method)."""
    from alan_tpu import train
    key = jax.random.key(7)
    runs = {N: train.scan_steps(step, N) for N in (n, 4 * n)}
    for run in runs.values():
        _, elbos = run(state, key)
        float(np.asarray(elbos[-1]))
    best = None
    raw_total = None
    for _ in range(3):
        totals = {}
        for N, run in runs.items():
            t0 = time.perf_counter()
            _, elbos = run(state, key)
            float(np.asarray(elbos[-1]))
            totals[N] = time.perf_counter() - t0
        dt = (totals[4 * n] - totals[n]) / (3 * n)
        if dt > 0 and (best is None or dt < best):
            best = dt
        per_step = totals[4 * n] / (4 * n)
        if raw_total is None or per_step < raw_total:
            raw_total = per_step
    if best is None:
        # tunnel stall made every slope non-positive (CLAUDE.md timing
        # gotcha): fall back to the raw per-step total, which overcounts
        # the constant dispatch overhead but never goes negative
        print(f"# warning: no positive slope; using raw total "
              f"{raw_total*1e3:.1f} ms/step (includes dispatch overhead)",
              flush=True)
        best = raw_total
    return best


def main():
    from alan_tpu import logpq

    step, state = covid_step()
    t_full = time_step(step, state)
    print(f"full step: {t_full*1e3:.1f} ms", flush=True)

    real_chain = logpq._chain

    def mock_chain(ms, platename):
        # wrong semantics, same [..., Ki, K] output shape, negligible cost
        return jax.nn.logsumexp(ms, axis=-3)

    logpq._chain = mock_chain
    try:
        step2, state2 = covid_step()
        t_mock = time_step(step2, state2)
    finally:
        logpq._chain = real_chain
    print(f"mock-chain step: {t_mock*1e3:.1f} ms", flush=True)
    print(f"chain share: {(t_full-t_mock)*1e3:.1f} ms "
          f"({100*(t_full-t_mock)/t_full:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
