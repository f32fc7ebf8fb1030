"""Headline benchmark: importance-weighted samples/sec/chip on MovieLens,
K=30 (the BASELINE.md target metric).

One fused QEM training step = draw K particles for every latent site,
evaluate the full logPQ K-contraction, extract the posterior sufficient-stat
moments by autodiff, and apply the natural-gradient update.  The metric
counts K x (number of latent sites, plate copies included) importance-
weighted samples fully processed per second on one chip.

``vs_baseline`` compares against the reference implementation (alan-ppl/alan,
pure PyTorch) running the same model/method/K on this machine's CPU — the
reference has no TPU path and publishes no numbers (BASELINE.md), so its own
runnable implementation is the baseline.  Set ``BENCH_SKIP_TORCH=1`` to skip
that (falls back to the last recorded baseline value).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "examples", "models"))

import jax

K = 30
N_STEPS = 20

# Last measured reference-CPU throughput in the same metric (samples/s),
# recorded so the bench stays runnable if torch is unavailable.
RECORDED_TORCH_BASELINE = 57000.0


def bench_alan_tpu():
    import movielens
    from alan_tpu import train

    with jax.default_device(jax.devices("cpu")[0]):
        problem, _, _, _ = movielens.load_and_generate_problem(
            key=jax.random.key(0), Q_param_type="qem")

    step, state = train.qem(problem, K, lr=0.1)
    key = jax.random.key(7)

    # compile + warm up
    state, elbo = step(state, jax.random.fold_in(key, 0))
    jax.block_until_ready(elbo)

    t0 = time.perf_counter()
    for i in range(1, N_STEPS + 1):
        state, elbo = step(state, jax.random.fold_in(key, i))
    jax.block_until_ready(elbo)
    dt = (time.perf_counter() - t0) / N_STEPS

    n_latent_sites = 2 + movielens.M          # mu_z, psi_z, z x plate_1
    samples_per_sec = K * n_latent_sites / dt
    return samples_per_sec, dt, float(elbo)


def bench_reference_torch():
    """Run the reference implementation's QEM step on CPU for vs_baseline."""
    try:
        sys.path.insert(0, "/root/reference/src")
        import torch as t
        import alan  # noqa
        sys.path.insert(0, "/root/reference/examples/models/movielens")
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "ref_movielens", "/root/reference/examples/models/movielens/movielens.py")
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)

        # synthesise covariates/data (the reference's fake_data path still
        # reads covariate files, so build them directly)
        platesizes = {'plate_1': ref.M, 'plate_2': ref.N}
        cov = {'x': t.randn(ref.M, ref.N, ref.d_z).rename('plate_1', 'plate_2', None)}
        P = ref.get_P(platesizes, cov)
        data = {'obs': P.sample()['obs'].align_to('plate_1', 'plate_2')}
        problem = ref.generate_problem("cpu", platesizes, data, cov, "qem")

        # warm-up
        problem.sample(K).update_qem_params(0.1)
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            problem.sample(K).update_qem_params(0.1)
        dt = (time.perf_counter() - t0) / n
        n_latent_sites = 2 + ref.M
        return K * n_latent_sites / dt
    except Exception as e:
        print(f"# reference baseline unavailable ({type(e).__name__}: {e}); "
              f"using recorded value", file=sys.stderr)
        return RECORDED_TORCH_BASELINE


def main():
    value, step_time, elbo = bench_alan_tpu()
    if os.environ.get("BENCH_SKIP_TORCH"):
        baseline = RECORDED_TORCH_BASELINE
    else:
        baseline = bench_reference_torch()
    print(json.dumps({
        "metric": "movielens_qem_K30_importance_weighted_samples_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "samples/s",
        "vs_baseline": round(value / baseline, 3),
    }))


if __name__ == "__main__":
    main()
