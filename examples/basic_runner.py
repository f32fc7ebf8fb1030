"""Minimal training loop without the CLI (parity: reference
``examples/basic_runner.py``) — import a model module and call ``run``.

    import basic_runner
    basic_runner.run('movielens', methods=['qem', 'vi', 'rws', 'global_qem'],
                     K=10, num_iters=100, lrs={'qem': 0.1})
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "models"))

import jax


def run(model_name, methods=("qem",), K=10, num_runs=1, num_iters=100,
        lrs=None, fake_data=True, seed=0):
    from alan_tpu import train
    lrs = lrs or {}
    model = __import__(model_name)
    results = {}
    for run_idx in range(num_runs):
        for method in methods:
            qtype = "opt" if ("vi" in method or "rws" in method) else "qem"
            problem, *_ = model.load_and_generate_problem(
                key=jax.random.key(seed + run_idx), Q_param_type=qtype,
                fake_data=fake_data)
            lr = lrs.get(method)
            elbos = train.fit(problem, method=method, K=K, iters=num_iters,
                              lr=lr, key=jax.random.key(seed + 100 + run_idx))
            results[(model_name, method, run_idx)] = elbos
            print(f"{model_name}/{method} run {run_idx}: "
                  f"elbo {float(elbos[0]):.2f} -> {float(elbos[-1]):.2f}")
    return results


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "movielens",
        methods=["qem"], K=10, num_iters=50)
