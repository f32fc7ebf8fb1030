"""Moments-paper IS sweep: MP vs global-IS moment accuracy over K
(parity: reference ``old_scripts/runner_moments_IS.py`` +
``config/moments_IS_conf.yaml`` + ``moments_paper_plots.py:47-116`` — the
flagship experiment of arXiv:2310.17374: the MP estimator's moment MSE
decays polynomially faster in K than one global importance sample).

Per (method, K): ``num_runs`` independent moment estimates from an
UNTRAINED Q ('opt' — the proposals are the prior, reference conf
``Q_param_type`` analog), then

* ``var_mse``  — across-run variance of the estimate (the reference's
  real-data MSE: unbiased sample variance vs the across-run mean),
* ``fake_mse`` — squared error vs the known generating latents
  (``fake_data=True`` mode),

each summed over coordinates per latent, plus per-run wall time (the cost
axis).  TPU-native differences from the reference: the whole per-run
estimate is ONE jitted XLA program, and global-IS at huge K streams
through ``nonmp_moments_streaming`` (lax.scan chunks + online logsumexp)
instead of OOMing — the reference drops failed Ks from its plots
(``moments_paper_plots.remove_failed_Ks``); here K=10^7 fits in O(chunk)
memory.

    python examples/runner_moments_IS.py --model movielens \
        --mp-Ks 3 10 30 100 300 --is-Ks 10 100 1000 10000 100000 1000000 \
        --runs 20 --out results/moments_IS_movielens.json
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "models"))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))) if "__file__" in dir() else ".", ".jax_cache")
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np


def _latent_moment_list(problem):
    from alan_tpu import mean
    from alan_tpu.ir.plate import flatten_tree
    names = [k for k in flatten_tree(problem.Q.plate.grouped_prog).keys()]
    # keep only sampled latents (exclude observed Data)
    flat = problem.Q.plate.varname2groupvarname()
    data_names = set()

    def walk(pl):
        from alan_tpu.ir.data import Data as _Data
        for k, v in pl.flat_prog.items():
            if hasattr(v, "flat_prog"):
                walk(v)
            elif isinstance(v, _Data):
                data_names.add(k)
    walk(problem.Q.plate)
    latents = [n for n in flat if n not in data_names]
    return [((n,), mean) for n in latents], latents


def make_mp_fn(problem, K, split=None):
    """Jitted key -> list of positional moment arrays (MP estimator)."""
    from alan_tpu.split import no_checkpoint, Split
    strategy = Split(*split) if split else no_checkpoint
    moment_list, _ = _latent_moment_list(problem)
    from alan_tpu.dims import as_dt, dims_of

    def f(key):
        s = problem.sample(K, reparam=False, key=key)
        moms = s._moments_uniform_input(moment_list,
                                        computation_strategy=strategy)
        out = []
        for m in moms:
            m = as_dt(m)
            out.append(m.order(*dims_of(m)).data)
        return out
    return jax.jit(f)


def make_is_fn(problem, K, chunk):
    """Jitted key -> list of positional moment arrays (global IS,
    streamed in ``chunk``-sized pieces)."""
    from alan_tpu.sample_nonmp import nonmp_moments_streaming
    from alan_tpu.dims import as_dt, dims_of
    moment_list, _ = _latent_moment_list(problem)
    # chunk must divide K: round to the nearest divisor at most `chunk`
    chunk = min(chunk, K)
    n = -(-K // chunk)
    while K % n:
        n += 1
    chunk = K // n

    def f(key):
        moms, _ = nonmp_moments_streaming(problem, K, chunk, moment_list,
                                          key)
        out = []
        for m in moms:
            m = as_dt(m)
            out.append(m.order(*dims_of(m)).data)
        return out
    return jax.jit(f)


def sweep(model_name, mp_Ks, is_Ks, runs=20, seed=0, chunk=30000,
          split=None, out=None, mp_split_min_K=0):
    from alan_tpu.dims import as_dt, dims_of

    model = __import__(model_name)
    # problem construction runs eager ops; pin to host CPU (eager ops on
    # the remote-TPU backend pay a network round-trip each)
    with jax.default_device(jax.devices("cpu")[0]):
        problem, _, _, _, fake_latents = model.load_and_generate_problem(
            key=jax.random.key(seed), Q_param_type="opt",
            return_fake_latents=True)
    _, latents = _latent_moment_list(problem)
    truth = {}
    for n in latents:
        t = as_dt(fake_latents[n])
        for d in dims_of(t):
            tr = problem.all_platedims.get(d)
            if tr is not None and t.dim_size(d) > tr:
                from alan_tpu.dims import slice_dim
                t = slice_dim(t, d, 0, tr)
        truth[n] = np.asarray(t.order(*dims_of(t)).data)

    result = {"model": model_name, "runs": runs, "latents": latents,
              "chunk": chunk, "mp": {}, "global_is": {}}

    def one_method(tag, Ks, make_fn):
        for K in Ks:
            try:
                f = make_fn(K)
                ests = []
                t0 = time.perf_counter()
                base = jax.random.fold_in(
                    jax.random.key(seed + (1 if tag == "mp" else 2)), K)
                for r in range(runs):
                    key = jax.random.fold_in(base, r)
                    ests.append([np.asarray(x) for x in
                                 jax.block_until_ready(f(key))])
                dt = (time.perf_counter() - t0) / runs
                rec = {"run_s": dt, "var_mse": {}, "fake_mse": {}}
                for i, n in enumerate(latents):
                    stack = np.stack([e[i] for e in ests])     # (runs, ...)
                    gm = stack.mean(axis=0)
                    var = ((stack - gm) ** 2).mean(axis=0).sum()
                    rec["var_mse"][n] = float(var * runs / max(runs - 1, 1))
                    if truth[n].shape == stack.shape[1:]:
                        rec["fake_mse"][n] = float(
                            ((stack - truth[n]) ** 2).mean(axis=0).sum())
                rec["var_mse_total"] = float(sum(rec["var_mse"].values()))
                rec["fake_mse_total"] = float(sum(rec["fake_mse"].values()))
                result[tag][str(K)] = rec
                print(f"{tag} K={K}: var_mse={rec['var_mse_total']:.4g} "
                      f"fake_mse={rec['fake_mse_total']:.4g} "
                      f"run_s={dt:.3f}", flush=True)
            except Exception as e:
                result[tag][str(K)] = {"error": f"{type(e).__name__}: {e}"}
                print(f"{tag} K={K}: FAILED {type(e).__name__}: {e}",
                      flush=True)
            if out:
                with open(out, "w") as fh:
                    json.dump(result, fh, indent=1)

    one_method("mp", mp_Ks,
               lambda K: make_mp_fn(problem, K,
                                    split if K >= mp_split_min_K else None))
    one_method("global_is", is_Ks, lambda K: make_is_fn(problem, K, chunk))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--model", required=True)
    ap.add_argument("--mp-Ks", nargs="+", type=int,
                    default=[3, 10, 30, 100, 300])
    ap.add_argument("--is-Ks", nargs="+", type=int,
                    default=[10, 100, 1000, 10000, 100000, 1000000])
    ap.add_argument("--runs", type=int, default=20)
    ap.add_argument("--chunk", type=int, default=30000)
    ap.add_argument("--split", nargs=2, default=None,
                    metavar=("PLATE", "SIZE"),
                    help="Split(plate, size) for the MP estimator")
    ap.add_argument("--mp-split-min-K", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    split = (a.split[0], int(a.split[1])) if a.split else None
    r = sweep(a.model, a.mp_Ks, a.is_Ks, a.runs, a.seed, a.chunk,
              split, a.out, a.mp_split_min_K)
    print(json.dumps({t: {k: v.get("var_mse_total", v.get("error"))
                          for k, v in r[t].items()}
                      for t in ("mp", "global_is")}, indent=1))


if __name__ == "__main__":
    main()
