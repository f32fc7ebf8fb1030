"""Microbenchmark: block-diagonal batch packing for chain_logmmexp.

Covid's chain contraction (reference hot path ``utils.py:478-510`` invoked at
``logpq.py:131-146``) reduces ``[K_npis=30, nRs=92, T=137, K=30, K=30]`` —
thousands of 30x30 log-space matmuls.  Each such matmul occupies a full
128x128x128 MXU pass at ~1.3% utilisation, and its 30-wide trailing axis
wastes ~3/4 of the VPU lanes in the exp/max passes.  Packing G=4 batch
elements into a block-diagonal (G*K)x(G*K) operand turns 4 passes into 1:
block-diag @ block-diag = block-diag, off-diagonal zeros add exactly 0.0 to
every accumulator, and the per-row/per-column max shifts stay within-block
(off-diagonal entries are -inf before exp), so the packed result is
numerically identical to the unpacked one.

This script measures the covid-shaped chain, forward and grad, dense vs
packed, on whatever backend is active (run it on the TPU).
"""
import argparse
import functools
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from bench_lowrank_kernel import device_loop_time  # noqa: E402
from alan_tpu.ops.logmmexp import chain_logmmexp, logmmexp  # noqa: E402


def pack_blockdiag(ms, G):
    """[B, T, K, K] -> [ceil(B/G), T, G*K, G*K] block-diagonal, -inf off-diag."""
    B, T, K, _ = ms.shape
    nb = -(-B // G)
    pad = nb * G - B
    if pad:
        ms = jnp.pad(ms, ((0, pad), (0, 0), (0, 0), (0, 0)),
                     constant_values=-jnp.inf)
    ms = ms.reshape(nb, G, T, K, K)
    packed = jnp.full((nb, T, G * K, G * K), -jnp.inf, ms.dtype)
    for g in range(G):
        packed = packed.at[:, :, g * K:(g + 1) * K, g * K:(g + 1) * K].set(
            ms[:, g])
    return packed


def unpack_blockdiag(out, G, B, K):
    """[nb, G*K, G*K] -> [B, K, K] diagonal blocks."""
    nb = out.shape[0]
    blocks = [out[:, g * K:(g + 1) * K, g * K:(g + 1) * K] for g in range(G)]
    return jnp.stack(blocks, 1).reshape(nb * G, K, K)[:B]


def chain_logmmexp_packed(ms, G, remask=True):
    B, T, K, _ = ms.shape
    x = pack_blockdiag(ms, G)
    if remask:
        mask = jnp.full((G * K, G * K), False)
        for g in range(G):
            mask = mask.at[g * K:(g + 1) * K, g * K:(g + 1) * K].set(True)
    T_axis = 1
    while x.shape[T_axis] != 1:
        n = x.shape[T_axis]
        even = jax.lax.slice_in_dim(x, 0, n - (n % 2), stride=2, axis=T_axis)
        odd = jax.lax.slice_in_dim(x, 1, n, stride=2, axis=T_axis)
        prod = logmmexp(even, odd, allow_pallas=False)
        if remask:
            prod = jnp.where(mask, prod, -jnp.inf)
        if n % 2 == 1:
            rem = jax.lax.slice_in_dim(x, n - 1, n, axis=T_axis)
            prod = jnp.concatenate([prod, rem], axis=T_axis)
        x = prod
    return unpack_blockdiag(jnp.squeeze(x, T_axis), G, B, K)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=2760)   # K_npis=30 x nRs=92
    ap.add_argument("--T", type=int, default=137)
    ap.add_argument("--K", type=int, default=30)
    ap.add_argument("--Gs", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--grad-B", type=int, default=0,
                    help="batch for grad timing (0 = same as --B)")
    ap.add_argument("--skip-grad", action="store_true")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    with jax.default_device(jax.devices("cpu")[0]):
        ms_np = jnp.asarray(
            rng.standard_normal((args.B, args.T, args.K, args.K)) - 2.0,
            jnp.float32)
    ms = jax.device_put(ms_np, jax.devices()[0])
    print(f"backend={jax.devices()[0].platform} shape={ms.shape} "
          f"({ms.size*4/1e9:.2f} GB)", flush=True)

    res = {"B": args.B, "T": args.T, "K": args.K}

    dense = lambda m: chain_logmmexp(m)
    ref = jax.jit(dense)(ms)
    res["dense_fwd_s"] = device_loop_time(dense, (ms,), m=4)
    print(f"dense fwd: {res['dense_fwd_s']*1e3:.2f} ms", flush=True)

    for G in args.Gs:
        f = functools.partial(chain_logmmexp_packed, G=G)
        out = jax.jit(f)(ms)
        err = float(jnp.max(jnp.abs(out - ref)))
        t = device_loop_time(f, (ms,), m=4)
        res[f"packed_G{G}_fwd_s"] = t
        res[f"packed_G{G}_err"] = err
        print(f"packed G={G} fwd: {t*1e3:.2f} ms  (max|err|={err:.2e}, "
              f"{res['dense_fwd_s']/t:.2f}x)", flush=True)

    if not args.skip_grad:
        gB = args.grad_B or args.B
        msg = ms[:gB]
        def make_grad(f):
            return jax.grad(lambda m: jnp.sum(f(m) * 1e-3))
        gd = device_loop_time(make_grad(dense), (msg,), m=4)
        res["dense_grad_s"] = gd
        print(f"dense grad (B={gB}): {gd*1e3:.2f} ms", flush=True)
        for G in args.Gs:
            f = functools.partial(chain_logmmexp_packed, G=G)
            t = device_loop_time(make_grad(f), (msg,), m=4)
            res[f"packed_G{G}_grad_s"] = t
            print(f"packed G={G} grad: {t*1e3:.2f} ms ({gd/t:.2f}x)",
                  flush=True)

    path = os.path.join(_REPO, "BENCH_DETAIL.json")
    prev = json.load(open(path)) if os.path.exists(path) else {}
    prev.setdefault("chain_packed", {})[f"B{args.B}_T{args.T}_K{args.K}"] = res
    json.dump(prev, open(path, "w"), indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
