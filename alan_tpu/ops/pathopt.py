"""ctypes binding for the native contraction-path planner
(``csrc/pathopt.cpp``).  Falls back to opt_einsum if the shared library
isn't built.  Plans are cached per program structure."""
from __future__ import annotations

import ctypes
import functools
import os

_LIB = None
_TRIED = False


def _autobuild(path):
    """Build the planner on first import of a fresh checkout.

    The native planner is not just faster than the opt_einsum fallback — its
    plans differ, and on sharded programs a different contraction order can
    change which dims GSPMD merges (the round-4 merge-gather class; the
    headline 8-device compile carries 4.9 MB/step of all-gathers under the
    fallback planner vs 0.2 MB under the native one).  A missing build must
    therefore not silently degrade: try a quiet `make` when the toolchain is
    present; fall back to opt_einsum only if that fails."""
    src = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "csrc", "pathopt.cpp")
    if os.path.exists(path) or not os.path.exists(src):
        return
    import subprocess
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-fPIC", "-shared", "-o", path, src],
            check=True, capture_output=True, timeout=120)
    except Exception:
        pass


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "_native", "libalanpath.so")
    _autobuild(path)
    try:
        lib = ctypes.CDLL(path)
        lib.alan_plan_path.restype = ctypes.c_int
        lib.alan_plan_path.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


@functools.lru_cache(maxsize=4096)
def plan_path(factor_dims: tuple[tuple[str, ...], ...],
              dim_sizes: tuple[tuple[str, int], ...],
              out_dims: tuple[str, ...],
              max_optimal: int = 12):
    """Returns an opt_einsum-style linear path (tuple of index pairs).

    All arguments are hashable so plans are memoised per program structure —
    planning happens exactly once per (model, K) configuration.
    """
    lib = _load()
    sizes = dict(dim_sizes)
    names = list(sizes.keys())
    if lib is not None and len(names) < 64 and len(factor_dims) < 64:
        idx = {d: i for i, d in enumerate(names)}
        offsets = [0]
        flat = []
        for dims in factor_dims:
            flat.extend(idx[d] for d in dims)
            offsets.append(len(flat))
        n = len(factor_dims)
        c_off = (ctypes.c_int * len(offsets))(*offsets)
        c_flat = (ctypes.c_int * max(len(flat), 1))(*flat)
        c_sizes = (ctypes.c_double * len(names))(*[float(sizes[d]) for d in names])
        c_out = (ctypes.c_int * max(len(out_dims), 1))(*[idx[d] for d in out_dims])
        c_path = (ctypes.c_int * (2 * max(n - 1, 1)))()
        m = lib.alan_plan_path(n, c_off, c_flat, len(names), c_sizes, c_out,
                               len(out_dims), max_optimal, c_path)
        if m > 0:
            out = []
            for i in range(m):
                a, b = c_path[2 * i], c_path[2 * i + 1]
                out.append((a,) if b < 0 else (a, b))
            return tuple(out)

    # fallback: opt_einsum
    import opt_einsum
    sym = {d: opt_einsum.get_symbol(i) for i, d in enumerate(names)}
    subs = ",".join("".join(sym[d] for d in dims) for dims in factor_dims)
    out = "".join(sym[d] for d in out_dims)
    shapes = [tuple(sizes[d] for d in dims) for dims in factor_dims]
    path, _ = opt_einsum.contract_path(subs + "->" + out, *shapes, shapes=True)
    return tuple(tuple(step) for step in path)
