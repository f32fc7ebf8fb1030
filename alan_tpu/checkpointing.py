"""Checkpoint / resume for training state.

The reference saves bare ``state_dict()`` every iteration with no optimizer
or RNG state and no resume logic (reference ``examples/runner.py:189``,
``Stores.py:23-40``).  Here a checkpoint captures the full training state —
P/Q parameter states (opt params, QEM conventional params + moment EMAs),
optimizer state, and the PRNG key — as one pytree, so a run resumes
bit-exactly.
"""
from __future__ import annotations

import json
import os

import jax
import numpy as np

from .dims import DT


def _encode(tree, prefix, arrays, manifest):
    if isinstance(tree, dict):
        manifest["type"] = "dict"
        manifest["children"] = {}
        for k, v in tree.items():
            manifest["children"][k] = {}
            _encode(v, f"{prefix}.{k}", arrays, manifest["children"][k])
    elif isinstance(tree, (tuple, list)):
        manifest["type"] = "tuple" if isinstance(tree, tuple) else "list"
        manifest["children"] = []
        for i, v in enumerate(tree):
            child = {}
            _encode(v, f"{prefix}.{i}", arrays, child)
            manifest["children"].append(child)
    elif isinstance(tree, DT):
        manifest["type"] = "DT"
        manifest["dims"] = list(tree.dims)
        manifest["key"] = prefix
        arrays[prefix] = np.asarray(tree.data)
    elif tree is None:
        manifest["type"] = "none"
    elif np.isscalar(tree) and not hasattr(tree, "shape"):
        manifest["type"] = "scalar"
        manifest["value"] = tree
    else:
        manifest["type"] = "array"
        manifest["key"] = prefix
        arrays[prefix] = np.asarray(tree)


def _decode(manifest, arrays):
    t = manifest["type"]
    if t == "dict":
        return {k: _decode(v, arrays) for k, v in manifest["children"].items()}
    if t in ("tuple", "list"):
        vals = [_decode(c, arrays) for c in manifest["children"]]
        return tuple(vals) if t == "tuple" else vals
    if t == "DT":
        return DT(jax.numpy.asarray(arrays[manifest["key"]]),
                  tuple(manifest["dims"]))
    if t == "none":
        return None
    if t == "scalar":
        return manifest["value"]
    return jax.numpy.asarray(arrays[manifest["key"]])


def save_checkpoint(path: str, state) -> None:
    """Serialise a training-state pytree (dicts/tuples/DT/arrays) to
    ``path.npz`` + ``path.json``.  PRNG keys are stored as their raw data."""
    state = jax.tree.map(
        lambda x: jax.random.key_data(x)
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key)
        else x, state,
        is_leaf=lambda x: isinstance(x, jax.Array))
    arrays, manifest = {}, {}
    _encode(state, "root", arrays, manifest)
    np.savez(path + ".npz", **arrays)
    with open(path + ".json", "w") as f:
        json.dump(manifest, f)


def load_checkpoint(path: str):
    with open(path + ".json") as f:
        manifest = json.load(f)
    arrays = dict(np.load(path + ".npz"))
    return _decode(manifest, arrays)


def save_problem(path: str, problem, extra=None) -> None:
    """Checkpoint a Problem's P/Q states (+ optional extras, e.g. the
    optimizer state and PRNG key)."""
    save_checkpoint(path, {"P": problem.P.state(), "Q": problem.Q.state(),
                           "extra": extra})


def load_problem(path: str, problem):
    """Restore a Problem's P/Q states in place; returns the extras."""
    ck = load_checkpoint(path)
    problem.P.set_state(ck["P"])
    problem.Q.set_state(ck["Q"])
    return ck.get("extra")
