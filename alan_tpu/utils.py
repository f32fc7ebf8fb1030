"""Shared helpers: function introspection, reserved names, tree utilities.

Parity references: ``src/alan/utils.py:17-104`` (introspection + reserved
names), ``src/alan/Plate.py:314-387`` (flat-dict <-> tree converters).
"""
from __future__ import annotations

import inspect

from .dims import DT, dims_of

Number = (int, float)


def function_arguments(f):
    """Extract argument names of a user lambda; enforce a plain signature
    (reference ``utils.py:17-44``)."""
    argspec = inspect.getfullargspec(f)
    if argspec.varargs is not None:
        raise Exception("functions used in a model may not have *args")
    if argspec.varkw is not None:
        raise Exception("functions used in a model may not have **kwargs")
    if (argspec.defaults is not None) or (argspec.kwonlydefaults is not None):
        raise Exception("functions used in a model may not have default args")
    if argspec.kwonlyargs:
        raise Exception("functions used in a model may not have keyword-only args")
    if argspec.annotations:
        raise Exception("functions used in a model may not have type annotations")
    return argspec.args


reserved_names = [
    "prev", "plate", "prog", "sample", "groupvarname2Kdim",
    "inputs", "params", "inputs_params_named", "N",
]
reserved_prefixes = ["K_"]


def check_name(name: str):
    if name in reserved_names:
        raise Exception(f"{name} is a reserved name")
    for prefix in reserved_prefixes:
        if name.startswith(prefix):
            raise Exception(f"names may not start with the reserved prefix {prefix!r} ({name})")


def list_duplicates(xs):
    seen, dups = set(), set()
    for x in xs:
        if x in seen:
            dups.add(x)
        seen.add(x)
    return list(dups)


# ---- tree utilities (trees are nested dicts; leaves are DT) -------------

def flatten_dict(d: dict) -> dict:
    result = {}
    for k, v in d.items():
        if isinstance(v, dict):
            result.update(flatten_dict(v))
        else:
            result[k] = v
    return result


def detach_tree(d):
    import jax
    from .dims import DT
    result = {}
    for k, v in d.items():
        if isinstance(v, dict):
            result[k] = detach_tree(v)
        else:
            result[k] = DT(jax.lax.stop_gradient(v.data), v.dims) if isinstance(v, DT) else jax.lax.stop_gradient(v)
    return result


def tree_branches(tree: dict) -> dict:
    return {k: v for k, v in tree.items() if isinstance(v, dict)}


def tree_values(tree: dict) -> dict:
    return {k: v for k, v in tree.items() if not isinstance(v, dict)}


class KeyGen:
    """Deterministic PRNG-key dispenser for trace-time traversals: the n-th
    request in traversal order returns ``fold_in(key, n)``, so a fixed
    program structure maps a single key to a stable set of per-site keys."""

    def __init__(self, key):
        import jax
        self._key = key
        self._n = 0
        self._fold_in = jax.random.fold_in

    def __call__(self):
        self._n += 1
        return self._fold_in(self._key, self._n)
