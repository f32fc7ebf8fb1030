"""Learnable-parameter markers (parity: reference ``src/alan/Param.py``).

``OptParam`` marks a distribution argument as a gradient-learned parameter;
``QEMParam`` marks one learned by natural-gradient moment matching (QEM).
Initial values become entries in the BoundPlate's functional parameter state.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils import Number


class Param:
    pass


def identity(x):
    return x


def _proc_init(init):
    if isinstance(init, Number):
        return jnp.asarray(float(init))
    if isinstance(init, np.ndarray):
        return jnp.asarray(init)
    return init


class OptParam(Param):
    def __init__(self, init, transformation=None, ignore_platenames=(), name=None):
        self.init = _proc_init(init)
        self.trans = transformation if transformation is not None else identity
        self.ignore_platenames = ignore_platenames
        self.name = name


class QEMParam(Param):
    def __init__(self, init, ignore_platenames=(), name=None):
        self.init = _proc_init(init)
        self.trans = identity
        self.ignore_platenames = ignore_platenames
        self.name = name
