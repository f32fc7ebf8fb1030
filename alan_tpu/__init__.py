"""alan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) massively-parallel
probabilistic programming framework with the capabilities of alan-ppl/alan.

Public API parity: reference ``src/alan/__init__.py``.
"""

from .dims import DT, dt
from .bound import BoundPlate, named
from .ir.plate import Plate
from .ir.group import Group
from .ir.data import Data
from .ir.timeseries import Timeseries
from .ir.param import OptParam, QEMParam
from .ir.dist import new_dist
from .sampler import (Sampler, PermutationSampler, CategoricalSampler,
                      IndependentSampler, samplers)
from .problem import Problem
from .sample import Sample
from .sample_nonmp import SampleNonMP
from .marginals import Marginals
from .importance import ImportanceSample, ExtendedImportanceSample
from .moments import (mean, mean2, var, mean_log, mean_log1m, mean_recip,
                      mean_xxT, cov_x)
from .split import Split, no_checkpoint, checkpoint

# user-facing distribution constructors (Normal, Beta, ...)
from .ir.dist import _dist_calls as _dc
globals().update(_dc)

# subsystem modules (alan_tpu.train.vi, alan_tpu.nuts.run_nuts, ...)
from . import train, predict, checkpointing, profiling, diagnostics  # noqa: E402
from . import mcmc, nuts, smc  # noqa: E402

__all__ = [
    "DT", "dt", "named", "Plate", "BoundPlate", "Problem", "Group", "Data",
    "Timeseries", "OptParam", "QEMParam", "new_dist", "Sampler",
    "PermutationSampler", "CategoricalSampler", "IndependentSampler",
    "samplers", "Sample", "SampleNonMP", "Marginals", "ImportanceSample",
    "ExtendedImportanceSample", "mean", "mean2", "var", "mean_log",
    "mean_log1m", "mean_recip", "mean_xxT", "cov_x", "Split", "no_checkpoint",
    "checkpoint",
    *list(_dc.keys()),
]
