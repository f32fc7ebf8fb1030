"""User-facing distribution atoms of the model IR.

Parity reference: ``src/alan/dist.py``.  A distribution argument may be
  * a number / array  (constant),
  * a string          (reference to a variable in scope),
  * a lambda          (transformation of scope variables; args matched by name),
  * an ``OptParam`` / ``QEMParam`` (learnable; resolved via the parameter
    state that BoundPlate threads through the scope).

``alan_tpu.Normal(0., 1.)`` etc. construct lazy ``_DistCall`` objects that
``Plate`` finalizes with the variable name (reference ``dist.py:86-102``).
"""
from __future__ import annotations

import types

import jax
import jax.numpy as jnp
import numpy as np

from ..dims import DT, as_dt, dims_of, is_dt
from ..utils import Number, function_arguments
from ..distributions.families import FAMILIES, Family
from ..distributions.dimdist import DimDist
from .param import Param, OptParam, QEMParam
from .data import Data


def datagroup(group: dict) -> bool:
    """True if this (singleton) group is a Data marker (reference ``dist.py:15``)."""
    assert isinstance(group, dict)
    hasdata = any(isinstance(v, Data) for v in group.values())
    assert not (len(group) >= 2 and hasdata)
    return hasdata


class _DistCall:
    """Lazy user-level distribution: ``Normal(0., 'a')`` before it is bound
    to a variable name inside a Plate/Group."""
    family: type[Family]

    def __init__(self, *args, sample_shape=(), **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.sample_shape = tuple(sample_shape) if not isinstance(sample_shape, int) else (sample_shape,)

    def finalize(self, varname):
        return Dist(varname=varname, family=self.family, args=self.args,
                    sample_shape=self.sample_shape, kwargs=self.kwargs)


class Dist:
    """A finalized distribution node (reference ``dist.py:104-318``)."""

    is_timeseries = False

    def __init__(self, varname, family, args, sample_shape, kwargs):
        self.varname = varname
        self.family = family
        self.sample_shape = tuple(sample_shape)
        self.using_sample_shape = self.sample_shape != ()

        bound = family.bind_args(args, kwargs)

        self.qem_dist = any(isinstance(v, QEMParam) for v in bound.values())
        self.opt_dist = any(isinstance(v, OptParam) for v in bound.values())

        if (self.qem_dist or self.opt_dist) and self.using_sample_shape:
            raise Exception("You can't use sample_shape with QEM or Opt parameters")

        if self.qem_dist:
            vals = list(bound.values())
            for v in vals:
                if not isinstance(v, QEMParam):
                    raise Exception(
                        "If one parameter on a distribution is a QEMParam, all "
                        "parameters on that distribution must be QEMParams")
            ig0 = set(vals[0].ignore_platenames)
            for v in vals[1:]:
                if ig0 != set(v.ignore_platenames):
                    raise Exception("All QEMParams on a distribution must share ignore_platenames")

        # Param -> named string reference saved in opt_qem_params.
        self.opt_qem_params = {}   # paramname -> (distargname, Param)
        resolved = {}
        for distargname, v in bound.items():
            if isinstance(v, Param):
                if varname is None:
                    raise Exception("You can't use QEMParam / OptParam in a timeseries at present")
                name = v.name if v.name is not None else f"{varname}_{distargname}"
                self.opt_qem_params[name] = (distargname, v)
                v = name
            resolved[distargname] = v

        self.str_args = {}
        self.func_args = {}
        self.tensor_args = {}
        self.val_args = {}
        all_args = set()
        for distargname, v in resolved.items():
            if isinstance(v, str):
                self.str_args[distargname] = v
                all_args.add(v)
            elif isinstance(v, types.FunctionType):
                self.func_args[distargname] = v
                all_args.update(function_arguments(v))
            elif isinstance(v, (DT, jax.Array, np.ndarray)):
                self.tensor_args[distargname] = as_dt(v)
            else:
                assert isinstance(v, Number), f"bad arg {distargname}={v!r}"
                self.val_args[distargname] = v
        self.all_args = list(all_args)

    def filter_scope(self, scope):
        return {k: v for k, v in scope.items() if k in self.all_args}

    def paramname2val(self, scope):
        result = {}
        for k, v in self.val_args.items():
            result[k] = float(v) if not self.family.discrete else v
        for k, v in self.tensor_args.items():
            result[k] = v
        for k, ref in self.str_args.items():
            result[k] = scope[ref]
        for k, f in self.func_args.items():
            val = f(*[scope[a] for a in function_arguments(f)])
            if not isinstance(val, (DT, jax.Array)) and not np.isscalar(val):
                raise Exception("Lambda on a distribution returned a non-array")
            result[k] = val
        return result

    def tdd(self, scope) -> DimDist:
        return DimDist(self.family, **self.paramname2val(scope))

    def sample(self, scope, key, reparam, active_platedims, K_dim, dim_sizes,
               timeseries_perm=None) -> DT:
        return self.tdd(scope).sample(
            key, reparam,
            sample_dims=[*active_platedims, K_dim],
            dim_sizes=dim_sizes,
            sample_shape=self.sample_shape,
        )

    def log_prob(self, sample, scope, T_dim=None, K_dim=None):
        # T_dim/K_dim accepted for interface parity with Timeseries.
        return self.tdd(scope).log_prob(sample), None

    def sample_extended(self, sample, name, scope, inputs_params,
                        original_platedims, extended_platedims,
                        active_extended_platedims, Ndim, key,
                        original_data):
        """Prior-extend a posterior sample over enlarged plates
        (reference ``dist.py:234-269``)."""
        from ..dims import expand_to, bind
        filtered_scope = self.filter_scope(scope)
        sample_dims = [*active_extended_platedims, Ndim]
        original_sample = as_dt(sample if sample is not None else original_data[name])

        tdd = self.tdd(filtered_scope)
        extended = tdd.sample(key, False, sample_dims, extended_platedims,
                              sample_shape=self.sample_shape)

        # overwrite the original region with the (posterior) original sample
        shared = [d for d in dims_of(extended)
                  if d in original_platedims and d in dims_of(original_sample)]
        ext_o = extended.order(*shared)       # dims rest, pos (*ext_shared, *pos)
        orig_o = original_sample.order(*shared)
        orig_arr = expand_to(orig_o, ext_o.dims)
        idx = tuple(slice(None) for _ in ext_o.dims) + tuple(
            slice(0, original_platedims[d]) for d in shared)
        new_data = ext_o.data.at[idx].set(orig_arr)
        return bind(DT(new_data, ext_o.dims), *shared)

    def predictive_ll(self, sample, name, scope, inputs_params,
                      original_platedims, extended_platedims,
                      original_data, extended_data):
        """Log-lik of extended data + the original-region restriction
        (reference ``dist.py:271-294``)."""
        from ..dims import slice_dim
        original_ll, extended_ll = {}, {}
        if name in extended_data:
            ell, _ = self.log_prob(extended_data[name], scope)
            extended_ll[name] = ell
            oll = ell
            for d in dims_of(ell):
                if d in original_platedims:
                    oll = slice_dim(oll, d, 0, original_platedims[d])
            original_ll[name] = oll
        return original_ll, extended_ll


def sample_gdt(prog: dict, scope: dict, keygen, active_platedims, K_dim,
               groupvarname2Kdim, dim_sizes, sampler, reparam) -> dict:
    """Sample a group/dist/timeseries sharing one K-dim
    (reference ``dist.py:23-72``)."""
    assert not datagroup(prog)

    set_all_args = set(a for dist in prog.values() for a in dist.all_args)
    all_args = set_all_args.difference([*prog.keys(), "prev"])

    for k in all_args:
        if k not in scope:
            raise Exception(f"{k} is not in scope")

    scope = {k: v for k, v in scope.items() if k in all_args}
    scope = sampler.resample_scope(scope, active_platedims, K_dim, dim_sizes, keygen)

    timeseries_perm = sampler.perm(
        dims=[K_dim, *active_platedims], Kdim=K_dim, dim_sizes=dim_sizes, key=keygen())

    result = {}
    for name, dist in prog.items():
        s = dist.sample(scope, keygen(), reparam, active_platedims, K_dim,
                        dim_sizes, timeseries_perm)
        scope[name] = s
        result[name] = s
    return result


# ---- family table + new_dist extension hook (reference dist.py:323-374) --

def new_dist(name: str, family: type[Family]):
    """Register a new user-facing distribution class."""
    DC = type(name, (_DistCall,), {"family": family})
    globals()[name] = DC
    _dist_calls[name] = DC
    return DC


_dist_calls: dict[str, type] = {}
for _name, _fam in FAMILIES.items():
    new_dist(_name, _fam)
