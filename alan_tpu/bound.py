"""BoundPlate: binds a Plate to plate sizes, inputs (covariates) and the
learnable-parameter state.

Parity: reference ``src/alan/BoundPlate.py``.  TPU-native difference: there is
no ``nn.Module`` and no in-place buffers — the parameter state (opt params,
QEM conventional params, QEM moment EMAs) is an explicit pytree
(``state()``/``set_state()``), so training steps are pure functions
``state -> state`` that jit/grad cleanly.  The object API mutates the stored
state at the Python level for interactive convenience.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .dims import DT, as_dt, dims_of, dt, elementwise as ew
from .ir.plate import Plate, tensordict2tree, flatten_tree
from .ir.checking import check_timeseries
from .ir.param import OptParam, QEMParam
from .sampler import Sampler, PermutationSampler
from .moments import moments_func2name
from .conversions import conversion_dict
from .utils import KeyGen, check_name


def named(data, *dims: str) -> DT:
    """Create a dimmed tensor whose leading axes are the given plate names
    (the JAX-side analog of torch named tensors used by the reference API)."""
    return dt(jnp.asarray(data), *dims)


def expand_named(x, names, all_platesizes: dict) -> DT:
    """Broadcast a parameter init over its plates
    (reference ``BoundPlate.py:17-30``)."""
    x = as_dt(x)
    for d in x.dims:
        if d not in all_platesizes:
            raise Exception(f"{d} is on a parameter but not in all_platesizes")
    extra = [n for n in names if n not in x.dims]
    for n in extra:
        if n not in all_platesizes:
            raise Exception(f"{n} is a plate dimension, but is not in all_platesizes")
    sizes = tuple(all_platesizes[n] for n in extra)
    data = jnp.broadcast_to(x.data, sizes + x.data.shape)
    return DT(data, tuple(extra) + x.dims)


class BoundPlate:
    def __init__(self, plate: Plate, all_platesizes: dict | None,
                 inputs=None, extra_opt_params=None):
        assert isinstance(plate, Plate)
        self.plate = plate

        all_platesizes = dict(all_platesizes or {})
        for platename in plate.all_platenames():
            if platename not in all_platesizes:
                raise Exception(
                    f"Every plate must have a size in all_platesizes; {platename} doesn't")
        self.all_platesizes = all_platesizes

        inputs = {k: as_dt(v) for k, v in (inputs or {}).items()}
        extra_opt_params = {k: as_dt(v) for k, v in (extra_opt_params or {}).items()}

        for k, v in {**inputs, **extra_opt_params}.items():
            for name in dims_of(v):
                if name not in all_platesizes:
                    raise Exception(
                        f"Dim {name} on input/extra_opt_param {k} not in all_platesizes")
                if v.dim_size(name) != all_platesizes[name]:
                    raise Exception(
                        f"Size mismatch for {k} along {name}: all_platesizes says "
                        f"{all_platesizes[name]}, tensor has {v.dim_size(name)}")

        check_timeseries(plate)

        # inputs/params must be used at plate depths consistent with their dims
        groupvarname2platenames = plate.groupvarname2platenames()
        varname2groupvarname_dist = plate.varname2groupvarname_dist()
        ie = {**inputs, **extra_opt_params}
        for varname, (groupvarname, dist) in varname2groupvarname_dist.items():
            for argname in dist.all_args:
                if argname in ie:
                    dist_platenames = groupvarname2platenames[groupvarname]
                    arg_platenames = dims_of(ie[argname])
                    if not set(arg_platenames).issubset(dist_platenames):
                        raise Exception(
                            f"{argname} is used on {varname} (plates {dist_platenames}) "
                            f"but has plates {list(arg_platenames)}")

        # ---- build parameter state (reference BoundPlate.py:108-199) -----
        opt_params = dict(extra_opt_params)
        self.opt_paramname2trans = {p: (lambda x: x) for p in opt_params}

        self.qem_list_varname = []
        self.qem_list_conversion = []
        self.qem_list_rmkeys = []
        self.qem_flat_list_rmkeys = []
        qem_means = {}
        qem_params = {}
        self.qem_varname_distargname2paramname = {}
        self.qem_rmkey2meanname = {}
        self.qem_meanname2rmkey = {}

        for varname, (groupvarname, dist) in varname2groupvarname_dist.items():
            platenames = groupvarname2platenames[groupvarname]
            if not getattr(dist, "qem_dist", False):
                for paramname, (distargname, param) in dist.opt_qem_params.items():
                    if paramname in opt_params:
                        raise Exception(
                            f"OptParam name clash: {paramname} already exists")
                    opt_params[paramname] = expand_named(param.init, platenames, all_platesizes)
                    self.opt_paramname2trans[paramname] = param.trans
            else:
                self.qem_list_varname.append(varname)
                conversion = conversion_dict[dist.family]
                self.qem_list_conversion.append(conversion)

                rmkeys = [((varname,), mom) for mom in conversion.sufficient_stats]
                self.qem_flat_list_rmkeys.extend(rmkeys)
                self.qem_list_rmkeys.append(rmkeys)

                init_conv_dict = {}
                for paramname, (distargname, param) in dist.opt_qem_params.items():
                    expanded = expand_named(param.init, platenames, all_platesizes)
                    qem_params[paramname] = expanded
                    init_conv_dict[distargname] = expanded
                init_means = conversion.conv2mean(**init_conv_dict)

                for rmkey in rmkeys:
                    _, rawmoment = rmkey
                    meanname = f"{varname}_{moments_func2name[rawmoment]}"
                    self.qem_rmkey2meanname[rmkey] = meanname
                    self.qem_meanname2rmkey[meanname] = rmkey
                for rmkey, init_mean in zip(rmkeys, init_means):
                    qem_means[self.qem_rmkey2meanname[rmkey]] = as_dt(init_mean)

                for paramname, (distargname, param) in dist.opt_qem_params.items():
                    self.qem_varname_distargname2paramname[(varname, distargname)] = paramname

        self._inputs = inputs
        self._state = {
            "opt": opt_params,
            "qem_params": qem_params,
            "qem_means": qem_means,
        }

        # name hygiene (reference BoundPlate.py:204-220)
        input_param_names = list(self.inputs_params_flat_named().keys())
        for name in input_param_names:
            check_name(name)
        if len(input_param_names) != len(set(input_param_names)):
            raise Exception("BoundPlate has overlapping names in inputs/opt_params/qem_params")
        overlap = set(input_param_names).intersection(plate.all_prog_names())
        if overlap:
            raise Exception(
                f"Program names overlap with input/param names: {overlap}")

        # check dependencies resolve, by sampling once
        self.sample(key=jax.random.key(0))

    # ---- functional state ------------------------------------------------
    def state(self):
        return self._state

    def set_state(self, state):
        self._state = state

    def inputs(self):
        return dict(self._inputs)

    def opt_params(self, state=None):
        state = state if state is not None else self._state
        return {k: ew(self.opt_paramname2trans[k], v) for k, v in state["opt"].items()}

    def qem_params(self, state=None):
        state = state if state is not None else self._state
        return dict(state["qem_params"])

    def qem_means(self, state=None):
        state = state if state is not None else self._state
        return dict(state["qem_means"])

    def inputs_params_flat_named(self, state=None):
        return {**self.inputs(), **self.opt_params(state), **self.qem_params(state)}

    def inputs_params(self, all_platedims=None, state=None):
        return tensordict2tree(self.plate, self.inputs_params_flat_named(state))

    # ---- QEM updates (reference BoundPlate.py:256-296) -------------------
    def _updated_qem_state(self, lr, sample, computation_strategy, state=None,
                           moments=None):
        """Pure QEM step: EMA the posterior moments and re-derive conventional
        params; returns a new state pytree.  ``moments`` may carry the
        precomputed moment list for ``qem_flat_list_rmkeys`` (the fused QEM
        step extracts P's and Q's moments plus the ELBO in one grad pass)."""
        state = state if state is not None else self._state
        new_means = dict(state["qem_means"])
        rmkey_list = self.qem_flat_list_rmkeys
        if rmkey_list:
            new_moment_list = moments if moments is not None else \
                sample._moments_uniform_input(
                    rmkey_list, computation_strategy=computation_strategy)
            assert len(new_moment_list) == len(rmkey_list)
            for rmkey, new_moment in zip(rmkey_list, new_moment_list):
                meanname = self.qem_rmkey2meanname[rmkey]
                prev = new_means[meanname]
                upd = (1.0 - lr) * prev + lr * new_moment
                new_means[meanname] = upd.with_dims_front(prev.dims)

        new_params = dict(state["qem_params"])
        for varname, conversion, rmkeys in zip(
                self.qem_list_varname, self.qem_list_conversion, self.qem_list_rmkeys):
            means = [new_means[self.qem_rmkey2meanname[rmkey]] for rmkey in rmkeys]
            conv_dict = conversion.mean2conv(*means)
            for distargname, new_param in conv_dict.items():
                paramname = self.qem_varname_distargname2paramname[(varname, distargname)]
                old = new_params[paramname]
                assert set(dims_of(new_param)) == set(dims_of(old))
                new_params[paramname] = new_param.with_dims_front(old.dims)

        return {"opt": dict(state["opt"]), "qem_params": new_params,
                "qem_means": new_means}

    def _update_qem_params(self, lr, sample, computation_strategy):
        self._state = self._updated_qem_state(lr, sample, computation_strategy)

    # ---- sampling --------------------------------------------------------
    def _sample(self, K: int, reparam: bool, sampler, all_platedims: dict,
                key, state=None):
        assert isinstance(K, int)
        assert issubclass(sampler, Sampler)
        groupvarname2Kdim = self.plate.groupvarname2Kdim(K)
        dim_sizes = {**all_platedims, **{kd: K for kd in groupvarname2Kdim.values()}}
        keygen = KeyGen(key)
        sample = self.plate.sample(
            name=None,
            scope={},
            inputs_params=self.inputs_params(all_platedims, state),
            active_platedims=[],
            all_platedims=all_platedims,
            groupvarname2Kdim=groupvarname2Kdim,
            sampler=sampler,
            reparam=reparam,
            keygen=keygen,
            dim_sizes=dim_sizes,
        )
        return sample, groupvarname2Kdim

    def sample(self, sample_size: int = 1, key=None):
        """Draw from the prior; returns a flat dict of dimmed tensors whose
        dims are plates (plus ``N`` if sample_size > 1)."""
        if key is None:
            key = jax.random.key(0)
        all_platedims = dict(self.all_platesizes)
        tree, gv2K = self._sample(sample_size, False, PermutationSampler, all_platedims, key)
        flat = flatten_tree(tree)
        out = {}
        platenames = set(all_platedims)
        for k, v in flat.items():
            Kdims = [d for d in dims_of(v) if d not in platenames]
            o = v.order(*Kdims)
            if sample_size > 1:
                from .dims import bind
                out[k] = bind(o, "N") if len(Kdims) == 1 else o
            else:
                data = o.data
                for _ in Kdims:
                    data = jnp.squeeze(data, axis=len(o.dims))
                out[k] = DT(data, o.dims)
        return out

    def groupvarname2platenames(self):
        return self.plate.groupvarname2platenames()

    def varname2groupvarname(self):
        return self.plate.varname2groupvarname()
