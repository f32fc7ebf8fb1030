"""Sample: K particles per latent drawn from Q, plus everything derived from
the logPQ contraction (parity: reference ``src/alan/Sample.py``).

The autodiff "source-term" trick carries over verbatim to JAX: posterior
moments/marginals are gradients of the ELBO w.r.t. injected zero-valued
log-factors ``J`` (``jax.grad`` of a closure over the trace-time tree walk).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .dims import DT, as_dt, dims_of, sum_pos, detach, dt_index
from .ir.plate import tensordict2tree, flatten_tree, empty_tree
from .logpq import logPQ_plate
from .sample_logpq import logPQ_sample
from .split import no_checkpoint, checkpoint
from .moments import RawMoment, torchdim_moments_mixin, named_moments_mixin
from .marginals import Marginals
from .importance import ImportanceSample
from .utils import detach_tree, KeyGen


class Sample:
    def __init__(self, problem, sample: dict, groupvarname2Kdim: dict,
                 sampler, reparam: bool, states=None):
        self.problem = problem
        self.groupvarname2Kdim = groupvarname2Kdim
        self.sampler = sampler
        self.reparam = reparam
        # optional (stateP, stateQ) override for pure/jitted training steps
        self._states = states if states is not None else (None, None)

        if reparam:
            self.reparam_sample = sample
            self.detached_sample = detach_tree(sample)
        else:
            self.detached_sample = detach_tree(sample)

    @property
    def P(self):
        return self.problem.P

    @property
    def Q(self):
        return self.problem.Q

    @property
    def all_platedims(self):
        return self.problem.all_platedims

    def _elbo(self, sample, extra_log_factors, computation_strategy):
        if extra_log_factors is None:
            extra_log_factors = {}
        # Re-key with positional string ids: pytree dict keys must be sortable,
        # and elf keys are only ever used positionally.
        extra_log_factors = {f"__elf_{i}": sum_pos(v)
                             for i, v in enumerate(extra_log_factors.values())}
        extra_log_factors = tensordict2tree(self.P.plate, extra_log_factors)

        # With an active MeshPlan, also pin the covariate/data layouts:
        # constraining only the sampled particles leaves GSPMD free to
        # replicate plate-sharded broadcasts against unannotated inputs
        # (measured: a full-plate all-gather of the z*x product dominated
        # the headline step's collective bytes, MULTICHIP_DETAIL r4).
        from .parallel.mesh import active_plan
        plan = active_plan()
        inputs_params = self.problem.inputs_params(*self._states)
        data = self.problem.data
        if plan is not None:
            inputs_params = plan.constrain_tree(inputs_params)
            data = plan.constrain_tree(data)

        lp, _, _, _ = logPQ_plate(
            name=None,
            P=self.P.plate,
            Q=self.Q.plate,
            sample=sample,
            inputs_params=inputs_params,
            data=data,
            extra_log_factors=extra_log_factors,
            scope={},
            active_platedims=[],
            all_platedims=self.all_platedims,
            groupvarname2Kdim=self.groupvarname2Kdim,
            varname2groupvarname=self.problem.Q.plate.varname2groupvarname(),
            sampler=self.sampler,
            computation_strategy=computation_strategy)
        assert dims_of(lp) == ()
        return lp.data if isinstance(lp, DT) else lp

    def elbo_vi(self, computation_strategy=checkpoint):
        """The ELBO through a reparameterised sample.  NOTE (JAX semantics):
        for *gradients*, use ``alan_tpu.train.vi_step`` — JAX has no tape, so
        sampling and ELBO must be fused in one differentiated function."""
        if not self.reparam:
            raise Exception(
                "To compute the VI ELBO you must construct a reparameterised "
                "sample with problem.sample(K, reparam=True)")
        return self._elbo(self.reparam_sample, None, computation_strategy)

    def elbo_rws(self, computation_strategy=checkpoint):
        return self._elbo(self.detached_sample, None, computation_strategy)

    def elbo_nograd(self, computation_strategy=checkpoint):
        return jax.lax.stop_gradient(
            self._elbo(self.detached_sample, None, computation_strategy))

    # ---- marginals (reference Sample.py:208-289) -------------------------
    def _marginal_idxs(self, joints, computation_strategy):
        for joint in joints:
            if not isinstance(joint, tuple):
                raise Exception("Arguments to marginals must be tuples of groupvarnames")
            if len(joint) < 2:
                raise Exception("joints in marginals must have length >= 2")
            for gvn in joint:
                if gvn not in self.groupvarname2Kdim:
                    raise Exception(
                        "Arguments to marginals must be groupvarnames (for a "
                        "variable in a Group, use the Group's name)")

        univariates = tuple(frozenset([v]) for v in self.groupvarname2Kdim)
        joints = univariates + tuple(frozenset(j) for j in joints)

        gvn2platenames = self.problem.Q.plate.groupvarname2platenames()

        specs = []   # (frozenset, dims tuple, shape)
        for gvns_frozen in joints:
            gvns = tuple(gvns_frozen)
            active_platenames = gvn2platenames[gvns[0]]
            set_apn = set(active_platenames)
            for gvn in gvns[1:]:
                if set_apn != set(gvn2platenames[gvn]):
                    raise Exception("Joint marginals across different plates don't make sense")

            Kdims = [self.groupvarname2Kdim[gvn] for gvn in gvns]
            dims = tuple([*Kdims, *active_platenames])
            K = self._K_size()
            shape = tuple(K if d.startswith("K_") else self.all_platedims[d] for d in dims)
            specs.append((gvns_frozen, dims, shape))

        def loss(J_list):
            elfs = {gvns: DT(J, dims)
                    for (gvns, dims, _), J in zip(specs, J_list)}
            return self._elbo(self.detached_sample, elfs, computation_strategy)

        J0 = [jnp.zeros(shape) for (_, _, shape) in specs]
        grads = jax.grad(loss)(J0)

        return {gvns: DT(g, dims) for (gvns, dims, _), g in zip(specs, grads)}

    def _K_size(self):
        flat = flatten_tree(self.detached_sample)
        v2g = self.problem.Q.plate.varname2groupvarname()
        for vn, v in flat.items():
            kd = self.groupvarname2Kdim[v2g[vn]]
            return v.dim_size(kd)
        raise Exception("no latents")

    def marginals(self, joints=(), computation_strategy=checkpoint):
        marginals = self._marginal_idxs(joints, computation_strategy)
        samples = flatten_tree(self.detached_sample)
        return Marginals(samples, marginals, self.all_platedims,
                         self.problem.Q.plate.varname2groupvarname())

    # ---- moments via source terms (reference Sample.py:291-346) ----------
    def _moment_specs(self, moms):
        assert isinstance(moms, list)
        for (varnames, m) in moms:
            if not isinstance(m, RawMoment):
                raise Exception("sample.moments requires RawMoments (E[f(x)])")

        flat_sample = flatten_tree(self.detached_sample)
        set_platenames = set(self.all_platedims)

        specs = []
        for i, (varnames, m) in enumerate(moms):
            samples = [flat_sample[vn] for vn in varnames]
            platedimss = [[d for d in dims_of(s) if d in set_platenames] for s in samples]
            longest = sorted(platedimss, key=len)[-1]
            for pd in platedimss:
                assert set(pd).issubset(longest), \
                    "moment variables must be hierarchically nested in plates"
            f = detach(as_dt(m.f(*samples)))
            dims = tuple(longest)
            shape = tuple([self.all_platedims[d] for d in dims]) + f.pos_shape
            # key by position: the same (varnames, moment) may appear twice
            # (e.g. P's and Q's QEM stats in one fused pass)
            specs.append((i, dims, shape, f))
        return specs

    def _moments_uniform_input(self, moms, computation_strategy=no_checkpoint):
        specs = self._moment_specs(moms)

        def loss(J_list):
            elfs = {}
            for ((key_, dims, shape, f), J) in zip(specs, J_list):
                elfs[key_] = f * DT(J, dims)
            return self._elbo(self.detached_sample, elfs, computation_strategy)

        J0 = [jnp.zeros(shape) for (_, _, shape, _) in specs]
        grads = jax.grad(loss)(J0)
        return [DT(g, dims) for (_, dims, _, _), g in zip(specs, grads)]

    def _moments_and_elbo(self, moms, computation_strategy=no_checkpoint):
        """(elbo, moments) in ONE forward + ONE backward: the J source terms
        are zero, so the loss value IS the plain ELBO while its gradient
        w.r.t. the Js reads off all the moments (used by the fused QEM step,
        which otherwise pays 3 forwards + 2 backwards for P-moments,
        Q-moments and the reported ELBO)."""
        specs = self._moment_specs(moms)

        def loss(J_list):
            elfs = {}
            for ((key_, dims, shape, f), J) in zip(specs, J_list):
                elfs[key_] = f * DT(J, dims)
            return self._elbo(self.detached_sample, elfs, computation_strategy)

        J0 = [jnp.zeros(shape) for (_, _, shape, _) in specs]
        elbo, grads = jax.value_and_grad(loss)(J0)
        return elbo, [DT(g, dims) for (_, dims, _, _), g in zip(specs, grads)]

    _moments = torchdim_moments_mixin
    moments = named_moments_mixin

    # ---- importance sampling (reference Sample.py:150-206) ---------------
    def _importance_sample_idxs(self, N: int, computation_strategy, key=None):
        extra_log_factors = empty_tree(self.P.plate)
        N_dim = "N"
        if key is None:
            key = jax.random.key(self.problem._counter + 1000)
        keygen = KeyGen(key)

        indices = logPQ_sample(
            name=None,
            P=self.P.plate,
            Q=self.Q.plate,
            sample=self.detached_sample,
            inputs_params=self.problem.inputs_params(*self._states),
            data=self.problem.data,
            extra_log_factors=extra_log_factors,
            scope={},
            active_platedims=[],
            all_platedims=self.all_platedims,
            groupvarname2Kdim=self.groupvarname2Kdim,
            varname2groupvarname=self.problem.Q.plate.varname2groupvarname(),
            sampler=self.sampler,
            computation_strategy=computation_strategy,
            indices={},
            num_samples=N,
            N_dim=N_dim,
            keygen=keygen)

        Kdim2gvn = {v: k for k, v in self.groupvarname2Kdim.items()}
        return {Kdim2gvn[k]: v for k, v in indices.items()}, N_dim

    def importance_sample(self, N: int, computation_strategy=checkpoint, key=None):
        indices, N_dim = self._importance_sample_idxs(N, computation_strategy, key)
        samples = index_into_sample(self.detached_sample, indices,
                                    self.groupvarname2Kdim,
                                    self.problem.Q.plate.varname2groupvarname())
        return ImportanceSample(self.problem, samples, N_dim,
                                states=self._states)

    def update_qem_params(self, lr: float, computation_strategy=no_checkpoint):
        self.problem.P._update_qem_params(lr, self, computation_strategy)
        self.problem.Q._update_qem_params(lr, self, computation_strategy)


def index_into_sample(sample: dict, indices: dict, groupvarname2Kdim: dict,
                      varname2groupvarname: dict):
    """Swap each latent's K-dim for the sampled N-dim
    (reference ``Sample.py:359-381``)."""
    result = {}
    for name, value in sample.items():
        if isinstance(value, dict):
            result[name] = index_into_sample(value, indices, groupvarname2Kdim,
                                             varname2groupvarname)
        else:
            gvn = varname2groupvarname[name]
            Kdim = groupvarname2Kdim[gvn]
            result[name] = dt_index(detach(value), Kdim, indices[gvn])
    return result
