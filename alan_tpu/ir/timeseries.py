"""First-order Markov timeseries inside a plate.

Parity: reference ``src/alan/Timeseries.py``.  TPU-native design differences:

  * Sampling is a ``jax.lax.scan`` over the T dim (the reference runs a
    Python loop per step, ``Timeseries.py:101-123``) — one compiled kernel,
    O(1) program size in T.
  * ``log_prob`` builds the lagged-sample tensor in one shot and returns a
    ``[T, Kinit, K]``-dimmed factor; the *contraction* over T happens in
    ``logpq`` via an associative log-matmul scan (reference
    ``chain_logmmexp``, ``utils.py:478-510``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..dims import DT, as_dt, bind, dims_of, dt_index, expand_to, rename_dim
from .dist import _DistCall


class Timeseries:
    is_timeseries = True
    qem_dist = False

    def __init__(self, init, trans):
        if not isinstance(init, str):
            raise Exception(
                "the first / `init` argument of a Timeseries should be a string "
                "naming a variable in the parent plate")
        if not isinstance(trans, _DistCall):
            raise Exception("the second / `trans` argument of a Timeseries should be a distribution")
        if trans.sample_shape != ():
            raise Exception("sample_shape must not be set on the transition distribution")

        self.init = init
        self.trans = trans.finalize(None)
        assert not self.trans.qem_dist
        # includes own-name/prev refs; stripped by sample_gdt
        self.all_args = [init, *self.trans.all_args]

    @property
    def opt_qem_params(self):
        return self.trans.opt_qem_params

    # -- sampling: lax.scan over T ---------------------------------------
    def sample(self, scope, key, reparam, active_platedims, K_dim, dim_sizes,
               timeseries_perm=None) -> DT:
        assert len(active_platedims) >= 1
        other_platedims, T_dim = active_platedims[:-1], active_platedims[-1]
        T = dim_sizes[T_dim]

        prev0 = scope[self.init]
        if set(dims_of(prev0)) != set([K_dim, *other_platedims]):
            raise Exception(
                f"Initial state {self.init} doesn't have the right dims for a "
                f"timeseries; it must be defined one step up the plate hierarchy "
                f"(got {dims_of(prev0)}, expected {[K_dim, *other_platedims]})")
        carry_dims = dims_of(prev0)
        prev0 = as_dt(prev0)

        # split scope into per-step (T-dimmed) and static parts
        static_scope, scanned_scope = {}, {}
        for k, v in scope.items():
            v = as_dt(v)
            if T_dim in dims_of(v):
                o = v.order(T_dim)                    # (named_rem..., T, pos...)
                scanned_scope[k] = (jnp.moveaxis(o.data, len(o.dims), 0), o.dims)
            else:
                static_scope[k] = v

        perm_xs = None
        if timeseries_perm is not None and T_dim in dims_of(timeseries_perm):
            po = timeseries_perm.order(T_dim)         # (plates..., T, K)
            perm_xs = (jnp.moveaxis(po.data, len(po.dims), 0), po.dims)

        keys = jax.random.split(key, T)

        def step(prev_data, xs):
            key_t, scan_datas, perm_t = xs
            scope_t = dict(static_scope)
            for (k2, (_, ds)), arr in zip(scanned_scope.items(), scan_datas):
                scope_t[k2] = DT(arr, ds)
            scope_t["prev"] = DT(prev_data, carry_dims)
            s = self.trans.sample(scope_t, key_t, reparam, other_platedims,
                                  K_dim, dim_sizes, None)
            s = s.with_dims_front(carry_dims)
            out = s.data
            if perm_t is not None:
                p = DT(perm_t, perm_xs[1])
                nxt = bind(dt_index(s, K_dim, p), K_dim).with_dims_front(carry_dims).data
            else:
                nxt = out
            return nxt, out

        scan_data_list = [arr for arr, _ in scanned_scope.values()]
        carry0 = prev0.with_dims_front(carry_dims).data
        if perm_xs is None:
            def step_noperm(prev, xs2):
                key_t, scan_datas = xs2
                return step(prev, (key_t, scan_datas, None))
            _, ys = jax.lax.scan(step_noperm, carry0, (keys, scan_data_list))
        else:
            _, ys = jax.lax.scan(step, carry0, (keys, scan_data_list, perm_xs[0]))
        return DT(ys, (T_dim,) + carry_dims)

    # -- log prob: lagged tensor, [T, Kinit, K] factor --------------------
    def log_prob(self, sample, scope, T_dim, K_dim):
        """Returns (lp, Kinit_dim); lp carries Kinit, K and T dims
        (reference ``Timeseries.py:203-245``)."""
        assert T_dim is not None and K_dim is not None
        sample = as_dt(sample)
        sdims = set(dims_of(sample))
        assert K_dim in sdims and T_dim in sdims

        initial_state = as_dt(scope[self.init])
        idims = set(dims_of(initial_state))
        assert T_dim not in idims
        diff = list(idims.difference(sdims))
        assert len(diff) == 1, f"couldn't infer Kinit dim: {diff}"
        Kinit_dim = diff[0]

        # lagged sample: [init, x_0, ..., x_{T-2}] labelled with Kinit
        prev = rename_dim(sample, K_dim, Kinit_dim)
        o = prev.order(T_dim)                         # (rem..., T, pos...)
        ax = len(o.dims)
        body = jax.lax.slice_in_dim(o.data, 0, o.data.shape[ax] - 1, axis=ax)
        init_arr = expand_to(initial_state, o.dims)   # (rem_or_1..., pos...)
        init_arr = jnp.broadcast_to(
            jnp.expand_dims(init_arr, ax),
            body.shape[:ax] + (1,) + body.shape[ax + 1:])
        lagged = bind(DT(jnp.concatenate([init_arr, body], axis=ax), o.dims), T_dim)

        scope = {**scope, "prev": lagged}
        lp, _ = self.trans.log_prob(sample, scope)
        lpd = set(dims_of(lp))
        assert Kinit_dim in lpd and K_dim in lpd and T_dim in lpd
        return lp, Kinit_dim

    # -- prior roll-forward beyond T (prediction) -------------------------
    def sample_extended(self, sample, name, scope, inputs_params,
                        original_platedims, extended_platedims,
                        active_extended_platedims, Ndim, key, original_data):
        """Roll the transition forward from the last posterior state
        (reference ``Timeseries.py:125-175``; we index extended inputs at the
        *absolute* time step ``orig_T + t``)."""
        active_plates, T_dim = active_extended_platedims[:-1], active_extended_platedims[-1]
        orig_T = original_platedims[T_dim]
        ext_T = extended_platedims[T_dim]
        steps = ext_T - orig_T

        sample = as_dt(sample)
        # last original timestep as the initial state
        o = sample.order(T_dim)
        ax = len(o.dims)
        prev0 = DT(jax.lax.index_in_dim(o.data, orig_T - 1, axis=ax, keepdims=False), o.dims)
        carry_dims = dims_of(prev0)

        static_scope, scanned_scope = {}, {}
        for k, v in scope.items():
            v = as_dt(v)
            if T_dim in dims_of(v):
                ov = v.order(T_dim)
                arr = jnp.moveaxis(ov.data, len(ov.dims), 0)[orig_T:ext_T]
                scanned_scope[k] = (arr, ov.dims)
            else:
                static_scope[k] = v

        keys = jax.random.split(key, max(steps, 1))

        def step(prev_data, xs):
            key_t, scan_datas = xs
            scope_t = dict(static_scope)
            for (k2, (_, ds)), arr in zip(scanned_scope.items(), scan_datas):
                scope_t[k2] = DT(arr, ds)
            scope_t["prev"] = DT(prev_data, carry_dims)
            s = self.trans.sample(scope_t, key_t, False, active_plates, Ndim,
                                  extended_platedims, None)
            s = s.with_dims_front(carry_dims)
            return s.data, s.data

        if steps > 0:
            scan_data_list = [arr for arr, _ in scanned_scope.values()]
            _, ys = jax.lax.scan(step, prev0.with_dims_front(carry_dims).data,
                                 (keys[:steps], scan_data_list))
            new = DT(ys, (T_dim,) + carry_dims)
            so = sample.order(T_dim)   # dims == carry_dims (same ordering path)
            so_dt = DT(jnp.moveaxis(so.data, len(so.dims), 0), (T_dim,) + so.dims)
            from ..dims import concat_dim
            return concat_dim([so_dt, new], T_dim)
        return sample

    def predictive_ll(self, sample, name, scope, inputs_params,
                      original_platedims, extended_platedims,
                      original_data, extended_data):
        # A timeseries latent is never itself a data variable in the shipped
        # models; mirror the reference by returning nothing here.
        return {}, {}
