"""Named-dimension substrate for JAX arrays.

The reference framework (alan-ppl/alan) builds its entire IR on torchdim
(``functorch.dim``, a C++ extension giving first-class ``Dim`` objects;
see reference ``src/alan/utils.py``).  On TPU we want every shape static at
trace time so the whole model compiles into one XLA program.  We therefore
replace first-class dim *objects* with dim *metadata*: a :class:`DT`
("dimmed tensor") is a pytree of ``(jax.Array data, tuple[str] dims)`` where
``dims`` names the leading axes of ``data`` and all remaining trailing axes
are positional.  All dim bookkeeping happens in Python at trace time and is
free at runtime; XLA sees only plain transposes/reshapes/broadcasts, which it
fuses away.

Correspondence with the reference substrate (cited for parity-checking):
  - ``generic_dims/order/getitem``        -> :func:`dims_of`, :meth:`DT.order`, :func:`bind`
    (reference ``utils.py:244-282``)
  - ``sum_dims/logsumexp_dims/...``       -> :func:`sum_dims`, :func:`logsumexp_dims`, ...
    (reference ``utils.py:181-226``)
  - ``x.order(Kdim)[perm]`` gather        -> :func:`dt_index`
  - ``logmmexp/chain_logmmexp``           -> ``alan_tpu.ops.logmmexp`` (Pallas kernel)
"""
from __future__ import annotations

import math
from numbers import Number as PyNumber
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "DT", "dt", "as_dt", "is_dt", "dims_of", "pos_shape", "pos_ndim",
    "dim_size", "align", "bind", "order", "elementwise", "sum_dims",
    "mean_dims", "prod_dims", "amax_dims", "amin_dims", "logsumexp_dims",
    "logmeanexp_dims", "sum_pos", "dt_index", "slice_dim", "concat_dim",
    "unify_dims", "check_unique_dims", "detach", "dimsizes_of", "expand_to",
    "pos_op", "rename_dim",
]

Number = (int, float)


def _is_array_like(x):
    return isinstance(x, (jax.Array, np.ndarray)) or np.isscalar(x)


class DT:
    """A JAX array whose leading axes carry string dim names.

    ``data.shape == (*dim_sizes, *positional_shape)``.  Named dims are
    unordered semantically: every operation aligns by name.  DT is a pytree
    (``dims`` is static aux data), so it traces through ``jit``/``grad``.
    """

    __slots__ = ("data", "dims")

    def __init__(self, data, dims: tuple[str, ...] = ()):
        if isinstance(data, DT):
            raise TypeError("DT of DT")
        dims = tuple(dims)
        self.data = data if isinstance(data, jax.Array) else jnp.asarray(data)
        if len(set(dims)) != len(dims):
            raise ValueError(f"duplicate dims {dims}")
        if self.data.ndim < len(dims):
            raise ValueError(f"{len(dims)} dims {dims} but data.ndim={self.data.ndim}")
        self.dims = dims

    # -- basic properties ------------------------------------------------
    @property
    def pos_shape(self):
        return self.data.shape[len(self.dims):]

    @property
    def pos_ndim(self):
        return self.data.ndim - len(self.dims)

    @property
    def dtype(self):
        return self.data.dtype

    def dim_size(self, d: str) -> int:
        return self.data.shape[self.dims.index(d)]

    def dimsizes(self) -> dict[str, int]:
        return {d: self.data.shape[i] for i, d in enumerate(self.dims)}

    # -- reordering ------------------------------------------------------
    def order(self, *ds: str) -> "DT":
        """Move named dims ``ds`` out of the named block: they become the
        *leading positional* axes (mirrors torchdim ``x.order(*dims)``)."""
        for d in ds:
            if d not in self.dims:
                raise KeyError(f"dim {d} not in {self.dims}")
        rem = [d for d in self.dims if d not in ds]
        perm = ([self.dims.index(d) for d in rem]
                + [self.dims.index(d) for d in ds]
                + list(range(len(self.dims), self.data.ndim)))
        return DT(self.data.transpose(perm), tuple(rem))

    def with_dims_front(self, ds: Sequence[str]) -> "DT":
        """Reorder the named block so it starts with ``ds`` (all must exist)."""
        rest = [d for d in self.dims if d not in ds]
        new = tuple(ds) + tuple(rest)
        perm = [self.dims.index(d) for d in new] + list(range(len(self.dims), self.data.ndim))
        return DT(self.data.transpose(perm), new)

    # -- arithmetic ------------------------------------------------------
    def _binop(self, other, f):
        if getattr(other, "__lazy_dt__", False):
            # lazy factored log-prob (ops/lowrank.LowRankDT): let its
            # reflected op absorb or materialise
            return NotImplemented
        return elementwise(f, self, other)

    def __add__(self, o): return self._binop(o, jnp.add)
    def __radd__(self, o): return elementwise(jnp.add, o, self)
    def __sub__(self, o): return self._binop(o, jnp.subtract)
    def __rsub__(self, o): return elementwise(jnp.subtract, o, self)
    def __mul__(self, o): return self._binop(o, jnp.multiply)
    def __rmul__(self, o): return elementwise(jnp.multiply, o, self)
    def __truediv__(self, o): return self._binop(o, jnp.divide)
    def __rtruediv__(self, o): return elementwise(jnp.divide, o, self)
    def __pow__(self, o): return self._binop(o, jnp.power)
    def __neg__(self): return DT(-self.data, self.dims)
    def __matmul__(self, o): return pos_op(jnp.matmul, self, o)
    def __rmatmul__(self, o): return pos_op(jnp.matmul, o, self)
    def __lt__(self, o): return self._binop(o, jnp.less)
    def __le__(self, o): return self._binop(o, jnp.less_equal)
    def __gt__(self, o): return self._binop(o, jnp.greater)
    def __ge__(self, o): return self._binop(o, jnp.greater_equal)

    def exp(self): return DT(jnp.exp(self.data), self.dims)
    def log(self): return DT(jnp.log(self.data), self.dims)
    def sqrt(self): return DT(jnp.sqrt(self.data), self.dims)
    def sigmoid(self): return DT(jax.nn.sigmoid(self.data), self.dims)
    def abs(self): return DT(jnp.abs(self.data), self.dims)
    def astype(self, dtype): return DT(self.data.astype(dtype), self.dims)

    def sum(self, ds=None):
        if ds is None:
            return sum_pos(self)
        if isinstance(ds, str):
            ds = (ds,)
        return sum_dims(self, ds)

    def __repr__(self):
        return f"DT(dims={self.dims}, pos_shape={self.pos_shape}, dtype={self.data.dtype})"


def _dt_unflatten(dims, children):
    # Raw reconstruction: pytree unflattening must tolerate placeholder
    # leaves (jit.lower ArgInfo, tracers, None in partial trees) and skip
    # validation — construction-time checks live in __init__ for user code.
    obj = object.__new__(DT)
    obj.data = children[0]
    obj.dims = dims
    return obj


jax.tree_util.register_pytree_node(
    DT,
    lambda x: ((x.data,), x.dims),
    _dt_unflatten,
)


# -- constructors / predicates ------------------------------------------

def dt(data, *dims: str) -> DT:
    return DT(data, dims)


def is_dt(x) -> bool:
    return isinstance(x, DT)


def as_dt(x) -> DT:
    if isinstance(x, DT):
        return x
    if getattr(x, "__lazy_dt__", False):
        return x  # lazy factored log-prob: duck-types the DT dim protocol
    return DT(jnp.asarray(x), ())


def dims_of(x) -> tuple[str, ...]:
    if isinstance(x, DT) or getattr(x, "__lazy_dt__", False):
        return x.dims
    return ()


def pos_shape(x):
    return x.pos_shape if isinstance(x, DT) else jnp.shape(x)


def pos_ndim(x) -> int:
    return x.pos_ndim if isinstance(x, DT) else jnp.ndim(x)


def dim_size(x, d: str) -> int:
    return as_dt(x).dim_size(d)


def dimsizes_of(*xs) -> dict[str, int]:
    out: dict[str, int] = {}
    for x in xs:
        if isinstance(x, DT):
            for d, s in x.dimsizes().items():
                if d in out and out[d] != s:
                    raise ValueError(f"dim {d} has conflicting sizes {out[d]} vs {s}")
                out[d] = s
    return out


def unify_dims(xs) -> list[str]:
    """Unique ordered list of dims across xs (reference ``utils.py:231``)."""
    seen: dict[str, None] = {}
    for x in xs:
        for d in dims_of(x):
            seen.setdefault(d, None)
    return list(seen)


def check_unique_dims(ds):
    if len(set(ds)) != len(ds):
        raise ValueError(f"non-unique dims {ds}")


def bind(x, *names: str) -> DT:
    """Bind the first positional axes of ``x`` to ``names`` (torchdim ``x[dim]``)."""
    x = as_dt(x)
    for n in names:
        if n in x.dims:
            raise ValueError(f"dim {n} already bound in {x.dims}")
    if x.pos_ndim < len(names):
        raise ValueError(f"cannot bind {names}: only {x.pos_ndim} positional axes")
    return DT(x.data, x.dims + tuple(names))


def order(x, ds) -> DT:
    if isinstance(ds, str):
        ds = (ds,)
    return as_dt(x).order(*ds)


def detach(x):
    if isinstance(x, DT):
        return DT(jax.lax.stop_gradient(x.data), x.dims)
    return jax.lax.stop_gradient(x)


# -- alignment & elementwise ops ----------------------------------------

def _expand_named(x: DT, union: Sequence[str]):
    """Return raw array with named block == union (size-1 for missing dims),
    positional block unchanged."""
    x = x.with_dims_front([d for d in union if d in x.dims])
    # After with_dims_front the named block is ordered as union∩x.dims.
    shape = list(x.data.shape)
    pos = shape[len(x.dims):]
    sizes = x.dimsizes()
    full = [sizes.get(d, 1) for d in union]
    return x.data.reshape([*full, *pos])


def expand_to(x, union: Sequence[str]):
    """Raw array for ``x`` with named block exactly ``union`` (size-1 where
    missing), positional block unchanged.  ``x.dims ⊆ union`` required."""
    x = as_dt(x)
    for d in x.dims:
        if d not in union:
            raise KeyError(f"dim {d} of operand not in target dims {union}")
    return _expand_named(x, union)


def align(*xs, extra: Sequence[str] = ()):
    """Align values over the union of their named dims.

    Returns ``(arrays, union_dims)`` where each array has shape
    ``(*union_sizes_or_1, *its_own_positional_shape)``.  Positional blocks are
    left untouched (they broadcast right-aligned under numpy rules).
    """
    dts = [as_dt(x) for x in xs]
    union = unify_dims(dts)
    for d in extra:
        if d not in union:
            union.append(d)
    dimsizes_of(*dts)  # consistency check
    return [_expand_named(x, union) for x in dts], tuple(union)


def pos_op(f, *xs) -> DT:
    """Apply ``f`` to the *positional* blocks of the operands, vectorised over
    the union of named dims.  Needed for ops like ``matmul`` whose semantics
    depend on operand rank (torchdim applies them to positional dims only)."""
    dts = [as_dt(x) for x in xs]
    if not any(x.dims for x in dts):
        return DT(f(*[x.data for x in dts]), ())
    # Two regimes (trace-time choice):
    # * no MeshPlan active — flatten the named dims to ONE batch axis
    #   (single-batch-dim dots tile best on the MXU);
    # * MeshPlan active — nested vmaps over the INTACT axes: a reshape
    #   merging sharded dims (K on "k", plate on "p") is unrepresentable
    #   in GSPMD and forces full-plate all-gathers of both operands
    #   (measured 2x1.6 MB/step on the 8-device headline audit).
    from .parallel.mesh import active_plan
    plan = active_plan()
    arrs, union = align(*dts)
    sizes = [max(a.shape[i] for a in arrs) for i in range(len(union))]
    full = []
    for a in arrs:
        tgt = tuple(sizes) + a.shape[len(union):]
        full.append(jnp.broadcast_to(a, tgt))
    if plan is not None:
        g = f
        for _ in range(len(union)):
            g = jax.vmap(g)
        return DT(g(*full), union)
    flat = [a.reshape((-1,) + a.shape[len(union):]) for a in full]
    out = jax.vmap(f)(*flat)
    return DT(out.reshape(tuple(sizes) + out.shape[1:]), union)


def elementwise(f, *xs) -> DT:
    """Apply positional-broadcasting ``f`` across aligned dimmed args."""
    if not any(isinstance(x, DT) and x.dims for x in xs):
        datas = [x.data if isinstance(x, DT) else x for x in xs]
        return DT(f(*datas), ())
    arrs, union = align(*xs)
    # positional blocks broadcast right-aligned; named blocks are leading and
    # already the same length, so pad positional ranks to a common rank.
    max_pos = max(a.ndim - len(union) for a in arrs)
    padded = []
    for a in arrs:
        p = a.ndim - len(union)
        if p < max_pos:
            a = a.reshape(a.shape[:len(union)] + (1,) * (max_pos - p) + a.shape[len(union):])
        padded.append(a)
    return DT(f(*padded), union)


# -- reductions over named dims -----------------------------------------

def _reduce(fn):
    def inner(x, ds, ignore_extra_dims: bool = False):
        x = as_dt(x)
        if isinstance(ds, str):
            ds = (ds,)
        check_unique_dims(tuple(ds))
        if ignore_extra_dims:
            ds = tuple(d for d in ds if d in x.dims)
        for d in ds:
            if d not in x.dims:
                raise KeyError(f"reduction dim {d} not in {x.dims}")
        if len(ds) == 0:
            return x
        o = x.order(*ds)
        axes = tuple(range(len(o.dims), len(o.dims) + len(ds)))
        return DT(fn(o.data, axes), o.dims)
    return inner


sum_dims = _reduce(lambda a, ax: jnp.sum(a, axis=ax))
mean_dims = _reduce(lambda a, ax: jnp.mean(a, axis=ax))
prod_dims = _reduce(lambda a, ax: jnp.prod(a, axis=ax))
amax_dims = _reduce(lambda a, ax: jnp.max(a, axis=ax))
amin_dims = _reduce(lambda a, ax: jnp.min(a, axis=ax))


def logsumexp_dims(x, ds, ignore_extra_dims: bool = False) -> DT:
    """eps-stabilised logsumexp over named dims.

    Numerics mirror the reference (``utils.py:207-222``): subtract the max,
    exp, sum, add ``eps`` inside the log so all--inf slices stay finite.
    """
    x = as_dt(x)
    if isinstance(ds, str):
        ds = (ds,)
    check_unique_dims(tuple(ds))
    if ignore_extra_dims:
        ds = tuple(d for d in ds if d in x.dims)
    for d in ds:
        if d not in x.dims:
            raise KeyError(f"reduction dim {d} not in {x.dims}")
    if len(ds) == 0:
        return x
    o = x.order(*ds)
    axes = tuple(range(len(o.dims), len(o.dims) + len(ds)))
    a = o.data
    a_max = jax.lax.stop_gradient(jnp.max(a, axis=axes, keepdims=True))
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    s = jnp.sum(jnp.exp(a - a_max), axis=axes)
    eps = jnp.finfo(s.dtype).eps
    out = jnp.log(s + eps) + jnp.squeeze(a_max, axis=axes)
    return DT(out, o.dims)


def logmeanexp_dims(x, ds) -> DT:
    x = as_dt(x)
    if isinstance(ds, str):
        ds = (ds,)
    total = sum(math.log(x.dim_size(d)) for d in ds)
    r = logsumexp_dims(x, ds)
    return DT(r.data - total, r.dims)


def sum_pos(x):
    """Sum over all positional axes (reference ``sum_non_dim``)."""
    if not isinstance(x, DT):
        return jnp.sum(jnp.asarray(x)) if jnp.ndim(x) > 0 else x
    if x.pos_ndim == 0:
        return x
    axes = tuple(range(len(x.dims), x.data.ndim))
    return DT(jnp.sum(x.data, axis=axes), x.dims)


# -- gather / indexing ---------------------------------------------------

def dt_index(x, dim: str, idx) -> DT:
    """Gather along named ``dim`` of ``x`` with integer indices ``idx``.

    Mirrors torchdim's ``x.order(dim)[idx]`` where ``idx`` is itself a dimmed
    tensor: the result's named dims are ``(x.dims - {dim}) ∪ idx.dims`` and its
    positional shape is ``(*idx.pos_shape, *x.pos_shape)``.
    """
    x = as_dt(x)
    idx = as_dt(idx)
    if dim not in x.dims:
        raise KeyError(f"{dim} not in {x.dims}")
    S = x.dim_size(dim)

    common = [d for d in x.dims if d != dim]
    for d in idx.dims:
        if d not in common:
            common.append(d)
    nC = len(common)
    n_ipos = idx.pos_ndim
    n_xpos = x.pos_ndim

    # x arranged: (*common_or_1, S, *1s(idx_pos), *x_pos)
    xa = _expand_named(x.order(dim), common)          # (*common_or_1, S, *x_pos)
    xa = xa.reshape(xa.shape[:nC + 1] + (1,) * n_ipos + xa.shape[nC + 1:])
    # idx arranged: (*common_or_1, 1, *idx_pos, *1s(x_pos))
    ia = _expand_named(idx, common)                   # (*common_or_1, *idx_pos)
    ia = ia.reshape(ia.shape[:nC] + (1,) + ia.shape[nC:] + (1,) * n_xpos)

    out = jnp.take_along_axis(xa, ia, axis=nC)        # size 1 along axis nC
    out = jnp.squeeze(out, axis=nC)
    return DT(out, tuple(common))


def slice_dim(x, dim: str, start: int, stop: int) -> DT:
    """Static slice along a named dim (used by Split and predictive-LL)."""
    x = as_dt(x)
    o = x.order(dim)
    axis = len(o.dims)
    sl = [slice(None)] * o.data.ndim
    sl[axis] = slice(start, stop)
    return bind(DT(o.data[tuple(sl)], o.dims), dim)


def rename_dim(x, old: str, new: str) -> DT:
    """Relabel a named dim (used e.g. to view a timeseries sample's K-dim as
    the lagged Kinit-dim)."""
    x = as_dt(x)
    if new in x.dims:
        raise ValueError(f"dim {new} already present in {x.dims}")
    return DT(x.data, tuple(new if d == old else d for d in x.dims))


def concat_dim(xs: Sequence[DT], dim: str) -> DT:
    """Concatenate along a named dim; all xs must share remaining dims."""
    xs = [as_dt(x) for x in xs]
    os = [x.order(dim) for x in xs]
    ref = os[0].dims
    arrs = []
    for o in os:
        o2 = DT(o.data, o.dims).with_dims_front(ref) if set(o.dims) == set(ref) else None
        if o2 is None:
            raise ValueError("concat_dim: mismatched dims")
        arrs.append(o2.data)
    axis = len(ref)
    return bind(DT(jnp.concatenate(arrs, axis=axis), ref), dim)
