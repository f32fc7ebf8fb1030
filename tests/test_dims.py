"""Unit tests for the dimmed-tensor substrate (the analog of the reference's
``test_ad_hoc/`` pokes at torchdim utilities)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alan_tpu.dims import (DT, bind, dt_index, elementwise, expand_to,
                           logsumexp_dims, logmeanexp_dims, order, pos_op,
                           rename_dim, slice_dim, sum_dims, sum_pos,
                           concat_dim, mean_dims, amax_dims)

rng = np.random.default_rng(0)


def A(*shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_order_bind_roundtrip():
    x = DT(A(3, 4, 5), ("a", "b"))
    o = x.order("a")
    assert o.dims == ("b",) and o.data.shape == (4, 3, 5)
    back = bind(o, "a")
    assert set(back.dims) == {"a", "b"}
    assert np.allclose(np.asarray(back.with_dims_front(("a", "b")).data),
                       np.asarray(x.data))


def test_elementwise_alignment():
    x = DT(A(3, 4), ("a", "b"))
    y = DT(A(5, 4), ("c", "b"))
    z = x + y
    assert set(z.dims) == {"a", "b", "c"}
    zz = z.with_dims_front(("a", "b", "c"))
    manual = np.asarray(x.data)[:, :, None] + np.asarray(
        y.with_dims_front(("b", "c")).data)[None]
    # zz layout (a,b,c)
    assert np.allclose(np.asarray(zz.data), manual)


def test_positional_broadcast_right_aligned():
    x = DT(A(3, 7), ("a",))       # pos (7,)
    y = DT(A(3, 2, 7), ("a",))    # pos (2,7)
    z = x * y
    assert z.dims == ("a",) and z.pos_shape == (2, 7)


def test_pos_op_matmul_semantics():
    z = DT(A(3, 18), ("K",))          # vector per K
    x = DT(A(5, 18), ("p",))          # vector per p
    out = z @ x
    assert set(out.dims) == {"K", "p"} and out.pos_shape == ()
    o = out.with_dims_front(("K", "p"))
    manual = np.einsum("kd,pd->kp", np.asarray(z.data), np.asarray(x.data))
    assert np.allclose(np.asarray(o.data), manual, atol=1e-5)


def test_reductions():
    x = DT(A(3, 4), ("a", "b"))
    s = sum_dims(x, ("a",))
    assert s.dims == ("b",)
    assert np.allclose(np.asarray(s.data), np.asarray(x.data).sum(0))
    l = logsumexp_dims(x, ("a", "b"))
    assert l.dims == ()
    ref = jax.scipy.special.logsumexp(x.data)
    assert np.isclose(float(l.data), float(ref), atol=1e-5)
    lm = logmeanexp_dims(x, ("a",))
    ref2 = jax.scipy.special.logsumexp(x.data, axis=0) - np.log(3)
    assert np.allclose(np.asarray(lm.data), np.asarray(ref2), atol=1e-5)


def test_dt_index_basic():
    x = DT(A(5, 3), ("K", "p"))
    idx = DT(jnp.asarray([4, 0, 2]), ("p",))   # per-p selection of K
    out = dt_index(x, "K", idx)
    assert out.dims == ("p",)
    xd = np.asarray(x.data)
    expect = np.array([xd[4, 0], xd[0, 1], xd[2, 2]])
    assert np.allclose(np.asarray(out.data), expect)


def test_dt_index_positional_idx():
    # permutation with positional K axis (resample_scope pattern)
    x = DT(A(5,), ("K",))
    perm = DT(jnp.asarray([1, 0, 3, 2, 4]), ())   # pos (K,)
    out = bind(dt_index(x, "K", perm), "K2")
    assert out.dims == ("K2",)
    assert np.allclose(np.asarray(out.data), np.asarray(x.data)[[1, 0, 3, 2, 4]])


def test_slice_and_concat():
    x = DT(A(6, 2), ("T",))
    a = slice_dim(x, "T", 0, 4)
    b = slice_dim(x, "T", 4, 6)
    assert a.dim_size("T") == 4 and b.dim_size("T") == 2
    back = concat_dim([a, b], "T")
    assert np.allclose(np.asarray(back.with_dims_front(("T",)).data),
                       np.asarray(x.data))


def test_rename_and_expand():
    x = DT(A(3), ("K",))
    y = rename_dim(x, "K", "Kinit")
    assert y.dims == ("Kinit",)
    e = expand_to(x, ("p", "K"))
    assert e.shape == (1, 3)


def test_grad_through_dt_ops():
    x0 = A(3, 4)

    def f(x):
        d = DT(x, ("a", "b"))
        return logsumexp_dims(d * 2.0, ("a", "b")).data

    g = jax.grad(f)(x0)
    ref = jax.grad(lambda x: jax.scipy.special.logsumexp(2.0 * x))(x0)
    assert np.allclose(np.asarray(g), np.asarray(ref), atol=1e-5)
