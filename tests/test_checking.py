"""Static-checking negative tests (reference ``checking.py`` behaviors)."""
import jax.numpy as jnp
import numpy as np
import pytest

from alan_tpu import (Normal, Beta, Plate, BoundPlate, Problem, Data, Group,
                      Timeseries, named)


def test_duplicate_names_rejected():
    with pytest.raises(Exception, match="duplicate"):
        Plate(a=Normal(0, 1), g=Group(a=Normal(0, 1), b=Normal(0, 1)))


def test_reserved_names_rejected():
    with pytest.raises(Exception, match="reserved"):
        Plate(K_foo=Normal(0, 1))
    with pytest.raises(Exception, match="reserved"):
        Plate(N=Normal(0, 1))


def test_support_mismatch_rejected():
    P = Plate(a=Normal(0, 1), T=Plate(d=Normal('a', 1)))
    Q = Plate(a=Beta(1, 1), T=Plate(d=Data()))
    Pb = BoundPlate(P, {'T': 3})
    Qb = BoundPlate(Q, {'T': 3})
    with pytest.raises(Exception, match="support"):
        Problem(Pb, Qb, {'d': named(jnp.zeros(3), 'T')})


def test_data_name_mismatch_rejected():
    P = Plate(a=Normal(0, 1), T=Plate(d=Normal('a', 1)))
    Q = Plate(a=Normal(0, 1), T=Plate(d=Data()))
    Pb = BoundPlate(P, {'T': 3})
    Qb = BoundPlate(Q, {'T': 3})
    with pytest.raises(Exception):
        Problem(Pb, Qb, {'WRONG': named(jnp.zeros(3), 'T')})


def test_structure_mismatch_rejected():
    P = Plate(a=Normal(0, 1), T=Plate(d=Normal('a', 1)))
    Q = Plate(a=Normal(0, 1), d=Data())  # d not in a plate in Q
    Pb = BoundPlate(P, {'T': 3})
    with pytest.raises(Exception):
        Qb = BoundPlate(Q, {'T': 3})
        Problem(Pb, Qb, {'d': named(jnp.zeros(3), 'T')})


def test_missing_platesize_rejected():
    P = Plate(a=Normal(0, 1), T=Plate(d=Normal('a', 1)))
    with pytest.raises(Exception, match="platesize"):
        BoundPlate(P, {})


def test_timeseries_init_must_be_in_parent_plate():
    P = Plate(
        T=Plate(ts=Timeseries('nonexistent', Normal(lambda prev: prev, 1.))),
    )
    with pytest.raises(Exception):
        BoundPlate(P, {'T': 3})


def test_scope_is_ordered():
    # c refers to a before a is defined -> error at binding time
    P = Plate(c=Normal('zzz_undefined', 1), a=Normal(0, 1))
    with pytest.raises(Exception, match="scope"):
        BoundPlate(P, {})
