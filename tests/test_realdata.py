"""Real-dataset loading: every canonical model honours the reference's
``data_dir`` .pt file-name contract (e.g. reference
``examples/models/movielens/movielens.py:12-22``), so a dataset prepared for
the reference drops straight in.  The test writes reference-format .pt files
and round-trips each model through load -> Problem -> ELBO."""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples", "models"))

torch = pytest.importorskip("torch")


def _save(d, stem, arr):
    torch.save(torch.as_tensor(np.asarray(arr)), os.path.join(d, stem + ".pt"))


def _check(model, data_dir, expect_platesizes, run=0):
    out = model.load_data_covariates(run=run, fake_data=False,
                                     data_dir=data_dir)
    platesizes, all_platesizes, data, all_data, cov, all_cov = out
    assert platesizes == expect_platesizes
    prob = model.generate_problem(platesizes, data, cov,
                                  getattr(model, "default_qtype", "qem")
                                  if model.name != "covid" else "opt")
    e = float(prob.sample(K=3, reparam=False, key=jax.random.key(0)).elbo_nograd())
    assert np.isfinite(e)
    return all_platesizes, all_data, all_cov


def test_movielens_real_data(tmp_path):
    import movielens
    rng = np.random.default_rng(0)
    d = str(tmp_path)
    M, N = 20, 3
    _save(d, f"weights_{N}_{M}", rng.standard_normal((M, N, movielens.d_z), dtype=np.float32))
    _save(d, f"test_weights_{N}_{M}", rng.standard_normal((M, N, movielens.d_z), dtype=np.float32))
    _save(d, f"data_y_{N}_{M}", rng.integers(0, 2, (M, N)).astype(np.float32))
    _save(d, f"test_data_y_{N}_{M}", rng.integers(0, 2, (M, N)).astype(np.float32))
    out = movielens.load_data_covariates(fake_data=False, data_dir=d, M=M, N=N)
    platesizes, all_platesizes, data, all_data, cov, all_cov = out
    assert platesizes == {'plate_1': M, 'plate_2': N}
    assert all_platesizes == {'plate_1': M, 'plate_2': 2 * N}
    assert all_cov['x'].data.shape == (M, 2 * N, movielens.d_z)
    prob = movielens.generate_problem(platesizes, data, cov, "qem")
    e = float(prob.sample(K=3, reparam=False, key=jax.random.key(0)).elbo_nograd())
    assert np.isfinite(e)


def test_bus_breakdown_real_data(tmp_path):
    import bus_breakdown as m
    rng = np.random.default_rng(1)
    d = str(tmp_path)
    M, J, I = m.M, m.J, m.I
    for half in ("train", "test"):
        _save(d, f"run_type_{half}_0",
              rng.integers(0, 2, (M, J, I, m.run_type_dim)).astype(np.float32))
        _save(d, f"bus_company_name_{half}_0",
              rng.integers(0, 2, (M, J, I, m.bus_company_name_dim)).astype(np.float32))
        _save(d, f"delay_{half}_0", rng.integers(0, 2, (M, J, I)).astype(np.float32))
    _check(m, d, {'plate_Year': M, 'plate_Borough': J, 'plate_ID': I})


def test_chimpanzees_real_data(tmp_path):
    import chimpanzees as m
    rng = np.random.default_rng(2)
    d = str(tmp_path)
    A, B = m.num_actors, m.num_blocks
    R, Re = m.num_repeats, m.num_repeats_extended
    for stem, reps in (("condition_train", R), ("condition_test", Re - R),
                       ("prosoc_left_train", R), ("prosoc_left_test", Re - R),
                       ("data_train", R), ("data_test", Re - R)):
        _save(d, stem, rng.integers(0, 2, (A, B, reps)).astype(np.float32))
    _check(m, d, {'plate_actors': A, 'plate_blocks': B, 'plate_repeats': R})


def test_occupancy_real_data(tmp_path):
    import occupancy as m
    rng = np.random.default_rng(3)
    d = str(tmp_path)
    M, J, I, Re = m.M, m.J, m.I, m.Returns
    Iext = m.I_extended
    for half, n in (("train", I), ("test", Iext - I)):
        _save(d, f"weather_{half}_0", rng.standard_normal((M, J, n), dtype=np.float32))
        _save(d, f"quality_{half}_0", rng.standard_normal((M, J, n), dtype=np.float32))
        _save(d, f"birds_{half}_0", rng.integers(0, 2, (M, J, n, Re)).astype(np.float32))
    _check(m, d, {'plate_Years': M, 'plate_Birds': J, 'plate_Ids': I,
                  'plate_Replicate': Re})


def test_radon_real_data(tmp_path):
    import radon as m
    rng = np.random.default_rng(4)
    d = str(tmp_path)
    S, Z = 4, 10  # plate sizes derive from the tensors
    _save(d, "log_radon", rng.standard_normal((S, Z), dtype=np.float32))
    _save(d, "basement", rng.integers(0, 2, (S, Z)).astype(np.float32))
    _save(d, "log_u", rng.standard_normal((S, Z), dtype=np.float32))
    out = m.load_data_covariates(fake_data=False, data_dir=d)
    platesizes, all_platesizes, data, all_data, cov, all_cov = out
    assert platesizes == {'States': S, 'Zips': Z // 2}
    assert all_platesizes == {'States': S, 'Zips': Z}
    prob = m.generate_problem(platesizes, data, cov, "qem")
    assert np.isfinite(float(prob.sample(K=3, reparam=False, key=jax.random.key(0)).elbo_nograd()))


def test_covid_real_data(tmp_path):
    import covid as m
    rng = np.random.default_rng(5)
    d = str(tmp_path)
    nRs, nDs_train, nDs = 4, 8, 10
    for var, feat in (("ActiveCMs_NPIs", (m.nCMs - 2,)),
                      ("ActiveCMs_wearing", ()),
                      ("ActiveCMs_mobility", ())):
        _save(d, var, rng.random((nRs, nDs_train) + feat).astype(np.float32))
        _save(d, var + "_all", rng.random((nRs, nDs) + feat).astype(np.float32))
    _save(d, "obs", rng.integers(0, 50, (nRs, nDs_train)).astype(np.float32))
    _save(d, "obs_all", rng.integers(0, 50, (nRs, nDs)).astype(np.float32))
    out = m.load_data_covariates(fake_data=False, data_dir=d)
    platesizes, all_platesizes, data, all_data, cov, all_cov = out
    assert platesizes == {'nRs': nRs, 'nDs': nDs_train}
    assert all_platesizes == {'nRs': nRs, 'nDs': nDs}
    prob = m.generate_problem(platesizes, data, cov, "opt")
    assert np.isfinite(float(prob.sample(K=3, reparam=False, key=jax.random.key(0)).elbo_nograd()))


def test_missing_file_message(tmp_path):
    import movielens
    with pytest.raises(FileNotFoundError, match="fake_data=True"):
        movielens.load_data_covariates(fake_data=False, data_dir=str(tmp_path))
