"""Minimal synthetic Normal-Normal model (parity: reference
``examples/models/synthetic_model/synthetic_model.py``): scalar latent
``mean`` with a far-from-standard prior (N(33, 0.5)), N observations —
the smallest end-to-end workload for sanity runs and moment-convergence
experiments."""
import jax
import jax.numpy as jnp

from alan_tpu import (Normal, Plate, BoundPlate, Problem, Data, QEMParam,
                      OptParam, named)

N = 4
N_extended = 8
z_mean = 33.0
z_var = 0.5
obs_var = 10.0

name = "synthetic_model"


def load_data_covariates(key=None, run=0, fake_data=True, data_dir=None):
    # synthetic model: data is always generated (no real dataset exists;
    # data_dir accepted for interface uniformity)
    if key is None:
        key = jax.random.key(run)
    platesizes = {'plate_1': N}
    all_platesizes = {'plate_1': N_extended}

    P = get_P(all_platesizes, {})
    sample = P.sample(key=key)
    obs = sample['obs'].with_dims_front(('plate_1',))
    all_data = {'obs': obs}
    data = {'obs': named(obs.data[:N], 'plate_1')}
    return platesizes, all_platesizes, data, all_data, {}, {}


def get_P(platesizes, covariates):
    P = Plate(
        mean=Normal(z_mean, z_var),
        plate_1=Plate(
            obs=Normal('mean', obs_var),
        ),
    )
    return BoundPlate(P, platesizes, inputs=covariates)


def generate_problem(platesizes, data, covariates, Q_param_type="qem"):
    P = get_P(platesizes, covariates)

    if Q_param_type == "opt":
        Q = Plate(
            mean=Normal(OptParam(0.), OptParam(0., transformation=jnp.exp)),
            plate_1=Plate(obs=Data()),
        )
    else:
        assert Q_param_type == "qem"
        Q = Plate(
            mean=Normal(QEMParam(0.), QEMParam(1.)),
            plate_1=Plate(obs=Data()),
        )
    Q = BoundPlate(Q, platesizes, inputs=covariates)
    return Problem(P, Q, data)


def load_and_generate_problem(key=None, Q_param_type="qem", run=0,
                              fake_data=True, data_dir="data/"):
    platesizes, all_platesizes, data, all_data, covariates, all_covariates = \
        load_data_covariates(key, run, fake_data, data_dir=data_dir)
    problem = generate_problem(platesizes, data, covariates, Q_param_type)
    return problem, all_data, all_covariates, all_platesizes
