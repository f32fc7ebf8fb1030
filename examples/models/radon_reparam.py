"""Radon with a badly-scaled ``State_mean`` (parity: reference
``examples/models/radon_reparam/radon_reparam.py``): divided by SCALE in
the prior, multiplied back in the observation mean.  Fake data reused from
the base module (observation law unchanged)."""
import math
import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
import radon as base

from alan_tpu import (Normal, Plate, BoundPlate, Problem, Data, Group,
                      QEMParam, OptParam)

SCALE = 1000.0

name = "radon_reparam"

load_data_covariates = base.load_data_covariates


def get_P(platesizes, covariates):
    P = Plate(
        global_mean=Normal(0., 1.),
        global_log_sigma=Normal(0., 1.),
        States=Plate(
            State_mean=Normal(lambda global_mean: global_mean / SCALE,
                              lambda global_log_sigma: global_log_sigma.exp() / SCALE),
            State_log_sigma=Normal(0., 1.),
            Beta_u=Normal(0., 1.),
            Beta_basement=Normal(0., 1.),
            Zips=Plate(
                obs=Normal(lambda State_mean, basement, log_uranium, Beta_basement, Beta_u:
                           SCALE * State_mean + basement * Beta_basement + log_uranium * Beta_u,
                           lambda State_log_sigma: State_log_sigma.exp()),
            ),
        ),
    )
    return BoundPlate(P, platesizes, inputs=covariates)


def generate_problem(platesizes, data, covariates, Q_param_type="qem"):
    P = get_P(platesizes, covariates)

    def loc_scale(scale_init=1.0):
        if Q_param_type == "opt":
            return (OptParam(0.), OptParam(math.log(scale_init), transformation=jnp.exp))
        return (QEMParam(0.), QEMParam(scale_init))

    Q = Plate(
        global_latents=Group(
            global_mean=Normal(*loc_scale()),
            global_log_sigma=Normal(*loc_scale()),
        ),
        States=Plate(
            State_mean=Normal(*loc_scale(1.0 / SCALE)),
            State_log_sigma=Normal(*loc_scale()),
            Beta_u=Normal(*loc_scale()),
            Beta_basement=Normal(*loc_scale()),
            Zips=Plate(obs=Data()),
        ),
    )
    Q = BoundPlate(Q, platesizes, inputs=covariates)
    return Problem(P, Q, data)


def load_and_generate_problem(key=None, Q_param_type="qem", run=0,
                              fake_data=True, data_dir="data/"):
    platesizes, all_platesizes, data, all_data, covariates, all_covariates = \
        load_data_covariates(key, run, fake_data, data_dir=data_dir)
    problem = generate_problem(platesizes, data, covariates, Q_param_type)
    return problem, all_data, all_covariates, all_platesizes
