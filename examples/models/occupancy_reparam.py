"""Occupancy with a badly-scaled ``bird_year_mean`` (parity: reference
``examples/models/occupancy_reparam/occupancy_reparam.py``): divided by
SCALE in the prior, multiplied back in the presence logits.  Fake data
reused from the base module (observation law unchanged)."""
import math
import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
import occupancy as base

from alan_tpu import (Normal, Bernoulli, Plate, BoundPlate, Problem, Data,
                      Group, QEMParam, OptParam)

SCALE = 1000.0

name = "occupancy_reparam"

load_data_covariates = base.load_data_covariates


def get_P(platesizes, covariates):
    P = Plate(
        bird_mean_mean=Normal(0., 1.),
        bird_mean_log_var=Normal(0., 1.),
        alpha_mean=Normal(0., 1.),
        alpha_log_var=Normal(0., 1.),
        beta_mean=Normal(0., 1.),
        beta_log_var=Normal(0., 1.),
        plate_Birds=Plate(
            bird_mean=Normal('bird_mean_mean', lambda bird_mean_log_var: bird_mean_log_var.exp()),
            alpha=Normal('alpha_mean', lambda alpha_log_var: alpha_log_var.exp()),
            beta=Normal('beta_mean', lambda beta_log_var: beta_log_var.exp()),
            plate_Years=Plate(
                bird_year_mean=Normal(lambda bird_mean: bird_mean / SCALE, 1.0 / SCALE),
                plate_Ids=Plate(
                    z=Bernoulli(logits=lambda weather, bird_year_mean, beta:
                                SCALE * bird_year_mean * weather * beta),
                    plate_Replicate=Plate(
                        obs=Bernoulli(logits=lambda alpha, quality, z:
                                      alpha * quality * z + (1 - z) * (-10)),
                    ),
                ),
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

    def bern():
        if Q_param_type == "opt":
            return Bernoulli(logits=OptParam(0.))
        return Bernoulli(probs=QEMParam(0.5))

    Q = Plate(
        global_latents=Group(
            bird_mean_mean=Normal(*loc_scale()),
            bird_mean_log_var=Normal(*loc_scale()),
            alpha_mean=Normal(*loc_scale()),
            alpha_log_var=Normal(*loc_scale()),
            beta_mean=Normal(*loc_scale()),
            beta_log_var=Normal(*loc_scale()),
        ),
        plate_Birds=Plate(
            bird_latents=Group(
                bird_mean=Normal(*loc_scale()),
                alpha=Normal(*loc_scale()),
                beta=Normal(*loc_scale()),
            ),
            plate_Years=Plate(
                bird_year_mean=Normal(*loc_scale(1.0 / SCALE)),
                plate_Ids=Plate(
                    z=bern(),
                    plate_Replicate=Plate(obs=Data()),
                ),
            ),
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
