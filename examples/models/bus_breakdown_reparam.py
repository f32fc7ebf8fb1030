"""Bus-breakdown with a badly-scaled ``alpha`` (parity: reference
``examples/models/bus_breakdown_reparam/bus_breakdown_reparam.py``):
``alpha`` is divided by SCALE in the prior and multiplied back in the
likelihood logits.  Observation law unchanged; fake data reused from the
base module."""
import math
import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
import bus_breakdown as base

from alan_tpu import (Normal, Bernoulli, Plate, BoundPlate, Problem, Data,
                      Group, QEMParam, OptParam)

run_type_dim = base.run_type_dim
bus_company_name_dim = base.bus_company_name_dim
SCALE = 1000.0

name = "bus_breakdown_reparam"

load_data_covariates = base.load_data_covariates


def get_P(platesizes, covariates):
    P = Plate(
        psi=Normal(jnp.zeros(run_type_dim), jnp.ones(run_type_dim)),
        phi=Normal(jnp.zeros(bus_company_name_dim), jnp.ones(bus_company_name_dim)),
        sigma_beta=Normal(0, 1),
        mu_beta=Normal(0, 1),
        plate_Year=Plate(
            beta=Normal(lambda mu_beta: mu_beta, lambda sigma_beta: sigma_beta.exp()),
            sigma_alpha=Normal(0, 1),
            plate_Borough=Plate(
                alpha=Normal(lambda beta: beta / SCALE,
                             lambda sigma_alpha: sigma_alpha.exp() / SCALE),
                plate_ID=Plate(
                    obs=Bernoulli(logits=lambda alpha, phi, psi, run_type, bus_company_name:
                                  alpha * SCALE + phi @ bus_company_name + psi @ run_type),
                ),
            ),
        ),
    )
    return BoundPlate(P, platesizes, inputs=covariates)


def generate_problem(platesizes, data, covariates, Q_param_type="qem"):
    P = get_P(platesizes, covariates)

    def loc_scale(shape=None, scale_init=1.0):
        if Q_param_type == "opt":
            z = jnp.zeros(shape) if shape else 0.
            ls = (jnp.full(shape, math.log(scale_init)) if shape
                  else math.log(scale_init))
            return (OptParam(z), OptParam(ls, transformation=jnp.exp))
        z = jnp.zeros(shape) if shape else 0.
        s = jnp.full(shape, scale_init) if shape else scale_init
        return (QEMParam(z), QEMParam(s))

    Q = Plate(
        global_latents=Group(
            psi=Normal(*loc_scale((run_type_dim,))),
            phi=Normal(*loc_scale((bus_company_name_dim,))),
            sigma_beta=Normal(*loc_scale()),
            mu_beta=Normal(*loc_scale()),
        ),
        plate_Year=Plate(
            year_latents=Group(
                beta=Normal(*loc_scale()),
                sigma_alpha=Normal(*loc_scale()),
            ),
            plate_Borough=Plate(
                alpha=Normal(*loc_scale(scale_init=1.0 / SCALE)),
                plate_ID=Plate(obs=Data()),
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
