"""MovieLens with a badly-scaled parameterization (parity: reference
``examples/models/movielens_reparam/movielens_reparam.py``): the per-user
factor ``z`` is divided by SCALE in the prior and multiplied back in the
likelihood, so a sensible Q must learn a scale ~1/SCALE.  This is the QEM
paper's parameterization-sensitivity experiment (QEM adapts the proposal
scale from posterior moments; fixed-lr VI/RWS struggle).

The observation law is identical to the base model, so fake data is reused
from ``movielens.load_data_covariates``.
"""
import math
import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
import movielens as base

from alan_tpu import (Normal, Bernoulli, Plate, BoundPlate, Problem, Data,
                      QEMParam, OptParam)

d_z = base.d_z
SCALE = 100.0

name = "movielens_reparam"

load_data_covariates = base.load_data_covariates


def get_P(platesizes, covariates):
    logits = lambda z, x: (SCALE * z) @ x
    P = Plate(
        mu_z=Normal(jnp.zeros(d_z), jnp.ones(d_z)),
        psi_z=Normal(jnp.zeros(d_z), jnp.ones(d_z)),
        plate_1=Plate(
            z=Normal(lambda mu_z: mu_z / SCALE, lambda psi_z: psi_z.exp() / SCALE),
            plate_2=Plate(
                obs=Bernoulli(logits=logits),
            ),
        ),
    )
    return BoundPlate(P, platesizes, inputs=covariates)


def generate_problem(platesizes, data, covariates, Q_param_type="qem"):
    P = get_P(platesizes, covariates)

    if Q_param_type == "opt":
        def ls(scale_init=1.0):
            return (OptParam(jnp.zeros(d_z)),
                    OptParam(jnp.full(d_z, math.log(scale_init)), transformation=jnp.exp))
    else:
        assert Q_param_type == "qem"
        def ls(scale_init=1.0):
            return (QEMParam(jnp.zeros(d_z)), QEMParam(jnp.full(d_z, scale_init)))

    Q = Plate(
        mu_z=Normal(*ls()),
        psi_z=Normal(*ls()),
        plate_1=Plate(
            z=Normal(*ls(1.0 / SCALE)),
            plate_2=Plate(obs=Data()),
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
