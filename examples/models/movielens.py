"""MovieLens factor model (parity: reference
``examples/models/movielens/movielens.py``): 300 users x 5 films, d_z=18
latent factors, Bernoulli observations with logits z @ x.

Data files aren't shipped; ``fake_data=True`` draws a dataset from the prior
(the reference supports the same mode).
"""
import jax
import jax.numpy as jnp

from alan_tpu import (Normal, Bernoulli, Plate, BoundPlate, Problem, Data,
                      QEMParam, OptParam, named)

d_z = 18
M, N = 300, 5

name = "movielens"


def load_data_covariates(key=None, run=0, fake_data=True, M=M, N=N,
                         data_dir="data/", return_fake_latents=False):
    if key is None:
        key = jax.random.key(run)
    platesizes = {'plate_1': M, 'plate_2': N}
    all_platesizes = {'plate_1': M, 'plate_2': 2 * N}

    if not fake_data:
        if return_fake_latents:
            raise ValueError(
                "return_fake_latents requires fake_data=True")
        # reference file contract: movielens.py:12-22
        from _realdata import load_train_test
        x, x_all = load_train_test(data_dir, f"weights_{N}_{M}",
                                   f"test_weights_{N}_{M}", axis=-2)
        y, y_all = load_train_test(data_dir, f"data_y_{N}_{M}",
                                   f"test_data_y_{N}_{M}", axis=-1)
        nm = ('plate_1', 'plate_2')
        covariates = {'x': named(jnp.asarray(x), *nm)}
        all_covariates = {'x': named(jnp.asarray(x_all), *nm)}
        data = {'obs': named(jnp.asarray(y, jnp.float32), *nm)}
        all_data = {'obs': named(jnp.asarray(y_all, jnp.float32), *nm)}
        return (platesizes, all_platesizes, data, all_data,
                covariates, all_covariates)

    k1, k2 = jax.random.split(key)
    x_all = jax.random.normal(k1, (M, 2 * N, d_z))
    all_covariates = {'x': named(x_all, 'plate_1', 'plate_2')}
    covariates = {'x': named(x_all[:, :N], 'plate_1', 'plate_2')}

    P = get_P(all_platesizes, all_covariates)
    sample = P.sample(key=k2)
    fake_latents = {k_: v_ for k_, v_ in sample.items() if k_ != 'obs'}
    obs = sample['obs'].with_dims_front(('plate_1', 'plate_2'))
    all_data = {'obs': obs}
    data = {'obs': named(obs.data[:, :N], 'plate_1', 'plate_2')}

    ret = (platesizes, all_platesizes, data, all_data, covariates, all_covariates)
    if return_fake_latents:
        # reference parity: movielens.py:7-38 return_fake_latents
        ret = ret + (fake_latents,)
    return ret


def get_P(platesizes, covariates):
    logits = lambda z, x: z @ x
    P = Plate(
        mu_z=Normal(jnp.zeros(d_z), jnp.ones(d_z)),
        psi_z=Normal(jnp.zeros(d_z), jnp.ones(d_z)),
        plate_1=Plate(
            z=Normal("mu_z", lambda psi_z: psi_z.exp()),
            plate_2=Plate(
                obs=Bernoulli(logits=logits),
            ),
        ),
    )
    return BoundPlate(P, platesizes, inputs=covariates)


def generate_problem(platesizes, data, covariates, Q_param_type="qem"):
    P = get_P(platesizes, covariates)

    if Q_param_type == "opt":
        Q = Plate(
            mu_z=Normal(OptParam(jnp.zeros(d_z)),
                        OptParam(jnp.zeros(d_z), transformation=jnp.exp)),
            psi_z=Normal(OptParam(jnp.zeros(d_z)),
                         OptParam(jnp.zeros(d_z), transformation=jnp.exp)),
            plate_1=Plate(
                z=Normal(OptParam(jnp.zeros(d_z)),
                         OptParam(jnp.zeros(d_z), transformation=jnp.exp)),
                plate_2=Plate(obs=Data()),
            ),
        )
    else:
        assert Q_param_type == "qem"
        Q = Plate(
            mu_z=Normal(QEMParam(jnp.zeros(d_z)), QEMParam(jnp.ones(d_z))),
            psi_z=Normal(QEMParam(jnp.zeros(d_z)), QEMParam(jnp.ones(d_z))),
            plate_1=Plate(
                z=Normal(QEMParam(jnp.zeros(d_z)), QEMParam(jnp.ones(d_z))),
                plate_2=Plate(obs=Data()),
            ),
        )
    Q = BoundPlate(Q, platesizes, inputs=covariates)
    return Problem(P, Q, data)


def load_and_generate_problem(key=None, Q_param_type="qem", run=0,
                              fake_data=True, data_dir="data/", return_fake_latents=False):
    out = load_data_covariates(key, run, fake_data, data_dir=data_dir,
                               return_fake_latents=return_fake_latents)
    platesizes, all_platesizes, data, all_data, covariates, all_covariates = out[:6]
    problem = generate_problem(platesizes, data, covariates, Q_param_type)
    result = (problem, all_data, all_covariates, all_platesizes)
    if return_fake_latents:
        result = result + (out[6],)
    return result
