"""NYC bus-breakdown 3-level hierarchy with Groups (parity: reference
``examples/models/bus_breakdown/bus_breakdown.py``)."""
import jax
import jax.numpy as jnp

from alan_tpu import (Normal, Bernoulli, Plate, BoundPlate, Problem, Data,
                      Group, QEMParam, OptParam, named)

M, J, I = 2, 3, 150
run_type_dim = 2
bus_company_name_dim = 4

name = "bus_breakdown"


def load_data_covariates(key=None, run=0, fake_data=True, data_dir="data/", return_fake_latents=False):
    if key is None:
        key = jax.random.key(run)
    platesizes = {'plate_Year': M, 'plate_Borough': J, 'plate_ID': I}
    all_platesizes = {'plate_Year': M, 'plate_Borough': J, 'plate_ID': 2 * I}

    if not fake_data:
        if return_fake_latents:
            raise ValueError(
                "return_fake_latents requires fake_data=True")
        # reference file contract: bus_breakdown.py:11-21 (train/test pairs
        # concatenated along plate_ID)
        from _realdata import load_train_test
        nm = ('plate_Year', 'plate_Borough', 'plate_ID')
        rt, rt_all = load_train_test(data_dir, f"run_type_train_{run}",
                                     f"run_type_test_{run}", axis=2)
        bc, bc_all = load_train_test(data_dir, f"bus_company_name_train_{run}",
                                     f"bus_company_name_test_{run}", axis=2)
        y, y_all = load_train_test(data_dir, f"delay_train_{run}",
                                   f"delay_test_{run}", axis=-1)
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        covariates = {'run_type': named(f32(rt), *nm),
                      'bus_company_name': named(f32(bc), *nm)}
        all_covariates = {'run_type': named(f32(rt_all), *nm),
                          'bus_company_name': named(f32(bc_all), *nm)}
        data = {'obs': named(f32(y), *nm)}
        all_data = {'obs': named(f32(y_all), *nm)}
        return (platesizes, all_platesizes, data, all_data,
                covariates, all_covariates)

    k1, k2, k3 = jax.random.split(key, 3)
    rt = jax.random.bernoulli(k1, 0.5, (M, J, 2 * I, run_type_dim)).astype(jnp.float32)
    bc = jax.random.bernoulli(k2, 0.5, (M, J, 2 * I, bus_company_name_dim)).astype(jnp.float32)
    all_covariates = {
        'run_type': named(rt, 'plate_Year', 'plate_Borough', 'plate_ID'),
        'bus_company_name': named(bc, 'plate_Year', 'plate_Borough', 'plate_ID')}
    covariates = {
        'run_type': named(rt[:, :, :I], 'plate_Year', 'plate_Borough', 'plate_ID'),
        'bus_company_name': named(bc[:, :, :I], 'plate_Year', 'plate_Borough', 'plate_ID')}

    P = get_P(all_platesizes, all_covariates)
    sample = P.sample(key=k3)
    fake_latents = {k_: v_ for k_, v_ in sample.items() if k_ != 'obs'}
    obs = sample['obs'].with_dims_front(('plate_Year', 'plate_Borough', 'plate_ID'))
    all_data = {'obs': obs}
    data = {'obs': named(obs.data[:, :, :I], 'plate_Year', 'plate_Borough', 'plate_ID')}
    ret = (platesizes, all_platesizes, data, all_data, covariates, all_covariates)
    if return_fake_latents:
        # reference parity: movielens.py:7-38 return_fake_latents
        ret = ret + (fake_latents,)
    return ret


def get_P(platesizes, covariates):
    P = Plate(
        psi=Normal(jnp.zeros(run_type_dim), jnp.ones(run_type_dim)),
        phi=Normal(jnp.zeros(bus_company_name_dim), jnp.ones(bus_company_name_dim)),
        sigma_beta=Normal(0, 1),
        mu_beta=Normal(0, 1),
        plate_Year=Plate(
            beta=Normal('mu_beta', lambda sigma_beta: sigma_beta.exp()),
            sigma_alpha=Normal(0, 1),
            plate_Borough=Plate(
                alpha=Normal('beta', lambda sigma_alpha: sigma_alpha.exp()),
                plate_ID=Plate(
                    obs=Bernoulli(logits=lambda alpha, phi, psi, run_type, bus_company_name:
                                  alpha + phi @ bus_company_name + psi @ run_type),
                ),
            ),
        ),
    )
    return BoundPlate(P, platesizes, inputs=covariates)


def generate_problem(platesizes, data, covariates, Q_param_type="qem"):
    P = get_P(platesizes, covariates)
    Par = OptParam if Q_param_type == "opt" else QEMParam

    def loc_scale(shape=None):
        if Q_param_type == "opt":
            z = jnp.zeros(shape) if shape else 0.
            return (OptParam(z), OptParam(z, transformation=jnp.exp))
        z = jnp.zeros(shape) if shape else 0.
        o = jnp.ones(shape) if shape else 1.
        return (QEMParam(z), QEMParam(o))

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
                alpha=Normal(*loc_scale()),
                plate_ID=Plate(obs=Data()),
            ),
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
