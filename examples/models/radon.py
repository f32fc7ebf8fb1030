"""Radon hierarchical linear regression (parity: reference
``examples/models/radon/radon.py``; Gelman et al. 2006).  Synthetic shapes
mirror the processed dataset: States x Zips, half the Zips held out."""
import jax
import jax.numpy as jnp

from alan_tpu import (Normal, Plate, BoundPlate, Problem, Data, Group,
                      QEMParam, OptParam, named)

n_states, n_zips = 4, 100  # synthetic stand-in shapes

name = "radon"


def load_data_covariates(key=None, run=0, fake_data=True, data_dir="data/", return_fake_latents=False):
    if key is None:
        key = jax.random.key(run)

    if not fake_data:
        if return_fake_latents:
            raise ValueError(
                "return_fake_latents requires fake_data=True")
        # reference file contract: radon.py:14-45 (plate sizes derive from
        # the tensors; train = first half of the Zips axis)
        from _realdata import load_array
        log_radon = load_array(data_dir, "log_radon")
        basement = load_array(data_dir, "basement")
        log_u = load_array(data_dir, "log_u")
        S, Z = log_radon.shape
        platesizes = {'States': S, 'Zips': Z // 2}
        all_platesizes = {'States': S, 'Zips': Z}
        nm = ('States', 'Zips')
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        all_inputs = {'basement': named(f32(basement), *nm),
                      'log_uranium': named(f32(log_u), *nm)}
        train_inputs = {'basement': named(f32(basement[:, :Z // 2]), *nm),
                        'log_uranium': named(f32(log_u[:, :Z // 2]), *nm)}
        all_data = {'obs': named(f32(log_radon), *nm)}
        data = {'obs': named(f32(log_radon[:, :Z // 2]), *nm)}
        return (platesizes, all_platesizes, data, all_data,
                train_inputs, all_inputs)

    platesizes = {'States': n_states, 'Zips': n_zips // 2}
    all_platesizes = {'States': n_states, 'Zips': n_zips}

    k1, k2, k3 = jax.random.split(key, 3)
    basement = jax.random.bernoulli(k1, 0.5, (n_states, n_zips)).astype(jnp.float32)
    log_u = jax.random.normal(k2, (n_states, n_zips))
    all_inputs = {'basement': named(basement, 'States', 'Zips'),
                  'log_uranium': named(log_u, 'States', 'Zips')}
    train_inputs = {'basement': named(basement[:, :n_zips // 2], 'States', 'Zips'),
                    'log_uranium': named(log_u[:, :n_zips // 2], 'States', 'Zips')}

    P = get_P(all_platesizes, all_inputs)
    sample = P.sample(key=k3)
    fake_latents = {k_: v_ for k_, v_ in sample.items() if k_ != 'obs'}
    obs = sample['obs'].with_dims_front(('States', 'Zips'))
    all_data = {'obs': obs}
    data = {'obs': named(obs.data[:, :n_zips // 2], 'States', 'Zips')}
    ret = (platesizes, all_platesizes, data, all_data, train_inputs, all_inputs)
    if return_fake_latents:
        # reference parity: movielens.py:7-38 return_fake_latents
        ret = ret + (fake_latents,)
    return ret


def get_P(platesizes, covariates):
    P = Plate(
        global_mean=Normal(0., 1.),
        global_log_sigma=Normal(0., 1.),
        States=Plate(
            State_mean=Normal('global_mean', lambda global_log_sigma: global_log_sigma.exp()),
            State_log_sigma=Normal(0., 1.),
            Beta_u=Normal(0., 1.),
            Beta_basement=Normal(0., 1.),
            Zips=Plate(
                obs=Normal(lambda State_mean, basement, log_uranium, Beta_basement, Beta_u:
                           State_mean + basement * Beta_basement + log_uranium * Beta_u,
                           lambda State_log_sigma: State_log_sigma.exp()),
            ),
        ),
    )
    return BoundPlate(P, platesizes, inputs=covariates)


def generate_problem(platesizes, data, covariates, Q_param_type="qem"):
    P = get_P(platesizes, covariates)

    def loc_scale():
        if Q_param_type == "opt":
            return (OptParam(0.), OptParam(0., transformation=jnp.exp))
        return (QEMParam(0.), QEMParam(1.))

    Q = Plate(
        global_latents=Group(
            global_mean=Normal(*loc_scale()),
            global_log_sigma=Normal(*loc_scale()),
        ),
        States=Plate(
            State_mean=Normal(*loc_scale()),
            State_log_sigma=Normal(*loc_scale()),
            Beta_u=Normal(*loc_scale()),
            Beta_basement=Normal(*loc_scale()),
            Zips=Plate(obs=Data()),
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
