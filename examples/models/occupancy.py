"""Bird occupancy Binomial/Bernoulli detection model (parity: reference
``examples/models/occupancy/occupancy.py``)."""
import jax
import jax.numpy as jnp

from alan_tpu import (Normal, Bernoulli, Plate, BoundPlate, Problem, Data,
                      Group, QEMParam, OptParam, named)

M, J, I, Returns = 6, 12, 200, 5
I_extended = 300

name = "occupancy"


def load_data_covariates(key=None, run=0, fake_data=True, data_dir="data/", return_fake_latents=False):
    if key is None:
        key = jax.random.key(run)
    platesizes = {'plate_Years': M, 'plate_Birds': J, 'plate_Ids': I,
                  'plate_Replicate': Returns}
    all_platesizes = {'plate_Years': M, 'plate_Birds': J, 'plate_Ids': I_extended,
                      'plate_Replicate': Returns}
    names3 = ('plate_Years', 'plate_Birds', 'plate_Ids')

    if not fake_data:
        if return_fake_latents:
            raise ValueError(
                "return_fake_latents requires fake_data=True")
        # reference file contract: occupancy.py:17-26 (covariates cat along
        # plate_Ids; obs [.., Ids, Replicate] cat along plate_Ids = axis -2)
        from _realdata import load_train_test
        w, w_all = load_train_test(data_dir, f"weather_train_{run}",
                                   f"weather_test_{run}", axis=-1)
        q, q_all = load_train_test(data_dir, f"quality_train_{run}",
                                   f"quality_test_{run}", axis=-1)
        y, y_all = load_train_test(data_dir, f"birds_train_{run}",
                                   f"birds_test_{run}", axis=-2)
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        covariates = {'weather': named(f32(w), *names3),
                      'quality': named(f32(q), *names3)}
        all_covariates = {'weather': named(f32(w_all), *names3),
                          'quality': named(f32(q_all), *names3)}
        nm4 = (*names3, 'plate_Replicate')
        data = {'obs': named(f32(y), *nm4)}
        all_data = {'obs': named(f32(y_all), *nm4)}
        return (platesizes, all_platesizes, data, all_data,
                covariates, all_covariates)

    k1, k2, k3 = jax.random.split(key, 3)
    weather = jax.random.normal(k1, (M, J, I_extended))
    quality = jax.random.normal(k2, (M, J, I_extended))
    all_covariates = {'weather': named(weather, *names3),
                      'quality': named(quality, *names3)}
    covariates = {'weather': named(weather[:, :, :I], *names3),
                  'quality': named(quality[:, :, :I], *names3)}

    P = get_P(all_platesizes, all_covariates)
    sample = P.sample(key=k3)
    fake_latents = {k_: v_ for k_, v_ in sample.items() if k_ != 'obs'}
    obs = sample['obs'].with_dims_front((*names3, 'plate_Replicate'))
    all_data = {'obs': obs}
    data = {'obs': named(obs.data[:, :, :I, :], *names3, 'plate_Replicate')}
    ret = (platesizes, all_platesizes, data, all_data, covariates, all_covariates)
    if return_fake_latents:
        # reference parity: movielens.py:7-38 return_fake_latents
        ret = ret + (fake_latents,)
    return ret


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
                bird_year_mean=Normal('bird_mean', 1.),
                plate_Ids=Plate(
                    z=Bernoulli(logits=lambda weather, bird_year_mean, beta:
                                bird_year_mean * weather * beta),
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

    def loc_scale():
        if Q_param_type == "opt":
            return (OptParam(0.), OptParam(0., transformation=jnp.exp))
        return (QEMParam(0.), QEMParam(1.))

    def bern():
        # z is discrete; Q over z is a Bernoulli
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
                bird_year_mean=Normal(*loc_scale()),
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
                              fake_data=True, data_dir="data/", return_fake_latents=False):
    out = load_data_covariates(key, run, fake_data, data_dir=data_dir,
                               return_fake_latents=return_fake_latents)
    platesizes, all_platesizes, data, all_data, covariates, all_covariates = out[:6]
    problem = generate_problem(platesizes, data, covariates, Q_param_type)
    result = (problem, all_data, all_covariates, all_platesizes)
    if return_fake_latents:
        result = result + (out[6],)
    return result
