"""Chimpanzees hierarchical logistic regression (parity: reference
``examples/models/chimpanzees/chimpanzees.py``)."""
import jax
import jax.numpy as jnp

from alan_tpu import (Normal, Bernoulli, Plate, BoundPlate, Problem, Data,
                      Group, QEMParam, OptParam, named)

num_actors, num_blocks = 7, 6
num_repeats, num_repeats_extended = 10, 12

name = "chimpanzees"


def load_data_covariates(key=None, run=0, fake_data=True, data_dir="data/", return_fake_latents=False):
    if key is None:
        key = jax.random.key(run)
    platesizes = {'plate_actors': num_actors, 'plate_blocks': num_blocks,
                  'plate_repeats': num_repeats}
    all_platesizes = {'plate_actors': num_actors, 'plate_blocks': num_blocks,
                      'plate_repeats': num_repeats_extended}
    names = ('plate_actors', 'plate_blocks', 'plate_repeats')

    if not fake_data:
        if return_fake_latents:
            raise ValueError(
                "return_fake_latents requires fake_data=True")
        # reference file contract: chimpanzees.py:17-31 (train/test pairs
        # concatenated along plate_repeats)
        from _realdata import load_train_test
        cond, cond_all = load_train_test(data_dir, "condition_train",
                                         "condition_test", axis=-1)
        pl, pl_all = load_train_test(data_dir, "prosoc_left_train",
                                     "prosoc_left_test", axis=-1)
        y, y_all = load_train_test(data_dir, "data_train", "data_test",
                                   axis=-1)
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        covariates = {'condition': named(f32(cond), *names),
                      'prosoc_left': named(f32(pl), *names)}
        all_covariates = {'condition': named(f32(cond_all), *names),
                          'prosoc_left': named(f32(pl_all), *names)}
        data = {'obs': named(f32(y), *names)}
        all_data = {'obs': named(f32(y_all), *names)}
        return (platesizes, all_platesizes, data, all_data,
                covariates, all_covariates)

    k1, k2, k3 = jax.random.split(key, 3)
    shape = (num_actors, num_blocks, num_repeats_extended)
    cond = jax.random.bernoulli(k1, 0.5, shape).astype(jnp.float32)
    pleft = jax.random.bernoulli(k2, 0.5, shape).astype(jnp.float32)
    all_covariates = {'condition': named(cond, *names),
                      'prosoc_left': named(pleft, *names)}
    covariates = {'condition': named(cond[..., :num_repeats], *names),
                  'prosoc_left': named(pleft[..., :num_repeats], *names)}

    P = get_P(all_platesizes, all_covariates)
    sample = P.sample(key=k3)
    fake_latents = {k_: v_ for k_, v_ in sample.items() if k_ != 'obs'}
    obs = sample['obs'].with_dims_front(names)
    all_data = {'obs': obs}
    data = {'obs': named(obs.data[..., :num_repeats], *names)}
    ret = (platesizes, all_platesizes, data, all_data, covariates, all_covariates)
    if return_fake_latents:
        # reference parity: movielens.py:7-38 return_fake_latents
        ret = ret + (fake_latents,)
    return ret


def get_P(platesizes, covariates):
    P = Plate(
        sigma_block=Normal(0., 1.),
        sigma_actor=Normal(0., 1.),
        beta_PC=Normal(0., 10.),
        beta_P=Normal(0., 10.),
        alpha=Normal(0., 10.),
        plate_actors=Plate(
            alpha_actor=Normal(0., lambda sigma_actor: sigma_actor.exp()),
            plate_blocks=Plate(
                alpha_block=Normal(0., lambda sigma_block: sigma_block.exp()),
                plate_repeats=Plate(
                    obs=Bernoulli(logits=lambda alpha, alpha_block, alpha_actor,
                                  beta_PC, beta_P, condition, prosoc_left:
                                  alpha + alpha_actor + alpha_block
                                  + (beta_P + beta_PC * condition) * prosoc_left),
                ),
            ),
        ),
    )
    return BoundPlate(P, platesizes, inputs=covariates)


def generate_problem(platesizes, data, covariates, Q_param_type="qem"):
    import math
    P = get_P(platesizes, covariates)

    def loc_scale(scale_init=1.0):
        if Q_param_type == "opt":
            return (OptParam(0.), OptParam(math.log(scale_init), transformation=jnp.exp))
        return (QEMParam(0.), QEMParam(scale_init))

    Q = Plate(
        global_latents=Group(
            sigma_block=Normal(*loc_scale()),
            sigma_actor=Normal(*loc_scale()),
            beta_PC=Normal(*loc_scale(10.)),
            beta_P=Normal(*loc_scale(10.)),
            alpha=Normal(*loc_scale(10.)),
        ),
        plate_actors=Plate(
            alpha_actor=Normal(*loc_scale()),
            plate_blocks=Plate(
                alpha_block=Normal(*loc_scale()),
                plate_repeats=Plate(obs=Data()),
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
