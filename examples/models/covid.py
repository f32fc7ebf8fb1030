"""COVID NPI model with a Timeseries latent and NegativeBinomial observations
(parity: reference ``examples/models/covid/covid.py``): nRs regions x nDs
days, first-order Markov ``log_infected`` chain."""
import math

import jax
import jax.numpy as jnp

from alan_tpu import (Normal, NegativeBinomial, Timeseries, Plate, BoundPlate,
                      Problem, Data, Group, QEMParam, OptParam, named)

nRs = 92
nDs = 137
nCMs = 11

name = "covid"


def load_data_covariates(key=None, run=0, fake_data=True, nRs=nRs, nDs=nDs,
                         data_dir="data/", return_fake_latents=False):
    if key is None:
        key = jax.random.key(run)

    if not fake_data:
        if return_fake_latents:
            raise ValueError(
                "return_fake_latents requires fake_data=True")
        # reference file contract: covid.py:15-24 (pre-split train/all files;
        # plate sizes derive from the tensors)
        from _realdata import load_array
        nm = ('nRs', 'nDs')
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        covariates, all_covariates = {}, {}
        for var in ('ActiveCMs_NPIs', 'ActiveCMs_wearing', 'ActiveCMs_mobility'):
            covariates[var] = named(f32(load_array(data_dir, var)), *nm)
            all_covariates[var] = named(f32(load_array(data_dir, var + "_all")), *nm)
        obs = load_array(data_dir, "obs")
        obs_all = load_array(data_dir, "obs_all")
        platesizes = {'nRs': obs.shape[0], 'nDs': obs.shape[1]}
        all_platesizes = {'nRs': obs_all.shape[0], 'nDs': obs_all.shape[1]}
        data = {'obs': named(f32(obs), *nm)}
        all_data = {'obs': named(f32(obs_all), *nm)}
        return (platesizes, all_platesizes, data, all_data,
                covariates, all_covariates)

    nDs_train = int(nDs * 0.8)
    platesizes = {'nRs': nRs, 'nDs': nDs_train}
    all_platesizes = {'nRs': nRs, 'nDs': nDs}

    k1, k2, k3, k4 = jax.random.split(key, 4)
    npis = jax.random.bernoulli(k1, 0.3, (nRs, nDs, nCMs - 2)).astype(jnp.float32)
    wearing = jax.random.uniform(k2, (nRs, nDs))
    mobility = jax.random.uniform(k3, (nRs, nDs))
    all_covariates = {
        'ActiveCMs_NPIs': named(npis, 'nRs', 'nDs'),
        'ActiveCMs_wearing': named(wearing, 'nRs', 'nDs'),
        'ActiveCMs_mobility': named(mobility, 'nRs', 'nDs')}
    covariates = {
        'ActiveCMs_NPIs': named(npis[:, :nDs_train], 'nRs', 'nDs'),
        'ActiveCMs_wearing': named(wearing[:, :nDs_train], 'nRs', 'nDs'),
        'ActiveCMs_mobility': named(mobility[:, :nDs_train], 'nRs', 'nDs')}

    P = get_P(all_platesizes, all_covariates)
    sample = P.sample(key=k4)
    fake_latents = {k_: v_ for k_, v_ in sample.items() if k_ != 'obs'}
    obs = sample['obs'].with_dims_front(('nRs', 'nDs'))
    all_data = {'obs': obs}
    data = {'obs': named(obs.data[:, :nDs_train], 'nRs', 'nDs')}
    ret = (platesizes, all_platesizes, data, all_data, covariates, all_covariates)
    if return_fake_latents:
        # reference parity: movielens.py:7-38 return_fake_latents
        ret = ret + (fake_latents,)
    return ret


def get_P(platesizes, covariates, corr_CM=False):
    cm_prior_scale = 1
    wearing_mean, wearing_sigma = 0, 0.4
    mobility_mean, mobility_sigma = 1.704, 0.44
    R_prior_mean_mean, R_prior_mean_scale = 1.07, 0.2
    R_noise_scale = 0.4

    Expected_Log_Rs = lambda RegionR, CM_alpha, ActiveCMs_NPIs, Wearing_alpha, \
        ActiveCMs_wearing, Mobility_alpha, ActiveCMs_mobility, prev: \
        RegionR + CM_alpha @ ActiveCMs_NPIs + Wearing_alpha * ActiveCMs_wearing \
        + Mobility_alpha * ActiveCMs_mobility + prev

    if corr_CM:
        # identical prior expressed as an MVN so the corr_Q proposal's
        # real_vector support matches (check_support)
        from alan_tpu import MultivariateNormal
        cm_alpha_P = MultivariateNormal(
            jnp.zeros(nCMs - 2),
            covariance_matrix=cm_prior_scale ** 2 * jnp.eye(nCMs - 2))
    else:
        cm_alpha_P = Normal(0, cm_prior_scale, sample_shape=[nCMs - 2])
    P = Plate(
        CM_alpha=cm_alpha_P,
        Wearing_alpha=Normal(wearing_mean, wearing_sigma),
        Mobility_alpha=Normal(mobility_mean, mobility_sigma),
        RegionR=Normal(R_prior_mean_mean, R_prior_mean_scale + R_noise_scale),
        InitialSize_log_mean=Normal(math.log(1000), 0.5),
        log_infected_noise_mean=Normal(math.log(0.01), 0.25),
        nRs=Plate(
            InitialSize_log=Normal(lambda InitialSize_log_mean: InitialSize_log_mean, 0.5),
            log_infected_noise=Normal(lambda log_infected_noise_mean: log_infected_noise_mean, 0.25),
            psi=Normal(0, 1),
            nDs=Plate(
                log_infected=Timeseries('InitialSize_log',
                                        Normal(Expected_Log_Rs,
                                               lambda log_infected_noise: log_infected_noise.exp())),
                obs=NegativeBinomial(
                    total_count=lambda psi: psi.exp(),
                    probs=lambda log_infected, psi:
                    1.0 / ((psi.exp() / log_infected.exp()) + 1 + 1e-7)),
            ),
        ),
    )
    return BoundPlate(P, platesizes, inputs=covariates)


def generate_problem(platesizes, data, covariates, Q_param_type="opt",
                     corr_Q=False):
    """``corr_Q=True`` (QEM only) replaces the factorised CM_alpha proposal
    with a full-covariance MultivariateNormal: the NPI regression
    coefficients are strongly correlated in the posterior (collinear
    activation covariates), and the round-5 K-sweep showed their MP-vs-NUTS
    discrepancy does NOT decay with K under a factorised Q — a structural
    proposal limitation, not finite-K bias (results/covid_k_sweep.json;
    reference covid Q variants: examples/models/covid/covid_only_*.py)."""
    P = get_P(platesizes, covariates, corr_CM=corr_Q)

    def loc_scale(shape=None, loc_init=0.0, scale_init=1.0):
        if Q_param_type == "opt":
            loc = jnp.full(shape, loc_init) if shape else loc_init
            ls = jnp.full(shape, math.log(scale_init)) if shape else math.log(scale_init)
            return (OptParam(loc), OptParam(ls, transformation=jnp.exp))
        loc = jnp.full(shape, loc_init) if shape else loc_init
        sc = jnp.full(shape, scale_init) if shape else scale_init
        return (QEMParam(loc), QEMParam(sc))

    if corr_Q:
        if Q_param_type != "qem":
            raise ValueError("corr_Q covid Q requires Q_param_type='qem'")
        from alan_tpu import MultivariateNormal
        cm_alpha_Q = MultivariateNormal(
            QEMParam(jnp.zeros(nCMs - 2)),
            covariance_matrix=QEMParam(jnp.eye(nCMs - 2)))
    else:
        cm_alpha_Q = Normal(*loc_scale((nCMs - 2,)))
    Q = Plate(
        npis=Group(
            CM_alpha=cm_alpha_Q,
            Wearing_alpha=Normal(*loc_scale()),
            Mobility_alpha=Normal(*loc_scale()),
            RegionR=Normal(*loc_scale(loc_init=1.0)),
            InitialSize_log_mean=Normal(*loc_scale(loc_init=math.log(1000))),
            log_infected_noise_mean=Normal(*loc_scale(loc_init=math.log(0.01))),
        ),
        nRs=Plate(
            a=Group(
                InitialSize_log=Normal(*loc_scale(loc_init=math.log(1000))),
                log_infected_noise=Normal(*loc_scale(loc_init=math.log(0.01))),
                psi=Normal(*loc_scale()),
            ),
            nDs=Plate(
                log_infected=Normal(*loc_scale(loc_init=math.log(1000))),
                obs=Data(),
            ),
        ),
    )
    Q = BoundPlate(Q, platesizes, inputs=covariates)
    return Problem(P, Q, data)


def load_and_generate_problem(key=None, Q_param_type="opt", run=0,
                              fake_data=True, data_dir="data/", return_fake_latents=False):
    out = load_data_covariates(key, run, fake_data, data_dir=data_dir,
                               return_fake_latents=return_fake_latents)
    platesizes, all_platesizes, data, all_data, covariates, all_covariates = out[:6]
    problem = generate_problem(platesizes, data, covariates, Q_param_type)
    result = (problem, all_data, all_covariates, all_platesizes)
    if return_fake_latents:
        result = result + (out[6],)
    return result
