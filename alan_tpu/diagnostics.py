"""MCMC diagnostics: split-R̂ and bulk ESS for `run_hmc`/`run_nuts` outputs
(draw, chain, *shape) — the convergence checks the reference leaves to
PyMC/ArviZ."""
from __future__ import annotations

import numpy as np

from .dims import DT, as_dt


def _draws(x) -> np.ndarray:
    x = as_dt(x)
    if x.dims[:2] != ("draw", "chain"):
        x = x.with_dims_front(("draw", "chain"))
    return np.asarray(x.data)


def split_rhat(x) -> np.ndarray:
    """Gelman-Rubin split-R̂ per parameter component."""
    a = _draws(x)
    n, m = a.shape[0], a.shape[1]
    half = n // 2
    a = np.concatenate([a[:half], a[half:2 * half]], axis=1)  # (half, 2m, ...)
    n, m = a.shape[0], a.shape[1]
    chain_mean = a.mean(axis=0)
    chain_var = a.var(axis=0, ddof=1)
    W = chain_var.mean(axis=0)
    B = n * chain_mean.var(axis=0, ddof=1)
    var_plus = (n - 1) / n * W + B / n
    return np.sqrt(var_plus / np.maximum(W, 1e-12))


def ess_bulk(x, max_lag: int = 200) -> np.ndarray:
    """Effective sample size via initial-monotone autocorrelation sums
    (Geyer), averaged over chains."""
    a = _draws(x)
    n, m = a.shape[0], a.shape[1]
    a = a - a.mean(axis=0, keepdims=True)
    flat = a.reshape(n, m, -1)
    ess = np.empty(flat.shape[2])
    for j in range(flat.shape[2]):
        rhos = []
        var = (flat[:, :, j] ** 2).mean()
        if var < 1e-12:
            ess[j] = n * m
            continue
        for lag in range(1, min(max_lag, n - 1)):
            c = (flat[:-lag, :, j] * flat[lag:, :, j]).mean() / var
            rhos.append(c)
        # Geyer initial positive sequence on pair sums
        tau = 1.0
        for k in range(0, len(rhos) - 1, 2):
            pair = rhos[k] + rhos[k + 1]
            if pair < 0:
                break
            tau += 2 * pair
        ess[j] = n * m / tau
    return ess.reshape(a.shape[2:]) if a.ndim > 2 else ess.reshape(())


def summary(samples: dict) -> dict:
    """Per-variable {mean, sd, rhat_max, ess_min} table."""
    out = {}
    for name, x in samples.items():
        a = _draws(x)
        out[name] = {
            "mean": a.mean(axis=(0, 1)),
            "sd": a.std(axis=(0, 1)),
            "rhat_max": float(np.max(split_rhat(x))),
            "ess_min": float(np.min(ess_bulk(x))),
        }
    return out
