"""Kernel-level op tests: log-space matmul contraction, chain reduce, and
the Pallas kernel (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from alan_tpu.dims import DT, logsumexp_dims
from alan_tpu.ops.contraction import pairwise_logsumexp_contract
from alan_tpu.ops.logmmexp import logmmexp, chain_logmmexp
from alan_tpu.ops.pallas_logmmexp import logmmexp_pallas

rng = np.random.default_rng(0)


def test_pairwise_contract_matches_naive():
    cases = [
        (("K_x", "p"), (3, 4), ("K_x", "K_y", "p"), (3, 5, 4), ("K_x",)),
        (("K_x",), (3,), ("K_y",), (5,), ("K_x", "K_y")),
        (("K_x", "K_y"), (3, 5), ("K_y", "K_z"), (5, 7), ("K_y",)),
        (("p", "K_x"), (4, 3), ("K_x",), (3,), ("K_x",)),
        (("K_x", "p"), (3, 4), ("p",), (4,), ()),
        (("K_a", "K_b", "T"), (3, 3, 6), ("K_b", "T"), (3, 6), ("K_b",)),
        # adversarial scale separation (the old eps-floor failure mode)
        (("K_x",), (3,), ("K_x",), (3,), ("K_x",)),
    ]
    # scale 15 keeps row/col-max misalignment inside the f32 exp range (~87
    # nats) that the per-factor-shift matmul formulation supports; the
    # reference's own logmmexp (eps floor 1e-7) degrades ~5x earlier.
    for ad, ash, bd, bsh, Ks in cases:
        A = DT(jnp.asarray(rng.standard_normal(ash) * 15, jnp.float32), ad)
        B = DT(jnp.asarray(rng.standard_normal(bsh) * 15, jnp.float32), bd)
        naive = logsumexp_dims(A + B, Ks, ignore_extra_dims=True)
        mm = pairwise_logsumexp_contract(A, B, Ks).with_dims_front(naive.dims)
        assert np.allclose(np.asarray(naive.data), np.asarray(mm.data),
                           rtol=1e-5, atol=1e-4), (ad, bd, Ks)


def test_chain_logmmexp_matches_sequential():
    T, K = 7, 5
    ms = jnp.asarray(rng.standard_normal((2, T, K, K)), jnp.float32)
    tree = chain_logmmexp(ms)
    seq = ms[:, 0]
    for t in range(1, T):
        seq = logmmexp(seq, ms[:, t], allow_pallas=False)
    assert np.allclose(np.asarray(tree), np.asarray(seq), rtol=1e-4, atol=1e-4)


def test_pallas_logmmexp_interpret():
    A = jnp.asarray(rng.standard_normal((3, 128, 128)) * 3, jnp.float32)
    B = jnp.asarray(rng.standard_normal((3, 128, 128)) * 3, jnp.float32)
    r1 = logmmexp(A, B, allow_pallas=False)
    r2 = logmmexp_pallas(A, B, interpret=True)
    assert np.allclose(np.asarray(r1), np.asarray(r2), rtol=1e-5, atol=1e-5)
