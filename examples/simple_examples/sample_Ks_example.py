"""Direct use of the contraction engine's posterior index sampler
(parity: reference ``examples/simple_examples/sample_Ks_example.py``)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

from alan_tpu.dims import DT
from alan_tpu.reduce_ks import reduce_Ks, sample_Ks
from alan_tpu.utils import KeyGen

key = jax.random.key(0)
ks = jax.random.split(key, 6)

# three log-factors over a K tensor network with one plate
lps = [
    DT(jax.random.normal(ks[0], (2, 3, 4, 5)), ("K", "parent_1_K", "parent_2_K", "plate_1")),
    DT(jax.random.normal(ks[1], (2, 3, 5)), ("K", "parent_1_K", "plate_1")),
    DT(jax.random.normal(ks[2], (2, 4, 5)), ("K", "parent_2_K", "plate_1")),
]

print("reduced:", reduce_Ks(lps, ["K", "parent_1_K", "parent_2_K"]))

idx = sample_Ks(lps, ["K", "parent_1_K", "parent_2_K"], "N", 10, KeyGen(ks[3]))
for k, v in idx.items():
    print(k, v, jnp.asarray(v.data)[:3] if v.data.ndim == 1 else v.data.shape)

# two plates
lps = [
    DT(jax.random.normal(ks[4], (2, 3, 4, 5, 6)),
       ("K", "parent_1_K", "parent_2_K", "plate_1", "plate_2")),
    DT(jax.random.normal(ks[5], (2, 3, 5, 6)), ("K", "parent_1_K", "plate_1", "plate_2")),
]
idx = sample_Ks(lps, ["K", "parent_1_K"], "N", 10, KeyGen(ks[3]))
for k, v in idx.items():
    print(k, v)
