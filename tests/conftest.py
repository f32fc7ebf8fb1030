import os

# Tests run on CPU with a virtual 8-device mesh so multi-chip sharding paths
# are exercised without TPU hardware (SURVEY.md §4 gap-fill).
os.environ["JAX_PLATFORMS"] = os.environ.get("ALAN_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

# The axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS; pin the platform via the config API so tests really run on
# the virtual 8-device CPU mesh.
import jax
jax.config.update("jax_platforms", os.environ.get("ALAN_TPU_TEST_PLATFORM", "cpu"))
