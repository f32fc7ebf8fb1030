"""Multi-host runtime glue.

The reference has no distributed backend at all (SURVEY §2.4/§5.8).  On TPU
pods, multi-host SPMD needs only: (1) ``jax.distributed.initialize`` on each
host, (2) a global mesh over ``jax.devices()`` (all hosts), (3) the same
jitted program everywhere — GSPMD handles cross-host collectives over
ICI/DCN exactly like the single-host case.

``initialize()`` wraps step (1); ``global_mesh`` builds (2) from the same
axis spec used by ``MeshPlan``.  Single-process multi-device keeps working
unchanged (initialize() is a no-op when no coordinator is configured).
"""
from __future__ import annotations

import os

import jax

from .mesh import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """Start the jax.distributed runtime when a coordinator is configured
    (either via args or the standard JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars); no-op otherwise."""
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    kwargs = {"coordinator_address": coordinator_address}
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    return True


def global_mesh(axis_sizes: dict[str, int]):
    """Mesh over all global devices (across hosts)."""
    return make_mesh(axis_sizes, devices=jax.devices())
