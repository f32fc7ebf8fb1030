"""Worker process for the multi-host (multi-process) distributed test.

Each process owns 2 local CPU devices; ``jax.distributed.initialize`` joins
them into one 4-device cluster (the JAX-native fake-multi-host setup —
SURVEY.md §4's gap-fill: the reference has no multi-host story at all).
The worker runs one K+plate-sharded QEM step over the *global* mesh; GSPMD
places the cross-process collectives (Gloo over loopback here; ICI/DCN on a
real pod).  Results are written as JSON for the parent test to compare
against the single-process reference.

Usage: python tests/_distributed_worker.py <pid> <nproc> <port> <outfile>
"""
import json
import os
import sys


def tiny_problem():
    import jax.numpy as jnp
    import numpy as np
    from alan_tpu import Normal, Plate, BoundPlate, Problem, Data, QEMParam, named
    P = Plate(
        mu=Normal(0., 1.),
        plate_1=Plate(
            z=Normal('mu', 1.),
            plate_2=Plate(obs=Normal('z', 1.)),
        ),
    )
    Q = Plate(
        mu=Normal(QEMParam(0.), QEMParam(1.)),
        plate_1=Plate(
            z=Normal(QEMParam(0.), QEMParam(1.)),
            plate_2=Plate(obs=Data()),
        ),
    )
    ps = {'plate_1': 16, 'plate_2': 4}
    Pb, Qb = BoundPlate(P, ps), BoundPlate(Q, ps)
    rng = np.random.default_rng(0)
    data = {'obs': named(jnp.asarray(rng.standard_normal((16, 4)), jnp.float32),
                         'plate_1', 'plate_2')}
    return Problem(Pb, Qb, data)


def ts_problem():
    """Covid-shaped: regions x T plate with a latent AR(1) timeseries."""
    import jax.numpy as jnp
    import numpy as np
    from alan_tpu import (Normal, Timeseries, Plate, BoundPlate, Problem,
                          Data, QEMParam, named)
    P = Plate(
        mu=Normal(0., 1.),
        regions=Plate(
            init=Normal('mu', 1.),
            T=Plate(
                ts=Timeseries('init', Normal(lambda prev: 0.9 * prev, 0.3)),
                obs=Normal('ts', 1.),
            ),
        ),
    )
    Q = Plate(
        mu=Normal(QEMParam(0.), QEMParam(1.)),
        regions=Plate(
            init=Normal(QEMParam(0.), QEMParam(1.)),
            T=Plate(ts=Normal(QEMParam(0.), QEMParam(1.)), obs=Data()),
        ),
    )
    ps = {'regions': 2, 'T': 8}
    rng = np.random.default_rng(3)
    data = {'obs': named(jnp.asarray(rng.standard_normal((2, 8)), jnp.float32),
                         'regions', 'T')}
    return Problem(BoundPlate(P, ps), BoundPlate(Q, ps), data)


def main(pid, nproc, port, outfile):
    # 2 local CPU devices per process; must be set before jax imports
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")

    from alan_tpu.parallel import distributed
    distributed.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert len(jax.devices()) == 2 * nproc, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from alan_tpu import train
    from alan_tpu.parallel.mesh import MeshPlan

    problem = tiny_problem()
    K = 8

    mesh = distributed.global_mesh({"k": 2, "p": 2})
    plan = MeshPlan(mesh, {"plate_1": "p"}).with_all_K("k")
    step, state0 = train.qem(problem, K, lr=0.1, mesh_plan=plan)

    # host-replicated inputs: every process feeds identical numpy leaves, so
    # jit commits them as fully-replicated global arrays
    state0 = jax.tree.map(np.asarray, state0)
    with mesh:
        (sP, sQ), elbo = step(state0, jax.random.key(0))
        # scalar jit outputs are replicated -> fetchable on every process;
        # summarise (possibly sharded) param arrays through scalar reductions
        summaries = {}
        for k, v in sQ["qem_params"].items():
            m, s2 = jax.jit(lambda a: (jnp.mean(a), jnp.sum(a * a)))(v.data)
            summaries[k] = [float(m), float(s2)]

    # T-sharded timeseries training across the process boundary: the chain
    # contraction's boundary-operator exchange (all_gather of K x K blocks)
    # crosses hosts
    prob_ts = ts_problem()
    mesh_t = distributed.global_mesh({"t": 2 * nproc})
    plan_t = MeshPlan(mesh_t, {"T": "t"})
    step_t, state_t0 = train.qem(prob_ts, 4, lr=0.1, mesh_plan=plan_t)
    state_t0 = jax.tree.map(np.asarray, state_t0)
    with mesh_t:
        _, elbo_t = step_t(state_t0, jax.random.key(1))

    with open(outfile, "w") as f:
        json.dump({"pid": pid, "n_global_devices": len(jax.devices()),
                   "elbo": float(elbo), "qem_params": summaries,
                   "ts_elbo": float(elbo_t)}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
