"""Sharded-compile collective audit over ALL six canonical models
(VERDICT r5 #7): the GSPMD merge-gather bug class produced three instances
in round 4 on just two audited models; this compiles every canonical model's
fused QEM step on the virtual 8-device mesh and records the full collective
inventory, so the regression net (tests/test_sharding.py) covers each one.

Writes results/sharded_audit_all_models.json and merges per-model rows into
MULTICHIP_DETAIL.json under "all_models_audit".
"""
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "examples", "models"))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# (model, K, mesh axes, plate->axis): the sharded plate must divide its
# mesh axis; bus_breakdown/chimpanzees/radon have small or odd plates, so
# they ride a {k:2, p:2} or {k:2, p:4} mesh accordingly.
PLANS = {
    "movielens": (30, {"k": 2, "p": 4}, {"plate_1": "p"}),
    "bus_breakdown": (30, {"k": 2, "p": 2}, {"plate_ID": "p"}),
    "chimpanzees": (30, {"k": 2, "p": 2}, {"plate_blocks": "p"}),
    "occupancy": (30, {"k": 2, "p": 4}, {"plate_Ids": "p"}),
    "radon": (30, {"k": 2, "p": 4}, {"States": "p"}),
    "covid": (30, {"k": 2, "p": 4}, {"nRs": "p"}),
}


def main():
    from alan_tpu import train
    from alan_tpu.parallel.mesh import make_mesh, MeshPlan
    from alan_tpu.parallel.hlo_audit import collective_inventory

    out = {}
    for name, (K, axes, shards) in PLANS.items():
        mod = __import__(name)
        problem, *_ = mod.load_and_generate_problem(
            key=jax.random.key(0), Q_param_type="qem")
        mesh = make_mesh(axes)
        plan = MeshPlan(mesh, shards).with_all_K("k")
        step, state = train.qem(problem, K, lr=0.1, mesh_plan=plan)
        with mesh:
            compiled = step.lower(state, jax.random.key(4)).compile()
        inv = collective_inventory(compiled.as_text())
        out[name] = {"K": K, "mesh": axes, "shards": shards,
                     "collectives": inv}
        print(name, json.dumps(inv), flush=True)

    path = os.path.join(ROOT, "results", "sharded_audit_all_models.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    det_path = os.path.join(ROOT, "MULTICHIP_DETAIL.json")
    if os.path.exists(det_path):
        det = json.load(open(det_path))
        det["all_models_audit"] = out
        json.dump(det, open(det_path, "w"), indent=1)
    print("->", path)


if __name__ == "__main__":
    main()
