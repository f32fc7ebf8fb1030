"""Declarative experiment-grid schemas (parity: reference hydra configs
``examples/config/conf.yaml`` consumed by ``examples/runner.py:18``).

A grid spec is a YAML or JSON file:

.. code-block:: yaml

    defaults:                 # applied to every job (any runner flag)
      iters: 250
      predll_N: 100
    jobs:
      - model: movielens
        methods: [qem, vi, rws]       # axis
        Ks_lrs: {30: [0.1, 0.01]}     # axis: K -> lrs (reference Ks_lrs)
        seeds: [0, 1]                 # axis
        split: {plate: plate_1, size: 150}
        mesh: "k=2,p=4"               # multi-chip passthrough flags
        shard: "plate_1=p"
        shard_all_k: k
        devices: 8
        out_dir: results

Axes (``methods`` × ``Ks_lrs`` × ``seeds``) expand to one runner invocation
each; scalar fields pass through as runner flags.  Consumers:

* ``python examples/gridspec.py spec.yaml -o cmds.txt`` emits one command
  line per job for the native parallel executor
  (``alan_tpu/_native/alan-grid``, csrc/gridrunner.cpp) — or prints them.
* ``python examples/runner.py --grid spec.yaml`` runs the expanded jobs
  sequentially in-process.
"""
from __future__ import annotations

import json
import os
import shlex
import sys

_AXES = ("methods", "Ks_lrs", "seeds")
_KNOWN = {"model", "method", "K", "lr", "iters", "runs", "seed", "predll_N",
          "predll_every", "Q_param_type", "split", "mesh", "shard",
          "shard_all_k", "devices", "platform", "data_dir", "fuse_iters",
          "out", "out_dir"} | set(_AXES)


def load_spec(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    if path.endswith(".json"):
        spec = json.loads(text)
    else:
        import yaml
        spec = yaml.safe_load(text)
    if not isinstance(spec, dict) or "jobs" not in spec:
        raise ValueError(f"{path}: grid spec must be a mapping with a "
                         f"'jobs' list")
    for job in spec["jobs"]:
        unknown = set(job) - _KNOWN
        if unknown:
            raise ValueError(f"{path}: unknown job fields {sorted(unknown)}")
        if "model" not in job:
            raise ValueError(f"{path}: every job needs a 'model'")
    unknown = set(spec.get("defaults", {})) - _KNOWN
    if unknown:
        raise ValueError(f"{path}: unknown default fields {sorted(unknown)}")
    return spec


def _flag(name: str) -> str:
    return "--" + name.replace("_", "-")


def expand(spec: dict) -> list[list[str]]:
    """Expand a spec into runner argv lists (without the leading
    ``python examples/runner.py``)."""
    defaults = spec.get("defaults", {})
    out = []
    for job in spec["jobs"]:
        cfg = {**defaults, **job}
        # an axis form shadows its scalar counterpart: a scalar left in cfg
        # would be re-emitted in the passthrough loop below, and argparse
        # last-wins would silently override every axis value
        methods = cfg.pop("methods", None)
        if methods is not None:
            cfg.pop("method", None)
        else:
            methods = [cfg.pop("method", "qem")]
        ks_lrs = cfg.pop("Ks_lrs", None)
        if ks_lrs is not None:
            cfg.pop("K", None)
            cfg.pop("lr", None)
        else:
            ks_lrs = {cfg.pop("K", 30): [cfg.pop("lr", None)]}
        seeds = cfg.pop("seeds", None)
        if seeds is not None:
            cfg.pop("seed", None)
        else:
            seeds = [cfg.pop("seed", 0)]
        out_dir = cfg.pop("out_dir", None)
        explicit_out = cfg.pop("out", None)

        for method in methods:
            for K, lrs in ks_lrs.items():
                for lr in (lrs if isinstance(lrs, (list, tuple)) else [lrs]):
                    for seed in seeds:
                        argv = ["--model", str(cfg["model"]),
                                "--method", str(method),
                                "--K", str(K), "--seed", str(seed)]
                        if lr is not None:
                            argv += ["--lr", str(lr)]
                        for k, v in cfg.items():
                            if k == "model" or v is None:
                                continue
                            if k == "split":
                                argv += ["--split", str(v["plate"]),
                                         str(v["size"])]
                            elif k == "fuse_iters":
                                if v:
                                    argv += ["--fuse-iters"]
                            else:
                                argv += [_flag(k), str(v)]
                        if explicit_out is not None:
                            argv += ["--out", explicit_out]
                        elif out_dir is not None:
                            name = f"{cfg['model']}_{method}_K{K}"
                            if lr is not None:
                                name += f"_lr{lr}"
                            if len(seeds) > 1:
                                name += f"_s{seed}"
                            argv += ["--out",
                                     os.path.join(out_dir, name + ".json")]
                        out.append(argv)
    return out


def command_lines(spec: dict, runner: str = "examples/runner.py",
                  python: str = "python") -> list[str]:
    """One shell command per expanded job (alan-grid input format)."""
    return [" ".join([python, runner] + [shlex.quote(a) for a in argv])
            for argv in expand(spec)]


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("spec", help="YAML or JSON grid spec")
    ap.add_argument("-o", "--out", default=None,
                    help="write command lines here (default: stdout)")
    args = ap.parse_args(argv)
    lines = command_lines(load_spec(args.spec))
    text = "\n".join(lines) + "\n"
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text)
        print(f"{len(lines)} jobs -> {args.out}", file=sys.stderr)
    else:
        sys.stdout.write(text)


if __name__ == "__main__":
    main()
