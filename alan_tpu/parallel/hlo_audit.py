"""HLO collective audit + comm-vs-compute scaling model.

Multi-chip hardware is not reachable from this environment, so multi-chip
evidence is extracted from the *compiled program* instead: after GSPMD
partitioning, the HLO text names every collective XLA inserted.  The audit
verifies the expected collectives exist (and only those — e.g. a
data-parallel plate sharding must produce all-reduces, a T-sharded
timeseries chain must produce all-gathers or collective-permutes), counts
the bytes each moves, and feeds a first-order comm-vs-compute model that
predicts scaling efficiency at pod sizes.

The reference framework is single-device (SURVEY.md §2.4) — there is no
reference counterpart; the ≥80% scaling target comes from BASELINE.md.
"""
from __future__ import annotations

import re

__all__ = ["collective_inventory", "audit_compiled", "predict_scaling",
           "scaling_report"]

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

# `%name = <shape> <collective-op>(...)`; shape may be a tuple.  TPU emits
# async pairs (`all-reduce-start` / `-done`); count only the `-start` (or
# the sync form) so each transfer is counted once.
_COLL_RE = re.compile(
    r"=\s*((?:\([^)]*\))|(?:[a-z0-9]+\[[^\]]*\](?:\{[^}]*\})?))\s+"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(-start)?\(")


def _shape_tokens(shape_str: str) -> list[int]:
    out = []
    for m in re.finditer(r"([a-z0-9]+)\[([\d,]*)\]", shape_str):
        dt, dims = m.groups()
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append(n * _DTYPE_BYTES[dt])
    return out


def _shape_bytes(shape_str: str, start: bool = False) -> int:
    """Bytes a collective's RESULT carries.  Async ``*-start`` ops have a
    tuple shape ``(operand(s), result(s)[, u32 contexts])`` — summing every
    member double-counts the transfer; keep only the result half.

    Heuristic, with two known failure modes (ADVICE r4): the ``t > 4``
    context filter also drops genuine <=4-byte members (a scalar f32
    all-reduce falls through to summing the whole tuple, double-counting
    ~8 bytes — negligible against the MB-scale payloads the audit cares
    about), and the equal-halves split assumes operand/result token counts
    match — an asymmetric start tuple degrades to dropping the first
    member.  Both err small and only on near-empty transfers; byte totals
    for the payloads that drive the scaling model are exact."""
    tokens = _shape_tokens(shape_str)
    if start and len(tokens) >= 2:
        body = [t for t in tokens if t > 4]      # drop scalar u32 contexts
        if len(body) % 2 == 0 and len(body) >= 2:
            tokens = body[len(body) // 2:]       # (operands..., results...)
        elif body:
            tokens = body[1:]                    # fallback: drop operand
    return sum(tokens)


def collective_inventory(hlo_text: str) -> dict:
    """Count collectives and the bytes each kind's results carry in a
    post-SPMD HLO module text (``compiled.as_text()``)."""
    inv: dict[str, dict] = {}
    for m in _COLL_RE.finditer(hlo_text):
        shape, kind, start = m.groups()
        e = inv.setdefault(kind, {"count": 0, "bytes": 0})
        e["count"] += 1
        e["bytes"] += _shape_bytes(shape, start=bool(start))
    return inv


def audit_compiled(compiled, expect=(), forbid=()) -> dict:
    """Inventory a compiled (jit-lowered) executable's collectives.

    ``expect``: kinds that MUST appear (e.g. ``("all-reduce",)`` for a
    data-parallel plan).  ``forbid``: kinds that must NOT.  Raises
    AssertionError otherwise.  Returns the inventory dict.
    """
    inv = collective_inventory(compiled.as_text())
    for kind in expect:
        assert kind in inv, (
            f"expected collective '{kind}' absent from compiled HLO; "
            f"present: {sorted(inv)}")
    for kind in forbid:
        assert kind not in inv, (
            f"forbidden collective '{kind}' present in compiled HLO: {inv[kind]}")
    return inv


# Per-collective wire-traffic factor for a ring implementation on an N-chip
# slice: all-reduce moves ~2·(N−1)/N of its payload per chip
# (reduce-scatter + all-gather phases), all-gather/reduce-scatter (N−1)/N,
# collective-permute exactly its payload.
_WIRE_FACTOR = {
    "all-reduce": lambda n: 2.0 * (n - 1) / n,
    "all-gather": lambda n: (n - 1) / n,
    "reduce-scatter": lambda n: (n - 1) / n,
    "collective-permute": lambda n: 1.0,
    "all-to-all": lambda n: (n - 1) / n,
}


def predict_scaling(flops_per_step: float, inventory: dict, n_chips: int,
                    peak_flops: float = 1.97e14,
                    achieved_frac: float = 0.04,
                    ici_bytes_per_s: float = 1.8e11,
                    step_time_s: float | None = None,
                    mode: str = "strong",
                    audited_chips: int | None = None) -> dict:
    """First-order comm-vs-compute efficiency at ``n_chips``.

    Compute time: ``step_time_s`` (the MEASURED single-chip step, preferred)
    or FLOPs / (peak·achieved_frac).  ``mode``:

    * ``"strong"`` — fixed problem, compute splits ``/ n_chips``; collective
      payloads held at their audited sizes (replicated-parameter reductions
      and already-materialized gathers don't shrink with the slice).
    * ``"weak"`` — per-chip work held constant (K / data plates grow with the
      slice — the BASELINE.md samples/s-per-chip regime): compute time
      constant; all-gather / reduce-scatter / all-to-all payloads scale
      ``n_chips / audited_chips`` (their results cover the total sharded
      work), all-reduce payloads stay parameter-sized, and
      collective-permute bytes scale ``log2(n)/log2(audited)`` — the
      butterfly T-exchange (parallel/seq.py, the only ppermute emitter)
      does log2(n) rounds of fixed-size K x K boundary operators per chip,
      so its per-chip traffic grows logarithmically, not linearly.

    t_comm = Σ wire-factor(kind)·bytes / ICI bandwidth.  Efficiency =
    t_comp / (t_comp + t_comm) vs a perfectly-linear step.

    Defaults are TPU v5e: 197 bf16 TFLOP/s peak; ICI ~45 GB/s per link ×4
    links.
    """
    t1 = (step_time_s if step_time_s is not None
          else flops_per_step / (peak_flops * achieved_frac))
    t_comp = t1 / n_chips if mode == "strong" else t1
    t_comm = 0.0
    for kind, e in inventory.items():
        factor = _WIRE_FACTOR.get(kind, lambda n: 1.0)(n_chips)
        b = e["bytes"]
        if mode == "weak" and kind != "all-reduce" and audited_chips:
            if kind == "collective-permute" and audited_chips > 1:
                import math
                b *= math.log2(n_chips) / math.log2(audited_chips)
            else:
                b *= n_chips / audited_chips
        t_comm += factor * b / ici_bytes_per_s
    eff = t_comp / (t_comp + t_comm) if (t_comp + t_comm) > 0 else 1.0
    return {"n_chips": n_chips, "t_comp_s": t_comp, "t_comm_s": t_comm,
            "efficiency": eff, "mode": mode}


def scaling_report(flops_per_step: float, inventory: dict,
                   chip_counts=(8, 16, 64), **kw) -> dict:
    return {str(n): predict_scaling(flops_per_step, inventory, n, **kw)
            for n in chip_counts}
