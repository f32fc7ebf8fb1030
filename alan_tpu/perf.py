"""FLOP accounting and MFU (model FLOP utilisation) reporting.

The reference publishes no utilisation numbers at all (BASELINE.md); here
every benchmark grounds its step time in XLA's own cost model: we lower the
*exact* compiled program and read ``compiled.cost_analysis()`` — the FLOP
count the compiler assigns to the HLO it actually emitted — and divide by
wall-clock and the chip's published dense peak.

Peak table: public per-chip dense bf16 peaks (TPU system specs; JAX's
default f32 matmul precision on TPU executes bf16 MXU passes, so bf16 peak
is the honest denominator).
"""
from __future__ import annotations

import jax

# device_kind substring -> per-chip dense bf16 peak FLOP/s
_PEAKS = [
    ("v6", 918e12),        # Trillium / v6e
    ("v5p", 459e12),
    ("v5 lite", 197e12),   # v5e reports device_kind "TPU v5 lite"
    ("v5e", 197e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 46e12),
]


def peak_flops(device=None) -> float | None:
    """Published dense bf16 peak FLOP/s for the device, or None if unknown
    (e.g. CPU)."""
    device = device if device is not None else jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    if "tpu" not in kind and device.platform != "tpu":
        return None
    for sub, peak in _PEAKS:
        if sub in kind:
            return peak
    return None


def xla_cost(fn, *args):
    """FLOPs / bytes accessed of the compiled program for ``fn(*args)``,
    from XLA's cost analysis of the exact HLO executed.  ``fn`` may already
    be jitted.  Returns {} when the backend doesn't support cost analysis
    (some PJRT plugins).

    Two known undercounts (both make reported MFU a LOWER bound):
    while/scan bodies are counted once, not x trip count (callers should
    lower the single-step program), and custom calls — including Pallas
    kernels — are counted as zero FLOPs."""
    try:
        lowered = fn.lower(*args) if hasattr(fn, "lower") \
            else jax.jit(fn).lower(*args)
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        if ca is None:
            return {}
        out = {}
        if "flops" in ca:
            out["flops"] = float(ca["flops"])
        for k in ("bytes accessed", "bytes_accessed"):
            if k in ca:
                out["bytes_accessed"] = float(ca[k])
                break
        return out
    except Exception:
        return {}


def mfu_report(fn, args, step_time_s: float, steps_per_call: int = 1,
               device=None) -> dict:
    """MFU summary for a timed program: FLOPs per step (XLA cost model),
    achieved FLOP/s, and the fraction of the chip's dense bf16 peak.

    ``steps_per_call``: when ``fn`` fuses N training steps (lax.scan), the
    cost analysis covers all N — divide through to get per-step numbers.
    """
    cost = xla_cost(fn, *args)
    out = {"step_s": step_time_s}
    device = device if device is not None else jax.devices()[0]
    out["device_kind"] = getattr(device, "device_kind", device.platform)
    if "flops" not in cost:
        out["mfu"] = None
        return out
    flops_step = cost["flops"] / steps_per_call
    out["flops_per_step"] = flops_step
    out["achieved_flops_per_s"] = flops_step / step_time_s
    if "bytes_accessed" in cost:
        out["bytes_per_step"] = cost["bytes_accessed"] / steps_per_call
        # arithmetic intensity — below the chip's ridge point the workload
        # is HBM-bound and MFU is capped by bandwidth, not the MXU
        out["arithmetic_intensity"] = (cost["flops"]
                                       / max(cost["bytes_accessed"], 1.0))
    peak = peak_flops(device)
    if peak:
        out["peak_flops_per_s"] = peak
        out["mfu"] = flops_step / step_time_s / peak
    else:
        out["mfu"] = None
    return out
