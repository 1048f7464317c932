"""MFU / roofline accounting for the QVRCNN pipeline.

The reference's whole INT8x4/cuDNN configuration exists to feed the GPU's
tensor units (mat.cuh:39-101); the TPU build must tell the same story
quantitatively: how much of the chip's peak the kernel sustains, and where
the issued-vs-useful MAC gap sits stage by stage.

Two ceilings matter and both are reported:

* the CHIP peak (marketing TOPS for the detected generation) — the
  absolute roofline;
* the PASS-MODEL ceiling — what the kernel's own MXU pass structure can
  reach at the measured per-pass rate. The fused kernel decomposes convs
  into [M, K<=128] @ [K, N<=128] passes whose cost is ~M rows regardless
  of K/N utilization (measured: scripts/mfu_probe.py), so utilization is
  fixed by the tap structure, not by tuning.

Useful MACs per pixel (the network as defined, SURVEY.md §0 topology —
NOT the merged/padded matrices the kernel issues):
    C1 5x5x1x64=1600, C2_1 3x3x64x32=18432, C2_2 5x5x64x16=25600,
    C3_1 3x3x48x16=6912, C3_2 1x1x48x32=1536, C4 3x3x48x1=432
"""

from __future__ import annotations

from typing import Dict

USEFUL_MACS_PER_PX = 1600 + 18432 + 25600 + 6912 + 1536 + 432  # = 54512

# Per-pixel MXU capacity units issued by the width-packed kernel (v3),
# in px-units: 1 unit = one [px/2-row, 128, 128] pass per 2 pixels.
# passes x rows(px/2) x (128x128 grid) -> capacity = passes/2 * 16384 MAC/px.
PASS_MODEL_V3 = {  # stage -> (passes, K_used, N_used, useful MACs/px)
    "S1": (1, 32, 128, 1600),
    "S2": (15, 128, 96, 18432 + 25600),
    "S3": (6, 96, 96, 6912 + 1536),
    "S4": (6, 96, 2, 432),
}

# Chip peaks (dense, per chip): (int8 TOPS, bf16 TFLOPs). Sources: public
# TPU spec tables. Keys matched as substrings of device_kind.lower().
_PEAKS = {
    "v6": (1836.0, 918.0),  # Trillium
    "v5p": (918.0, 459.0),
    "v5e": (394.0, 197.0),
    "v5 lite": (394.0, 197.0),
    "v4": (275.0, 275.0),  # v4 has no 2x int8 path
    "cpu": (None, None),
}


def chip_peaks(device_kind: str):
    """(int8_tops, bf16_tflops) for the detected chip, or (None, None)."""
    kind = (device_kind or "").lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return peaks
    return (None, None)


def pass_model_summary(model: Dict = None) -> Dict:
    """Issued-vs-useful MAC accounting per stage + the structural ceiling."""
    model = model or PASS_MODEL_V3
    stages = {}
    total_units = 0.0
    total_useful = 0
    for name, (passes, k, n, useful) in model.items():
        units = passes / 2.0  # px-units (each pass covers 2 px/row)
        issued_capacity = units * 16384  # 128x128 MAC grid per pass-row
        stages[name] = {
            "passes": passes,
            "px_units": units,
            "K_used": k,
            "N_used": n,
            "issued_capacity_macs_per_px": int(issued_capacity),
            "useful_macs_per_px": useful,
            "useful_frac": round(useful / issued_capacity, 4),
        }
        total_units += units
        total_useful += useful
    return {
        "stages": stages,
        "total_px_units": total_units,
        "useful_macs_per_px": total_useful,
        # the fraction of issued MXU capacity doing useful MACs — the
        # kernel's structural MFU ceiling at 100% MXU occupancy
        "structural_mfu_ceiling": round(total_useful / (total_units * 16384), 4),
    }


def mfu_report(px_per_frame: int, ms_per_frame: float, device_kind: str,
               model: Dict = None) -> Dict:
    """The BENCH detail block: sustained OPS vs chip peak + pass model."""
    macs_per_s = USEFUL_MACS_PER_PX * px_per_frame / (ms_per_frame * 1e-3)
    tops = 2 * macs_per_s / 1e12
    int8_peak, bf16_peak = chip_peaks(device_kind)
    pm = pass_model_summary(model)
    out = {
        "device_kind": device_kind,
        "useful_macs_per_px": USEFUL_MACS_PER_PX,
        "sustained_useful_tops": round(tops, 2),
        "peak_tops_int8": int8_peak,
        "peak_tops_bf16": bf16_peak,
        "mfu_vs_int8_peak": round(tops / int8_peak, 4) if int8_peak else None,
        "mfu_vs_bf16_peak": round(tops / bf16_peak, 4) if bf16_peak else None,
        "pass_model": pm,
    }
    # Pass-rate occupancy: rows/px issued by the pass structure (each pass
    # covers a packed row per 2 px) against the wall clock — ~7.4 rows per
    # 940MHz-cycle measured at 1080p means the kernel runs at ~93% of the
    # ~8-rows/cycle MXU pass rate: it is pass-structure-bound, and raising
    # MFU requires restructuring passes, not tuning. (Halo overhead per
    # tile, ~10% at th=64/we=256, is excluded here — the number reported
    # is the useful-output pass rate, the conservative side.)
    rows_per_px = sum(s[0] for s in (model or PASS_MODEL_V3).values()) / 2.0
    rows_per_s = rows_per_px * px_per_frame / (ms_per_frame * 1e-3)
    out["mxu_pass_rows_per_cycle_at_940mhz"] = round(rows_per_s / 0.94e9, 2)
    return out
