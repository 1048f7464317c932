"""Tuned kernel configuration — sweep results feed the default build.

`scripts/sweep_kernel.py` measures (th, we, wc) configs of the fused
Pallas pipeline on real hardware and writes the exactness-certified
winner to `assets/tuned_kernel.json`; every production entry point
(bench.py, engine/runner.py) builds the kernel through `tuned_kwargs()`
so the shipping default IS the measured optimum. Override per-process
with env `QCNN_KERNEL_CONFIG=/path/to.json` or `QCNN_KERNEL_<KNOB>=n`.
"""

from __future__ import annotations

import json
import os
from typing import Dict

_KNOBS = ("th", "we", "wc")

TUNED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets",
    "tuned_kernel.json",
)


def tuned_kwargs() -> Dict[str, int]:
    """Kernel-build kwargs from (in priority order) QCNN_KERNEL_* env vars,
    the QCNN_KERNEL_CONFIG file, assets/tuned_kernel.json, else {} (the
    builder's own defaults)."""
    cfg: Dict[str, int] = {}
    path = os.environ.get("QCNN_KERNEL_CONFIG", TUNED_PATH)
    if os.path.exists(path):
        try:
            data = json.load(open(path))
            cfg.update({k: int(data[k]) for k in _KNOBS if k in data})
        except (ValueError, KeyError, OSError):
            pass
    for k in _KNOBS:
        v = os.environ.get(f"QCNN_KERNEL_{k.upper()}")
        if v:
            cfg[k] = int(v)
    return cfg


def write_tuned(cfg: Dict[str, int], path: str = "") -> str:
    path = path or TUNED_PATH
    with open(path, "w") as fp:
        json.dump({k: int(cfg[k]) for k in _KNOBS if k in cfg}, fp, indent=1)
    return path
