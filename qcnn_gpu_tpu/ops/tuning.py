"""Tuned kernel configuration — sweep results feed the default build.

`scripts/sweep_kernel.py` measures (th, we, wc) configs of the fused
Pallas pipeline on real hardware and writes the exactness-certified
winner to `assets/tuned_kernel.json`; every production entry point
(bench.py, engine/runner.py) builds the kernel through `tuned_kwargs()`
so the shipping default IS the measured optimum. Override per-process
with env `QCNN_KERNEL_CONFIG=/path/to.json` or `QCNN_KERNEL_<KNOB>=n`.

Malformed config files or env values are never fatal: anything that
does not parse as an int knob is skipped (the builder's own defaults
apply) — a bad tuned file must not take down the engine.
"""

from __future__ import annotations

import json
import os
from typing import Dict

_KNOBS = ("th", "we", "wc", "kernel")

TUNED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets",
    "tuned_kernel.json",
)


def tuned_kwargs(use_file: bool = True) -> Dict[str, int]:
    """Kernel-build kwargs from (in priority order) QCNN_KERNEL_* env vars,
    the QCNN_KERNEL_CONFIG file, assets/tuned_kernel.json, else {} (the
    builder's own defaults). use_file=False skips the file tiers (used by
    the CPU interpret path, where the hardware-tuned tile is wrong)."""
    cfg: Dict[str, int] = {}
    if use_file:
        path = os.environ.get("QCNN_KERNEL_CONFIG", TUNED_PATH)
        if os.path.exists(path):
            try:
                with open(path) as fp:
                    data = json.load(fp)
            except (ValueError, OSError):
                data = None
            if isinstance(data, dict):
                for k in _KNOBS:
                    if k in data:
                        try:
                            cfg[k] = int(data[k])
                        except (ValueError, TypeError):
                            pass  # per-knob skip: one bad value must not
                            # drop the valid knobs with it
    for k in _KNOBS:
        v = os.environ.get(f"QCNN_KERNEL_{k.upper()}")
        if v:
            try:
                cfg[k] = int(v)
            except ValueError:
                pass
    return cfg


def build_tuned(p, interpret: bool = False, use_file: bool = True, **overrides):
    """Build the fused Pallas forward through the tuned config, selecting
    the kernel generation with the `kernel` knob (3 = width-packed
    pallas_pipeline3, the default; 2 = frame-pair pallas_pipeline2).
    Extra kwargs override the tuned/env knobs."""
    kw = tuned_kwargs(use_file=use_file)
    kw.update(overrides)
    kver = int(kw.pop("kernel", 3))
    if kver >= 3:
        from qcnn_gpu_tpu.ops.pallas_pipeline3 import build_pallas_forward3 as bld
    else:
        from qcnn_gpu_tpu.ops.pallas_pipeline2 import build_pallas_forward2 as bld
    run = bld(p, interpret=interpret, **kw)
    run.kernel_version = kver
    return run


def write_tuned(cfg: Dict[str, int], path: str = "") -> str:
    """Atomic write (temp + rename): an interrupted sweep must not leave a
    truncated file that tuned_kwargs() then silently ignores forever."""
    path = path or TUNED_PATH
    tmp = path + ".tmp"
    with open(tmp, "w") as fp:
        json.dump({k: int(cfg[k]) for k in _KNOBS if k in cfg}, fp, indent=1)
    os.replace(tmp, path)
    return path
