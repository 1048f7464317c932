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
# string-valued knobs (kernel v5): s1 in {"a1t", "op6", ...} selects the
# S1 operand mode of pallas_pipeline3
_STR_KNOBS = ("s1",)

TUNED_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets",
    "tuned_kernel.json",
)


def _load_file() -> Dict:
    path = os.environ.get("QCNN_KERNEL_CONFIG", TUNED_PATH)
    if not os.path.exists(path):
        return {}
    try:
        with open(path) as fp:
            data = json.load(fp)
    except (ValueError, OSError):
        return {}
    return data if isinstance(data, dict) else {}


def _knobs_of(data: Dict) -> Dict[str, int]:
    cfg: Dict[str, int] = {}
    for k in _KNOBS:
        if k in data:
            try:
                cfg[k] = int(data[k])
            except (ValueError, TypeError):
                pass  # per-knob skip: one bad value must not drop the
                # valid knobs with it
    for k in _STR_KNOBS:
        if isinstance(data.get(k), str):
            cfg[k] = data[k]
    return cfg


def geometry_class(h: int, w: int, data: Dict = None) -> str:
    """The tuned file's per_geometry key serving (h, w): an exact "HxW"
    match, else the entry with the nearest pixel count (log distance —
    240p and 4K are classes, not points), else None."""
    import math

    data = _load_file() if data is None else data
    per = data.get("per_geometry")
    if not isinstance(per, dict) or not per:
        return None
    key = f"{h}x{w}"
    if key in per:
        return key

    def pixels(k):
        try:
            hh, ww = k.split("x")
            return int(hh) * int(ww)
        except ValueError:
            return None

    cands = [k for k in per if pixels(k)]
    if not cands:
        return None
    return min(cands, key=lambda k: abs(math.log(pixels(k) / (h * w))))


def tuned_kwargs(use_file: bool = True, h: int = None, w: int = None,
                 batch: int = None) -> Dict[str, int]:
    """Kernel-build kwargs from (in priority order) QCNN_KERNEL_* env vars,
    a per-geometry entry of the tuned file matching (h, w), the file's
    top-level knobs, else {} (the builder's own defaults). use_file=False
    skips the file tiers (used by the CPU interpret path, where the
    hardware-tuned tile is wrong). batch=1 additionally applies a
    per-geometry "batch1" override block when present — the single-frame
    LATENCY winner can differ from the throughput winner (measured at
    1080p: th=72 at batch 1 vs th=90 at batch 16)."""
    cfg: Dict[str, int] = {}
    if use_file:
        data = _load_file()
        cfg.update(_knobs_of(data))
        if h and w:
            cls = geometry_class(h, w, data)
            if cls is not None:
                entry = data["per_geometry"].get(cls, {})
                cfg.update(_knobs_of(entry))
                if batch == 1 and isinstance(entry.get("batch1"), dict):
                    cfg.update(_knobs_of(entry["batch1"]))
    for k in _KNOBS:
        v = os.environ.get(f"QCNN_KERNEL_{k.upper()}")
        if v:
            try:
                cfg[k] = int(v)
            except ValueError:
                pass
    for k in _STR_KNOBS:
        v = os.environ.get(f"QCNN_KERNEL_{k.upper()}")
        if v:
            cfg[k] = v
    return cfg


def build_tuned(p, interpret: bool = False, use_file: bool = True,
                h: int = None, w: int = None, batch: int = None, **overrides):
    """Build the fused Pallas forward through the tuned config, selecting
    the kernel generation with the `kernel` knob (3 = width-packed
    pallas_pipeline3, the default; 2 = frame-pair pallas_pipeline2).
    Pass (h, w) to pick a per-geometry entry of the tuned table (the
    built fn still accepts any frame shape — the geometry only selects
    the tile config it is fastest at). Extra kwargs override everything."""
    kw = tuned_kwargs(use_file=use_file, h=h, w=w, batch=batch)
    kw.update(overrides)
    kver = int(kw.pop("kernel", 3))
    if kver >= 3:
        from qcnn_gpu_tpu.ops.pallas_pipeline3 import build_pallas_forward3 as bld
    else:
        kw.pop("s1", None)  # v5 S1 modes exist only in pipeline3
        from qcnn_gpu_tpu.ops.pallas_pipeline2 import build_pallas_forward2 as bld
    run = bld(p, interpret=interpret, **kw)
    run.kernel_version = kver
    return run


def write_tuned(cfg: Dict[str, int], path: str = "", geometry: str = "") -> str:
    """Atomic write (temp + rename): an interrupted sweep must not leave a
    truncated file that tuned_kwargs() then silently ignores forever.

    With `geometry` ("HxW"), the knobs land under per_geometry[geometry]
    and existing top-level knobs / other geometries are preserved; without
    it the top-level knobs are replaced (per_geometry preserved)."""
    path = path or TUNED_PATH
    knobs = {k: int(cfg[k]) for k in _KNOBS if k in cfg}
    knobs.update({k: str(cfg[k]) for k in _STR_KNOBS if k in cfg})
    data = {}
    if os.path.exists(path):
        try:
            with open(path) as fp:
                old = json.load(fp)
            if isinstance(old, dict):
                data = old
        except (ValueError, OSError):
            pass
    if geometry:
        data.setdefault("per_geometry", {})[geometry] = knobs
    else:
        data = {**knobs, "per_geometry": data.get("per_geometry", {})}
        if not data["per_geometry"]:
            del data["per_geometry"]
    tmp = path + ".tmp"
    with open(tmp, "w") as fp:
        json.dump(data, fp, indent=1)
    os.replace(tmp, path)
    return path
