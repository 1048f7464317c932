"""Device-mesh construction for the restoration engine.

The reference is single-process single-GPU (SURVEY.md §2.4); scale-out here
is a new, TPU-first component:

  dp — data parallel over frames (embarrassingly parallel; zero steady-state
       collectives, like the reference's per-frame loop, kernel.cu:91-97)
  sp — spatial parallel over frame rows with halo exchange (the TPU
       generalization of the reference's divided_run tiling,
       model.py:235-255)

A (dp, sp) mesh rides ICI within a slice; multi-host processes join via
jax.distributed.initialize before constructing the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(
    n_devices: int, frames: Optional[int] = None, rows: Optional[int] = None
) -> Tuple[int, int]:
    """Pick a (dp, sp) factorization: prefer pure DP (no collectives) when
    there are enough frames to keep every device busy; otherwise give the
    remainder to spatial sharding."""
    if frames is None or frames >= n_devices:
        return (n_devices, 1)
    dp = max(1, frames)
    while n_devices % dp:
        dp -= 1
    sp = n_devices // dp
    if rows is not None:
        # each spatial shard should carry enough rows to dwarf its halo
        while sp > 1 and rows // sp < 64:
            sp //= 2
    return (dp, sp)


def make_mesh(
    dp: int, sp: int = 1, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp * sp > len(devices):
        raise ValueError(f"mesh {dp}x{sp} needs {dp*sp} devices, have {len(devices)}")
    arr = np.array(devices[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))
