"""QVRCNN network topology — the single model family this framework serves.

The 4-stage variable-filter-size CNN predicting a residual over the decoded
Y plane. Defined identically on both sides of the reference:
TF weight shapes `training/model.py:34-49`, CUDA layer builds
`inference/qvrcnn.cu:10-18`. All convs are stride-1 SAME cross-correlations.

Layer order everywhere in this framework (files, tables, pytrees) is:
    C1, C2_1, C2_2, C3_1, C3_2, C4
matching the reference's model-file layout (`inference/qvrcnn.cu:433-438`).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class LayerDef:
    name: str
    ksize: int
    in_ch: int
    out_ch: int
    blu: bool  # bounded-linear-unit activation (clip 0..blu); False => linear
    input: str  # name of the producing node: "input" | layer | concat name


# qvrcnn.cu:11-18 / model.py:94-110
QVRCNN_LAYERS: Tuple[LayerDef, ...] = (
    LayerDef("C1", 5, 1, 64, True, "input"),
    LayerDef("C2_1", 3, 64, 32, True, "C1"),
    LayerDef("C2_2", 5, 64, 16, True, "C1"),
    LayerDef("C3_1", 3, 48, 16, True, "Conc1"),
    LayerDef("C3_2", 1, 48, 32, True, "Conc1"),
    LayerDef("C4", 3, 48, 1, False, "Conc2"),
)

# concat nodes: (name, (branch_a, branch_b)) — channel concat, a first.
# qvrcnn.cu:14,17; model.py:102,107
QVRCNN_CONCATS = (
    ("Conc1", ("C2_1", "C2_2")),
    ("Conc2", ("C3_1", "C3_2")),
)

LAYER_NAMES = tuple(l.name for l in QVRCNN_LAYERS)
N_LAYERS = len(QVRCNN_LAYERS)

# Total spatial receptive-field radius of the network: 2 (5x5) + 2 (5x5 via
# C2_2, the widest branch) + 1 (3x3) + 1 (3x3) = 6 pixels. The reference's
# tiled test path uses a conservative halo of 10 (model.py:237-238); 6 is the
# exact bound and what halo-exchange spatial sharding requires for
# bit-exactness at tile seams.
RECEPTIVE_RADIUS = 6

# Per-frame MAC count per pixel (for perf accounting):
#   C1 25*1*64 + C2_1 9*64*32 + C2_2 25*64*16 + C3_1 9*48*16 + C3_2 1*48*32
#   + C4 9*48*1
MACS_PER_PIXEL = sum(l.ksize * l.ksize * l.in_ch * l.out_ch for l in QVRCNN_LAYERS)


def weight_shape_hwio(layer: LayerDef) -> Tuple[int, int, int, int]:
    """Training-side HWIO (a.k.a. HWCN in the reference's file naming)."""
    return (layer.ksize, layer.ksize, layer.in_ch, layer.out_ch)
