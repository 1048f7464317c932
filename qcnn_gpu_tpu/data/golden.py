"""Deterministic golden-clip generation (the repo's psnr_static analog).

The reference verifies by golden-PSNR regression over known anchors
(kernel.cu:105-115, psnr_static_*.data), but ships neither its HEVC
anchors nor its int8 weights. This repo's equivalent closed loop uses the
materials available offline and regenerates them deterministically:

  * clip: a camera pan over the one real photograph in the environment
    (matplotlib's grace_hopper.jpg, 512x600 luma), cropped to 416x240 —
    the reference's JCT-VC class D geometry;
  * anchors: PIL JPEG at four qualities mapped to the reference QP set
    {22,27,32,37} (JPEG = 8x8 DCT coefficient quantization, the same
    intra-coding artifact family as HEVC intra: blocking + ringing).

scripts/make_golden.py trains the 4 per-QP models on this clip with the
repo's own toolkit and commits engine model files + golden PSNR tables
under assets/golden/; tests/test_golden_psnr.py regenerates the clip and
asserts the engine reproduces the goldens to ±0.01 dB.
"""

from __future__ import annotations

import io
import os

import numpy as np

# JPEG quality standing in for each HEVC QP (anchor PSNR on this clip:
# ~43 / ~38.5 / ~35.5 / ~33 dB — the reference's QP22..QP37 anchor range)
QP_QUALITY = {22: 93, 27: 80, 32: 60, 37: 35}
H, W = 240, 416
N_TRAIN, N_EVAL = 12, 4

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets",
    "golden",
)


def hopper_luma() -> np.ndarray:
    """The one real photograph available offline: [600, 512] uint8 luma."""
    import matplotlib
    from PIL import Image

    path = os.path.join(
        os.path.dirname(matplotlib.__file__), "mpl-data", "sample_data",
        "grace_hopper.jpg",
    )
    return np.asarray(Image.open(path).convert("L"))


def pan_clip(img: np.ndarray, n: int, phase: float = 0.0) -> np.ndarray:
    """Deterministic camera pan: n crops of HxW along a diagonal track."""
    ih, iw = img.shape
    t = (np.arange(n) + phase) / max(n, 1)
    y0 = np.round(t * (ih - H)).astype(int)
    x0 = np.round((0.5 + 0.5 * np.sin(2 * np.pi * t)) * (iw - W)).astype(int)
    return np.stack([img[y : y + H, x : x + W] for y, x in zip(y0, x0)])


def jpeg_anchor(frames: np.ndarray, quality: int) -> np.ndarray:
    """Intra-frame JPEG degradation (the HEVC-anchor stand-in)."""
    from PIL import Image

    out = []
    for f in frames:
        buf = io.BytesIO()
        Image.fromarray(f, "L").save(buf, format="JPEG", quality=quality)
        out.append(np.asarray(Image.open(buf).convert("L")))
    return np.stack(out)


def golden_clip():
    """(train_clean, eval_clean): deterministic, shared between the
    generator script and the regression test."""
    img = hopper_luma()
    return pan_clip(img, N_TRAIN, 0.0), pan_clip(img, N_EVAL, 0.37)
