"""Cross-implementation validation & golden-dump tooling.

The reference's verification machinery, formalized (SURVEY.md §4):
  * conv_validation (model.py:366-383): run the FLOAT graph, scale each
    layer's x/w/b/conv by the layer's ratio/stepw into the integer domain,
    and compare against what the INT engine actually computes;
  * viewmem (cnn.cu:203-248): per-stage corner dumps of x/w/u/v with
    mul/shift — here a structured per-layer diff report instead of eyeball
    printf matching;
  * dump_feature (model.py:342-364): golden activation tensors to disk.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import numpy as np

from qcnn_gpu_tpu.models import float_model as FM
from qcnn_gpu_tpu.models import oracle as O
from qcnn_gpu_tpu.models.topology import QVRCNN_LAYERS
from qcnn_gpu_tpu.quant.params import QuantTable


@dataclasses.dataclass
class LayerDiff:
    name: str
    max_abs_diff: float  # float-model-int-domain vs engine accumulator
    mean_abs_diff: float
    engine_corner: np.ndarray  # 5x5 corner of the engine value (viewmem)
    float_corner: np.ndarray


def conv_validation(
    float_params: FM.Params,
    table: QuantTable,
    engine_params: O.EngineParams,
    frames: np.ndarray,
) -> List[LayerDiff]:
    """Per-layer comparison of the float model's integer-scaled
    accumulators vs the INT engine's exact accumulators.

    The float value of layer L's pre-activation, multiplied by
    ratio_in/stepw (conv_validation's scaling, model.py:379-382), should
    land within quantization error of the engine's int32 accumulator u.
    Large deviations localize numeric breakage to a layer — the diff this
    tool reports is what the reference's manual printf-vs-printf compare
    established by eye.
    """
    x_norm = (frames[..., None].astype(np.float32) - 128.0) / 255.0
    import jax.numpy as jnp

    blu_ub = table.blu_adj
    _, facts = FM.residual_float(
        float_params, jnp.asarray(x_norm), blu_ub, collect=True
    )
    # float pre-activations in layer order need a second pass (collect gives
    # post-activation); recompute pre-acts explicitly
    def conv(x, name):
        return FM._conv(x, float_params[f"w_{name}"], float_params[f"b_{name}"])

    xj = jnp.asarray(x_norm)
    pre = {}
    a1 = jnp.clip(conv(xj, "C1"), 0, blu_ub[0])
    pre["C1"] = conv(xj, "C1")
    pre["C2_1"] = conv(a1, "C2_1")
    pre["C2_2"] = conv(a1, "C2_2")
    c2 = jnp.concatenate(
        [jnp.clip(pre["C2_1"], 0, blu_ub[1]), jnp.clip(pre["C2_2"], 0, blu_ub[2])],
        axis=-1,
    )
    pre["C3_1"] = conv(c2, "C3_1")
    pre["C3_2"] = conv(c2, "C3_2")
    c3 = jnp.concatenate(
        [jnp.clip(pre["C3_1"], 0, blu_ub[3]), jnp.clip(pre["C3_2"], 0, blu_ub[4])],
        axis=-1,
    )
    pre["C4"] = conv(c3, "C4")

    _, inter = O.forward_blu(frames, engine_params, collect_intermediates=True)
    engine_u = {
        "C1": inter["u1"],
        "C2_1": inter["u2_1"],
        "C2_2": inter["u2_2"],
        "C3_1": inter["u3_1"],
        "C3_2": inter["u3_2"],
        "C4": inter["u4"],
    }

    out = []
    for i, layer in enumerate(QVRCNN_LAYERS):
        row = table[i]
        scaled = np.asarray(pre[layer.name]) * (row.ratio / row.stepw)
        eng = engine_u[layer.name].astype(np.float64)
        diff = np.abs(scaled - eng)
        out.append(
            LayerDiff(
                name=layer.name,
                max_abs_diff=float(diff.max()),
                mean_abs_diff=float(diff.mean()),
                engine_corner=eng[0, :5, :5, 0].copy(),
                float_corner=np.round(scaled[0, :5, :5, 0]).copy(),
            )
        )
    return out


def dump_features(
    engine_params: O.EngineParams, frames: np.ndarray, path: str
) -> Dict[str, np.ndarray]:
    """Golden activation dump (dump_feature analog): writes the six
    post-requant activation tensors for `frames` to `path` as raw arrays
    in layer order, returns them keyed by name."""
    _, inter = O.forward_blu(frames, engine_params, collect_intermediates=True)
    conc1 = inter["conc1"]
    conc2 = inter["conc2"]
    feats = {
        "blu1": inter["v1"],
        "blu2_1": conc1[..., :32],
        "blu2_2": conc1[..., 32:],
        "blu3_1": conc2[..., :16],
        "blu3_2": conc2[..., 16:],
        "conv4": inter["u4"],
    }
    with open(path, "wb") as fp:
        for name in ("blu1", "blu2_1", "blu2_2", "blu3_1", "blu3_2", "conv4"):
            fp.write(np.asarray(feats[name], dtype="<i4").tobytes())
    return feats


def viewmem_report(
    engine_params: O.EngineParams, frames: np.ndarray
) -> str:
    """Human-readable per-stage corner dump (viewmem analog, cnn.cu:203-248):
    5x5 corners of each accumulator and requantized output + mul/shift."""
    _, inter = O.forward_blu(frames, engine_params, collect_intermediates=True)
    lines = []
    stages = [
        ("C1", "u1", "v1", 0),
        ("C2_1", "u2_1", None, 1),
        ("C2_2", "u2_2", None, 2),
        ("C3_1", "u3_1", None, 3),
        ("C3_2", "u3_2", None, 4),
        ("C4", "u4", None, 5),
    ]
    for name, ukey, vkey, idx in stages:
        lines.append(f"== {name} ==")
        lines.append(
            f"mul:{engine_params.mul[idx]} shift:{engine_params.shift[idx]} "
            f"blu:{engine_params.blu_q[idx]}"
        )
        lines.append("u:")
        for r in inter[ukey][0, :5, :5, 0]:
            lines.append("\t".join(str(int(v)) for v in r))
        if vkey:
            lines.append("v:")
            for r in inter[vkey][0, :5, :5, 0]:
                lines.append("\t".join(str(int(v)) for v in r))
    return "\n".join(lines)
