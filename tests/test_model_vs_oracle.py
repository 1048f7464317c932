"""JAX XLA engine vs the NumPy oracle: bit-for-bit equality.

This is the central correctness gate: every conv implementation of the
jitted program must reproduce the oracle's integer output EXACTLY on every
pixel, for all four QP tables.
"""

import numpy as np
import pytest

from qcnn_gpu_tpu.models import oracle as O
from qcnn_gpu_tpu.models import qvrcnn as M
from qcnn_gpu_tpu.testing import synth_engine_params, synth_frames


@pytest.mark.parametrize("qp", [22, 27, 32, 37])
@pytest.mark.parametrize("merged", [True, False])
def test_int_path_bit_exact(qp, merged):
    p = synth_engine_params(qp)
    x = synth_frames(2, 48, 64, seed=qp)
    want = O.forward_blu(x, p)
    run = M.make_forward(p, impl="int", merged=merged)
    got = np.asarray(run(x))
    assert (got == want).all(), f"QP{qp}: {np.sum(got != want)} mismatched pixels"


@pytest.mark.parametrize("qp", [22, 37])
@pytest.mark.parametrize("merged", [True, False])
def test_bf16_path_bit_exact(qp, merged):
    """bf16 MXU-style path under the exactness certificate. On CPU XLA still
    emulates bf16 conv with f32 accumulation, so the certificate argument
    holds there too."""
    p = synth_engine_params(qp)
    assert M.certify_exact_bf16(p), "synth params must satisfy the certificate"
    x = synth_frames(1, 40, 56, seed=qp + 10)
    want = O.forward_blu(x, p)
    run = M.make_forward(p, impl="bf16", merged=merged)
    got = np.asarray(run(x))
    assert (got == want).all(), f"QP{qp}: {np.sum(got != want)} mismatched pixels"


def test_merged_weights_construction():
    """Merged kernels: zero-padded smaller kernels, concat-ordered channels,
    per-channel requant vectors matching the per-branch scalars."""
    p = synth_engine_params(37)
    mp = M.MergedParams.from_engine(p)
    w2 = np.asarray(mp.w_i8[1])
    assert w2.shape == (5, 5, 64, 48)
    # C2_1's 3x3 sits centered in the 5x5, ring is zero
    assert (w2[1:4, 1:4, :, :32] == p.weights[1]).all()
    assert (w2[0, :, :, :32] == 0).all() and (w2[:, 0, :, :32] == 0).all()
    assert (w2[:, :, :, 32:] == p.weights[2]).all()
    w3 = np.asarray(mp.w_i8[2])
    assert (w3[:, :, :, :16] == p.weights[3]).all()
    assert (w3[1, 1, :, 16:] == p.weights[4][0, 0]).all()
    assert (w3[0, :, :, 16:] == 0).all()
    # per-channel vectors carry the branch scalars
    assert (np.asarray(mp.mul[1])[:32] == p.mul[1]).all()
    assert (np.asarray(mp.mul[1])[32:] == p.mul[2]).all()
    assert (np.asarray(mp.shift[2])[:16] == p.shift[3]).all()


def test_exactness_bounds_reasonable():
    p = synth_engine_params(37)
    bounds = M.exactness_bounds(p)
    assert len(bounds) == 6
    assert all(0 < b < (1 << 24) for b in bounds)
    # and the bound really bounds observed accumulators
    x = synth_frames(1, 32, 32)
    _, inter = O.forward_blu(x, p, collect_intermediates=True)
    for key, idx in (("u1", 0), ("u2_1", 1), ("u2_2", 2), ("u3_1", 3), ("u3_2", 4), ("u4", 5)):
        assert int(np.abs(inter[key]).max()) <= bounds[idx]


def test_adversarial_extreme_frames():
    """All-0 / all-255 / checkerboard frames stress the clamp branches."""
    p = synth_engine_params(32)
    run = M.make_forward(p, impl="int")
    h, w = 32, 48
    frames = [
        np.zeros((1, h, w), np.uint8),
        np.full((1, h, w), 255, np.uint8),
        (np.indices((h, w)).sum(0) % 2 * 255).astype(np.uint8)[None],
    ]
    for x in frames:
        want = O.forward_blu(x, p)
        got = np.asarray(run(x))
        assert (got == want).all()


def test_odd_geometry():
    """Non-multiple-of-tile shapes must stay exact (SAME pad edges)."""
    p = synth_engine_params(27)
    run = M.make_forward(p, impl="int")
    x = synth_frames(1, 37, 53, seed=5)
    assert (np.asarray(run(x)) == O.forward_blu(x, p)).all()
