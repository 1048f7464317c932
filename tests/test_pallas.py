"""Fused Pallas pipeline vs oracle — bit-exact (interpreter mode on CPU)."""

import numpy as np
import pytest

from qcnn_gpu_tpu.models import oracle as O
from qcnn_gpu_tpu.ops.pallas_pipeline import build_pallas_forward
from qcnn_gpu_tpu.testing import synth_engine_params, synth_frames


@pytest.mark.parametrize("qp", [22, 37])
def test_pallas_bit_exact(qp):
    p = synth_engine_params(qp)
    run = build_pallas_forward(p, interpret=True)
    x = synth_frames(1, 40, 300, seed=qp)  # multi-tile both dims
    got = np.asarray(run(x))
    want = O.forward_blu(x, p)
    assert (got == want).all(), f"{np.sum(got != want)} mismatches"


def test_pallas_odd_geometry_and_edges():
    p = synth_engine_params(27)
    run = build_pallas_forward(p, interpret=True)
    for h, w, seed in ((37, 53, 1), (16, 244, 2), (18, 250, 3)):
        x = synth_frames(1, h, w, seed=seed)
        got = np.asarray(run(x))
        want = O.forward_blu(x, p)
        assert (got == want).all(), (h, w, np.sum(got != want))


def test_pallas_extreme_frames():
    p = synth_engine_params(32)
    run = build_pallas_forward(p, interpret=True)
    h, w = 20, 250
    for x in (
        np.zeros((1, h, w), np.uint8),
        np.full((1, h, w), 255, np.uint8),
    ):
        assert (np.asarray(run(x)) == O.forward_blu(x, p)).all()


def test_pallas_batch():
    p = synth_engine_params(37)
    run = build_pallas_forward(p, interpret=True)
    x = synth_frames(3, 24, 250, seed=9)
    assert (np.asarray(run(x)) == O.forward_blu(x, p)).all()


@pytest.mark.parametrize("qp", [22, 37])
def test_pallas2_framepair_bit_exact(qp):
    from qcnn_gpu_tpu.ops.pallas_pipeline2 import build_pallas_forward2

    p = synth_engine_params(qp)
    run = build_pallas_forward2(p, th=8, interpret=True)
    x = synth_frames(2, 40, 300, seed=qp)
    got = np.asarray(run(x))
    want = O.forward_blu(x, p)
    assert (got == want).all(), f"{np.sum(got != want)} mismatches"


def test_pallas2_odd_batch_and_geometry():
    from qcnn_gpu_tpu.ops.pallas_pipeline2 import build_pallas_forward2

    p = synth_engine_params(27)
    run = build_pallas_forward2(p, th=8, interpret=True)
    for n, h, w, s in ((1, 37, 53, 1), (3, 18, 250, 2)):
        x = synth_frames(n, h, w, seed=s)
        got = np.asarray(run(x))
        want = O.forward_blu(x, p)
        assert (got == want).all(), (n, h, w, np.sum(got != want))


@pytest.mark.parametrize("qp", [22, 37])
def test_pallas3_width_packed_bit_exact(qp):
    from qcnn_gpu_tpu.ops.pallas_pipeline3 import build_pallas_forward3

    p = synth_engine_params(qp)
    run = build_pallas_forward3(p, th=8, interpret=True)
    x = synth_frames(2, 40, 300, seed=qp)
    got = np.asarray(run(x))
    want = O.forward_blu(x, p)
    assert (got == want).all(), f"{np.sum(got != want)} mismatches"


def test_pallas3_odd_batch_and_geometry():
    """Odd frame counts, odd H/W (phase-split right edge), single-tile and
    multi-tile cases — the packed-column masks must stay per-phase exact."""
    from qcnn_gpu_tpu.ops.pallas_pipeline3 import build_pallas_forward3

    p = synth_engine_params(27)
    run = build_pallas_forward3(p, th=8, interpret=True)
    for n, h, w, s in ((1, 37, 53, 1), (3, 18, 250, 2), (2, 13, 245, 4)):
        x = synth_frames(n, h, w, seed=s)
        got = np.asarray(run(x))
        want = O.forward_blu(x, p)
        assert (got == want).all(), (n, h, w, np.sum(got != want))


def test_pallas3_interior_tile_gating():
    """Frames wide/tall enough to contain INTERIOR tiles must stay exact:
    interior tiles reuse the all-ones class of the mask ATLAS (their DMA
    elided by the pipeline) while edge tiles select real edge classes —
    both paths exercised in one frame."""
    from qcnn_gpu_tpu.ops.pallas_pipeline3 import build_pallas_forward3

    p = synth_engine_params(37)
    run = build_pallas_forward3(p, th=8, interpret=True)
    for n, h, w, s in ((1, 48, 800, 1), (2, 40, 740, 2)):
        x = synth_frames(n, h, w, seed=s)
        got = np.asarray(run(x))
        want = O.forward_blu(x, p)
        assert (got == want).all(), (n, h, w, np.sum(got != want))


def test_pallas3_variants():
    """bf16 operand dtype, fori (non-unrolled) tap loop, wc column
    chunking, and extreme frames all stay bit-exact."""
    import jax.numpy as jnp

    from qcnn_gpu_tpu.ops.pallas_pipeline3 import build_pallas_forward3

    p = synth_engine_params(37)
    x = synth_frames(2, 40, 300, seed=7)
    want = O.forward_blu(x, p)
    for kw in ({"dtype": jnp.bfloat16}, {"unroll": False}, {"wc": 2},
               {"kpad": True}):
        run = build_pallas_forward3(p, th=8, interpret=True, **kw)
        got = np.asarray(run(x))
        assert (got == want).all(), (kw, np.sum(got != want))
    run = build_pallas_forward3(p, th=8, interpret=True)
    for xe in (np.zeros((1, 20, 250), np.uint8), np.full((1, 20, 250), 255, np.uint8)):
        assert (np.asarray(run(xe)) == O.forward_blu(xe, p)).all()


@pytest.mark.parametrize("wc", [2, 3])
def test_pallas2_column_chunking(wc):
    """wc>1 processes several column tiles per program (divides the
    per-program grid overhead) with the lane-major [.., 2, m4] output;
    must stay bit-exact incl. the nw % wc != 0 padded-tile case."""
    from qcnn_gpu_tpu.ops.pallas_pipeline2 import build_pallas_forward2

    p = synth_engine_params(37)
    run = build_pallas_forward2(p, th=8, interpret=True, wc=wc)
    # 300px wide -> nw=2 tiles at we=256 (tw=244): exercises nw<wc and
    # nw not divisible by wc
    for n, h, w, s in ((2, 40, 300, 5), (1, 24, 600, 6)):
        x = synth_frames(n, h, w, seed=s)
        got = np.asarray(run(x))
        want = O.forward_blu(x, p)
        assert (got == want).all(), (n, h, w, np.sum(got != want))


@pytest.mark.parametrize(
    "h,w",
    [
        (40, 60),   # interior tiles exist: 3 pallas calls (band split)
        (35, 56),   # both spill classes active (halo past the frame edge)
        (16, 20),   # no interior: falls back to the single masked call
    ],
)
def test_pallas3_band_split_exact(h, w):
    """The band-split dispatch (unmasked interior kernel + masked edge
    rectangles) is bit-exact vs the oracle, including the halo-spill
    classes and the no-interior fallback."""
    from qcnn_gpu_tpu.ops.pallas_pipeline3 import build_pallas_forward3

    p = synth_engine_params(37)
    x = synth_frames(2, h, w, seed=h + w)
    run = build_pallas_forward3(p, th=8, we=24, interpret=True)
    assert (np.asarray(run(x)) == O.forward_blu(x, p)).all()


def test_pallas3_no_split_debug_matches():
    """The single-call path (_debug='no_split') stays available for
    ablation and remains exact."""
    from qcnn_gpu_tpu.ops.pallas_pipeline3 import build_pallas_forward3

    p = synth_engine_params(27)
    x = synth_frames(1, 40, 60, seed=3)
    run = build_pallas_forward3(p, th=8, we=24, interpret=True, _debug="no_split")
    assert (np.asarray(run(x)) == O.forward_blu(x, p)).all()
