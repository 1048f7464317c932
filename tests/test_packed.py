"""Packed-residual D2H transport (engine/packed.py): bit-exactness incl.
exception handling, overflow detection, and the pipelined streaming path."""

import numpy as np
import pytest

from qcnn_gpu_tpu.engine.packed import (
    make_packed_restore,
    measure_stream_fps_packed,
    packed_roundtrip_bytes,
)
from qcnn_gpu_tpu.models import oracle as O
from qcnn_gpu_tpu.models.qvrcnn import make_forward
from qcnn_gpu_tpu.testing import synth_engine_params, synth_frames


def test_packed_roundtrip_bit_exact_engine():
    p = synth_engine_params(37)
    run = make_forward(p, impl="int")
    x = synth_frames(3, 48, 64, seed=4)
    packed, decode = make_packed_restore(run)
    rec = decode(x, packed(x))
    assert (rec == O.forward_blu(x, p)).all()


@pytest.mark.parametrize("w", [64, 63])  # odd width exercises nibble padding
def test_packed_exceptions_exact(w):
    """A synthetic restorer with large residuals: every |diff|>7 pixel must
    ride the exception list and decode exactly."""
    import jax.numpy as jnp

    shift = np.zeros((2, 32, w), np.int16)
    rng = np.random.default_rng(0)
    pos = rng.random((2, 32, w)) < 0.03
    shift[pos] = rng.integers(-200, 201, int(pos.sum())).astype(np.int16)
    shift[~pos] = rng.integers(-7, 8, int((~pos).sum())).astype(np.int16)
    shift_j = jnp.asarray(shift)

    def run(x):
        return jnp.clip(x.astype(jnp.int16) + shift_j, 0, 255).astype(jnp.uint8)

    x = synth_frames(2, 32, w, seed=9)
    want = np.clip(x.astype(np.int16) + shift, 0, 255).astype(np.uint8)
    packed, decode = make_packed_restore(run, capacity_frac=0.1)
    assert (decode(x, packed(x)) == want).all()


def test_packed_overflow_raises_not_corrupts():
    import jax.numpy as jnp

    def run(x):  # every pixel overflows the nibble range
        return jnp.clip(x.astype(jnp.int16) + 100, 0, 255).astype(jnp.uint8)

    x = np.full((1, 64, 64), 10, np.uint8)
    packed, decode = make_packed_restore(run, capacity_frac=1e-4)
    with pytest.raises(OverflowError):
        decode(x, packed(x))


def test_packed_streaming_path():
    """The pipelined loop with packed D2H + in-window host decode restores
    every batch bit-exactly (decode runs on the fetcher thread)."""
    p = synth_engine_params(32)
    run = make_forward(p, impl="int")
    batches = [synth_frames(2, 32, 48, seed=s) for s in range(3)]
    packed, decode = make_packed_restore(run)

    recs = {}
    orig_decode = decode

    def recording_decode(x, fetched):
        rec = orig_decode(x, fetched)
        recs[len(recs)] = rec
        return rec

    fps = measure_stream_fps_packed(packed, recording_decode, batches, depth=2)
    assert fps > 0 and len(recs) == 3
    for i, b in enumerate(batches):
        assert (recs[i] == O.forward_blu(b, p)).all()


def test_packed_roundtrip_bytes_halves_d2h():
    h2d, d2h = packed_roundtrip_bytes((16, 1080, 1920))
    assert h2d == 16 * 1080 * 1920
    assert d2h < 0.55 * h2d  # ~0.5 B/px + exception slots
