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


def _video_like_batches(n_batches, b, h, w, seed=0, jump=6):
    """Temporally correlated uint8 batches: a random base plus a slowly
    drifting signal, with occasional large jumps (nibble exceptions)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w), np.int16)
    frames = []
    cur = base
    for _ in range(n_batches * b):
        step = rng.integers(-3, 4, (h, w), np.int16)
        big = rng.random((h, w)) < 0.01
        step[big] = rng.integers(-60, 61, int(big.sum())).astype(np.int16)
        cur = np.clip(cur + step, 0, 255)
        frames.append(cur.astype(np.uint8))
    fr = np.stack(frames)
    return [fr[i * b : (i + 1) * b] for i in range(n_batches)]


def test_duplex_roundtrip_bit_exact_chain():
    """Packed H2D (temporal deltas incl. exceptions) + packed D2H decode
    bit-exactly across a chained sequence of batches."""
    from qcnn_gpu_tpu.engine.packed import make_duplex_restore

    p = synth_engine_params(37)
    run = make_forward(p, impl="int")
    batches = _video_like_batches(3, 2, 32, 49, seed=5)  # odd width
    pack_input, step_full, step_packed, decode = make_duplex_restore(
        run, capacity_frac=0.1
    )
    import jax

    prev = None
    kinds = []
    for x in batches:
        kind, payload = pack_input(x)
        kinds.append(kind)
        if kind == "full" or prev is None:
            prev, out = step_full(jax.device_put(x))
        else:
            prev, out = step_packed(prev, *(jax.device_put(a) for a in payload))
        rec = decode(x, out)
        assert (rec == O.forward_blu(x, p)).all()
    assert kinds[0] == "full" and "packed" in kinds[1:]


def test_duplex_capacity_overflow_goes_full():
    """A batch whose temporal deltas exceed exception capacity must ship
    full-frame (lossless fallback), never a corrupted packed batch."""
    from qcnn_gpu_tpu.engine.packed import make_duplex_restore

    rng = np.random.default_rng(1)
    # > 1024 (the capacity floor) exceptional pixels: uncorrelated frames
    a = rng.integers(0, 256, (2, 64, 64), np.uint8)
    b = rng.integers(0, 256, (2, 64, 64), np.uint8)
    pack_input, *_ = make_duplex_restore(lambda x: x, capacity_frac=1e-4)
    k0, _ = pack_input(a)
    k1, _ = pack_input(b)
    assert (k0, k1) == ("full", "full")


def test_duplex_streaming_loop_bit_exact():
    from qcnn_gpu_tpu.engine.packed import (
        make_duplex_restore,
        measure_stream_fps_duplex,
    )

    p = synth_engine_params(27)
    run = make_forward(p, impl="int")
    batches = _video_like_batches(4, 2, 32, 48, seed=7)
    pack_input, step_full, step_packed, decode = make_duplex_restore(
        run, capacity_frac=0.05
    )
    recs = {}

    def recording_decode(x, fetched):
        rec = decode(x, fetched)
        recs[len(recs)] = rec
        return rec

    fps = measure_stream_fps_duplex(
        pack_input, step_full, step_packed, recording_decode, batches, depth=2
    )
    assert fps > 0 and len(recs) == 4
    for i, x in enumerate(batches):
        assert (recs[i] == O.forward_blu(x, p)).all()


def test_duplex_block_sparse_static_scene():
    """Static background + fast uncorrelated moving object: zero blocks
    ship nothing, dense-motion blocks ship raw int16 deltas — wire bytes
    land far below the raw frame while staying bit-exact."""
    from qcnn_gpu_tpu.engine.packed import make_duplex_restore

    import jax

    rng = np.random.default_rng(3)
    h, w, b = 64, 256, 2
    bg = rng.integers(0, 256, (h, w), np.uint8)
    batches = []
    for j in range(3):
        fr = np.broadcast_to(bg, (b, h, w)).copy()
        for i in range(b):
            x0 = ((j * b + i) * 16) % (w - 32)
            fr[i, 8:40, x0 : x0 + 32] = rng.integers(0, 256, (32, 32), np.uint8)
        batches.append(fr)
    pack_input, step_full, step_packed, decode = make_duplex_restore(lambda x: x)
    prev = None
    for j, x in enumerate(batches):
        kind, payload = pack_input(x)
        if kind == "full" or prev is None:
            prev, out = step_full(jax.device_put(x))
        else:
            prev, out = step_packed(prev, *(jax.device_put(a) for a in payload))
            # moving object is uncorrelated content: raw blocks engaged
            assert payload[2].size > 0  # raw_idx bucket non-empty
            assert pack_input.stats["h2d_bytes"][-1] < 0.6 * x.nbytes
        assert (decode(x, out) == x).all()  # identity restorer: rec == x
    assert pack_input.stats["h2d_bytes"][0] == batches[0].nbytes  # cold full


def test_duplex_bytes_roundtrip_quarters_the_wire():
    from qcnn_gpu_tpu.engine.packed import duplex_roundtrip_bytes

    h2d, d2h = duplex_roundtrip_bytes((16, 1080, 1920))
    raw = 16 * 1080 * 1920
    assert h2d + d2h < 1.1 * raw  # ~1 B/px round trip vs 2 B/px raw
