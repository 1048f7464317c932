"""Compact D2H transport for restored frames (link-bound streaming).

The reference's timing definition includes the D2H copy of the full recon
frame (kernel.cu:96, timed at kernel.cu:89-101). When the host link — not
the chip — bounds throughput (this dev TPU sits behind a ~20-40 MB/s
network tunnel; a PCIe/DCN-starved production host has the same shape),
the round trip moves 2 bytes/pixel: anchor up, recon down. The recon is
redundant: the host already holds the anchor, and the restoration
residual rec − x is a low-entropy signal (the net's whole purpose is a
sub-1-dB correction; residuals sit overwhelmingly within ±7). So the
device ships the residual as packed 4-bit nibbles (0.5 B/px) plus an
EXACT exception list for the rare |diff| > 7 pixels, and the host
reconstructs rec = x + diff bit-exactly. D2H bytes drop ~2x; the host
decode cost lands inside the timed window (honest accounting).

Bit-exactness contract: decode(x, pack(x)) == run(x) for every input, or
OverflowError when the exception list overflows its fixed capacity (the
caller falls back to the full-recon fetch — never silent corruption).
"""

from __future__ import annotations

import time
from typing import Callable, Sequence, Tuple

import numpy as np


def make_packed_restore(run: Callable, capacity_frac: float = 1.0 / 256.0):
    """Wrap fn(uint8 [B,H,W]) -> uint8 [B,H,W] into a packed-transport pair.

    Returns (packed, decode):
      packed(x_dev) -> (nibbles u8 [B,H,ceil(W/2)], idx i32 [K], val i16 [K],
                        count i32)   — all device arrays, D2H ~0.5 B/px
      decode(x_host, fetched) -> rec uint8 [B,H,W]  — bit-exact vs run(x)

    K = max(1024, B*H*W * capacity_frac) exception slots; count > K raises
    OverflowError at decode (exact detection, caller falls back).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def packed(x):
        rec = run(x)
        diff = rec.astype(jnp.int16) - x.astype(jnp.int16)  # [-255, 255]
        b, h, w = x.shape
        k = max(1024, int(b * h * w * capacity_frac))
        d4 = (jnp.clip(diff, -8, 7) + 8).astype(jnp.uint8)
        if w % 2:
            d4 = jnp.pad(d4, ((0, 0), (0, 0), (0, 1)), constant_values=8)
        nib = d4[..., 0::2] | (d4[..., 1::2] << 4)
        exc = (diff > 7) | (diff < -8)
        flat = exc.reshape(-1)
        # sorted indices of exceptions; fill slots point past the end and
        # are ignored by the host (count bounds the real ones)
        (idx,) = jnp.nonzero(flat, size=k, fill_value=b * h * w)
        idx = idx.astype(jnp.int32)
        val = jnp.take(
            diff.reshape(-1), jnp.minimum(idx, b * h * w - 1)
        ).astype(jnp.int16)
        count = flat.sum(dtype=jnp.int32)
        return nib, idx, val, count

    def decode(x_host: np.ndarray, fetched) -> np.ndarray:
        nib, idx, val, count = (np.asarray(a) for a in fetched)
        b, h, w = x_host.shape
        n = int(count)
        if n > idx.size:
            raise OverflowError(
                f"{n} residual exceptions exceed capacity {idx.size}; "
                "fetch the full recon instead"
            )
        d = np.empty((b, h, nib.shape[-1] * 2), np.int16)
        d[..., 0::2] = nib & 15
        d[..., 1::2] = nib >> 4
        d -= 8
        d = np.ascontiguousarray(d[..., :w])
        if n:
            # exception indices address the UNPADDED [B,H,W] raster
            d.reshape(-1)[idx[:n]] = val[:n]
        return (x_host.astype(np.int16) + d).astype(np.uint8)

    return packed, decode


def measure_stream_fps_packed(
    packed: Callable,
    decode: Callable,
    batches: Sequence[np.ndarray],
    depth: int = 3,
) -> float:
    """measure_stream_fps with packed D2H: the pipelined loop ships the
    nibble residual + exceptions and the host DECODES each batch inside
    the timed window — the restored frames land in host memory, matching
    the reference's timing definition (kernel.cu:89-101) exactly."""
    from qcnn_gpu_tpu.engine.stream import pipeline_restore

    state = {"i": 0}

    def sink(fetched):
        decode(batches[state["i"] % len(batches)], fetched)
        state["i"] += 1

    n_frames = sum(b.shape[0] for b in batches)
    t0 = time.perf_counter()
    pipeline_restore(packed, batches, depth=depth, on_output=sink)
    return n_frames / (time.perf_counter() - t0)


def packed_roundtrip_bytes(shape: Tuple[int, int, int], capacity_frac=1.0 / 256.0):
    """(h2d, d2h) bytes per BATCH for the packed transport at [B,H,W]."""
    b, h, w = shape
    k = max(1024, int(b * h * w * capacity_frac))
    return b * h * w, b * h * ((w + 1) // 2) + 6 * k + 4
