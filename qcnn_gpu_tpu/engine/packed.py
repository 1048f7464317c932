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
from typing import Callable, Optional, Sequence, Tuple

import numpy as np


def _pack_residual_traced(run, x, capacity_frac, jnp):
    """Traced body shared by the D2H-only and duplex transports: run the
    restorer and ship rec − x as 4-bit nibbles + an exact exception list."""
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
        return _pack_residual_traced(run, x, capacity_frac, jnp)

    return packed, _decode_residual


def _decode_residual(x_host: np.ndarray, fetched) -> np.ndarray:
    """Host side of the packed-residual D2H: rec = x + diff, bit-exact."""
    nib, idx, val, count = (np.asarray(a) for a in fetched)
    b, h, w = x_host.shape
    n = int(count)
    if n > idx.size:
        raise OverflowError(
            f"{n} residual exceptions exceed capacity {idx.size}; "
            "fetch the full recon instead"
        )
    from qcnn_gpu_tpu import native

    out = native.residual_decode(x_host, nib, idx, val, n)  # C++ fast path
    if out is not None:
        return out
    d = np.empty((b, h, nib.shape[-1] * 2), np.int16)
    d[..., 0::2] = nib & 15
    d[..., 1::2] = nib >> 4
    d -= 8
    d = np.ascontiguousarray(d[..., :w])
    if n:
        # exception indices address the UNPADDED [B,H,W] raster
        d.reshape(-1)[idx[:n]] = val[:n]
    return (x_host.astype(np.int16) + d).astype(np.uint8)


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


def make_duplex_restore(run: Callable, capacity_frac: float = 1.0 / 256.0):
    """Full-duplex packed transport: pack the INPUT side too.

    Successive video frames are temporally redundant (the reference feeds
    decoded HEVC sequences frame-by-frame, kernel.cu:89-101; neighboring
    anchors differ by small motion/noise deltas), so the host ships each
    batch as 4-bit TEMPORAL deltas vs the previous frame — frame b's
    reference is frame b−1 of the stream, carried on device — plus the
    same exact exception list as the D2H side. The device reconstructs the
    anchors exactly (the per-frame deltas telescope: a cumsum over the
    batch axis lands every partial sum in [-255, 255], so int16 is exact),
    runs the restorer, and returns the packed residual. Wire cost drops to
    ~1 B/px round trip vs 2 B/px raw; content the nibble can't express
    rides the exception list or, past capacity, falls back to a full
    uint8 H2D for that batch — lossless by construction, never silent.

    The delta raster ships BLOCK-SPARSE (256-px flat blocks, all sizes
    power-of-2 bucketed so only the small unpack program ever retraces):
      * all-zero blocks ship nothing — static regions of a coded video
        are bit-identical between frames (HEVC SKIP; intra re-encode of
        unchanged pixels), typically most of the frame;
      * dense-exception blocks (moving content) ship raw int16 deltas
        (512 B beats 6 B/exception past ~85 of 256);
      * remaining blocks ship 4-bit nibbles + a pointwise exception list.

    Returns (pack_input, step_full, step_packed, decode):
      pack_input(x_host) -> ("full", x) | ("packed", payload)
          stateful host packer (tracks the previous raw frame); the first
          batch and any batch the format cannot beat raw bytes on go
          "full". payload = (nib_idx, nib, raw_idx, raw_val, idx, val).
      step_full(x_dev) -> (prev_dev, fetched)      — cold-start / fallback
      step_packed(prev_dev, *payload) -> (prev_dev, fetched)
      decode(x_host, fetched) -> rec uint8, bit-exact vs run(x)
    """
    import jax
    import jax.numpy as jnp

    state = {"prev": None, "exc_frac": [], "h2d_bytes": []}
    BLK = 256  # flat-raster block size for the sparse delta transport

    def _bucket(n: int, lo: int = 8) -> int:
        if n == 0:
            return 0  # empty class: zero wire bytes, zero-sized operand
        kb = lo
        while kb < n:
            kb *= 2
        return kb

    def _pack_payload_numpy(x: np.ndarray, refs: np.ndarray):
        """NumPy packer — the semantic definition; the native C++ packer
        (native/transport.cpp) must produce byte-identical payloads."""
        d = (x.astype(np.int16) - refs).reshape(-1)
        npx = d.size
        nb_total = -(-npx // BLK)
        if npx % BLK:
            d = np.pad(d, (0, nb_total * BLK - npx))
        blocks = d.reshape(nb_total, BLK)
        exc_cnt = ((blocks > 7) | (blocks < -8)).sum(axis=1)
        nz = (blocks != 0).any(axis=1)
        # three block classes: ALL-ZERO ships nothing (static regions of a
        # coded video are bit-identical frame to frame); DENSE-exception
        # blocks (moving content) ship raw int16 deltas (512 B beats
        # 6 B/exception past ~85/256); the rest ship 4-bit nibbles plus a
        # pointwise exception list for stragglers
        raw_sel = nz & (exc_cnt * 6 >= BLK * 2 + 4)
        nib_sel = nz & ~raw_sel
        (raw_ids,) = np.nonzero(raw_sel)
        (nib_ids,) = np.nonzero(nib_sel)
        exc_flat = ((blocks > 7) | (blocks < -8)) & nib_sel[:, None]
        ne = int(exc_flat.sum())
        kr, kn, ke = _bucket(raw_ids.size), _bucket(nib_ids.size), _bucket(ne)
        raw_idx = np.full(kr, nb_total, np.int32)
        raw_idx[: raw_ids.size] = raw_ids
        raw_val = np.zeros((kr, BLK), np.int16)
        raw_val[: raw_ids.size] = blocks[raw_ids]
        d4 = (np.clip(blocks[nib_ids], -8, 7) + 8).astype(np.uint8)
        nib = np.zeros((kn, BLK // 2), np.uint8)
        nib[: nib_ids.size] = d4[:, 0::2] | (d4[:, 1::2] << 4)
        nib_idx = np.full(kn, nb_total, np.int32)
        nib_idx[: nib_ids.size] = nib_ids
        idx = np.full(ke, nb_total * BLK, np.int32)
        val = np.zeros(ke, np.int16)
        if ne:
            ex = np.flatnonzero(exc_flat).astype(np.int32)
            idx[:ne] = ex
            val[:ne] = d[ex]
        return (nib_idx, nib, raw_idx, raw_val, idx, val), int(exc_cnt.sum())

    def pack_input(x: np.ndarray, _force_numpy: bool = False):
        prev = state["prev"]
        state["prev"] = np.ascontiguousarray(x[-1:])
        state["shape"] = x.shape
        if prev is None:
            state["h2d_bytes"].append(x.nbytes)
            return "full", x
        refs = np.concatenate([prev, x[:-1]], axis=0)
        res = None
        if not _force_numpy:
            from qcnn_gpu_tpu import native

            res = native.duplex_pack(x, refs, _bucket)  # C++ fast path
        if res is None:
            res = _pack_payload_numpy(x, refs)
        payload, n_exc_all = res
        nib_idx, nib, raw_idx, raw_val, idx, val = payload
        state["exc_frac"].append(n_exc_all / x.size)
        wire = (
            nib_idx.nbytes + nib.nbytes + raw_idx.nbytes + raw_val.nbytes
            + idx.nbytes + val.nbytes
        )
        if wire >= x.nbytes:  # content too hot for the format: raw batch
            state["h2d_bytes"].append(x.nbytes)
            return "full", x
        state["h2d_bytes"].append(wire)
        return "packed", payload

    def _make_unpack(b, h, w):
        npx = b * h * w
        nb_total = -(-npx // BLK)

        @jax.jit
        def unpack(prev, nib_idx, nib, raw_idx, raw_val, idx, val):
            lo = (nib & 15).astype(jnp.int16) - 8
            hi = (nib >> 4).astype(jnp.int16) - 8
            dn = jnp.stack([lo, hi], axis=-1).reshape(nib.shape[0], BLK)
            d = jnp.zeros((nb_total, BLK), jnp.int16)
            d = d.at[nib_idx].set(dn, mode="drop")
            d = d.at[raw_idx].set(raw_val, mode="drop")
            d = d.reshape(-1).at[idx].set(val, mode="drop")
            d = d[:npx].reshape(b, h, w)
            cums = jnp.cumsum(d, axis=0, dtype=jnp.int16)
            return (prev.astype(jnp.int16) + cums).astype(jnp.uint8)

        return unpack

    unpack_cache: dict = {}

    @jax.jit
    def step_full(x):
        return x[-1:], _pack_residual_traced(run, x, capacity_frac, jnp)

    def step_packed(prev, nib_idx, nib, raw_idx, raw_val, idx, val):
        # two programs, not one: the bucketed payload shapes only ever
        # retrace the cheap elementwise unpack; the net + residual pack
        # compile once (step_full) and see a fixed [B,H,W] anchor
        key = state["shape"]  # batch geometry recorded by pack_input
        if key not in unpack_cache:
            unpack_cache[key] = _make_unpack(*key)
        x = unpack_cache[key](prev, nib_idx, nib, raw_idx, raw_val, idx, val)
        return step_full(x)

    def decode(x_host: np.ndarray, fetched) -> np.ndarray:
        return _decode_residual(x_host, fetched)

    pack_input.stats = state  # exc_frac history for honest byte accounting
    return pack_input, step_full, step_packed, decode


def pipeline_restore_duplex(
    pack_input: Callable,
    step_full: Callable,
    step_packed: Callable,
    batches: Sequence[np.ndarray],
    depth: int = 3,
    on_output: Optional[Callable] = None,
    carry: Optional[dict] = None,
):
    """pipeline_restore with the duplex transport: the producer packs each
    input batch (temporal deltas vs the carried previous frame), enqueues
    the async step, and the fetcher thread pulls the packed residuals —
    both directions overlapped, both directions ~0.5 B/px. The device-side
    previous-frame carry chains the steps, which costs nothing extra: the
    compute stream was already serial. Pass `carry` (a dict; key "prev")
    to continue a chain across calls — a stream resumed mid-sequence then
    never pays the cold-start full-frame H2D."""
    import queue
    import threading

    import jax

    outs: list = []
    sink = on_output if on_output is not None else outs.append
    err: list = []
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    done = object()

    def fetcher():
        failed = False
        while True:
            item = q.get()
            if item is done:
                return
            if failed:
                continue
            try:
                sink(tuple(np.asarray(a) for a in item))
            except BaseException as e:
                err.append(e)
                failed = True

    th = threading.Thread(target=fetcher, daemon=True)
    th.start()
    prev = carry.get("prev") if carry is not None else None
    try:
        for x in batches:
            if err:
                break
            kind, payload = pack_input(x)
            if kind == "full" or prev is None:
                # a pre-warmed packer can say "packed" while THIS loop has
                # no device carry yet — the raw batch is still in hand
                prev, out = step_full(jax.device_put(x))
            else:
                prev, out = step_packed(
                    prev, *(jax.device_put(a) for a in payload)
                )
            q.put(out)
    finally:
        q.put(done)
        th.join()
        if carry is not None:
            carry["prev"] = prev
    if err:
        raise err[0]
    return outs


def measure_stream_fps_duplex(
    pack_input: Callable,
    step_full: Callable,
    step_packed: Callable,
    decode: Callable,
    batches: Sequence[np.ndarray],
    depth: int = 3,
    carry: Optional[dict] = None,
) -> float:
    """Wall-clock fps of the duplex loop: host pack, packed H2D, device
    unpack+restore+pack, packed D2H, host decode — ALL inside the timed
    window (the reference's timing definition with both copies packed)."""
    state = {"i": 0}

    def sink(fetched):
        decode(batches[state["i"] % len(batches)], fetched)
        state["i"] += 1

    n_frames = sum(b.shape[0] for b in batches)
    t0 = time.perf_counter()
    pipeline_restore_duplex(
        pack_input, step_full, step_packed, batches, depth=depth, on_output=sink,
        carry=carry,
    )
    return n_frames / (time.perf_counter() - t0)


def duplex_roundtrip_bytes(shape: Tuple[int, int, int], capacity_frac=1.0 / 256.0):
    """(h2d, d2h) bytes per BATCH for the duplex transport, H2D as the
    UPPER bound of the block-sparse format (every block ships nibbles,
    no zero blocks, no exceptions) — real streams with static regions
    land far lower (see pack_input.stats['h2d_bytes'] for measured).
    The D2H side is the fixed packed-residual cost."""
    b, h, w = shape
    k = max(1024, int(b * h * w * capacity_frac))
    nb = -(-b * h * w // 256)
    return nb * (4 + 128), b * h * ((w + 1) // 2) + 6 * k + 4
