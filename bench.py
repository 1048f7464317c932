"""Headline benchmark: 1080p INT8 restoration frames/sec on one chip.

Reference baseline (BASELINE.md): best observed 1920x1080 single-frame
end-to-end latency 42.4 ms => 23.6 fps (unnamed NVIDIA GPU, Win x64 Debug;
timing includes PCIe H2D/D2H, kernel.cu:89-101; the 23.6 is the BEST of
510 logged records).

Two numbers, both against that 23.6:
  * value (headline): sustained device throughput of the full fused
    pipeline (uint8 frames in HBM -> restored uint8 frames in HBM) — the
    production streaming figure where DMA input feeds overlap compute.
  * detail.fps_incl_host_transfers: the reference's own timing definition
    — wall clock around the whole frame loop INCLUDING H2D/D2H — measured
    with a pipelined loop (engine/stream.py: H2D of batch i+2 || compute
    of i+1 || D2H of i). Reported as the best of several windows, matching
    the baseline's best-of-510 definition. On THIS dev setup the TPU sits
    behind a network tunnel whose bandwidth fluctuates >30x; the measured
    link bandwidth of the run is reported alongside so the number is
    falsifiable (detail.h2d_mbps / d2h_mbps; moving 2 x 2.07MB/frame at
    23.6 fps needs ~100 MB/s agg).

Before timing, the pallas output is checked against the XLA graph on one
batch ON HARDWARE (via the bit-exact host-tiled path — this toolchain
rejects whole-frame 1080p XLA compiles), so every BENCH number doubles as
a hardware correctness certificate (detail.exact).

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": x}
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qcnn_gpu_tpu.models.qvrcnn import make_forward  # noqa: E402
from qcnn_gpu_tpu.testing import synth_engine_params, synth_frames  # noqa: E402

BASELINE_FPS = 23.6  # reference best at 1080p
H, W = 1080, 1920
BATCH = int(os.environ.get("BENCH_BATCH", "16"))  # measured best of the
# 1->16 batch-scaling curve (bench_matrix.json batch_scaling_1080p)
ITERS = int(os.environ.get("BENCH_ITERS", "16"))
IMPL = os.environ.get("BENCH_IMPL", "auto")
DEPTH = int(os.environ.get("BENCH_DEPTH", "3"))
HOST_WINDOWS = int(os.environ.get("BENCH_HOST_WINDOWS", "4"))
HOST_BUDGET_S = float(os.environ.get("BENCH_HOST_BUDGET_S", "180"))


def _mbps(nbytes: float, secs: float) -> float:
    return round(nbytes / max(secs, 1e-9) / 1e6, 1)


def measure_link(jax, frames):
    """One-shot tunnel bandwidth sample in each direction (fresh buffers
    so no caching; ~4 MB per direction to bound worst-case phases)."""
    probe = np.ascontiguousarray(frames[:2])
    t0 = time.perf_counter()
    xd = jax.device_put(probe)
    xd.block_until_ready()
    h2d = _mbps(probe.nbytes, time.perf_counter() - t0)
    bump = jax.jit(lambda a: a + 1)
    yd = bump(xd)
    yd.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(yd)
    d2h = _mbps(probe.nbytes, time.perf_counter() - t0)
    return h2d, d2h


_GOLD_CACHE = {}


def check_exact(run, frames, p):
    """Hardware correctness gate: pallas output == XLA graph output on one
    batch (gold via the host-tiled path, itself tested == whole-frame).
    The XLA reference is computed once and cached — rebuilding it per
    candidate would re-trace/compile through the slow remote helper."""
    from qcnn_gpu_tpu.engine.tiled import restore_tiled

    out = np.asarray(run(frames))
    if "gold" not in _GOLD_CACHE:
        xla = make_forward(p, impl="auto")
        _GOLD_CACHE["gold"] = restore_tiled(xla, frames, 540, 960)
    return bool((out == _GOLD_CACHE["gold"]).all())


def main():
    import jax

    # persistent compile cache: Mosaic kernel compiles go through a remote
    # helper that can take minutes; cache hits skip it entirely
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    p = synth_engine_params(37)
    frames = synth_frames(BATCH, H, W, seed=1)
    xd = jax.device_put(frames)

    # fastest path first: the width-packed fused Pallas pipeline (v3),
    # then the frame-pair kernel (v2), then the XLA graph — each candidate
    # must pass the on-hardware exactness gate before it may be timed
    run = None
    exact = None
    candidates = []
    if IMPL in ("auto", "pallas3", "pallas2"):
        from qcnn_gpu_tpu.ops.tuning import build_tuned

        if IMPL != "pallas2":
            candidates.append(("pallas3", lambda: build_tuned(p, kernel=3)))
        if IMPL != "pallas3":
            # v2's own sweep-certified best (th=64/we=256/wc=2) — the tuned
            # file's knobs belong to v3 and would detune the fallback
            candidates.append(
                ("pallas2", lambda: build_tuned(p, kernel=2, th=64, we=256, wc=2))
            )
    for name, builder in candidates:
        try:
            run = builder()
            out = run(xd)
            out.block_until_ready()
            run.impl = name
        except Exception:
            run = None
            continue
        try:
            exact = check_exact(run, frames, p)
        except Exception as e:  # infra failure of the CHECK, not the kernel
            exact = f"check-error: {type(e).__name__}"
        if exact is False:  # wrong numbers: never time a broken kernel
            run = None
            continue
        break
    if run is None:
        # the XLA graph is its own reference: a stale False/None from a
        # REJECTED pallas candidate must not be reported against it
        exact = None
        run = make_forward(p, impl="auto" if IMPL.startswith("pallas") else IMPL)
        out = run(xd)
        out.block_until_ready()
        run.impl = getattr(run, "impl", IMPL)

    # headline: sustained device-resident throughput
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = run(xd)
    out.block_until_ready()
    dt_dev = time.perf_counter() - t0
    fps_dev = BATCH * ITERS / dt_dev

    # the reference's timing definition, pipelined (best of N windows; the
    # 23.6 baseline is itself the best of 510 records). Window count/size
    # adapts to the link phase so a degraded tunnel can't hang the bench.
    from qcnn_gpu_tpu.engine.stream import measure_stream_fps

    h2d_mbps, d2h_mbps = measure_link(jax, frames)
    slow_link = min(h2d_mbps, d2h_mbps) < 30.0
    n_batches = 3 if slow_link else 8
    n_windows = 2 if slow_link else HOST_WINDOWS
    rng = np.random.default_rng(7)
    pool = [
        np.clip(
            frames.astype(np.int16) + rng.integers(-3, 4, frames.shape, np.int16),
            0,
            255,
        ).astype(np.uint8)
        for _ in range(n_batches)
    ]
    # untimed warmup of the exact streaming path (device=None keeps the
    # placement UNCOMMITTED and therefore on the already-compiled program;
    # a committed device_put would recompile inside the timed window)
    measure_stream_fps(run, pool[:1], depth=DEPTH)
    windows = []
    t_host0 = time.perf_counter()
    for _ in range(n_windows):
        windows.append(round(measure_stream_fps(run, pool, depth=DEPTH), 2))
        if time.perf_counter() - t_host0 > HOST_BUDGET_S:
            break
    fps_host = max(windows)
    # the tunnel's duplex-serialized physical cap for this frame geometry:
    # measured fps_host should sit near it when the link (not the chip)
    # is the binding constraint — that is what makes the number falsifiable
    fb = frames.nbytes / BATCH
    link_cap_fps = 1.0 / (fb / (h2d_mbps * 1e6) + fb / (d2h_mbps * 1e6))

    # 416x240 (JCT-VC class D): the reference geometry whose transfer-
    # inclusive budget FITS this dev tunnel (100KB/frame vs 2MB at 1080p).
    # Reference best there: 12.0 ms => 83.3 fps (BASELINE.md, best of 498).
    d240 = {}
    try:
        f240 = synth_frames(16, 240, 416, seed=3)
        out = run(jax.device_put(f240))
        out.block_until_ready()  # compile outside the timed window
        pool240 = [f240, np.roll(f240, 1, axis=0).copy(), f240[::-1].copy()]
        measure_stream_fps(run, pool240[:1], depth=DEPTH)
        w240 = [
            round(measure_stream_fps(run, pool240, depth=DEPTH), 2)
            for _ in range(2 if slow_link else 4)
        ]
        fb2 = f240.nbytes / 16
        d240 = {
            "fps_incl_host_transfers_416x240": max(w240),
            "vs_baseline_416x240": round(max(w240) / 83.3, 2),
            "baseline_fps_416x240": 83.3,
            "windows_416x240": w240,
            "link_duplex_cap_fps_416x240": round(
                1.0 / (fb2 / (h2d_mbps * 1e6) + fb2 / (d2h_mbps * 1e6)), 1
            ),
        }
    except Exception as e:
        d240 = {"fps_incl_host_transfers_416x240": f"error: {type(e).__name__}"}

    print(
        json.dumps(
            {
                "metric": "1080p YUV frames/sec/chip (INT8 QVRCNN forward_blu, sustained device throughput)",
                "value": round(fps_dev, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps_dev / BASELINE_FPS, 2),
                "detail": {
                    "impl": run.impl,
                    "exact_vs_xla_on_hw": exact,
                    "batch": BATCH,
                    "iters": ITERS,
                    "ms_per_frame_device": round(1000 * dt_dev / (BATCH * ITERS), 3),
                    "fps_incl_host_transfers": round(fps_host, 2),
                    "fps_incl_host_transfers_vs_baseline": round(fps_host / BASELINE_FPS, 2),
                    "host_windows_fps": windows,
                    "stream_depth": DEPTH,
                    "h2d_mbps": h2d_mbps,
                    "d2h_mbps": d2h_mbps,
                    "link_duplex_cap_fps": round(link_cap_fps, 2),
                    **d240,
                    "link_note": "dev TPU behind a network tunnel; 23.6fps needs ~100MB/s agg",
                    "backend": jax.default_backend(),
                    "baseline_fps": BASELINE_FPS,
                    "baseline_note": "reference best-of-510 1080p e2e 42.4ms (Debug build, log.txt)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
