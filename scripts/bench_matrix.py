"""Multi-resolution, multi-implementation benchmark matrix.

Covers the reference's six benchmarked geometries (BASELINE.md, from
inference/log.txt) across the engine's implementations, writing a JSON
report. The headline single-line bench stays in bench.py; this is the
deep record for optimization work.

    python scripts/bench_matrix.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


# (H, W, reference best-observed ms from log.txt)
GEOMETRIES = [
    (240, 416, 12.0),
    (480, 832, 11.9),
    (720, 1280, 20.3),
    (1080, 1920, 42.4),
    (1600, 2560, 72.7),
    (2160, 3840, 155.7),
]


def main(out_path="bench_matrix.json"):
    import jax

    from qcnn_gpu_tpu.models.qvrcnn import make_forward
    from qcnn_gpu_tpu.ops.tuning import build_tuned, tuned_kwargs
    from qcnn_gpu_tpu.testing import synth_engine_params, synth_frames

    p = synth_engine_params(37)
    report = {
        "backend": jax.default_backend(),
        "kernel_config": tuned_kwargs(),  # measure what ships
        "device_ms_per_frame": {},
    }

    # per-GEOMETRY builders: the tuned table carries per-geometry-class
    # tile configs (ops/tuning.tuned_kwargs(h, w)), so each geometry gets
    # the program the production engine would serve it with
    builders = {
        "pallas3": lambda h, w: build_tuned(p, kernel=3, h=h, w=w),
        "pallas2": lambda h, w: build_tuned(p, kernel=2, h=h, w=w),
        "xla": lambda h, w: make_forward(p, impl="auto"),
    }
    only = os.environ.get("BENCH_IMPLS")  # e.g. "pallas2" or "xla,pallas2"
    if only:
        builders = {k: v for k, v in builders.items() if k in only.split(",")}

    for name, mk in builders.items():
        rows = {}
        for h, w, ref_ms in GEOMETRIES:
            batch = max(2, min(8, (1 << 21) // (h * w // 512)))
            batch += batch % 2
            try:
                run = mk(h, w)
            except Exception as e:  # noqa: BLE001
                rows[f"{w}x{h}"] = {"build_error": str(e)[:200]}
                continue
            try:
                x = jax.device_put(synth_frames(batch, h, w, seed=1))
                o = run(x)
                jax.block_until_ready(o)
                n = 8
                t0 = time.perf_counter()
                for _ in range(n):
                    o = run(x)
                jax.block_until_ready(o)
                ms = (time.perf_counter() - t0) / (n * batch) * 1000
                rows[f"{w}x{h}"] = {
                    "ms_per_frame": round(ms, 3),
                    "fps": round(1000 / ms, 1),
                    "ref_best_ms": ref_ms,
                    "speedup_vs_ref": round(ref_ms / ms, 2),
                    "batch": batch,
                }
                print(f"{name} {w}x{h}: {ms:.2f} ms/frame ({1000/ms:.0f} fps, "
                      f"{ref_ms/ms:.1f}x ref)", flush=True)
            except Exception as e:  # noqa: BLE001
                # whole-frame compile rejected (remote toolchains cap XLA
                # graph size ~1080p): measure the bit-exact host-tiled
                # fallback the engine uses for this geometry instead
                try:
                    from qcnn_gpu_tpu.engine.tiled import restore_tiled

                    xh = np.asarray(synth_frames(batch, h, w, seed=1))
                    restore_tiled(run, xh)  # warm the tile-shape compile
                    n = 4
                    t0 = time.perf_counter()
                    for _ in range(n):
                        o = restore_tiled(run, xh)
                    ms = (time.perf_counter() - t0) / (n * batch) * 1000
                    rows[f"{w}x{h}"] = {
                        "ms_per_frame": round(ms, 3),
                        "fps": round(1000 / ms, 1),
                        "ref_best_ms": ref_ms,
                        "speedup_vs_ref": round(ref_ms / ms, 2),
                        "batch": batch,
                        "tiled": True,
                    }
                    print(f"{name} {w}x{h}: {ms:.2f} ms/frame tiled "
                          f"({1000/ms:.0f} fps, {ref_ms/ms:.1f}x ref)", flush=True)
                except Exception as e2:  # noqa: BLE001
                    rows[f"{w}x{h}"] = {"error": str(e)[:200],
                                        "tiled_error": str(e2)[:200]}
                    print(f"{name} {w}x{h}: FAIL {str(e)[:120]}", flush=True)
        report["device_ms_per_frame"][name] = rows
        with open(out_path, "w") as fp:  # incremental: survive timeouts
            json.dump(report, fp, indent=1)

    # batch-scaling curve @1080p on the shipping kernel (multi-chip
    # projections need a measured per-chip batch basis)
    curve = {}
    runs = {}

    def run_for(b):
        """Batch-aware tuned build (the tuned table carries a batch-1
        override: the latency winner differs from the throughput
        winner), cached per kwargs so equal configs share one compile."""
        kw = tuple(sorted(tuned_kwargs(h=1080, w=1920, batch=b).items()))
        if kw not in runs:
            runs[kw] = build_tuned(p, h=1080, w=1920, batch=b)
        return runs[kw]

    if True:
        for b in (1, 2, 4, 8, 16):
            try:
                run = run_for(b)
                x = jax.device_put(synth_frames(b, 1080, 1920, seed=2))
                o = run(x)
                jax.block_until_ready(o)
                n = 8 if b > 1 else 16
                t0 = time.perf_counter()
                for _ in range(n):
                    o = run(x)
                jax.block_until_ready(o)
                ms = (time.perf_counter() - t0) / (n * b) * 1000
                curve[b] = {"ms_per_frame": round(ms, 3), "fps": round(1000 / ms, 1)}
                print(f"batch {b} @1080p: {ms:.2f} ms/frame", flush=True)
            except Exception as e:  # noqa: BLE001
                # per-batch isolation: one compile-helper flake must not
                # drop the measured points with it
                curve[b] = {"error": str(e)[:160]}
    report["batch_scaling_1080p"] = curve

    with open(out_path, "w") as fp:
        json.dump(report, fp, indent=2)
    print(f"-> {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
