"""The inference engine runner — program cache, streaming, metrics.

Replaces the reference harness (`testqvrcnn`/`run_all`, kernel.cu:74-131)
with a TPU-first design:

  * one compiled XLA program per (qp, geometry, impl, mesh) — cached, like
    the reference reuses one built network per sequence but without
    per-layer descriptor plumbing;
  * frames stream host->device in batches with the NEXT batch's transfer
    overlapped behind the current batch's compute (JAX async dispatch +
    explicit device_put ahead of wait) — replacing the synchronous
    per-frame cudaMemcpy loop (kernel.cu:91-97);
  * per-sequence metrics to the structured log (engine/metrics.py).

Timing matches the reference's definition: wall clock around the whole
frame loop INCLUDING host<->device transfers (kernel.cu:89-101).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from qcnn_gpu_tpu.data import yuv
from qcnn_gpu_tpu.data.model_files import (
    read_static_qfp_hwcn,
    read_static_qfp_vect_c,
)
from qcnn_gpu_tpu.engine.metrics import MetricsLog, RunRecord
from qcnn_gpu_tpu.models.oracle import EngineParams
from qcnn_gpu_tpu.models.qvrcnn import make_forward


class Engine:
    def __init__(
        self,
        impl: str = "auto",
        mesh=None,
        out_dir: str = ".",
        batch_frames: int = 4,
    ):
        self.impl = impl
        self.mesh = mesh
        self.batch_frames = batch_frames
        self.metrics = MetricsLog(out_dir)
        self._models: Dict[int, EngineParams] = {}
        self._programs: Dict[Tuple, object] = {}
        # build-time kernel failures are geometry-independent (the Mosaic
        # build rejects the config itself) -> keyed by program key; call-time
        # failures are scoped per (key, geometry) so a one-off flake on one
        # frame size never demotes the fast path for every other size
        self._pallas_failed: set = set()
        self._pallas_failed_geos: set = set()
        self._tiled_geos: set = set()  # (key, (H, W)) that need host tiling
        self._duplex: Dict[Tuple, tuple] = {}  # (qp, geo, bs) -> transport
        # transport="auto" probe results: (qp, geo, bs) -> decision dict
        self.transport_decisions: Dict[Tuple, dict] = {}
        self.tile = (540, 960)  # divided_run-analog tile for the fallback

    # ---- model management (load_static_para analog, qvrcnn.cu:47-63) ----
    def load_model(self, qp: int, path: str, fmt: str = "vect_c") -> None:
        import os

        if not os.path.exists(path):
            # "cannot open model file." (qvrcnn.cu:33-36), minus the exit(1)
            raise FileNotFoundError(f"cannot open model file: {path}")
        from qcnn_gpu_tpu.data.model_files import read_static_qfp_pc

        reader = {
            "vect_c": read_static_qfp_vect_c,
            "hwcn": read_static_qfp_hwcn,
            "pc": read_static_qfp_pc,  # per-channel INT4 extension
        }[fmt]
        self._models[qp] = reader(path)
        self.reset_demotions(qp)

    def set_model(self, qp: int, params: EngineParams) -> None:
        self._models[qp] = params
        self.reset_demotions(qp)

    def reset_demotions(self, qp: Optional[int] = None) -> None:
        """Forget pallas->XLA demotions and tiling pins (for the given QP,
        or all) so transient device/compile flakes can be re-probed —
        e.g. after a model swap or when a degraded compile helper recovers."""

        def keep(entry) -> bool:
            k = entry[0] if isinstance(entry[0], tuple) else entry
            return qp is not None and k[0] != qp

        self._pallas_failed = {e for e in self._pallas_failed if keep(e)}
        self._pallas_failed_geos = {e for e in self._pallas_failed_geos if keep(e)}
        self._tiled_geos = {e for e in self._tiled_geos if keep(e)}
        self._duplex = {k: v for k, v in self._duplex.items() if keep(k)}
        if qp is None:
            self._programs.clear()
        else:
            self._programs = {
                k: v for k, v in self._programs.items() if k[0] != qp
            }

    def _program(self, qp: int, force_xla: bool = False, geo=None):
        # the tuned table may carry per-geometry tile configs; a pallas
        # program built for the 240p class must not serve 4K frames, so
        # the geometry CLASS (not the exact shape) keys the cache
        geo_cls = None
        if (
            geo is not None
            and self.mesh is None
            and not force_xla
            and (
                self.impl.startswith("pallas")
                or (self.impl == "auto" and jax.default_backend() != "cpu")
            )
        ):
            from qcnn_gpu_tpu.ops.tuning import geometry_class

            geo_cls = geometry_class(*geo)
        key = (qp, self.impl, id(self.mesh), geo_cls)
        if force_xla:
            key = key + ("xla",)
        if key not in self._programs:
            if qp not in self._models:
                raise KeyError(f"no model loaded for QP{qp}")
            if force_xla:
                # the demotion target must keep the MESH: an unsharded
                # graph would silently run the global batch on one chip
                # (and whole-frame XLA is exactly what some toolchains
                # reject — the tiling fallback is mesh-gated)
                if self.mesh is not None:
                    from qcnn_gpu_tpu.parallel.spatial import make_sharded_forward

                    self._programs[key] = make_sharded_forward(
                        self._models[qp], self.mesh, impl="xla"
                    )
                else:
                    self._programs[key] = make_forward(self._models[qp], impl="xla")
            elif self.mesh is not None:
                from qcnn_gpu_tpu.parallel.spatial import make_sharded_forward

                self._programs[key] = make_sharded_forward(
                    self._models[qp], self.mesh, impl=self.impl
                )
            elif self.impl.startswith("pallas") or (
                self.impl == "auto"
                and jax.default_backend() != "cpu"
                and key not in self._pallas_failed
            ):
                from qcnn_gpu_tpu.ops.tuning import build_tuned, tuned_kwargs

                # Mosaic kernels need a TPU; fall back to the Pallas
                # interpreter on CPU (slow but bit-identical) with a small
                # default tile so tests/dev machines exercise the same code
                # path (env QCNN_KERNEL_* still overrides; the hardware-
                # tuned FILE is skipped — its tile targets the TPU).
                interpret = jax.default_backend() == "cpu"
                kw = {"th": 8, **tuned_kwargs(use_file=False)} if interpret else {}
                if self.impl in ("pallas2", "pallas3"):
                    # explicit generation request (CLI --impl pallas2/3)
                    # beats the tuned file's `kernel` knob
                    kw["kernel"] = int(self.impl[-1])
                if geo is not None and not interpret:
                    kw.setdefault("h", geo[0])
                    kw.setdefault("w", geo[1])
                try:
                    run = build_tuned(
                        self._models[qp],
                        interpret=interpret,
                        use_file=not interpret,
                        **kw,
                    )
                except Exception:
                    # build-time failure (bad tuned config, Mosaic reject):
                    # under 'auto' demote to the XLA graph like a call-time
                    # failure would; explicit impl='pallas' propagates
                    if self.impl != "auto":
                        raise
                    self._pallas_failed.add(key)
                    return self._program(qp, geo=geo)
                run.impl = "pallas"
                self._programs[key] = run
            else:
                self._programs[key] = make_forward(self._models[qp], impl=self.impl)
        return self._programs[key]

    def _run(self, qp: int, frames):
        """Dispatch one batch. Under impl='auto' a Mosaic compile failure
        (kernel compiles happen at first call, not build) demotes THIS
        GEOMETRY of this QP's program to the XLA graph and retries — the
        same policy as bench.py, so `auto` is always the fastest path that
        works, and a flake at one frame size never costs the fast path at
        other sizes (reset_demotions re-probes).
        If the whole-frame program itself fails to compile (some remote
        toolchains reject >1080p XLA graphs), the frame is restored via
        the bit-exact host tiling path (engine/tiled.py, the divided_run
        analog) — recorded per geometry so later batches skip the probe."""
        key = (qp, self.impl, id(self.mesh))
        geo = tuple(frames.shape[-2:])
        if (key, geo) in self._tiled_geos:
            return self._run_tiled(qp, frames)
        demoted = (key, geo) in self._pallas_failed_geos
        run = self._program(qp, force_xla=demoted, geo=geo)
        self._last_impl = getattr(run, "impl", self.impl)
        try:
            return run(frames)
        except Exception:
            if (
                self.impl == "auto"
                and getattr(run, "impl", "").startswith("pallas")
                and not demoted
            ):
                self._pallas_failed_geos.add((key, geo))
                return self._run(qp, frames)
            th, tw = self.tile
            if self.mesh is None and (geo[0] > th or geo[1] > tw):
                self._tiled_geos.add((key, geo))
                return self._run_tiled(qp, frames)
            raise

    def _run_tiled(self, qp: int, frames):
        from qcnn_gpu_tpu.engine.tiled import restore_tiled

        th, tw = self.tile
        return restore_tiled(
            lambda t: self._run_whole(qp, t), np.asarray(frames), th, tw
        )

    def _run_whole(self, qp: int, frames):
        """Whole-input dispatch with the pallas->xla demotion but without
        the tiling fallback (tile inputs are already small)."""
        key = (qp, self.impl, id(self.mesh))
        geo = tuple(frames.shape[-2:])
        demoted = (key, geo) in self._pallas_failed_geos
        run = self._program(qp, force_xla=demoted, geo=geo)
        try:
            return run(frames)
        except Exception:
            if (
                self.impl != "auto"
                or not getattr(run, "impl", "").startswith("pallas")
                or demoted
            ):
                raise
            self._pallas_failed_geos.add((key, geo))
            return self._program(qp, force_xla=True)(frames)

    def profile_trace(self, trace_dir: str):
        """Context manager: capture a jax.profiler device trace of whatever
        runs inside (the TPU replacement for the reference's
        QueryPerformanceCounter wall-clock bracketing, kernel.cu:89-101)."""
        import jax.profiler

        return jax.profiler.trace(trace_dir)

    # ---- restoration ----
    def restore(self, frames: np.ndarray, qp: int) -> np.ndarray:
        """uint8 [N, H, W] -> restored uint8 [N, H, W] (blocking)."""
        return np.asarray(self._run(qp, frames))

    def restore_stream(
        self, frames: np.ndarray, qp: int, depth: int = 3, transport: str = "raw"
    ) -> np.ndarray:
        """Pipelined streaming restore: `depth` batches in flight, with
        H2D of batch i+2, compute of batch i+1, and D2H of batch i all
        overlapped (engine/stream.py). transport="duplex" additionally
        packs BOTH copies (engine/packed.py: block-sparse temporal deltas
        up, nibble residuals down — bit-exact, ~4x fewer wire bytes on
        static-camera content); any failure of the packed path falls back
        to the raw transport losslessly. transport="auto" probes the LINK
        (sustained MB/s of a real H2D+D2H round trip) against the warm
        program's device rate and picks the duplex wire exactly when the
        raw transport could not keep the device fed (link-bound) — the
        per-(geometry, link-state) selection of VERDICT r4 #5; decisions
        are recorded in self.transport_decisions."""
        if transport == "auto":
            transport = self._pick_transport(frames, qp)
        if transport == "duplex":
            try:
                return self._restore_stream_duplex(frames, qp, depth)
            except Exception:
                # raw transport is always correct — but the cached transport
                # may now be DESYNCED (the producer can run several send()
                # calls past the receive() that raised, advancing _prev/_carry
                # without _res); reusing it would decode silently wrong
                # frames, so evict it and let the next call start clean
                self._evict_duplex(qp, frames.shape[-2:])
        from qcnn_gpu_tpu.engine.stream import pipeline_restore

        n = frames.shape[0]
        bs = self.batch_frames
        # device=None -> uncommitted placement, matching warmup()/restore()
        # numpy-input dispatch: a committed device_put here would key a
        # SECOND compile of the same program inside the streaming loop
        outs = pipeline_restore(
            lambda x: self._run(qp, x),
            (frames[i : i + bs] for i in range(0, n, bs)),
            depth=depth,
            device=None,
        )
        return np.concatenate(outs, axis=0)

    def _pick_transport(self, frames: np.ndarray, qp: int) -> str:
        """Measured raw-vs-duplex decision for THIS (geometry, link phase).

        Probe (a): sustained link MB/s via a jitted +1 round trip over one
        real batch (H2D + D2H of the actual bytes — the same definition as
        bench.py's in-window ceiling, just one-shot per stream).
        Probe (b): the device rate of the warm program on device-resident
        input. Raw keeps up iff link_fps >= ~device_fps; otherwise the
        stream is link-bound and the block-sparse duplex wire wins (its
        bytes/frame are content-dependent, so the decision is the
        conservative link-bound test rather than a duplex byte model).
        Decisions + measurements land in self.transport_decisions."""
        import time

        import jax

        bs = min(self.batch_frames, frames.shape[0])
        geo = tuple(frames.shape[-2:])
        key = (qp, geo, bs)
        if key in self.transport_decisions:
            return self.transport_decisions[key]["transport"]
        x = frames[:bs]
        try:
            bump = jax.jit(lambda a: a + 1)
            np.asarray(bump(x))  # compile + first transfer outside timing
            ts = []
            for _ in range(2):
                t0 = time.perf_counter()
                np.asarray(bump(x))
                ts.append(time.perf_counter() - t0)
            link_mbps = 2 * x.nbytes / min(ts) / 1e6
            link_fps = link_mbps * 1e6 / (2 * x.nbytes / bs)
            run = self._program(qp, geo=geo)
            xd = jax.device_put(x)
            jax.block_until_ready(xd)
            jax.block_until_ready(run(xd))  # compile outside timing
            t0 = time.perf_counter()
            jax.block_until_ready(run(xd))
            dev_fps = bs / (time.perf_counter() - t0)
            choice = "duplex" if link_fps < 0.8 * dev_fps else "raw"
        except Exception:
            choice = "raw"  # probing must never break the stream
            link_mbps = link_fps = dev_fps = None
        self.transport_decisions[key] = {
            "transport": choice,
            "link_mbps": link_mbps,
            "link_fps": link_fps,
            "device_fps": dev_fps,
        }
        return choice

    def _evict_duplex(self, qp: int, geo) -> None:
        """Drop the cached duplex transport for (qp, geometry): called on
        any mid-stream failure, where producer/consumer state can be out
        of step (never reuse a possibly-desynced transport)."""
        self._duplex.pop((qp, tuple(geo), self.batch_frames), None)

    def _duplex_transport(self, qp: int, geo, bs: int):
        """Cached duplex-transport object for (qp, geometry, batch): the
        transport carries all stream state (host previous frame, residual
        carry, device carries) and its programs compile once — callers
        reuse it across restore_stream calls."""
        from qcnn_gpu_tpu.engine.packed import make_duplex_restore

        key = (qp, tuple(geo), bs)
        if key not in self._duplex:
            run = self._program(qp, geo=tuple(geo))
            self._duplex[key] = make_duplex_restore(run)
        return self._duplex[key]

    def _restore_stream_duplex(self, frames: np.ndarray, qp: int, depth: int):
        from qcnn_gpu_tpu.engine.packed import pipeline_restore_duplex

        n = frames.shape[0]
        bs = self.batch_frames
        geo = frames.shape[-2:]
        cut = (n // bs) * bs  # a ragged tail would force second step
        # compiles; it streams through the raw transport below instead
        transport = self._duplex_transport(qp, geo, bs)
        batches = [frames[i : i + bs] for i in range(0, cut, bs)]
        outs = pipeline_restore_duplex(transport, batches, depth=depth)
        self._last_impl = f"{getattr(self._program(qp, geo=tuple(geo)), 'impl', self.impl)}+duplex"
        if cut < n:
            outs.append(np.asarray(self._run(qp, frames[cut:])))
        return np.concatenate(outs, axis=0)

    def warmup(
        self, qp: int, height: int, width: int, frames: int = 1,
        transport: str = "raw",
    ) -> None:
        """Compile EVERY program shape the streaming loop will dispatch,
        ahead of the timed region (first compiles run seconds-to-minutes
        through the remote Mosaic helper). restore_stream cuts `frames`
        into batch_frames-sized batches plus a ragged tail; both shapes
        must be warm or a compile lands inside run_sequence's timed span
        — the reference times the whole frame loop (kernel.cu:89-101),
        and a compile there inflates time_us by orders of magnitude."""
        bs = self.batch_frames
        sizes = {min(bs, max(frames, 1))}
        tail = frames % bs
        if frames > bs and tail:
            sizes.add(tail)
        for n in sorted(sizes):
            np.asarray(self._run(qp, np.zeros((n, height, width), np.uint8)))
        if transport == "duplex" and frames >= bs:
            try:
                tr = self._duplex_transport(qp, (height, width), bs)
                z = np.zeros((bs, height, width), np.uint8)
                for x in (z, z):  # full step, then the all-zero packed step
                    tr.receive(x, tr.send(x))
            except Exception:
                # restore_stream falls back to the raw transport; the
                # half-warmed transport may hold advanced carries — evict
                self._evict_duplex(qp, (height, width))

    # ---- the testqvrcnn analog (kernel.cu:74-116) ----
    def run_sequence(
        self,
        name: str,
        ori_path: str,
        anchor_path: str,
        height: int,
        width: int,
        qp: int,
        frames: int = 1,
        recon_path: Optional[str] = None,
        transport: str = "raw",
    ) -> RunRecord:
        ori = yuv.read_y(ori_path, height, width, frames)
        anchor = yuv.read_y(anchor_path, height, width, frames)
        self.warmup(qp, height, width, frames, transport=transport)

        t0 = time.perf_counter()
        recon = self.restore_stream(anchor, qp, transport=transport)
        time_us = int((time.perf_counter() - t0) * 1e6)

        rec = RunRecord(
            sequence=name,
            qp=qp,
            frames=frames,
            height=height,
            width=width,
            psnr_before=yuv.psnr(anchor, ori),
            psnr_after=yuv.psnr(recon, ori),
            time_us=time_us,
            # the impl that actually served the stream (re-calling _program
            # here without the geometry could key a fresh compile)
            impl=getattr(self, "_last_impl", self.impl),
            mesh="" if self.mesh is None else "x".join(map(str, self.mesh.devices.shape)),
        )
        self.metrics.append(rec)
        if recon_path:
            yuv.write_y_as_420(recon_path, recon)
        return rec

    def run_manifest(self, specs, data_root: str, qps=(22, 27, 32, 37), **kw):
        """The run_all analog: sweep sequences x QPs (kernel.cu:117-131)."""
        records = []
        for qp in qps:
            for s in specs:
                records.append(
                    self.run_sequence(
                        s.name,
                        s.ori_path(data_root),
                        s.anchor_path(data_root, qp),
                        s.height,
                        s.width,
                        qp,
                        frames=s.frames,
                        **kw,
                    )
                )
        return records
