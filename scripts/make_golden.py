"""Golden-PSNR closure on real photographic content (VERDICT r1 #4).

The reference's verification culture is golden-PSNR regression: run the
INT8 engine over known anchors and compare per-sequence PSNR against
committed doubles (kernel.cu:105-115, psnr_static_*.data). Its own HEVC
anchors and int8 weight binaries are not shipped, so this repo closes the
loop with the materials available offline:

  * clip: a deterministic camera pan over the one real photograph in the
    environment (matplotlib's grace_hopper.jpg, 512x600 luma), cropped to
    416x240 — the reference's JCT-VC class D geometry;
  * degradation: PIL JPEG at four qualities mapped to the reference QP set
    {22,27,32,37}. JPEG is 8x8 DCT coefficient quantization — the same
    intra-coding artifact family (blocking/ringing) HEVC intra produces;
  * per QP: train float VRCNN with the repo's own toolkit (train ->
    calibrate -> solve fixed-point table -> shadow-weight finetune ->
    quantize), write the byte-compatible static-qfp engine model, and
    record the INT8 oracle's held-out PSNR as the golden.

Artifacts (committed under assets/golden/):
  model_q{qp}.data            static-qfp NCHW_VECT_C engine model
  psnr_golden.json            {qp: {before, after}} on the held-out frames
  psnr_static_hopper_{qp}.data  goldens in the reference's binary format
                                (little-endian doubles, read_psnr_goldens)

tests/test_golden_psnr.py regenerates the clip+anchors deterministically
and asserts the ENGINE (not the oracle) reproduces the goldens to
±0.01 dB — an end-to-end ±1-LSB regression tripwire.

Run on CPU (deterministic):
    env JAX_PLATFORM_NAME=cpu python scripts/make_golden.py
"""

import argparse
import json
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qcnn_gpu_tpu.data.golden import (  # noqa: E402
    N_EVAL,
    QP_QUALITY,
    golden_clip,
    jpeg_anchor,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--decay-steps", type=int, default=2000,
                    help="extra steps at lr/5 (the reference trains 30 "
                         "epochs; a plain two-stage schedule suffices here)")
    ap.add_argument("--finetune-steps", type=int, default=800)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--out-dir", default="assets/golden")
    ap.add_argument("--wbits", type=int, default=8, choices=(4, 8),
                    help="weight grid: 8 = the reference's INT8 path; 4 = "
                         "the INT4 stretch variant (coarser shadow-weight "
                         "grid, same train->solve->finetune->quantize loop; "
                         "artifacts get an _int4 suffix)")
    ap.add_argument("--qps", type=int, nargs="*", default=None,
                    help="subset of QPs (default: all four)")
    ap.add_argument("--per-channel", dest="per_channel", action="store_true",
                    default=None,
                    help="per-output-channel stepw + (mul, shift) "
                         "(quant/solver.solve_network_per_channel); the "
                         "default for --wbits 4, where the layer-wide grid "
                         "starves small channels")
    ap.add_argument("--no-per-channel", dest="per_channel", action="store_false")
    args = ap.parse_args()
    if args.per_channel is None:
        args.per_channel = args.wbits == 4
    suffix = "" if args.wbits == 8 else f"_int{args.wbits}"

    from qcnn_gpu_tpu.data import yuv
    from qcnn_gpu_tpu.data.datasets import PatchDataset
    from qcnn_gpu_tpu.data.model_files import (
        write_static_qfp_pc,
        write_static_qfp_vect_c,
    )
    from qcnn_gpu_tpu.engine.calibrate import (
        calibrate_blu_bounds,
        quantize_model,
        solve_table,
    )
    from qcnn_gpu_tpu.models import oracle as O
    from qcnn_gpu_tpu.parallel.mesh import make_mesh
    from qcnn_gpu_tpu.train.finetune import quant_finetune
    from qcnn_gpu_tpu.train.trainer import TrainConfig, Trainer

    os.makedirs(args.out_dir, exist_ok=True)
    clean_tr, clean_ev = golden_clip()
    goldens = {}
    qps = args.qps or list(QP_QUALITY)
    for qp, quality in QP_QUALITY.items():
        if qp not in qps:
            continue
        anchor_tr = jpeg_anchor(clean_tr, quality)
        anchor_ev = jpeg_anchor(clean_ev, quality)
        before = yuv.psnr(anchor_ev, clean_ev)
        print(f"QP{qp} (jpeg q{quality}): anchor {before:.3f} dB; training...",
              flush=True)

        ds = PatchDataset([(clean_tr, anchor_tr)], patch=64, seed=qp)
        tr = Trainer(TrainConfig(lr=args.lr, batch_size=args.batch,
                                 log_every=400, seed=qp), mesh=make_mesh(1, 1))
        tr.fit_batches(ds.batches(args.batch, args.steps))
        if args.decay_steps:
            tr = Trainer(
                TrainConfig(lr=args.lr / 5, batch_size=args.batch,
                            log_every=400, seed=qp),
                mesh=tr.mesh, params=tr.params,
            )
            tr.fit_batches(ds.batches(args.batch, args.decay_steps))

        blu = calibrate_blu_bounds(tr.params, anchor_tr[:4])
        table = solve_table(tr.params, blu_bounds=blu, wbits=args.wbits,
                            per_channel=args.per_channel)
        ft = quant_finetune(
            tr.params, table.stepw, tr.mesh,
            ds.batches(args.batch, args.finetune_steps),
            blu_ub=table.blu_adj, lr=args.lr * 0.1, log_every=400,
            wbits=args.wbits,
        )
        ep = quantize_model(ft, table, wbits=args.wbits)
        writer = write_static_qfp_pc if args.per_channel else write_static_qfp_vect_c
        writer(os.path.join(args.out_dir, f"model_q{qp}{suffix}.data"), ep)

        rec = O.forward_blu(anchor_ev, ep)
        after = yuv.psnr(rec, clean_ev)
        goldens[qp] = {"before": round(before, 6), "after": round(after, 6)}
        if args.wbits != 8:
            # the INT4 set may mix solvers per QP (measured best wins;
            # see PARITY round-5: per-channel helps three QPs, hurts QP27)
            goldens[qp]["per_channel"] = bool(args.per_channel)
        print(f"QP{qp}: {before:.3f} -> {after:.3f} dB "
              f"({after - before:+.3f})", flush=True)
        with open(os.path.join(args.out_dir,
                               f"psnr_static_hopper_{qp}{suffix}.data"), "wb") as fp:
            fp.write(struct.pack("<2d", before, after))

    # merge with any existing goldens file so partial runs (--qps) extend
    # rather than replace the committed set
    out_json = os.path.join(args.out_dir, f"psnr_golden{suffix}.json")
    merged = {}
    if os.path.exists(out_json):
        with open(out_json) as fp:
            merged = json.load(fp).get("goldens", {})
    merged.update({str(k): v for k, v in goldens.items()})
    with open(out_json, "w") as fp:
        json.dump(
            {
                "clip": "grace_hopper pan 416x240",
                "frames_eval": N_EVAL,
                "qp_quality": QP_QUALITY,
                "wbits": args.wbits,
                "goldens": merged,
            },
            fp,
            indent=1,
        )
    print(json.dumps(goldens))


if __name__ == "__main__":
    main()
