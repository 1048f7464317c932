"""Measure the fused kernel's per-stage marginal costs ON HARDWARE.

The reliable utilization methodology for this stack (r4): build the v3
kernel truncated at each stage (`stages` knob) and difference the
timings. Synthetic MXU-rate probes are NOT trustworthy here — XLA
factors sum-of-dots over shared operands, hoists loop-invariant grid
steps, and even serially-dependent chains measured above chip peak
(see scripts/mfu_probe.py's warning); the production kernel's own
marginals are ground truth.

r4 reference numbers @1080p batch 8, th=64/we=256 (ms/frame):
  stages=1 (S1 + XLA prep + unpack): 2.366
  S2 marginal: +1.371   S3: +0.858   S4: +0.386
  ablations: zero_a1 3.731 (prep chain cut), raw_out 4.865 (no unpack),
  no_split 5.521 (masked everywhere); standalone jitted prep: 0.689.

Run ON TPU:  python scripts/stage_marginals.py [H W BATCH]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from qcnn_gpu_tpu.models import oracle as O
from qcnn_gpu_tpu.ops.pallas_pipeline3 import build_pallas_forward3
from qcnn_gpu_tpu.ops.tuning import tuned_kwargs
from qcnn_gpu_tpu.testing import synth_engine_params, synth_frames


def main(h=1080, w=1920, batch=8):
    p = synth_engine_params(37)
    x = jax.device_put(synth_frames(batch, h, w, seed=1))
    jax.block_until_ready(x)
    kw = {k: v for k, v in tuned_kwargs(h=h, w=w).items() if k != "kernel"}

    def bench(run, n=12):
        o = run(x)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(n):
            o = run(x)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / (n * batch) * 1000

    prev = None
    for st in (1, 2, 3, 4):
        run = build_pallas_forward3(p, stages=st, **kw)
        ms = bench(run)
        marg = "" if prev is None else f"  marginal +{ms - prev:.3f}"
        print(f"stages={st}: {ms:.3f} ms/frame{marg}", flush=True)
        prev = ms
    # exactness certificate for the full build that was just timed
    xh = synth_frames(2, 80, 140, seed=3)
    run = build_pallas_forward3(p, **kw)
    ok = bool((np.asarray(run(jax.device_put(xh))) == O.forward_blu(xh, p)).all())
    print(f"full kernel exact vs oracle: {ok}")
    for dbg in ("zero_a1", "raw_out", "no_split"):
        try:
            run = build_pallas_forward3(p, _debug=dbg, **kw)
            print(f"ablation {dbg}: {bench(run):.3f} ms/frame", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"ablation {dbg}: FAIL {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
