"""MXU rate probe — KNOWN-UNRELIABLE on this stack; see caveat.

CAVEAT (r4, measured): every formulation tried here reports ABOVE-PEAK
throughput on the v5e behind the axon tunnel (596-685 bf16 "TFLOPs" vs
the chip's 197 peak) — XLA factors sum-of-dots over a shared operand
into dot(a, sum(w)), hoists loop-invariant grid steps, and even the
serial weight-dependency variant below still gets partially elided.
Numbers from this script must NOT feed MFU accounting. The reliable
methodology is differencing the production kernel's own stage
truncations: scripts/stage_marginals.py. This file is kept as the
record of what was tried and why it fails.

One result here that IS usable (relative, both paths equally elided):
int8 and bf16 operands time the same => no 2x int8 pass on this
chip+toolchain.
Run ON TPU:  python scripts/mfu_probe.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 2048  # rows per dot
CHAIN = 16  # distinct-weight dots per grid step
GRID = 32


def build(acc_dtype, n, k):
    def kernel(a_ref, w_ref, o_ref):
        a = a_ref[0]
        acc = jnp.zeros((M, n), acc_dtype)
        s = jnp.zeros((), acc_dtype)
        for c in range(CHAIN):
            # serial dependency THROUGH THE WEIGHTS: wc derives from the
            # previous dot's output scalar, so the chain cannot be factored
            # into dot(a, sum(w)) or reordered; the [k, n] weight update is
            # ~k/8 VPU cycles — negligible next to the M-row pass
            wc = (w_ref[c].astype(acc_dtype) + s).astype(w_ref.dtype)
            acc += jnp.dot(a, wc, preferred_element_type=acc_dtype)
            s = (
                acc[0, 0] % jnp.asarray(3, acc_dtype)
                if acc_dtype == jnp.int32
                else acc[0, 0] * jnp.asarray(1e-30, acc_dtype)
            )
        o_ref[...] = acc

    @jax.jit
    def run(a, w):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((1, M, k), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((CHAIN, k, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, n), acc_dtype),
        )(a, w)

    return run


def probe(dtype, acc_dtype, n=128, k=128, iters=8):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(-4, 5, (GRID, M, k)), dtype=dtype)
    w = jnp.asarray(rng.integers(-4, 5, (CHAIN, k, n)), dtype=dtype)
    run = build(acc_dtype, n=n, k=k)
    out = run(a, w)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(a, w)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    macs = M * k * n * CHAIN * GRID
    rows = M * CHAIN * GRID
    return {
        "tops": round(2 * macs / dt / 1e12, 1),
        "ms": round(dt * 1e3, 3),
        "rows_per_cycle_at_940mhz": round(rows / dt / 0.94e9, 2),
    }


def main():
    dev = jax.devices()[0]
    out = {"device_kind": dev.device_kind, "platform": dev.platform,
           "M": M, "chain": CHAIN, "grid": GRID}
    cases = [
        ("bf16_f32", jnp.bfloat16, jnp.float32, 128, 128),
        ("int8_i32", jnp.int8, jnp.int32, 128, 128),
        ("f32_f32", jnp.float32, jnp.float32, 128, 128),
        # the fused kernel's real pass shapes: cost should be ~row-
        # structural (independent of K/N utilization) if the pass model
        # holds
        ("int8_k128_n96", jnp.int8, jnp.int32, 96, 128),
        ("int8_k96_n96", jnp.int8, jnp.int32, 96, 96),
        ("int8_k96_n8", jnp.int8, jnp.int32, 8, 96),
        ("bf16_k96_n96", jnp.bfloat16, jnp.float32, 96, 96),
    ]
    for name, dtype, acc, n, k in cases:
        try:
            out[name] = probe(dtype, acc, n=n, k=k)
        except Exception as e:  # noqa: BLE001
            out[name] = f"error: {str(e)[:120]}"
        print(f"{name}: {out[name]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
