"""Fused whole-network Pallas kernel: the QVRCNN pipeline in one pass.

Replaces the per-layer cuDNN launches + VECT_C shuffles of the reference
engine (qvrcnn.cu:168-242) with ONE TPU kernel per frame tile: every
intermediate activation lives its whole life in VMEM, so HBM traffic is
frames in / residuals out (the XLA path rereads multi-GB lane-padded
intermediates from HBM at every stage).

Design:
  * grid over tiles; each program computes an output tile of (th, tw)
    residual accumulators from a halo-extended (th+12, we) input window
    (12 = 2*RECEPTIVE_RADIUS, we = tw + 12)
  * activations are flat [px, C] with px = row*we + col; a conv tap
    (dy, dx) is a SUBLANE-OFFSET SLICE at dy*we + dx — no im2col tensors,
    no reshapes. Row-crossing garbage lands in a tail of columns that the
    shrinking valid width never reads.
  * stage convs are MXU matmuls [px, K] @ [K, Cout] with TWO TAPS PACKED
    along K (K=128 for the 64-channel stage); bf16 x bf16 -> f32, exact
    under the load-time certificate (models/qvrcnn.py)
  * stage 1 (Cin=1, MXU-hostile) runs channel-major — W1 [64, 32taps] @
    A1 [32taps, px] — then transposes once to the [px, C] convention
  * integer epilogues (bias, BLU, requant — SURVEY.md §5.1) run in int32
    on the VPU between matmuls, bit-identical to ops/requant.py

The final scalar residual requant + clamp runs in XLA outside the kernel
(it needs the original uint8 frame; one cheap fused elementwise pass).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qcnn_gpu_tpu.models.oracle import EngineParams
from qcnn_gpu_tpu.models.qvrcnn import MergedParams

HALO = 6  # network receptive radius (models/topology.py)
PAD = 2 * HALO


def _flat_taps(w: np.ndarray, k: int) -> np.ndarray:
    """[k,k,Cin,Cout] -> [k*k, Cin, Cout] (row-major tap order)."""
    return np.ascontiguousarray(w.reshape(k * k, w.shape[2], w.shape[3]))


@dataclasses.dataclass(frozen=True)
class PackedWeights:
    w1: jnp.ndarray  # [64, 32] bf16 — S1 channel-major, taps along K (25 used)
    b1cm: jnp.ndarray  # [64, 1] i32
    q1cm: Tuple[jnp.ndarray, ...]  # channel-major requant vectors [64, 1]
    w2p: jnp.ndarray  # [25, 64, 48] bf16 (flat taps)
    w3p: jnp.ndarray  # [9, 48, 48] bf16
    w4p: jnp.ndarray  # [9, 48, 8] bf16 (Cout 1 padded to 8)
    b1: jnp.ndarray  # [1, 64] i32
    b2: jnp.ndarray
    b3: jnp.ndarray
    b4: jnp.ndarray  # [1, 8] i32
    q1: Tuple[jnp.ndarray, ...]  # (blu_q, mul, bias_pre, shift) [1, C] i32
    q2: Tuple[jnp.ndarray, ...]
    q3: Tuple[jnp.ndarray, ...]
    mul4: int
    shift4: int

    @classmethod
    def from_engine(cls, p: EngineParams) -> "PackedWeights":
        mp = MergedParams.from_engine(p)
        w = [np.asarray(x, dtype=np.float32) for x in mp.w_i8]

        w1 = w[0][..., 0, :].reshape(25, 64)  # [25, 64]
        w1 = np.pad(w1, ((0, 7), (0, 0))).T  # -> [64, 32], K 25 -> 32

        w4 = np.pad(w[3], ((0, 0), (0, 0), (0, 0), (0, 7)))

        def q(i):
            return tuple(
                jnp.asarray(np.asarray(v)[None, :], dtype=jnp.int32)
                for v in (mp.blu_q[i], mp.mul[i], mp.bias_pre[i], mp.shift[i])
            )

        b = [np.asarray(x, dtype=np.int32) for x in mp.b_i32]
        q1cm = tuple(
            jnp.asarray(np.asarray(v)[:, None], dtype=jnp.int32)
            for v in (mp.blu_q[0], mp.mul[0], mp.bias_pre[0], mp.shift[0])
        )
        return cls(
            w1=jnp.asarray(w1, dtype=jnp.bfloat16),
            b1cm=jnp.asarray(b[0][:, None], dtype=jnp.int32),
            q1cm=q1cm,
            w2p=jnp.asarray(_flat_taps(w[1], 5), dtype=jnp.bfloat16),
            w3p=jnp.asarray(_flat_taps(w[2], 3), dtype=jnp.bfloat16),
            w4p=jnp.asarray(_flat_taps(w4, 3), dtype=jnp.bfloat16),
            b1=jnp.asarray(b[0][None, :], dtype=jnp.int32),
            b2=jnp.asarray(b[1][None, :], dtype=jnp.int32),
            b3=jnp.asarray(b[2][None, :], dtype=jnp.int32),
            b4=jnp.asarray(np.pad(b[3], (0, 7))[None, :], dtype=jnp.int32),
            q1=q(0),
            q2=q(1),
            q3=q(2),
            mul4=mp.mul4,
            shift4=mp.shift4,
        )

    def consts(self):
        return [
            self.w1, self.w2p, self.w3p, self.w4p,
            self.b1cm, self.b2, self.b3, self.b4,
            *self.q1cm, *self.q2, *self.q3,
        ]


def _requant_vec(u_i32, blu_q, mul, bias_pre, shift):
    mid = jnp.right_shift((u_i32 + bias_pre) * mul, shift)
    return jnp.where(u_i32 > blu_q, 127, jnp.where(u_i32 < 0, 0, mid))


def _stage(v_ref, w_ref, n_taps, we, m_out, b_i32, qvec, mask=None, unroll=False,
           requant=None):
    """One merged conv stage (+ optional integer epilogue).

    v_ref: VMEM ref [M_in, Cin] flat; tap (dy,dx) is a MEMORY load at
    sublane offset dy*we + dx (value slices carry layout offsets Mosaic
    cannot recombine). w_ref: VMEM ref [n_taps, Cin, Cout].

    unroll=False: fori over rows with an aligned dynamic load per dy
    (dy*we is a lane-width multiple; Mosaic rejects dynamic unaligned
    offsets) and the k static dx shifts unrolled inside — small code,
    small stack.
    unroll=True: one load of the whole buffer, all k*k taps as static
    value slices — bigger stack (needs the raised vmem limit) but lets
    Mosaic software-pipeline the dot chain.
    """
    k = int(round(float(n_taps) ** 0.5))
    cout = w_ref.shape[2]

    acc_dtype = jnp.int32 if v_ref.dtype == jnp.int8 else jnp.float32

    if unroll:
        base = v_ref[...]
        acc = jnp.zeros((m_out, cout), dtype=acc_dtype)
        for dy in range(k):
            for dx in range(k):
                off = dy * we + dx
                acc = acc + jnp.dot(
                    base[off : off + m_out, :],
                    w_ref[dy * k + dx],
                    preferred_element_type=acc_dtype,
                )
    else:

        def body(dy, acc):
            base = pl.multiple_of(dy * we, 8)
            a_dy = v_ref[pl.ds(base, m_out + 8), :]
            for dx in range(k):
                wt = w_ref[dy * k + dx]
                acc = acc + jnp.dot(
                    a_dy[dx : dx + m_out, :], wt, preferred_element_type=acc_dtype
                )
            return acc

        acc = jax.lax.fori_loop(
            0, k, body, jnp.zeros((m_out, cout), dtype=acc_dtype)
        )
    u = acc.astype(jnp.int32) + b_i32 if acc_dtype != jnp.int32 else acc + b_i32
    if qvec is None:
        return u
    v = (requant or _requant_vec)(u, *qvec).astype(v_ref.dtype)
    # zero tail: the next stage's flat tap slices over-run by up to k-1
    # elements (row-crossing of the last row's garbage columns)
    v = jnp.pad(v, ((0, 8), (0, 0)))
    return mask(v) if mask is not None else v


def _make_kernel(th: int, we: int, mul4: int, shift4: int):
    m1 = (th + 8) * we
    m2 = (th + 4) * we
    m3 = (th + 2) * we
    m4 = th * we
    # u4*mul4 must stay in int32: |u4| < 2^24 by the exactness certificate,
    # so mul4 <= 127 suffices (shipped tables: mul4 in {1,5,7,13})
    assert mul4 <= 127, f"final mul {mul4} too large for int32 requant"

    def kernel(
        a1t_ref,  # [1,1,1, 32, m1] bf16 — transposed S1 im2col from XLA:
        #           row t = x window flattened, shifted by tap t's offset.
        #           Lanes = pixels => NO 128-lane padding blowup in HBM
        #           (the [m1, 32] orientation padded 32->128 and OOM'd).
        mk1_ref,  # [1,1, m1+8, 1] bf16 frame-edge mask at v1's origin.
        #           v2/v3 masks are OFFSET SLICES of the same vector:
        #           shifting by d*(we+1) re-bases the origin by d pixels
        #           diagonally; the row/col misattribution near row ends
        #           lands only in garbage-tail columns no stage reads.
        w1_ref, w2p_ref, w3p_ref, w4p_ref,
        b1cm_ref, b2_ref, b3_ref, b4_ref,
        q1b_ref, q1m_ref, q1p_ref, q1s_ref,
        q2b_ref, q2m_ref, q2p_ref, q2s_ref,
        q3b_ref, q3m_ref, q3p_ref, q3s_ref,
        out_ref,
        v1s, v2s, v3s,  # VMEM scratch: staged activations
    ):
        # The engine zero-pads at EVERY layer (SAME), so halo pixels beyond
        # a frame edge must read as 0 to the next conv — not as
        # requant(conv(0)+b). The 0/1 masks are precomputed per tile in XLA
        # (in-kernel [m,1] iota masks blow VMEM: lane-padded to [m,128]).

        # ---- S1 channel-major + one transpose to the [px, C] convention --
        u1 = jnp.dot(
            w1_ref[...], a1t_ref[0, 0, 0], preferred_element_type=jnp.float32
        )  # [64, m1]
        v1 = _requant_vec(
            u1.astype(jnp.int32) + b1cm_ref[...],
            q1b_ref[...], q1m_ref[...], q1p_ref[...], q1s_ref[...],
        )
        v1 = jnp.transpose(v1.astype(jnp.bfloat16))  # [m1, 64]
        v1 = jnp.pad(v1, ((0, 8), (0, 0)))  # [m1+8, 64]
        v1s[...] = v1 * mk1_ref[0, 0]

        # ---- S2 / S3 ----
        s2_shift = 2 * we + 2  # v2 origin is 2px diagonal from v1's
        s3_shift = 3 * we + 3
        v2s[...] = _stage(
            v1s, w2p_ref, 25, we, m2, b2_ref[...],
            (q2b_ref[...], q2m_ref[...], q2p_ref[...], q2s_ref[...]),
            mask=lambda v: v * mk1_ref[0, 0, s2_shift : s2_shift + m2 + 8, :],
        )
        v3s[...] = _stage(
            v2s, w3p_ref, 9, we, m3, b3_ref[...],
            (q3b_ref[...], q3m_ref[...], q3p_ref[...], q3s_ref[...]),
            mask=lambda v: v * mk1_ref[0, 0, s3_shift : s3_shift + m3 + 8, :],
        )

        # ---- S4 (linear) + final residual requant (cnn.cu:507-523) ----
        u4 = _stage(v3s, w4p_ref, 9, we, m4, b4_ref[...], None)
        res = jnp.right_shift(u4[:, 0:1] * mul4 + (1 << (shift4 - 1)), shift4)
        # clamp to [-255, 255] => int16 output (halves the out-block VMEM);
        # clip(x + clip(res,-255,255), 0, 255) == clip(x + res, 0, 255)
        out_ref[0, 0, 0] = jnp.clip(res, -255, 255).astype(jnp.int16)

    return kernel


def _edge_masks(nh, nw, th, tw, we, h, w, m_rows, off):
    """Per-tile 0/1 frame-validity masks [nh, nw, m_rows, 1] bf16 for a
    stage buffer with origin offset `off` (pixels above/left of the tile
    origin). Pixel p of tile (hi, wi) maps to global (hi*th - off + p//we,
    wi*tw - off + p%we); outside-frame pixels get 0."""
    px = jnp.arange(m_rows)
    gr = jnp.arange(nh)[:, None, None] * th - off + (px // we)[None, None, :]
    gc = jnp.arange(nw)[None, :, None] * tw - off + (px % we)[None, None, :]
    ok = (gr >= 0) & (gr < h) & (gc >= 0) & (gc < w)
    return ok.astype(jnp.bfloat16)[..., None]


def _window(xp, th, tw, he, we, nh, nw):
    """[B, Hpad, Wpad] -> overlapping windows [B, nh, nw, he, we]."""
    rows = jnp.arange(nh)[:, None] * th + jnp.arange(he)[None, :]
    cols = jnp.arange(nw)[:, None] * tw + jnp.arange(we)[None, :]
    xw = xp[:, rows, :][:, :, :, cols]  # [B, nh, he, nw, we]
    return xw.transpose(0, 1, 3, 2, 4)


def build_pallas_forward(
    p: EngineParams, th: int = 8, we: int = 256, interpret: bool = False
):
    """Fused restorer: fn(uint8 [B, H, W]) -> uint8 [B, H, W], bit-exact
    vs the oracle (tested on random frames at every geometry)."""
    pw = PackedWeights.from_engine(p)
    tw = we - PAD
    he = th + PAD
    m4 = th * we
    consts = pw.consts()

    @jax.jit
    def run(x_uint8):
        b, h, w = x_uint8.shape
        nh = -(-h // th)
        nw = -(-w // tw)
        hp, wp = nh * th, nw * tw
        x = x_uint8.astype(jnp.int32) - 128
        xp = jnp.pad(x, ((0, 0), (HALO, HALO + hp - h), (HALO, HALO + wp - w)))
        xw = _window(xp, th, tw, he, we, nh, nw)

        # S1 im2col in XLA, TRANSPOSED [B, nh, nw, 32, m1] (lanes = pixels,
        # no lane-pad blowup); flat-px tap slices identical to the
        # in-kernel convention (incl. garbage tails)
        m1 = (th + 8) * we
        flat = jnp.pad(
            xw.reshape(b, nh, nw, he * we).astype(jnp.bfloat16),
            ((0, 0), (0, 0), (0, 0), (0, 8)),
        )
        taps = [
            flat[..., dy * we + dx : dy * we + dx + m1]
            for dy in range(5)
            for dx in range(5)
        ]
        a1t = jnp.stack(taps, axis=3)  # [B, nh, nw, 25, m1]
        a1t = jnp.pad(a1t, ((0, 0), (0, 0), (0, 0), (0, 7), (0, 0)))

        masks = [_edge_masks(nh, nw, th, tw, we, h, w, m1 + 8, 4)]
        mask_specs = [
            pl.BlockSpec(
                (1, 1, mk.shape[2], 1),
                lambda bi, hi, wi: (hi, wi, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for mk in masks
        ]

        kernel = _make_kernel(th, we, pw.mul4, pw.shift4)
        out = pl.pallas_call(
            kernel,
            grid=(b, nh, nw),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 1, 32, m1),
                    lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            + mask_specs
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in consts],
            out_specs=pl.BlockSpec(
                (1, 1, 1, m4, 1),
                lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, nh, nw, m4, 1), jnp.int16),
            scratch_shapes=[
                pltpu.VMEM((m1 + 8, 64), jnp.bfloat16),
                pltpu.VMEM(((th + 4) * we + 8, 48), jnp.bfloat16),
                pltpu.VMEM(((th + 2) * we + 8, 48), jnp.bfloat16),
            ],
            interpret=interpret,
        )(a1t, *masks, *consts)

        res = out.reshape(b, nh, nw, th, we)[..., :tw]
        res = res.transpose(0, 1, 3, 2, 4).reshape(b, hp, wp)[:, :h, :w]
        rec = x_uint8.astype(jnp.int32) + res.astype(jnp.int32)
        return jnp.clip(rec, 0, 255).astype(jnp.uint8)

    run.geometry = (th, we, tw)
    run.packed = pw
    return run
