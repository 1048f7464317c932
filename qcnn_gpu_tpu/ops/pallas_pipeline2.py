"""Frame-pair-packed fused Pallas pipeline (v2) — fill the MXU's padding
with a second frame's work.

QVRCNN is channel-poor: K<=64, N<=48 on a 128x128 MXU, so v1's per-tile
matmuls waste 63-81% of the array, and the 128-lane VPU epilogues waste
the same on padding. v2 packs TWO FRAMES along the channel axis with
block-diagonal weights:

    stage 2:  [px, 2*64=128] @ blockdiag(w, w) [128, 2*48=96]
    stage 3:  [px, 96]       @ blockdiag(w, w) [96, 96]
    stage 4:  [px, 96]       @ blockdiag(w, w) [96, 2]

Every MXU pass and every VPU epilogue op now computes BOTH frames — the
lanes that were zero padding carry the second frame. Per-frame cost of the
dominant stages halves; nothing about the integer semantics changes (the
block-diagonal structure keeps the frames exactly independent, and the
per-channel requant vectors are just tiled x2).

Shares _stage/_edge_masks/_window/_requant_vec and all the Mosaic layout
lessons with ops/pallas_pipeline.py (v1, the single-frame variant).
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
from qcnn_gpu_tpu.ops.pallas_pipeline import (
    HALO,
    PAD,
    _edge_masks,
    _flat_taps,
    _requant_vec,
    _stage,
    _window,
)


def _blockdiag_taps(w: np.ndarray, k: int, pad_cout: int = 0) -> np.ndarray:
    """[k,k,Cin,Cout] -> [k*k, 2*Cin, 2*Cout(+pad)] block-diagonal."""
    taps = _flat_taps(w, k)  # [T, Cin, Cout]
    t, cin, cout = taps.shape
    out = np.zeros((t, 2 * cin, 2 * cout + pad_cout), dtype=taps.dtype)
    out[:, :cin, :cout] = taps
    out[:, cin:, cout : 2 * cout] = taps
    return out


@dataclasses.dataclass(frozen=True)
class PackedWeights2:
    w1: jnp.ndarray  # [64, 32] bf16 (shared by both frames)
    w2b: jnp.ndarray  # [25, 128, 96] bf16
    w3b: jnp.ndarray  # [9, 96, 96] bf16
    w4b: jnp.ndarray  # [9, 96, 8] bf16 (cols 0/1 = frame residuals)
    b1cm: jnp.ndarray  # [64, 1] i32
    q1cm: Tuple[jnp.ndarray, ...]
    b2: jnp.ndarray  # [1, 96] i32 (tiled x2)
    b3: jnp.ndarray
    b4: jnp.ndarray  # [1, 8]
    q2: Tuple[jnp.ndarray, ...]  # [1, 96] each
    q3: Tuple[jnp.ndarray, ...]
    mul4: int
    shift4: int

    @classmethod
    def from_engine(cls, p: EngineParams, dtype=None) -> "PackedWeights2":
        import jax.numpy as _jnp

        dtype = dtype if dtype is not None else _jnp.int8
        mp = MergedParams.from_engine(p)
        w = [np.asarray(x, dtype=np.float32) for x in mp.w_i8]

        w1t = np.pad(w[0][..., 0, :].reshape(25, 64), ((0, 7), (0, 0)))  # [32, 64]
        w1 = np.zeros((64, 128), np.float32)  # block-diag: taps x frames
        w1[:32, :64] = w1t
        w1[32:, 64:] = w1t

        def tile2(v):
            return jnp.asarray(np.tile(np.asarray(v), 2)[None, :], dtype=jnp.int32)

        # Folded epilogue constants (see _requant_fast): biases absorb the
        # pre-multiply rounding bias, thresholds shift accordingly.
        def q2x(i):
            bp = np.asarray(mp.bias_pre[i])
            return tuple(
                tile2(v)
                for v in (np.asarray(mp.blu_q[i]) + bp, mp.mul[i], mp.shift[i])
            )

        bp0 = np.asarray(mp.bias_pre[0])
        q1cm = tuple(
            jnp.asarray(np.tile(np.asarray(v), 2)[None, :], dtype=jnp.int32)
            for v in (
                np.asarray(mp.blu_q[0]) + bp0,
                np.broadcast_to(np.asarray(mp.mul[0]), (64,)),
                np.broadcast_to(np.asarray(mp.shift[0]), (64,)),
            )
        )
        b = [np.asarray(x, dtype=np.int32) for x in mp.b_i32]
        b1f = np.tile(b[0] + bp0, 2)
        b2f = np.asarray(mp.b_i32[1]) + np.asarray(mp.bias_pre[1])
        b3f = np.asarray(mp.b_i32[2]) + np.asarray(mp.bias_pre[2])
        b4_2 = np.zeros(8, np.int32)
        b4_2[0] = b4_2[1] = b[3][0]
        return cls(
            w1=jnp.asarray(w1, dtype=dtype),
            w2b=jnp.asarray(_blockdiag_taps(w[1], 5), dtype=dtype),
            w3b=jnp.asarray(_blockdiag_taps(w[2], 3), dtype=dtype),
            w4b=jnp.asarray(_blockdiag_taps(w[3], 3, pad_cout=6), dtype=dtype),
            b1cm=jnp.asarray(b1f[None, :], dtype=jnp.int32),
            q1cm=q1cm,
            b2=tile2(b2f),
            b3=tile2(b3f),
            b4=jnp.asarray(b4_2[None, :], dtype=jnp.int32),
            q2=q2x(1),
            q3=q2x(2),
            mul4=mp.mul4,
            shift4=mp.shift4,
        )

    def consts(self):
        return [
            self.w1, self.w2b, self.w3b, self.w4b,
            self.b1cm, self.b2, self.b3, self.b4,
            *self.q1cm, *self.q2, *self.q3,
        ]


def _requant_fast(u_folded, blu_b, mul, shift):
    """Folded BLU+requant: with u' = u + bias_pre (bias_pre absorbed into
    the conv bias) and B = blu_q + bias_pre,

        clip((min(u', B) * mul) >> shift, 0, 127)

    equals the reference chain exactly:
      * u in [0, blu_q]: min is a no-op and (u'*mul)>>shift is the
        original ((u+bias_pre)*mul)>>shift, already in [0, 127]
      * u > blu_q: min clamps to B; (B*mul)>>shift == 127 because
        blu_q*mul/2^shift in (127, 127.5] and bias_pre*mul <= 2^(shift-1)
      * u < 0: u' < bias_pre, so (u'*mul)>>shift <= 0 -> lower clip 0
        (for u' in [0, bias_pre), u'*mul < 2^(shift-1) shifts to 0)
    The two-sided clamp also prevents int32 overflow in BOTH directions
    (B*mul < 2^31; without the lower clamp a large-negative u'*mul could
    wrap positive). ~half the VPU passes of the literal chain."""
    u = jnp.clip(u_folded, 0, blu_b)
    return jnp.minimum(jnp.right_shift(u * mul, shift), 127)


def _apply_mask(v, mk):
    """Zero invalid pixels. int8 vector multiply is not legal in Mosaic
    (arith.muli on i8), so select on the mask instead."""
    if v.dtype == jnp.int8:
        return jnp.where(mk != 0, v, jnp.zeros((), jnp.int8))
    return v * mk


def _make_kernel2(th: int, we: int, mul4: int, shift4: int, unroll: bool = False,
                  stages: int = 4, wc: int = 1):
    # `stages` < 4 truncates the pipeline (perf ablation only — output is
    # then NOT the restoration result). `wc` = column-tiles per program:
    # per-program fixed overhead (grid sequencing + DMA waits, ~10us)
    # dominated at wc=1; processing wc tiles per program divides it,
    # reusing the same scratch buffers sequentially.
    m1 = (th + 8) * we
    m2 = (th + 4) * we
    m3 = (th + 2) * we
    m4 = th * we
    assert mul4 <= 127, f"final mul {mul4} too large for int32 requant"

    def kernel(
        a1t_ref,  # [1,1,wc, m1, 64]: lanes = taps x 2 frames (pixel-major)
        mk1_ref,  # [1,wc, m1+8, 1] shared frame-edge mask (spatial only)
        w1_ref, w2b_ref, w3b_ref, w4b_ref,
        b1cm_ref, b2_ref, b3_ref, b4_ref,
        q1b_ref, q1m_ref, q1s_ref,
        q2b_ref, q2m_ref, q2s_ref,
        q3b_ref, q3m_ref, q3s_ref,
        out_ref,  # [1,1,wc, 2, m4] i16 residuals, ROW per frame (lane-major:
        #           lanes = pixels, so the block is 2x{m4} not m4x{2->128
        #           lane-pad} — 256KB vs 8MB of scoped VMEM at wc=2, which
        #           is what used to OOM the wc>=2 configs at 1080p)
        v1s, v2s, v3s,
    ):
      def emit(wi, res_i32):
          # [m4, 8] i32 -> transpose (full 8x128-tile relayout, ~64KB) ->
          # keep frame rows 0:2 lane-major
          t = jnp.transpose(res_i32)
          out_ref[0, 0, wi] = jnp.clip(t[0:2, :], -255, 255).astype(jnp.int16)

      for wi in range(wc):
        # ---- S1: ONE pixel-major block-diagonal dot for both frames ----
        # a1p [m1, 64] (taps x 2 frames along K) @ w1 [64, 128] -> [m1, 128]
        # with cols 0:64 = frame A, 64:128 = frame B; no transposes.
        act_dtype = w1_ref.dtype
        acc1 = jnp.int32 if act_dtype == jnp.int8 else jnp.float32
        u1 = jnp.dot(
            a1t_ref[0, 0, wi], w1_ref[...], preferred_element_type=acc1
        )
        v1 = _requant_fast(
            u1.astype(jnp.int32) + b1cm_ref[...],
            q1b_ref[...], q1m_ref[...], q1s_ref[...],
        ).astype(act_dtype)
        v1 = jnp.pad(v1, ((0, 8), (0, 0)))
        v1s[...] = _apply_mask(v1, mk1_ref[0, wi])

        if stages <= 1:
            emit(wi, v1s[: (th * we), 0:8].astype(jnp.int32))
            continue

        # ---- S2 / S3 (both frames per op) ----
        s2_shift = 2 * we + 2
        s3_shift = 3 * we + 3
        v2s[...] = _stage(
            v1s, w2b_ref, 25, we, m2, b2_ref[...],
            (q2b_ref[...], q2m_ref[...], q2s_ref[...]),
            mask=lambda v: _apply_mask(v, mk1_ref[0, wi, s2_shift : s2_shift + m2 + 8, :]),
            unroll=unroll,
            requant=_requant_fast,
        )
        if stages <= 2:
            emit(wi, v2s[: (th * we), 0:8].astype(jnp.int32))
            continue

        v3s[...] = _stage(
            v2s, w3b_ref, 9, we, m3, b3_ref[...],
            (q3b_ref[...], q3m_ref[...], q3s_ref[...]),
            mask=lambda v: _apply_mask(v, mk1_ref[0, wi, s3_shift : s3_shift + m3 + 8, :]),
            unroll=unroll,
            requant=_requant_fast,
        )

        if stages <= 3:
            emit(wi, v3s[: (th * we), 0:8].astype(jnp.int32))
            continue

        # ---- S4 + final residual requant, both frames ----
        u4 = _stage(v3s, w4b_ref, 9, we, m4, b4_ref[...], None, unroll=unroll)
        emit(wi, jnp.right_shift(u4 * mul4 + (1 << (shift4 - 1)), shift4))

    return kernel


def build_pallas_forward2(
    p: EngineParams, th: int = 64, we: int = 256, interpret: bool = False,
    unroll: bool = True, dtype=None, stages: int = 4, wc: int = 1,
):
    """Frame-pair-packed fused restorer: fn(uint8 [B,H,W]) -> uint8 [B,H,W].
    Odd batches are padded with a zero frame internally. dtype (default
    int8) sets the activation/weight storage + MXU operand type: int8
    halves VMEM copy traffic vs bf16 and accumulates natively in int32;
    both are exact (certificate)."""
    dtype = dtype if dtype is not None else jnp.int8
    pw = PackedWeights2.from_engine(p, dtype=dtype)
    tw = we - PAD
    he = th + PAD
    m4 = th * we
    consts = pw.consts()

    @jax.jit
    def run(x_uint8):
        b0, h, w = x_uint8.shape
        b = b0 + (b0 % 2)
        if b != b0:
            x_uint8 = jnp.pad(x_uint8, ((0, 1), (0, 0), (0, 0)))
        b2 = b // 2
        nh = -(-h // th)
        nw = -(-w // tw)
        hp, wp = nh * th, nw * tw
        # ppro + cast BEFORE windowing: the gather/stack chain then moves
        # 1-byte (int8) or 2-byte data instead of int32
        x = (x_uint8.astype(jnp.int32) - 128).astype(dtype)
        xp = jnp.pad(x, ((0, 0), (HALO, HALO + hp - h), (HALO, HALO + wp - w)))
        xw = _window(xp, th, tw, he, we, nh, nw)

        m1 = (th + 8) * we
        flat = jnp.pad(
            xw.reshape(b, nh, nw, he * we),
            ((0, 0), (0, 0), (0, 0), (0, 8)),
        )
        taps = [
            flat[..., dy * we + dx : dy * we + dx + m1]
            for dy in range(5)
            for dx in range(5)
        ]
        a1t = jnp.stack(taps, axis=-1)  # [B, nh, nw, m1, 25] pixel-major
        a1t = jnp.pad(a1t, ((0, 0), (0, 0), (0, 0), (0, 0), (0, 7)))
        # pack frame pairs along the tap (lane) axis: [B2, nh, nw, m1, 64]
        a1t = (
            a1t.reshape(b2, 2, nh, nw, m1, 32)
            .transpose(0, 2, 3, 4, 1, 5)
            .reshape(b2, nh, nw, m1, 64)
        )

        masks = [_edge_masks(nh, nw, th, tw, we, h, w, m1 + 8, 4).astype(dtype)]
        mask_specs = [
            pl.BlockSpec(
                (1, wc, mk.shape[2], 1),
                lambda bi, hi, wi: (hi, wi, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for mk in masks
        ]

        nwp = -(-nw // wc) * wc
        if nwp != nw:
            a1t = jnp.pad(a1t, ((0, 0), (0, 0), (0, nwp - nw), (0, 0), (0, 0)))
            masks = [
                jnp.pad(mk, ((0, 0), (0, nwp - nw), (0, 0), (0, 0))) for mk in masks
            ]
        kernel = _make_kernel2(th, we, pw.mul4, pw.shift4, unroll, stages, wc)
        out = pl.pallas_call(
            kernel,
            grid=(b2, nh, nwp // wc),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, wc, m1, 64),
                    lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            + mask_specs
            + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in consts],
            out_specs=pl.BlockSpec(
                (1, 1, wc, 2, m4),
                lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b2, nh, nwp, 2, m4), jnp.int16),
            scratch_shapes=[
                pltpu.VMEM((m1 + 8, 128), dtype),
                pltpu.VMEM(((th + 4) * we + 8, 96), dtype),
                pltpu.VMEM(((th + 2) * we + 8, 96), dtype),
            ],
            interpret=interpret,
        )(a1t, *masks, *consts)

        # unpack: [B2, nh, nwp, 2, m4] -> [B, nh, nwp, th, we] -> frames
        out = out[:, :, :nw]
        res = out.transpose(0, 3, 1, 2, 4).reshape(b, nh, nw, th, we)[..., :tw]
        res = res.transpose(0, 1, 3, 2, 4).reshape(b, hp, wp)[:, :h, :w]
        rec = x_uint8.astype(jnp.int32) + res.astype(jnp.int32)
        return jnp.clip(rec, 0, 255).astype(jnp.uint8)[:b0]

    run.geometry = (th, we, tw)
    run.packed = pw
    return run
