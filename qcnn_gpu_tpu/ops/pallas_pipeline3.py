"""Width-packed fused Pallas pipeline (v3) — break the 25-tap MXU floor.

v2 (ops/pallas_pipeline2.py) fills the MXU's channel padding with a second
frame, but its pass STRUCTURE is unchanged: S2 still issues one MXU pass
per 5x5 tap (25), S3/S4 one per 3x3 tap (9 each) — 44 passes/program, each
costing ~M/8 cycles regardless of N. That structure, not utilization per
pass, is the measured 7.3ms/frame floor (PARITY.md cycle model).

v3 restructures the taps with WIDTH-2 PIXEL PACKING (space-to-depth along
W): every activation row holds TWO horizontally adjacent pixels' channels,

    buffer[p, q*C + c]  =  pixel(row = p//we2, col = 2*(p%we2) + q), ch c

so a conv's dx taps collapse into packed-column taps. For output phase po
and tap dx, the input lands at packed offset d = (po+dx)//2, phase
pi = (po+dx) % 2 — both phases of both operands ride the SAME MXU pass:

    S2 (5x5, 64ch):  [m/2, 2*64=128] @ [128, 2*48=96]   5dy x 3d = 15 passes
    S3 (3x3, 48ch):  [m/2, 2*48= 96] @ [ 96, 2*48=96]   3dy x 2d =  6 passes
    S4 (3x3, 48ch):  [m/2, 96]       @ [ 96, 2]         3dy x 2d =  6 passes

on HALF the rows of v2. Per-frame cost in row-units (th=64, we=256):
v2 = m1/2 + 12.5*m2 + 4.5*m3 + 4.5*m4 = 376.6k; v3 = m1' + 15*m2' +
6*m3' + 6*m4' = 239.6k — a structural 1.57x. The dx parity trick needs
stage origins of alternating column parity (S3/S4 origins sit at ODD
window columns so their 3 dx taps span only 2 packed columns); that is
why S3/S4 carry their own edge mask (mkO) instead of slicing S2's.

One frame per program (no frame pairing): K is already full at 128, odd
batches need no padding, and the S1 im2col HBM traffic halves ([m1', 32]
vs v2's [m1, 64] for two frames).

Reference parity: same contract as v1/v2 — forward_blu (qvrcnn.cu:168-242)
with the integer epilogues of SURVEY.md §5.1, bit-exact vs the oracle.
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
from qcnn_gpu_tpu.ops.pallas_pipeline import HALO, PAD, _window
from qcnn_gpu_tpu.ops.pallas_pipeline2 import _apply_mask, _requant_fast


def _packed_taps(w: np.ndarray, k: int) -> np.ndarray:
    """[k,k,Cin,Cout] -> [k * nd, 2*Cin, 2*Cout] width-packed tap matrices.

    Tap (dy, d) maps (pi, cin) -> (po, cout) with dx = 2*d + pi - po; slots
    whose dx falls outside [0, k) are zero (they belong to a neighboring d).
    nd = 2 for k=3 (odd output origin), 3 for k=5 (even origin)."""
    nd = (k + 1 + 1) // 2  # k=3 -> 2, k=5 -> 3
    cin, cout = w.shape[2], w.shape[3]
    out = np.zeros((k * nd, 2 * cin, 2 * cout), dtype=w.dtype)
    for dy in range(k):
        for d in range(nd):
            for pi in range(2):
                for po in range(2):
                    dx = 2 * d + pi - po
                    if 0 <= dx < k:
                        out[dy * nd + d, pi * cin : (pi + 1) * cin,
                            po * cout : (po + 1) * cout] = w[dy, dx]
    return out


@dataclasses.dataclass(frozen=True)
class PackedWeights3:
    w1: jnp.ndarray  # [32, 128] S1 pixel-major: rows (dy,u) taps, cols (po, c)
    w2p: jnp.ndarray  # [15, 128, 96]
    w3p: jnp.ndarray  # [6, 96, 96]
    w4p: jnp.ndarray  # [6, 96, 8] (cols 0/1 = phase residuals)
    b1: jnp.ndarray  # [1, 128] i32 (phase-tiled, bias_pre folded)
    q1: Tuple[jnp.ndarray, ...]  # (blu_b, mul, shift) [1, 128] each
    b2: jnp.ndarray  # [1, 96]
    b3: jnp.ndarray
    b4: jnp.ndarray  # [1, 8]
    q2: Tuple[jnp.ndarray, ...]
    q3: Tuple[jnp.ndarray, ...]
    mul4: int
    shift4: int

    @classmethod
    def from_engine(cls, p: EngineParams, dtype=None, kpad: bool = False) -> "PackedWeights3":
        """kpad=True zero-pads S3/S4's contraction dim 96 -> 128: int8
        K=96 MXU passes measured at ~half the K=128 rate on v5e (r4 stage
        marginals: S3 8.6 rows/cycle vs S2 13.8), so spending 32 zero
        lanes buys the full-rate path; bit-exact (zero rows contribute
        exact zeros)."""
        dtype = dtype if dtype is not None else jnp.int8
        mp = MergedParams.from_engine(p)
        w = [np.asarray(x, dtype=np.float32) for x in mp.w_i8]

        # S1: output (P, po) needs window col 2P + (po+dx); tap u = po+dx in
        # [0, 6). w1[(dy,u), po*64+c] = w[dy, u-po, 0, c] for u-po in [0,5).
        w1 = np.zeros((32, 128), np.float32)
        for dy in range(5):
            for u in range(6):
                for po in range(2):
                    dx = u - po
                    if 0 <= dx < 5:
                        w1[dy * 6 + u, po * 64 : (po + 1) * 64] = w[0][dy, dx, 0]

        def tile2(v, pad: int = 0):
            t = np.tile(np.asarray(v), 2)
            if pad:
                t = np.pad(t, (0, pad))
            return jnp.asarray(t[None, :], dtype=jnp.int32)

        # Folded epilogue constants (ops/pallas_pipeline2._requant_fast):
        # biases absorb the pre-multiply rounding bias, thresholds shift.
        # Padded lanes (kpad) carry B=0, mul=0: min(0, 0)*0 >> 0 == 0, so
        # the requant emits exact zeros there — the next stage's zero K
        # rows then contribute nothing.
        def qx(i, pad: int = 0):
            bp = np.asarray(mp.bias_pre[i])
            return tuple(
                tile2(v, pad)
                for v in (
                    np.asarray(mp.blu_q[i]) + bp,
                    np.broadcast_to(np.asarray(mp.mul[i]), bp.shape),
                    np.broadcast_to(np.asarray(mp.shift[i]), bp.shape),
                )
            )

        b = [np.asarray(x, dtype=np.int32) for x in mp.b_i32]
        b4_2 = np.zeros(8, np.int32)
        b4_2[0] = b4_2[1] = b[3][0]
        w4 = np.zeros((6, 96, 8), np.float32)
        w4[:, :, :2] = _packed_taps(w[3], 3)
        w2 = _packed_taps(w[1], 5)
        w3 = _packed_taps(w[2], 3)
        npad = 32 if kpad else 0
        if kpad:
            # N-side zero cols on S2/S3 (their outputs land in 128-lane
            # scratch, padded lanes requantizing to exact zeros) and
            # K-side zero rows on S3/S4 (consuming those zero lanes)
            w2 = np.pad(w2, ((0, 0), (0, 0), (0, npad)))
            w3 = np.pad(w3, ((0, 0), (0, npad), (0, npad)))
            w4 = np.pad(w4, ((0, 0), (0, npad), (0, 0)))
        return cls(
            w1=jnp.asarray(w1, dtype=dtype),
            w2p=jnp.asarray(w2, dtype=dtype),
            w3p=jnp.asarray(w3, dtype=dtype),
            w4p=jnp.asarray(w4, dtype=dtype),
            b1=tile2(b[0] + np.asarray(mp.bias_pre[0])),
            q1=qx(0),
            b2=tile2(b[1] + np.asarray(mp.bias_pre[1]), npad),
            b3=tile2(b[2] + np.asarray(mp.bias_pre[2]), npad),
            b4=jnp.asarray(b4_2[None, :], dtype=jnp.int32),
            q2=qx(1, npad),
            q3=qx(2, npad),
            mul4=mp.mul4,
            shift4=mp.shift4,
        )

    def consts(self):
        return [
            self.w1, self.w2p, self.w3p, self.w4p,
            self.b1, self.b2, self.b3, self.b4,
            *self.q1, *self.q2, *self.q3,
        ]


def _expand_mask(mk2, c: int, pad: int = 0):
    """[m, 2] per-phase mask -> [m, 2*c (+pad)] in (phase, channel) lane
    order; `pad` appends zero lanes matching kpad's N-padded outputs
    (their values are already exact zeros, any mask value works)."""
    m = mk2.shape[0]
    parts = [
        jnp.broadcast_to(mk2[:, 0:1], (m, c)),
        jnp.broadcast_to(mk2[:, 1:2], (m, c + pad)),
    ]
    # pad lanes (kpad) reuse phase 1's mask value — their data is already
    # exact zeros, so any mask works; a broadcast avoids a zeros const
    return jnp.concatenate(parts, axis=1)


def _stage_packed(v_ref, w_ref, kdy, nd, we2, m_out, b_i32, qvec, mask=None,
                  unroll=False):
    """One width-packed conv stage: taps (dy, d) at sublane offset
    dy*we2 + d, weights w_ref[dy*nd + d] of shape [K, N] (K = 2*Cin,
    N = 2*Cout; both possibly zero-padded to 128 — PackedWeights3 kpad,
    whose padded output lanes requantize to exact zeros)."""
    cout = w_ref.shape[2]
    acc_dtype = jnp.int32 if v_ref.dtype == jnp.int8 else jnp.float32

    if unroll:
        base = v_ref[...]
        acc = jnp.zeros((m_out, cout), dtype=acc_dtype)
        for dy in range(kdy):
            for d in range(nd):
                off = dy * we2 + d
                acc = acc + jnp.dot(
                    base[off : off + m_out, :],
                    w_ref[dy * nd + d],
                    preferred_element_type=acc_dtype,
                )
    else:

        def body(dy, acc):
            base = pl.multiple_of(dy * we2, 8)
            a_dy = v_ref[pl.ds(base, m_out + 8), :]
            for d in range(nd):
                acc = acc + jnp.dot(
                    a_dy[d : d + m_out, :],
                    w_ref[dy * nd + d],
                    preferred_element_type=acc_dtype,
                )
            return acc

        acc = jax.lax.fori_loop(
            0, kdy, body, jnp.zeros((m_out, cout), dtype=acc_dtype)
        )
    u = acc.astype(jnp.int32) + b_i32 if acc_dtype != jnp.int32 else acc + b_i32
    if qvec is None:
        return u
    v = _requant_fast(u, *qvec).astype(v_ref.dtype)
    v = jnp.pad(v, ((0, 8), (0, 0)))  # tap over-run tail (see v1)
    return mask(v) if mask is not None else v


def _s1_mode(s1: str, dtype):
    """Decode the S1 operand mode (kernel v5, round 5).

    'a1t'     — v3: host ships the full 30-tap im2col [32, m1] (~16 B/px);
    'op6'     — v5: host ships SIX column-tap planes [8, L] (~3.3 B/px,
                L = he*we2) and the kernel restacks the 30 (dy, u) taps
                into a [32, m1] VMEM scratch with lane-aligned slices
                (dy*we2 is a multiple of 128 when we == 256) before the
                same single K=32 MXU pass. Scratch writes land 8 rows at
                sublane offsets 6*dy (ascending, so overlaps resolve to
                the correct group);
    'op6x8'   — v5 with 8-row group stride (w1 re-laid to [40, 128] with
                zero rows at g*dy+6/7) — sublane offsets 8*dy;
    'op6bf16' — v5 with a bf16 scratch at 16-row stride ([80, 128] w1):
                16-row offsets are tile-aligned for bf16's (16, 128)
                tiling, trading aligned copies for a bf16-rate S1 pass.
                Exact: int8 values and their <=2^24 sums are exact in
                bf16 operands / f32 accumulation.
    Returns (op6, group_stride, scratch_dtype)."""
    if s1 == "a1t":
        return False, 6, dtype
    if s1 == "op6":
        return True, 6, dtype
    if s1 == "op6x8":
        return True, 8, dtype
    if s1 == "op6bf16":
        return True, 16, jnp.bfloat16
    raise ValueError(f"unknown s1 mode {s1!r}")


def _w1_regroup(w1: np.ndarray, g: int) -> np.ndarray:
    """[32, 128] (rows 6*dy+u) -> [4*g+8, 128] (rows g*dy+u, u<6; zeros
    elsewhere). g=6 returns w1 unchanged."""
    if g == 6:
        return w1
    out = np.zeros((4 * g + 8, w1.shape[1]), w1.dtype)
    for dy in range(5):
        out[g * dy : g * dy + 6] = w1[6 * dy : 6 * dy + 6]
    return out


def _make_kernel3(th: int, we: int, mul4: int, shift4: int, unroll: bool = False,
                  stages: int = 4, wc: int = 1, atlas: bool = False,
                  masked: bool = True, op6: bool = False, s1_group: int = 6):
    """masked=False emits the INTERIOR-tile variant: no mask operands in
    the signature and no mask multiplies in any stage — tiles whose
    halo-extended buffer cannot cross a frame edge compute identical
    values with or without masks (their masks are all-ones), and the mask
    applies were measured at ~20% of kernel time (PARITY.md no_mask
    ablation). Edge tiles keep the masked variant via the band-split
    dispatch in build_pallas_forward3."""
    we2 = we // 2
    m1 = (th + 8) * we2
    m2 = (th + 4) * we2
    m3 = (th + 2) * we2
    m4 = th * we2
    assert mul4 <= 127, f"final mul {mul4} too large for int32 requant"

    def kernel(*refs):
        if masked:
            a1t_ref, mkE_ref, mkO_ref = refs[0], refs[1], refs[2]
            rest = refs[3:]
        else:
            a1t_ref, mkE_ref, mkO_ref = refs[0], None, None
            rest = refs[1:]
        (
            w1_ref, w2p_ref, w3p_ref, w4p_ref,
            b1_ref, b2_ref, b3_ref, b4_ref,
            q1b_ref, q1m_ref, q1s_ref,
            q2b_ref, q2m_ref, q2s_ref,
            q3b_ref, q3m_ref, q3s_ref,
            out_ref,  # [1,1,wc, 2, m4] i16 residuals, lane-major, ROW/phase
            v1s, v2s, v3s,
            *a1s,  # op6 only: [4g+8, m1] S1 tap-restack scratch
        ) = rest
        return _kernel3_body(
            a1t_ref, mkE_ref, mkO_ref,
            w1_ref, w2p_ref, w3p_ref, w4p_ref,
            b1_ref, b2_ref, b3_ref, b4_ref,
            q1b_ref, q1m_ref, q1s_ref, q2b_ref, q2m_ref, q2s_ref,
            q3b_ref, q3m_ref, q3s_ref, out_ref, v1s, v2s, v3s,
            a1s[0] if a1s else None,
            th=th, we=we, mul4=mul4, shift4=shift4, unroll=unroll,
            stages=stages, wc=wc, atlas=atlas, s1_group=s1_group,
        )

    return kernel


def _kernel3_body(
        a1t_ref,  # [1,1,wc, 32, m1] TAP-major S1 im2col (taps (dy,u));
        #           S1 contracts dim 0 so the HBM operand needs no lane
        #           padding and no host-side transpose.
        #           op6 (v5): [1,1,wc, 8, L] instead — six column-tap
        #           planes; the (dy, u) taps are restacked in-kernel.
        mkE_ref,  # [1,wc, m1+8, 2] per-phase mask, EVEN col origins (v1, v2)
        mkO_ref,  # [1,wc, m3+8, 2] per-phase mask, ODD col origin (v3)
        w1_ref, w2p_ref, w3p_ref, w4p_ref,
        b1_ref, b2_ref, b3_ref, b4_ref,
        q1b_ref, q1m_ref, q1s_ref,
        q2b_ref, q2m_ref, q2s_ref,
        q3b_ref, q3m_ref, q3s_ref,
        out_ref,  # [1,1,wc, 2, m4] i16 residuals, lane-major, ROW per phase
        v1s, v2s, v3s,
        a1s,  # op6 only: [4g+8, m1] S1 tap-restack scratch, else None
        *, th, we, mul4, shift4, unroll, stages, wc, atlas, s1_group,
    ):
      we2 = we // 2
      m1 = (th + 8) * we2
      m2 = (th + 4) * we2
      m3 = (th + 2) * we2
      m4 = th * we2
      masked = mkE_ref is not None
      for wi in range(wc):
        # atlas masks carry no wc axis (atlas implies wc == 1)
        mkE2 = mkO2 = None
        if masked:
            mkE2 = mkE_ref[0] if atlas else mkE_ref[0, wi]
            mkO2 = mkO_ref[0] if atlas else mkO_ref[0, wi]
        # ---- S1: ONE pass for both phases; lhs arrives tap-major, the
        # dot contracts lhs dim 0 (Mosaic streams the transposed operand
        # through the MXU natively). op6: restack the (dy, u) taps from
        # the six shifted planes first — tap (dy, u) is plane u at flat
        # offset dy*we2 (a lane-tile-aligned slice when we2 % 128 == 0),
        # written as full 8-row groups at sublane offset g*dy (ascending,
        # so for g=6 the 2-row overlap resolves to the next group's
        # correct rows; rows beyond tap 5 hit zero weight rows) ----
        acc1 = jnp.int32 if w1_ref.dtype == jnp.int8 else jnp.float32
        if a1s is not None:
            g = s1_group
            a6 = a1t_ref[0, 0, wi]  # [8, L]
            for dy in range(5):
                a1s[dy * g : dy * g + 8, :] = a6[
                    :, dy * we2 : dy * we2 + m1
                ].astype(a1s.dtype)
            lhs = a1s[...]
        else:
            lhs = a1t_ref[0, 0, wi]
        u1 = jax.lax.dot_general(
            lhs, w1_ref[...],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc1,
        )  # [m1, 128]
        v1 = _requant_fast(
            u1.astype(jnp.int32) + b1_ref[...],
            q1b_ref[...], q1m_ref[...], q1s_ref[...],
        ).astype(v1s.dtype)
        v1 = jnp.pad(v1, ((0, 8), (0, 0)))
        v1s[...] = _apply_mask(v1, _expand_mask(mkE2, 64)) if masked else v1

        if stages <= 1:
            emit_cols = 8
            t = jnp.transpose(v1s[:m4, 0:emit_cols].astype(jnp.int32))
            out_ref[0, 0, wi] = jnp.clip(t[0:2, :], -255, 255).astype(jnp.int16)
            continue

        # ---- S2 (5x5): 15 packed passes; mask = mkE rebased by (2, 2),
        # i.e. packed offset 2*we2 + 1, same phase ----
        s2_off = 2 * we2 + 1
        v2s[...] = _stage_packed(
            v1s, w2p_ref, 5, 3, we2, m2, b2_ref[...],
            (q2b_ref[...], q2m_ref[...], q2s_ref[...]),
            mask=(
                lambda v: _apply_mask(
                    v,
                    _expand_mask(
                        mkE2[s2_off : s2_off + m2 + 8, :], 48,
                        pad=w2p_ref.shape[2] - 96,
                    ),
                )
            ) if masked else None,
            unroll=unroll,
        )
        if stages <= 2:
            t = jnp.transpose(v2s[:m4, 0:8].astype(jnp.int32))
            out_ref[0, 0, wi] = jnp.clip(t[0:2, :], -255, 255).astype(jnp.int16)
            continue

        # ---- S3 (3x3): 6 packed passes; odd col origin -> own mask ----
        v3s[...] = _stage_packed(
            v2s, w3p_ref, 3, 2, we2, m3, b3_ref[...],
            (q3b_ref[...], q3m_ref[...], q3s_ref[...]),
            mask=(
                lambda v: _apply_mask(
                    v, _expand_mask(mkO2, 48, pad=w3p_ref.shape[2] - 96)
                )
            )
            if masked else None,
            unroll=unroll,
        )
        if stages <= 3:
            t = jnp.transpose(v3s[:m4, 0:8].astype(jnp.int32))
            out_ref[0, 0, wi] = jnp.clip(t[0:2, :], -255, 255).astype(jnp.int16)
            continue

        # ---- S4 + final residual requant (cnn.cu:507-523), both phases ----
        u4 = _stage_packed(v3s, w4p_ref, 3, 2, we2, m4, b4_ref[...], None,
                           unroll=unroll)
        res = jnp.right_shift(u4 * mul4 + (1 << (shift4 - 1)), shift4)
        t = jnp.transpose(res)
        out_ref[0, 0, wi] = jnp.clip(t[0:2, :], -255, 255).astype(jnp.int16)


def _edge_masks2(nh, nw, th, tw, we2, hb, w, m_rows, row_off, col_off, wb=None):
    """Per-tile per-PHASE 0/1 masks [nh, nw, m_rows, 2]: packed pixel p,
    phase q of tile (hi, wi) is frame pixel (hi*th - row_off + p//we2,
    wi*tw - col_off + 2*(p%we2) + q). `hb` is either the frame height or a
    (row_lo, row_hi) pair — possibly traced scalars — marking the valid
    row range (sharded blocks: the true frame edge is shard-dependent);
    `wb` is the analogous optional (col_lo, col_hi) pair for 2-D spatial
    sharding (None -> the full [0, w) width is inside the frame).

    With static bounds the whole mask is computed in NUMPY so it embeds as
    a jit constant — zero per-call device work. Traced bounds (the sharded
    path) compute the mask on device from the same index grids."""
    row_lo, row_hi = hb if isinstance(hb, tuple) else (0, hb)
    col_lo, col_hi = wb if wb is not None else (0, w)
    xp = jnp if any(
        isinstance(v, jax.core.Tracer) for v in (row_lo, row_hi, col_lo, col_hi)
    ) else np
    px = np.arange(m_rows)
    q = np.arange(2)
    gr = xp.asarray(
        np.arange(nh)[:, None, None] * th - row_off + (px // we2)[None, None, :]
    )
    gc = xp.asarray(
        np.arange(nw)[None, :, None, None] * tw
        - col_off
        + (2 * (px % we2))[None, None, :, None]
        + q[None, None, None, :]
    )
    ok = ((gr >= row_lo) & (gr < row_hi))[..., None] & (
        (gc >= col_lo) & (gc < col_hi)
    )
    return ok


def _edge_mask_atlas(nh, nw, th, tw, we2, h, w, m_rows, row_off, col_off):
    """Canonical per-CLASS masks [64, m_rows, 2] instead of per-tile ones.

    A tile's mask depends only on which frame edges its halo-extended
    buffer can cross, and all tiles in the same position-class share the
    exact mask values. Classes are bitmasks rc + 8*cc with bits
    (first tile, last tile, second-to-last tile) per axis — the second-
    to-last tile's halo can spill past the frame by up to PAD-1 px when
    the frame nearly fills the tile grid. The BlockSpec index_map selects
    the class, so consecutive interior programs reuse ONE resident block
    and the per-program mask DMA is elided by the pipeline's revisiting
    optimization."""
    px = np.arange(m_rows)
    q = np.arange(2)
    rr = (px // we2) - row_off
    gc_rel = (2 * (px % we2) - col_off)[:, None] + q[None, :]
    atlas = np.ones((64, m_rows, 2), bool)
    for rc in range(8):
        ok_r = np.ones(m_rows, bool)
        if rc & 1:
            ok_r &= rr >= 0
        if rc & 2:
            ok_r &= (nh - 1) * th + rr < h
        if rc & 4:
            ok_r &= (nh - 2) * th + rr < h
        for cc in range(8):
            ok = np.broadcast_to(ok_r[:, None], (m_rows, 2)).copy()
            if cc & 1:
                ok &= gc_rel >= 0
            if cc & 2:
                ok &= (nw - 1) * tw + gc_rel < w
            if cc & 4:
                ok &= (nw - 2) * tw + gc_rel < w
            atlas[rc + 8 * cc] = ok
    return atlas


def build_pallas_forward3(
    p: EngineParams, th: int = 64, we: int = 256, interpret: bool = False,
    unroll: bool = True, dtype=None, stages: int = 4, wc: int = 1,
    row_bounds: bool = False, col_bounds: bool = False, kpad: bool = False,
    s1: str = "a1t",
    _debug: str = "",
):
    """Width-packed fused restorer: fn(uint8 [B,H,W]) -> uint8 [B,H,W],
    bit-exact vs the oracle. One frame per program; `we` must be even
    (tw = we-12 stays even so packed columns align across tiles).

    row_bounds=True returns fn(x_uint8, row_lo, row_hi) instead (unjitted,
    for use inside shard_map): rows outside [row_lo, row_hi) are treated
    as beyond the frame edge (per-layer zero padding), so a halo-extended
    spatial shard can mark where the TRUE frame boundary sits.
    col_bounds=True (implies the same for columns) returns
    fn(x_uint8, row_lo, row_hi, col_lo, col_hi) — the 2-D (sp, sw)
    sharding contract."""
    assert we % 2 == 0, "v3 packs two columns per lane group: we must be even"
    dtype = dtype if dtype is not None else jnp.int8
    op6, s1g, s1_dtype = _s1_mode(s1, dtype)
    pw = PackedWeights3.from_engine(p, dtype=dtype, kpad=kpad)
    tw = we - PAD
    he = th + PAD
    we2 = we // 2
    m1 = (th + 8) * we2
    m3 = (th + 2) * we2
    m4 = th * we2
    consts = pw.consts()
    if op6:
        if we2 % 128:
            raise ValueError(
                f"s1={s1!r} needs lane-tile-aligned dy*we2 slices "
                f"(we % 256 == 0), got we={we}"
            )
        w1_np = np.asarray(pw.w1).astype(np.float32)
        consts[0] = jnp.asarray(_w1_regroup(w1_np, s1g), dtype=s1_dtype)

    def _fwd(x_uint8, hb, wb=None):
        b, h, w = x_uint8.shape
        nh = -(-h // th)
        nw = -(-w // tw)
        hp, wp = nh * th, nw * tw
        x = (x_uint8.astype(jnp.int32) - 128).astype(dtype)
        xp = jnp.pad(x, ((0, 0), (HALO, HALO + hp - h), (HALO, HALO + wp - w)))

        # S1 im2col, width-packed. Tap (dy, u) of packed pixel p = R*we2+C
        # is window pixel (R+dy, 2C+u): window the frame into even/odd
        # column PLANES first (phase folded into the window gather's
        # column indices), after which every tap is a cheap contiguous
        # slice of plane u%2 at offset dy*we2 + u//2 — naive per-tap phase
        # indexing was 30 stride-2 relayouts and dominated the pipeline.
        tw2 = tw // 2
        rows = jnp.arange(nh)[:, None] * th + jnp.arange(he)[None, :]
        planes = []
        for ph in range(2):
            cols = (jnp.arange(nw)[:, None] * tw2 + jnp.arange(we2)[None, :]) * 2 + ph
            xw = xp[:, rows, :][:, :, :, cols].transpose(0, 1, 3, 2, 4)
            planes.append(
                jnp.pad(xw.reshape(b, nh, nw, he * we2), ((0, 0),) * 3 + ((0, 8),))
            )
        if op6:
            # v5: ship only the SIX column taps (u in [0, 6): plane u%2 at
            # flat offset u//2) — L = he*we2 covers every dy row shift,
            # which the kernel applies as lane-aligned slices. ~3.3 B/px
            # vs the 30-tap stack's ~16 B/px; the window gather above is
            # unchanged, the 30-slice stack (the measured 1.37 ms/frame
            # prep bulk at 1080p) collapses to 6 slices.
            L = he * we2  # == m1 + 4*we2
            six = [planes[u % 2][..., u // 2 : u // 2 + L] for u in range(6)]
            a1t = jnp.stack(six, axis=3)  # [B, nh, nw, 6, L]
            a1t = jnp.pad(a1t, ((0, 0),) * 3 + ((0, 2), (0, 0)))
        else:
            taps = [
                planes[u % 2][..., dy * we2 + u // 2 : dy * we2 + u // 2 + m1]
                for dy in range(5)
                for u in range(6)
            ]
            # the operand stays TAP-MAJOR [.., 32, m1]: minor dim m1 needs
            # no lane padding and the stack writes it directly, so XLA's
            # copy into the custom-call operand layout is a plain fused
            # loop. Both alternatives measured pathological: stacking on
            # the minor axis materializes every tap as [.., m1, 1]
            # lane-padded 128x (18.5 GB compile-time OOM at 1080p B=4),
            # and swapaxes-after-stack costs ~22 ms/frame in the
            # operand-layout copy (vs 0.09 ms for this form). The kernel
            # contracts dim 0 of the [32, m1] block instead.
            a1t = jnp.stack(taps, axis=3)  # [B, nh, nw, 30, m1] — no padding
            a1t = jnp.pad(a1t, ((0, 0),) * 3 + ((0, 2), (0, 0)))

        # mask transport: class ATLAS when possible (wc=1, static frame
        # bounds, tiles big enough that only first/last/second-to-last
        # tiles can cross a frame edge) — interior programs then reuse a
        # resident block with no per-program DMA; otherwise per-tile masks
        atlas = (
            wc == 1 and not isinstance(hb, tuple) and wb is None
            and th > 4 and tw > 10
        )
        if atlas:
            mkE = _edge_mask_atlas(nh, nw, th, tw, we2, hb, w, m1 + 8, 4, 4)
            mkO = _edge_mask_atlas(nh, nw, th, tw, we2, hb, w, m3 + 8, 1, 1)
            masks = [mkE.astype(dtype), mkO.astype(dtype)]
            spill_r = nh >= 2 and h <= (nh - 1) * th + 3
            spill_c = nw >= 2 and w <= (nw - 1) * tw + 10

            def mask_idx(bi, hi, wi):
                rc = jnp.where(hi == 0, 1, 0) + jnp.where(hi == nh - 1, 2, 0)
                if spill_r:
                    rc = rc + jnp.where(hi == nh - 2, 4, 0)
                cc = jnp.where(wi == 0, 1, 0) + jnp.where(wi == nw - 1, 2, 0)
                if spill_c:
                    cc = cc + jnp.where(wi == nw - 2, 4, 0)
                return (rc + 8 * cc, 0, 0)

        else:
            mkE = _edge_masks2(
                nh, nw, th, tw, we2, hb, w, m1 + 8, 4, 4, wb=wb
            ).astype(dtype)
            mkO = _edge_masks2(
                nh, nw, th, tw, we2, hb, w, m3 + 8, 1, 1, wb=wb
            ).astype(dtype)
            masks = [mkE, mkO]

        nwp = -(-nw // wc) * wc
        if nwp != nw:
            a1t = jnp.pad(a1t, ((0, 0), (0, 0), (0, nwp - nw), (0, 0), (0, 0)))
            masks = [
                jnp.pad(mk, ((0, 0), (0, nwp - nw), (0, 0), (0, 0))) for mk in masks
            ]
        if "zero_a1" in _debug:  # perf bisection: cut the prep chain
            a1t = jnp.zeros(a1t.shape, a1t.dtype)

        mid_lanes = 128 if kpad else 96
        scratch_shapes = [
            pltpu.VMEM((m1 + 8, 128), dtype),
            pltpu.VMEM(((th + 4) * we2 + 8, mid_lanes), dtype),
            pltpu.VMEM(((th + 2) * we2 + 8, mid_lanes), dtype),
        ]
        if op6:
            scratch_shapes.append(pltpu.VMEM((4 * s1g + 8, m1), s1_dtype))
        cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

        def launch(nr, nc, row_of, col_of, use_masks):
            """One pallas_call over an (nr x nc)-tile rectangle; row_of /
            col_of translate grid coords to absolute tile coords (in wc
            units). use_masks=False runs the interior-tile kernel variant
            (no mask operands, no mask multiplies)."""
            kern = _make_kernel3(th, we, pw.mul4, pw.shift4, unroll, stages,
                                 wc, atlas=atlas, masked=use_masks,
                                 op6=op6, s1_group=s1g)
            in_specs = [
                pl.BlockSpec(
                    (1, 1, wc) + tuple(a1t.shape[-2:]),
                    lambda bi, hi, wi: (bi, row_of(hi), col_of(wi), 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ]
            operands = [a1t]
            if use_masks:
                if atlas:
                    in_specs += [
                        pl.BlockSpec(
                            (1, mk.shape[1], 2),
                            lambda bi, hi, wi: mask_idx(
                                bi, row_of(hi), col_of(wi)
                            ),
                            memory_space=pltpu.VMEM,
                        )
                        for mk in masks
                    ]
                else:
                    in_specs += [
                        pl.BlockSpec(
                            (1, wc, mk.shape[2], 2),
                            lambda bi, hi, wi: (row_of(hi), col_of(wi), 0, 0),
                            memory_space=pltpu.VMEM,
                        )
                        for mk in masks
                    ]
                operands += masks
            in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in consts]
            operands += consts
            return pl.pallas_call(
                kern,
                grid=(b, nr, nc),
                compiler_params=cparams,
                in_specs=in_specs,
                out_specs=pl.BlockSpec(
                    (1, 1, wc, 2, m4),
                    lambda bi, hi, wi: (bi, hi, wi, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((b, nr, nc * wc, 2, m4), jnp.int16),
                scratch_shapes=scratch_shapes,
                interpret=interpret,
            )(*operands)

        if not atlas:
            spill_r = spill_c = False
        # BAND SPLIT: interior tiles (no frame edge in reach of their halo)
        # run the unmasked kernel variant — the masks there are all-ones
        # and their application was measured at ~20% of kernel time. Edge
        # tiles form three rectangles: the top/bottom row bands (+ the
        # second-to-last row when its halo spills), the left/right column
        # bands of the middle rows, and the interior. Outputs reassemble
        # with two cheap int16 concats.
        band_split = (
            atlas
            and wc == 1
            and nh >= 3 + int(spill_r)
            and nw >= 3 + int(spill_c)
            and "no_split" not in _debug
        )
        if not band_split:
            out = launch(nh, nwp // wc, lambda r: r, lambda c: c, True)
        else:
            nh_i = nh - 2 - int(spill_r)
            nw_i = nw - 2 - int(spill_c)

            def row_band(hb):
                r = jnp.where(hb == 0, 0, nh - 1)
                return jnp.where(hb == 2, nh - 2, r) if spill_r else r

            def col_band(cb):
                c = jnp.where(cb == 0, 0, nw - 1)
                return jnp.where(cb == 2, nw - 2, c) if spill_c else c

            tb = launch(2 + int(spill_r), nw, row_band, lambda c: c, True)
            mc = launch(nh_i, 2 + int(spill_c), lambda r: r + 1, col_band, True)
            it = launch(nh_i, nw_i, lambda r: r + 1, lambda c: c + 1, False)
            mid = [mc[:, :, 0:1], it]
            mid += [mc[:, :, 2:3]] if spill_c else []
            mid = jnp.concatenate(mid + [mc[:, :, 1:2]], axis=2)
            rows = [tb[:, 0:1], mid]
            rows += [tb[:, 2:3]] if spill_r else []
            out = jnp.concatenate(rows + [tb[:, 1:2]], axis=1)

        if "raw_out" in _debug:  # perf bisection: skip unpack/residual
            return out
        # unpack: row q of [2, m4] = phase-q residuals; packed col C, row R
        # of tile (hi, wi) -> frame (hi*th + R, wi*tw + 2C + q)
        out = out[:, :, :nw].reshape(b, nh, nw, 2, th, we2)[..., : tw // 2]
        res = out.transpose(0, 1, 4, 2, 5, 3).reshape(b, hp, wp)[:, :h, :w]
        rec = x_uint8.astype(jnp.int32) + res.astype(jnp.int32)
        return jnp.clip(rec, 0, 255).astype(jnp.uint8)

    if col_bounds:
        run = lambda x, row_lo, row_hi, col_lo, col_hi: _fwd(  # noqa: E731
            x, (row_lo, row_hi), (col_lo, col_hi)
        )
    elif row_bounds:
        run = lambda x, row_lo, row_hi: _fwd(x, (row_lo, row_hi))  # noqa: E731
    else:
        run = jax.jit(lambda x: _fwd(x, x.shape[1]))
    run.geometry = (th, we, tw)
    run.packed = pw
    run.s1 = s1
    return run
