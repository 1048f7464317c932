"""Exact integer requantization epilogues as JAX ops (VPU element-wise).

These are the jnp twins of the oracle primitives in models/oracle.py; the
test suite holds them bit-equal. All operate on int32 — safe because the
engine's accumulators are certified < 2^24 at model load (see
models/qvrcnn.exactness_bounds) and every (mul, shift) product is
range-checked against int32 before compilation.

Two DIFFERENT rounding-bias placements, per the reference (do not unify):
  * BLU layers: bias PRE-multiply, integer-divided by mul (mat.cu:262-303)
  * final residual: bias POST-multiply (cnn.cu:507-523)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

THRESHOLD = 127


def normalize_mul_shift(mul: int, shift: int):
    """Strip common powers of two from a (mul, shift) pair — an EXACT
    identity for BOTH reference rounding forms:

      pre-multiply:  ((u + (1<<(s-1))//(m*2^t)) * m*2^t) >> s
                   == ((u + (1<<(s-1-t))//m) * m) >> (s-t)
        (the bias equality holds because (1<<(s-1))/(m*2^t) and
         (1<<(s-1-t))/m are the same rational, so floors agree)
      post-multiply: (u*m*2^t + (1<<(s-1))) >> s
                   == ((u*m + (1<<(s-1-t))) << t) >> s  == RHS >> (s-t)

    Solver outputs for layers with tiny accumulator ranges can carry
    power-of-two-heavy muls (observed: mul=2^25, shift=27 from an INT4
    solve) whose products overflow int32; normalization brings every
    such pair back into the reference's int32 envelope without changing
    a single output bit."""
    mul, shift = int(mul), int(shift)
    while mul >= 2 and mul % 2 == 0 and shift > 1:
        mul //= 2
        shift -= 1
    return mul, shift


def check_blu_requant_i32_safe(blu_q: int, mul: int, shift: int, name: str = "") -> None:
    """The engine computes BLU requant in int32; the kept branch's largest
    product is (blu_q + bias) * mul. Raise rather than silently wrap —
    tables beyond this envelope are also beyond the REFERENCE engine's
    own int32 arithmetic (mat.cu:262-303)."""
    bias = (1 << (shift - 1)) // mul if mul else 0
    prod = (int(blu_q) + bias) * int(mul)
    if prod >= 1 << 31:
        raise ValueError(
            f"requant table {name or ''} (blu_q={blu_q}, mul={mul}, "
            f"shift={shift}) needs {prod.bit_length()}-bit products; "
            "outside the int32 engine envelope even after mul/shift "
            "normalization — re-solve with a smaller shift"
        )


def blu_requant_i32(u: jnp.ndarray, blu_q: int, mul: int, shift: int) -> jnp.ndarray:
    """u int32 accumulator -> int8-valued int32 in [0, 127].

    u > blu_q  -> 127;  u < 0 -> 0;  else ((u + (1<<(shift-1))//mul)*mul)>>shift.
    The else-branch product may wrap int32 for u >> blu_q; those lanes are
    discarded by the select (jnp integer overflow wraps, no UB).

    blu_q/mul/shift: per-layer scalars or [out_ch] vectors broadcast over
    u's channel axis (per-channel tables).
    """
    blu_q = jnp.asarray(np.asarray(blu_q, np.int64), jnp.int32)
    mul = np.asarray(mul, np.int64)
    shift = np.asarray(shift, np.int64)
    bias = (1 << (shift - 1)) // mul
    mid = jnp.right_shift(
        (u + jnp.asarray(bias, jnp.int32)) * jnp.asarray(mul, jnp.int32),
        jnp.asarray(shift, jnp.int32),
    )
    return jnp.where(u > blu_q, THRESHOLD, jnp.where(u < 0, 0, mid))


def final_residual_i32(u: jnp.ndarray, mul: int, shift: int) -> jnp.ndarray:
    """res = (u*mul + (1<<(shift-1))) >> shift, arithmetic shift (floor)."""
    return jnp.right_shift(u * jnp.int32(mul) + jnp.int32(1 << (shift - 1)), shift)


def apply_residual_u8(x_uint8: jnp.ndarray, res_i32: jnp.ndarray) -> jnp.ndarray:
    """rec = clamp(x + res, 0, 255) -> uint8."""
    rec = x_uint8.astype(jnp.int32) + res_i32
    return jnp.clip(rec, 0, 255).astype(jnp.uint8)


def mul_shift_i32(u: jnp.ndarray, mul: int, shift: int) -> jnp.ndarray:
    """Unfused static requant with PRE-multiply bias and int8 wrap —
    the `mul_shift` kernel (mat.cu:248-261). Returns int8-valued int32."""
    bias = (1 << (shift - 1)) // mul
    out = jnp.right_shift((u + jnp.int32(bias)) * jnp.int32(mul), shift)
    return out.astype(jnp.int8).astype(jnp.int32)
