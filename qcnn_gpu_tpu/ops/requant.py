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

THRESHOLD = 127


def blu_requant_i32(u: jnp.ndarray, blu_q: int, mul: int, shift: int) -> jnp.ndarray:
    """u int32 accumulator -> int8-valued int32 in [0, 127].

    u > blu_q  -> 127;  u < 0 -> 0;  else ((u + (1<<(shift-1))//mul)*mul)>>shift.
    The else-branch product may wrap int32 for u >> blu_q; those lanes are
    discarded by the select (jnp integer overflow wraps, no UB).
    """
    bias = (1 << (shift - 1)) // mul
    mid = jnp.right_shift((u + jnp.int32(bias)) * jnp.int32(mul), shift)
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
