"""Channel-sharded (tensor-parallel) conv layers — the TP analog.

SURVEY.md §2.4 P6: the reference has no model parallelism; the TPU build
introduces optional channel sharding for wide-CNN stretch configs (an
EDSR-scale restoration net has 256+ channels where sharding weights
matters; QVRCNN's 64 channels fit one chip trivially, so this component is
exercised at demonstration scale and kept exactly output-equivalent).

Scheme (the standard pair of shardings for back-to-back convs):
  * layer L: OUTPUT channels sharded over the mesh's `tp` axis — each
    device holds w[..., :, shard] and computes its slice of the feature
    map; no communication.
  * layer L+1: INPUT channels sharded — each device contracts its local
    channel slice and the partial sums combine with ONE psum.

For the float model this wraps residual_float with a 2-conv TP pattern;
`tp_pair_forward` is the reusable primitive. Integer semantics note: a
psum of int32 partials is exact, so the same scheme applies to the INT8
engine unchanged (the requant epilogue runs after the psum).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=_DN)


def tp_pair_forward(x, w_a, b_a, w_b, b_b, axis_name: str):
    """Two chained convs with channel sharding over `axis_name`.

    Call under shard_map with w_a sharded on its OUTPUT-channel dim and
    w_b sharded on its INPUT-channel dim; x and the result replicated.
    The hidden activation never materializes unsharded; one psum combines
    the second conv's partial sums. Exactly equals the unsharded pair.
    """
    h = jnp.maximum(_conv(x, w_a) + b_a, 0.0)  # local out-channel slice
    partial_out = _conv(h, w_b)  # partial sum over local in-channels
    out = lax.psum(partial_out, axis_name)
    return out + b_b


def make_tp_conv_pair(mesh: Mesh, axis: str = "sp"):
    """Jitted fn(x, w_a, b_a, w_b, b_b) computing the sharded pair over
    mesh axis `axis` (weights passed unsharded; shard_map splits them)."""

    f = shard_map(
        partial(tp_pair_forward, axis_name=axis),
        mesh=mesh,
        in_specs=(
            P(),  # x replicated
            P(None, None, None, axis),  # w_a out-channels sharded
            P(axis),  # b_a sharded
            P(None, None, axis, None),  # w_b in-channels sharded
            P(),  # b_b replicated
        ),
        out_specs=P(),
        check_rep=False,
    )
    return jax.jit(f)
