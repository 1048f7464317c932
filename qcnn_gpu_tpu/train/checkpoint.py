"""Checkpoint/resume for training state.

Replaces tf.train.Saver (model.py:70, 146-149, 307-316) with a simple
npz-based format (params + optimizer state + step), plus latest-pointer
semantics mirroring get_checkpoint_state. Orbax is available in the image
but a 54.5k-parameter model does not need async sharded checkpointing;
keeping this dependency-light and byte-inspectable.
"""

from __future__ import annotations

import json
import os
from typing import Any, Tuple

import jax
import numpy as np


def _flatten(tree) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, params, opt_state, step: int) -> None:
    """Writes `<path>/ckpt-<step>.npz` and updates `<path>/latest`."""
    os.makedirs(path, exist_ok=True)
    p_leaves, _ = _flatten(params)
    o_leaves, _ = _flatten(opt_state)
    arrays = {f"p{i}": np.asarray(x) for i, x in enumerate(p_leaves)}
    arrays.update({f"o{i}": np.asarray(x) for i, x in enumerate(o_leaves)})
    fname = os.path.join(path, f"ckpt-{step}.npz")
    np.savez(fname, **arrays)
    with open(os.path.join(path, "latest"), "w") as fp:
        json.dump({"file": os.path.basename(fname), "step": step}, fp)


def latest_checkpoint(path: str):
    meta_path = os.path.join(path, "latest")
    if not os.path.exists(meta_path):
        return None
    with open(meta_path) as fp:
        meta = json.load(fp)
    return os.path.join(path, meta["file"]), meta["step"]


def load_checkpoint(path: str, params_template, opt_template):
    """Restores into the same pytree structure as the templates."""
    found = latest_checkpoint(path)
    if found is None:
        raise FileNotFoundError(f"no checkpoint under {path}")
    fname, step = found
    data = np.load(fname)
    p_leaves, p_def = _flatten(params_template)
    o_leaves, o_def = _flatten(opt_template)
    new_p = [data[f"p{i}"] for i in range(len(p_leaves))]
    new_o = [data[f"o{i}"] for i in range(len(o_leaves))]
    params = jax.tree_util.tree_unflatten(p_def, new_p)
    opt_state = jax.tree_util.tree_unflatten(o_def, new_o)
    return params, opt_state, step
