"""Native C++ IO vs the NumPy semantic definition."""

import numpy as np
import pytest

from qcnn_gpu_tpu import native
from qcnn_gpu_tpu.data import yuv
from qcnn_gpu_tpu.testing import synth_frames


needs_native = pytest.mark.skipif(native.lib() is None, reason="no C++ toolchain")


@needs_native
def test_native_read_matches_numpy(tmp_path):
    y = synth_frames(4, 24, 32, seed=5)
    path = str(tmp_path / "c.yuv")
    yuv.write_y_as_420(path, y)
    nat = native.read_y(path, 24, 32, frames=4)
    assert (nat == y).all()
    part = native.read_y(path, 24, 32, frames=2, start=1)
    assert (part == y[1:3]).all()


@needs_native
def test_native_read_errors(tmp_path):
    y = synth_frames(2, 16, 16, seed=1)
    path = str(tmp_path / "c.yuv")
    yuv.write_y_as_420(path, y)
    with pytest.raises(EOFError):
        native.read_y(path, 16, 16, frames=5)
    with pytest.raises(FileNotFoundError):
        native.read_y(str(tmp_path / "nope.yuv"), 16, 16, frames=1)


@needs_native
def test_native_write_roundtrip(tmp_path):
    y = synth_frames(2, 16, 24, seed=2)
    path = str(tmp_path / "n.yuv")
    assert native.write_y_as_420(path, y)
    assert (yuv.read_y(path, 16, 24) == y).all()
    import os

    assert os.path.getsize(path) == 2 * yuv.frame_size_420(16, 24)


@needs_native
def test_native_psnr_matches_numpy():
    a = synth_frames(2, 32, 32, seed=3)
    b = synth_frames(2, 32, 32, seed=4)
    assert native.psnr(a, b) == pytest.approx(yuv.psnr(a, b), abs=1e-12)
    assert native.psnr(a, a) == float("inf")


@needs_native
def test_read_y_dispatches_to_native(tmp_path):
    """data.yuv.read_y with explicit frames uses the native path; results
    must be identical either way."""
    y = synth_frames(3, 20, 28, seed=6)
    path = str(tmp_path / "d.yuv")
    yuv.write_y_as_420(path, y)
    assert (yuv.read_y(path, 20, 28, frames=3) == y).all()
