"""Tuned-kernel-config plumbing (ops/tuning.py).

The sweep (scripts/sweep_kernel.py) persists the measured-fastest
exactness-certified (th, we, wc) to assets/tuned_kernel.json; production
entry points build the Pallas pipeline through tuned_kwargs(). These
tests pin the precedence contract: env knobs > config file > builder
defaults, and that a tuned config flows through the interpreter-mode
kernel bit-exactly.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # fast host tier: `pytest -m quick`

from qcnn_gpu_tpu.ops import tuning


@pytest.fixture()
def clean_env(monkeypatch, tmp_path):
    for k in ("QCNN_KERNEL_TH", "QCNN_KERNEL_WE", "QCNN_KERNEL_WC"):
        monkeypatch.delenv(k, raising=False)
    # isolate from the real assets/tuned_kernel.json (present once a sweep
    # has run); tests that want a file set QCNN_KERNEL_CONFIG themselves
    monkeypatch.setenv("QCNN_KERNEL_CONFIG", str(tmp_path / "no_such.json"))
    return monkeypatch


def test_defaults_empty_without_file(clean_env, tmp_path):
    clean_env.setenv("QCNN_KERNEL_CONFIG", str(tmp_path / "absent.json"))
    assert tuning.tuned_kwargs() == {}


def test_file_roundtrip_and_extra_keys_dropped(clean_env, tmp_path):
    path = str(tmp_path / "tuned.json")
    # write_tuned drops non-knob keys (sweep rows carry ms_per_frame etc.)
    out = tuning.write_tuned({"th": 128, "we": 512, "wc": 2, "ms_per_frame": 8.1}, path)
    assert out == path
    clean_env.setenv("QCNN_KERNEL_CONFIG", path)
    assert tuning.tuned_kwargs() == {"th": 128, "we": 512, "wc": 2}


def test_env_overrides_file(clean_env, tmp_path):
    path = str(tmp_path / "tuned.json")
    tuning.write_tuned({"th": 128, "we": 512}, path)
    clean_env.setenv("QCNN_KERNEL_CONFIG", path)
    clean_env.setenv("QCNN_KERNEL_TH", "32")
    assert tuning.tuned_kwargs() == {"th": 32, "we": 512}


def test_partial_file_ok(clean_env, tmp_path):
    path = str(tmp_path / "tuned.json")
    with open(path, "w") as fp:
        json.dump({"th": 16}, fp)
    clean_env.setenv("QCNN_KERNEL_CONFIG", path)
    assert tuning.tuned_kwargs() == {"th": 16}


def test_corrupt_file_ignored(clean_env, tmp_path):
    path = str(tmp_path / "tuned.json")
    with open(path, "w") as fp:
        fp.write("{not json")
    clean_env.setenv("QCNN_KERNEL_CONFIG", path)
    assert tuning.tuned_kwargs() == {}


def test_tuned_config_flows_into_kernel_bit_exact(clean_env, tmp_path):
    """A non-default tuned config drives the (interpreter-mode) fused
    kernel and stays bit-exact vs the oracle."""
    from qcnn_gpu_tpu.models import oracle
    from qcnn_gpu_tpu.ops.pallas_pipeline2 import build_pallas_forward2
    from qcnn_gpu_tpu.testing import synth_engine_params, synth_frames

    path = str(tmp_path / "tuned.json")
    tuning.write_tuned({"th": 16}, path)
    clean_env.setenv("QCNN_KERNEL_CONFIG", path)
    p = synth_engine_params(37)
    xs = synth_frames(2, 24, 40, seed=3)
    run = build_pallas_forward2(p, interpret=True, **tuning.tuned_kwargs())
    assert (np.asarray(run(xs)) == oracle.forward_blu(xs, p)).all()


def test_shipping_default_path_is_repo_assets():
    assert tuning.TUNED_PATH.endswith(os.path.join("assets", "tuned_kernel.json"))


def test_valid_json_wrong_types_ignored(clean_env, tmp_path):
    # {"th": null} / non-object top level parse as JSON but are not knobs
    for payload in ('{"th": null}', "3", '["th"]'):
        path = str(tmp_path / "t.json")
        with open(path, "w") as fp:
            fp.write(payload)
        clean_env.setenv("QCNN_KERNEL_CONFIG", path)
        assert tuning.tuned_kwargs() == {}


def test_bad_env_value_skipped(clean_env):
    clean_env.setenv("QCNN_KERNEL_TH", "fast")
    clean_env.setenv("QCNN_KERNEL_WE", "512")
    assert tuning.tuned_kwargs() == {"we": 512}


def test_use_file_false_keeps_env_only(clean_env, tmp_path):
    path = str(tmp_path / "tuned.json")
    tuning.write_tuned({"th": 128}, path)
    clean_env.setenv("QCNN_KERNEL_CONFIG", path)
    clean_env.setenv("QCNN_KERNEL_WC", "2")
    assert tuning.tuned_kwargs(use_file=False) == {"wc": 2}
    assert tuning.tuned_kwargs() == {"th": 128, "wc": 2}


def test_per_geometry_selection(clean_env, tmp_path):
    path = str(tmp_path / "tuned.json")
    tuning.write_tuned({"th": 64, "we": 256, "wc": 1, "kernel": 3}, path)
    tuning.write_tuned({"th": 32, "we": 128}, path, geometry="240x416")
    tuning.write_tuned({"th": 128, "we": 256}, path, geometry="2160x3840")
    clean_env.setenv("QCNN_KERNEL_CONFIG", path)

    # top-level knobs survive the per-geometry writes
    base = tuning.tuned_kwargs()
    assert base == {"th": 64, "we": 256, "wc": 1, "kernel": 3}
    # exact geometry match overlays the base
    kw = tuning.tuned_kwargs(h=240, w=416)
    assert kw["th"] == 32 and kw["we"] == 128
    assert kw["wc"] == 1 and kw["kernel"] == 3  # inherited
    # nearest-class fallback: 1600p is closer (log-pixel) to 4K than 240p
    assert tuning.geometry_class(1600, 2560) == "2160x3840"
    assert tuning.tuned_kwargs(h=1600, w=2560)["th"] == 128
    # env still beats everything
    clean_env.setenv("QCNN_KERNEL_TH", "96")
    assert tuning.tuned_kwargs(h=240, w=416)["th"] == 96


def test_geometry_class_none_without_table(clean_env, tmp_path):
    path = str(tmp_path / "flat.json")
    tuning.write_tuned({"th": 64}, path)
    clean_env.setenv("QCNN_KERNEL_CONFIG", path)
    assert tuning.geometry_class(1080, 1920) is None
    assert tuning.tuned_kwargs(h=1080, w=1920) == {"th": 64}


def test_s1_knob_roundtrip_env_and_file(clean_env, tmp_path):
    """The kernel-v5 string knob (s1) travels through write_tuned, the
    file tier, and the QCNN_KERNEL_S1 env tier."""
    path = str(tmp_path / "tuned.json")
    tuning.write_tuned({"th": 90, "s1": "op6", "kernel": 3}, path)
    clean_env.setenv("QCNN_KERNEL_CONFIG", path)
    assert tuning.tuned_kwargs() == {"th": 90, "kernel": 3, "s1": "op6"}
    clean_env.setenv("QCNN_KERNEL_S1", "a1t")
    assert tuning.tuned_kwargs()["s1"] == "a1t"
    clean_env.delenv("QCNN_KERNEL_S1")
    # non-string s1 in the file is skipped, not fatal
    import json as _json

    with open(path) as fp:
        data = _json.load(fp)
    data["s1"] = 7
    with open(path, "w") as fp:
        _json.dump(data, fp)
    assert "s1" not in tuning.tuned_kwargs()


def test_batch1_override_block(clean_env, tmp_path):
    """per_geometry entries may carry a batch1 sub-block applied only for
    batch=1 builds (latency winner != throughput winner)."""
    import json as _json

    path = str(tmp_path / "tuned.json")
    with open(path, "w") as fp:
        _json.dump(
            {
                "th": 64,
                "per_geometry": {
                    "1080x1920": {"th": 90, "s1": "op6", "batch1": {"th": 72}}
                },
            },
            fp,
        )
    clean_env.setenv("QCNN_KERNEL_CONFIG", path)
    kwN = tuning.tuned_kwargs(h=1080, w=1920)
    kw1 = tuning.tuned_kwargs(h=1080, w=1920, batch=1)
    assert kwN["th"] == 90 and kw1["th"] == 72
    assert kw1["s1"] == "op6"  # non-overridden knobs inherited
    # other batch sizes ignore the block
    assert tuning.tuned_kwargs(h=1080, w=1920, batch=16)["th"] == 90


def test_build_tuned_s1_reaches_kernel(clean_env, tmp_path):
    """s1 from the tuned file reaches build_pallas_forward3 (run.s1)."""
    import json as _json

    path = str(tmp_path / "tuned.json")
    with open(path, "w") as fp:
        _json.dump({"th": 8, "we": 256, "s1": "op6", "kernel": 3}, fp)
    clean_env.setenv("QCNN_KERNEL_CONFIG", path)
    from qcnn_gpu_tpu.testing import synth_engine_params

    run = tuning.build_tuned(synth_engine_params(37), interpret=True)
    assert run.s1 == "op6"
