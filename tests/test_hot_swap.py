"""Zero-downtime weight hot-swap on config reload.

Model weights are dispatch arguments of the compiled programs, so a
weights-path-only change swaps live — no restart, no recompile. The
reference requires a full restart for ANY model change (main.py:608-617).
A bad path or mismatched tree must error WITHOUT touching the running
weights.
"""
import textwrap

import jax
import numpy as np
import pytest

from telescope_cam_detection_tpu.models.convert import save_variables
from telescope_cam_detection_tpu.system import TelescopeDetectionSystem


def _write_cfg(path, weights_line=""):
    path.write_text(textwrap.dedent(f"""
        cameras:
          - id: cam1
            protocol: synthetic
            target_width: 64
            target_height: 64
            enabled: true
        detection:
          detector_type: yolox
          yolox:
            model_name: yolox-nano
            {weights_line}
          input_size: [64, 64]
          conf_threshold: 0.3
          use_two_stage: false
          batching: {{enabled: true, max_batch_size: 2}}
        web: {{host: 127.0.0.1, port: 18999}}
        snapshots: {{enabled: false}}
    """))


@pytest.fixture()
def system(tmp_path):
    cfg = tmp_path / "config.yaml"
    _write_cfg(cfg)
    sys_obj = TelescopeDetectionSystem(str(cfg), load_weights=True)
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    yield sys_obj, cfg, tmp_path
    sys_obj.stop()


def _leaf(variables):
    return np.asarray(jax.tree.leaves(variables)[0])


def test_weights_path_change_swaps_live(system):
    sys_obj, cfg, tmp = system
    vars_now = jax.device_get(sys_obj.program.variables)
    modified = jax.tree.map(lambda a: a + 1.0 if a.dtype.kind == "f" else a,
                            vars_now)
    wpath = tmp / "new_weights.msgpack"
    save_variables(modified, str(wpath))

    _write_cfg(cfg, weights_line=f"weights: {wpath}")
    res = sys_obj.reload_config()
    assert res["success"] is True, res
    assert "detection.yolox.weights" in res["reloaded"]
    # weights-only change must NOT demand a restart
    assert "detection.yolox" not in res["requires_restart"], res
    np.testing.assert_allclose(_leaf(sys_obj.program.variables),
                               _leaf(modified))


def test_bad_weights_path_keeps_old_weights(system):
    """A rejected reload must apply NOTHING — not even hot-reloadable
    settings changed in the same edit (no half-applied config)."""
    sys_obj, cfg, tmp = system
    before = _leaf(jax.device_get(sys_obj.program.variables)).copy()
    _write_cfg(cfg, weights_line="weights: /nonexistent/nope.msgpack")
    cfg.write_text(cfg.read_text().replace("conf_threshold: 0.3",
                                           "conf_threshold: 0.55"))
    res = sys_obj.reload_config()
    assert res["success"] is False
    assert any("failed to load" in e for e in res["errors"])
    np.testing.assert_allclose(_leaf(sys_obj.program.variables), before)
    assert sys_obj.engines["cam1"]._settings["conf_threshold"] == 0.3


def test_swapped_tree_adopts_running_dtypes(system):
    """Fine-tune exports are f32; serving trees may be bf16 — the swap
    casts to the running dtypes so compiled argument signatures (and
    therefore the zero-recompile guarantee) never change."""
    import jax.numpy as jnp
    sys_obj, cfg, tmp = system
    # force a distinct running dtype on one leaf, then swap an f32 export
    vars_now = jax.device_get(sys_obj.program.variables)
    as_bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == np.float32 else a,
        vars_now)
    sys_obj.program.variables = as_bf16
    wpath = tmp / "f32.msgpack"
    save_variables(vars_now, str(wpath))
    _write_cfg(cfg, weights_line=f"weights: {wpath}")
    res = sys_obj.reload_config()
    assert res["success"] is True, res
    dtypes = {np.asarray(leaf).dtype
              for leaf in jax.tree.leaves(sys_obj.program.variables)}
    assert np.float32 not in dtypes


def test_mismatched_tree_keeps_old_weights(system):
    sys_obj, cfg, tmp = system
    from telescope_cam_detection_tpu.models.yolox import init_yolox
    _, wrong = init_yolox("yolox-nano", num_classes=3, input_hw=(64, 64))
    wpath = tmp / "wrong.msgpack"
    save_variables(jax.device_get(wrong), str(wpath))
    before = _leaf(jax.device_get(sys_obj.program.variables)).copy()

    _write_cfg(cfg, weights_line=f"weights: {wpath}")
    res = sys_obj.reload_config()
    assert res["success"] is False
    assert any("do not match" in e for e in res["errors"])
    np.testing.assert_allclose(_leaf(sys_obj.program.variables), before)


def test_model_name_change_still_requires_restart(system):
    sys_obj, cfg, _ = system
    _write_cfg(cfg, weights_line="")
    cfg.write_text(cfg.read_text().replace("model_name: yolox-nano",
                                           "model_name: yolox-tiny"))
    res = sys_obj.reload_config()
    assert res["success"] is True
    assert "detection.yolox" in res["requires_restart"]
