"""Weight converter: flax<->torch-name mapping roundtrip and checkpoint IO."""
import numpy as np
import pytest

import jax

from telescope_cam_detection_tpu.models.convert import (
    convert_yolox_from_torch,
    export_yolox_to_torch_names,
    flax_path_to_torch_name,
    load_variables,
    save_variables,
)
from telescope_cam_detection_tpu.models.yolox import init_yolox


@pytest.fixture(scope="module")
def nano_vars():
    _, variables = init_yolox("yolox-nano", num_classes=8, input_hw=(64, 64))
    return variables


def test_path_translation_examples():
    assert flax_path_to_torch_name(
        "params", ("backbone", "stem", "conv", "conv", "kernel")
    ) == "backbone.backbone.stem.conv.conv.weight"
    assert flax_path_to_torch_name(
        "params", ("backbone", "dark3_csp", "m0", "conv1", "conv", "kernel")
    ) == "backbone.backbone.dark3.1.m.0.conv1.conv.weight"
    assert flax_path_to_torch_name(
        "params", ("backbone", "dark5_spp", "conv2", "bn", "scale")
    ) == "backbone.backbone.dark5.1.conv2.bn.weight"
    assert flax_path_to_torch_name(
        "batch_stats", ("neck", "C3_p4", "conv3", "bn", "mean")
    ) == "backbone.C3_p4.conv3.bn.running_mean"
    assert flax_path_to_torch_name(
        "params", ("head", "cls_conv1_0", "conv", "kernel")
    ) == "head.cls_convs.1.0.conv.weight"
    assert flax_path_to_torch_name(
        "params", ("head", "obj_pred2", "kernel")
    ) == "head.obj_preds.2.weight"


def test_export_import_roundtrip(nano_vars):
    """export (flax -> Megvii-named OIHW) then convert back must be exact."""
    state = export_yolox_to_torch_names(nano_vars)
    assert any(k.startswith("backbone.backbone.stem") for k in state)
    assert any(k.startswith("head.cls_preds.0") for k in state)
    # conv weights really are OIHW
    w = state["backbone.backbone.stem.conv.conv.weight"]
    assert w.ndim == 4 and w.shape[2] == w.shape[3] == 3  # HxW last

    # perturb one tensor so we can prove values flow through
    state["head.obj_preds.0.bias"] = state["head.obj_preds.0.bias"] + 1.0

    restored = convert_yolox_from_torch(state, nano_vars)
    flat_orig = jax.tree_util.tree_leaves_with_path(nano_vars["params"])
    for path, orig in flat_orig:
        keys = tuple(getattr(p, "key", getattr(p, "name", None)) for p in path)
        node = restored["params"]
        for k in keys:
            node = node[k]
        if keys[:2] == ("head", "obj_pred0") and keys[-1] == "bias":
            np.testing.assert_allclose(np.asarray(node),
                                       np.asarray(orig) + 1.0)
        else:
            np.testing.assert_allclose(np.asarray(node), np.asarray(orig),
                                       err_msg=str(keys))
    # batch stats round too
    bs_orig = jax.tree_util.tree_leaves(nano_vars["batch_stats"])
    bs_new = jax.tree_util.tree_leaves(restored["batch_stats"])
    for a, b in zip(bs_orig, bs_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_convert_reports_missing_and_shape_mismatch(nano_vars, caplog):
    state = export_yolox_to_torch_names(nano_vars)
    del state["head.obj_preds.0.bias"]
    restored = convert_yolox_from_torch(state, nano_vars)  # warns, keeps init
    assert restored is not None

    state = export_yolox_to_torch_names(nano_vars)
    state["head.obj_preds.0.bias"] = np.zeros((999,), np.float32)
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_yolox_from_torch(state, nano_vars)


def test_msgpack_save_load_roundtrip(nano_vars, tmp_path):
    path = tmp_path / "weights.msgpack"
    save_variables(nano_vars, str(path))
    loaded = load_variables(str(path))
    a = jax.tree_util.tree_leaves(nano_vars)
    b = jax.tree_util.tree_leaves(loaded)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    assert load_variables(str(tmp_path / "missing.msgpack")) is None


def test_torch_pth_roundtrip(nano_vars, tmp_path):
    """Save a real torch .pth checkpoint (Megvii layout) and load it."""
    torch = pytest.importorskip("torch")
    state = {k: torch.from_numpy(np.asarray(v))
             for k, v in export_yolox_to_torch_names(nano_vars).items()}
    path = tmp_path / "yolox_nano.pth"
    torch.save({"model": state, "start_epoch": 300}, str(path))
    restored = load_variables(str(path), reference_variables=nano_vars)
    assert restored is not None
    a = jax.tree_util.tree_leaves(nano_vars["params"])
    b = jax.tree_util.tree_leaves(restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
