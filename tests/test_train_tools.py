import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from telescope_cam_detection_tpu.train.data import (
    DetectionDataset,
    SyntheticDetectionDataset,
    find_pairs,
    load_yolo_labels,
    split_pairs,
)
from telescope_cam_detection_tpu.train.evaluate import (
    average_precision,
    evaluate_detections,
)

REPO = Path(__file__).resolve().parent.parent


def test_load_yolo_labels(tmp_path):
    lbl = tmp_path / "img.txt"
    lbl.write_text("1 0.5 0.5 0.2 0.4\n2 0.25 0.25 0.1 0.1\n")
    out = load_yolo_labels(lbl, (100, 200), max_gt=5)
    assert out.shape == (5, 5)
    np.testing.assert_allclose(out[0], [80, 30, 120, 70, 1])
    np.testing.assert_allclose(out[1], [40, 20, 60, 30, 2])
    assert (out[2:] == -1).all()


def test_find_and_split_pairs(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i in range(10):
        (tmp_path / "images" / f"f{i}.jpg").write_bytes(b"x")
        (tmp_path / "labels" / f"f{i}.txt").write_text("0 0.5 0.5 0.1 0.1")
    (tmp_path / "images" / "unlabeled.jpg").write_bytes(b"x")
    pairs = find_pairs(str(tmp_path / "images"))
    assert len(pairs) == 10
    train, val = split_pairs(pairs, 0.2, seed=1)
    assert len(train) == 8 and len(val) == 2
    assert not set(train) & set(val)


def test_synthetic_dataset_batches():
    ds = SyntheticDetectionDataset(n=8, input_hw=(64, 64), num_classes=3)
    img, lbl = ds.load(0)
    assert img.shape == (64, 64, 3)
    assert lbl.shape == (5, 5)
    assert (lbl[:, 4] >= 0).sum() >= 1
    batches = list(ds.batches(4, epochs=1))
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 64, 64, 3)
    # deterministic per index
    img2, lbl2 = ds.load(0)
    assert np.array_equal(img, img2) and np.array_equal(lbl, lbl2)


def test_average_precision_perfect_and_empty():
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    assert average_precision(scores, np.array([1, 1, 1], bool), 3) == pytest.approx(1.0)
    assert average_precision(scores, np.array([0, 0, 0], bool), 3) == 0.0
    assert average_precision(scores, np.array([1, 1, 1], bool), 0) == 0.0


def _det(x1, y1, x2, y2, cls, conf):
    return {"bbox": {"x1": x1, "y1": y1, "x2": x2, "y2": y2},
            "class_id": cls, "confidence": conf}


def test_evaluate_detections_perfect_score():
    gts = [np.array([[10, 10, 50, 50, 0], [60, 60, 90, 90, 1]], np.float32)]
    preds = [[_det(10, 10, 50, 50, 0, 0.9), _det(60, 60, 90, 90, 1, 0.8)]]
    m = evaluate_detections(preds, gts)
    assert m["mAP50"] == pytest.approx(1.0)
    assert m["mAP50_95"] == pytest.approx(1.0)


def test_evaluate_detections_penalizes_misses_and_fps():
    gts = [np.array([[10, 10, 50, 50, 0]], np.float32)]
    preds = [[_det(200, 200, 240, 240, 0, 0.9)]]  # pure false positive
    m = evaluate_detections(preds, gts)
    assert m["mAP50"] == 0.0
    # slightly offset box: AP50 hit, AP95 miss
    preds = [[_det(12, 12, 52, 52, 0, 0.9)]]
    m = evaluate_detections(preds, gts)
    assert m["mAP50"] == pytest.approx(1.0)
    assert m["mAP50_95"] < 1.0


@pytest.mark.slow
def test_train_cli_synthetic_smoke(tmp_path):
    """End-to-end training CLI: 2 epochs on synthetic data, checkpoint +
    serving export."""
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
           "PYTHONPATH": str(REPO), "HOME": str(tmp_path)}
    result = subprocess.run(
        [sys.executable, str(REPO / "training/scripts/train_custom_model.py"),
         "--synthetic", "--epochs", "2", "--steps-per-epoch", "2",
         "--batch", "2", "--variant", "yolox-nano", "--classes", "3",
         "--input", "96", "96", "--out", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=900, env=env)
    assert result.returncode == 0, result.stderr[-2000:]
    assert "epoch 2/2" in result.stdout
    assert (tmp_path / "run" / "yolox-nano_custom.msgpack").exists()
    assert list((tmp_path / "run" / "checkpoints").iterdir())


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from telescope_cam_detection_tpu.train.checkpoint import (
        restore_train_state, save_train_state)
    from telescope_cam_detection_tpu.train.trainer import build_training
    model, state, step = build_training(variant="yolox-nano", num_classes=3,
                                        input_hw=(96, 96))
    state = state.replace(step=state.step + 7)
    save_train_state(str(tmp_path / "ckpt"), state)
    model2, fresh, _ = build_training(variant="yolox-nano", num_classes=3,
                                      input_hw=(96, 96), seed=1)
    restored = restore_train_state(str(tmp_path / "ckpt"), fresh)
    assert int(jax.device_get(restored.step)) == 7
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_evaluate_jax_model_yolox():
    """The shared eval helper (per-epoch CLI mAP) runs the deploy decode
    on a dataset and returns the metric contract."""
    from telescope_cam_detection_tpu.models.yolox import init_yolox
    from telescope_cam_detection_tpu.train.data import SyntheticDetectionDataset
    from telescope_cam_detection_tpu.train.evaluate import evaluate_jax_model

    model, variables = init_yolox("yolox-nano", num_classes=3,
                                  input_hw=(96, 96), seed=0)
    ds = SyntheticDetectionDataset(n=4, input_hw=(96, 96), num_classes=3)
    m = evaluate_jax_model(model, variables, ds, family="yolox", limit=2)
    assert set(m) == {"mAP50", "mAP50_95", "per_class"}
    assert 0.0 <= m["mAP50"] <= 1.0


@pytest.mark.slow
def test_evaluate_jax_model_rtdetr():
    from telescope_cam_detection_tpu.models.rtdetr import init_rtdetr
    from telescope_cam_detection_tpu.train.data import SyntheticDetectionDataset
    from telescope_cam_detection_tpu.train.evaluate import evaluate_jax_model

    model, variables = init_rtdetr("rtdetrv2-r18vd", num_classes=3,
                                   input_hw=(96, 96), seed=0,
                                   sampling_impl="xla")
    ds = SyntheticDetectionDataset(n=2, input_hw=(96, 96), num_classes=3)
    m = evaluate_jax_model(model, variables, ds, family="rtdetr", limit=2)
    assert 0.0 <= m["mAP50"] <= 1.0
