"""Batch masking tool for existing products (tools/mask_existing_clips.py)
— the reference's "No batch masking tool (yet)" gap
(PRIVACY_MASKING.md Current Limitations), closed here.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import mask_existing_clips as tool  # noqa: E402


def _jpg(path, seed=0, hw=(48, 64)):
    path.parent.mkdir(parents=True, exist_ok=True)
    frame = np.random.default_rng(seed).integers(
        0, 256, (*hw, 3), np.uint8)
    assert cv2.imwrite(str(path), frame)


def _mp4(path, frames=5, hw=(48, 64)):
    path.parent.mkdir(parents=True, exist_ok=True)
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                        10.0, (hw[1], hw[0]))
    rng = np.random.default_rng(7)
    for _ in range(frames):
        w.write(rng.integers(0, 256, (*hw, 3), np.uint8))
    w.release()


@pytest.fixture()
def clips_tree(tmp_path):
    _jpg(tmp_path / "cam1" / "raw" / "cat_1.jpg")
    _jpg(tmp_path / "cam1" / "raw" / "cat_2.jpg", seed=1)
    _jpg(tmp_path / "cam1" / "annotated" / "cat_1.jpg", seed=2)
    _jpg(tmp_path / "cam1" / "masked" / "cat_1.jpg", seed=3)  # pre-existing
    _jpg(tmp_path / "loose.png", seed=4)
    _mp4(tmp_path / "cam1" / "cat_clip.mp4")
    return tmp_path


def test_plan_targets_saver_layout(clips_tree):
    plans = {(k, s.relative_to(clips_tree).as_posix(),
              d.relative_to(clips_tree).as_posix())
             for k, s, d in tool.plan_outputs(clips_tree)}
    assert ("image", "cam1/raw/cat_1.jpg", "cam1/masked/cat_1.jpg") in plans
    assert ("image", "cam1/raw/cat_2.jpg", "cam1/masked/cat_2.jpg") in plans
    assert ("image", "loose.png", "loose_masked.png") in plans
    assert ("clip", "cam1/cat_clip.mp4", "cam1/cat_clip_masked.mp4") in plans
    # annotated/ is derived and masked/ is already output: neither re-masked
    assert not any("annotated" in s for _, s, _ in plans)
    assert not any(s.startswith("cam1/masked") for _, s, _ in plans)


def test_cli_masks_everything(clips_tree):
    rc = tool.main([str(clips_tree)])
    assert rc == 0
    assert (clips_tree / "cam1" / "masked" / "cat_2.jpg").exists()
    assert (clips_tree / "loose_masked.png").exists()
    out_clip = clips_tree / "cam1" / "cat_clip_masked.mp4"
    assert out_clip.exists()
    cap = cv2.VideoCapture(str(out_clip))
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    assert n == 5  # every frame re-encoded
    # pre-existing masked output untouched without --overwrite
    rc = tool.main([str(clips_tree)])
    assert rc == 0


def test_cli_dry_run_writes_nothing(clips_tree):
    before = sorted(p.as_posix() for p in clips_tree.rglob("*"))
    rc = tool.main([str(clips_tree), "--dry-run"])
    assert rc == 0
    assert sorted(p.as_posix() for p in clips_tree.rglob("*")) == before
