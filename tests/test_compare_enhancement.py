"""Enhancement A/B tool (tools/compare_enhancement.py) — the reference's
planned "A/B testing framework to compare methods"
(STAGE2_ENHANCEMENT_OPTIONS.md Future Enhancements)."""
import json
import sys
from pathlib import Path

import pytest

cv2 = pytest.importorskip("cv2")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import compare_enhancement as tool  # noqa: E402


def test_synth_crops_are_low_light():
    crops = tool._synth_crops(4)
    assert len(crops) == 4
    for c in crops:
        assert c.dtype.name == "uint8" and c.shape == (128, 128, 3)
        assert tool._gray(c).mean() < 90  # genuinely dim


def test_ab_report_metrics(tmp_path, capsys, monkeypatch):
    # force DAY so the auto row is deterministic regardless of wall clock
    from telescope_cam_detection_tpu.pipeline import time_of_day as tod_mod
    monkeypatch.setattr(tod_mod, "classify_time_of_day",
                        lambda now=None: tod_mod.TimeOfDay.DAY)
    rc = tool.main(["--limit", "3", "--methods", "none", "clahe", "auto"])
    assert rc == 0
    out = capsys.readouterr().out
    report = json.loads(out[out.index("{"):])
    assert report["none"]["contrast_gain"] == 1.0
    assert report["clahe"]["contrast_gain"] > 1.0  # CLAHE stretches range
    assert report["clahe"]["entropy_gain_bits"] > 0
    # synthetic crops are dim -> auto enhances them all in DAY mode too
    assert report["auto"]["auto_enhanced"] == 3


def test_crops_dir_loading(tmp_path):
    import numpy as np
    for i in range(3):
        img = np.random.default_rng(i).integers(0, 256, (32, 32, 3),
                                                np.uint8)
        cv2.imwrite(str(tmp_path / f"c{i}.jpg"), img)
    crops = tool._load_crops(tmp_path, limit=2)
    assert len(crops) == 2
