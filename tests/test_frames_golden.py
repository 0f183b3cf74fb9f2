import numpy as np

from telescope_cam_detection_tpu.utils.frames import (
    RecordedTrace,
    SyntheticFrameSource,
    make_frame_dict,
)
from telescope_cam_detection_tpu.utils.golden import compare_detections


def test_synthetic_source_deterministic():
    a = SyntheticFrameSource(width=64, height=48, seed=3).frame_at(5)
    b = SyntheticFrameSource(width=64, height=48, seed=3).frame_at(5)
    assert a.shape == (48, 64, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)


def test_synthetic_source_motion():
    src = SyntheticFrameSource(width=128, height=128, seed=0, noise_sigma=0)
    f0, f1 = src.frame_at(0), src.frame_at(1)
    assert not np.array_equal(f0, f1)


def test_frame_dict_contract():
    d = make_frame_dict(np.zeros((4, 4, 3), np.uint8), 7, "cam2", "North")
    assert set(d) == {"frame", "timestamp", "frame_id", "camera_id", "camera_name"}
    assert d["frame_id"] == 7 and d["camera_id"] == "cam2"


def test_recorded_trace_roundtrip(tmp_path):
    trace = RecordedTrace.synthesize(n_frames=4, width=32, height=32)
    trace.detections = [[{"bbox": {"x1": 1, "y1": 2, "x2": 3, "y2": 4}}]]
    trace.save(str(tmp_path / "trace"))
    loaded = RecordedTrace.load(str(tmp_path / "trace"))
    assert len(loaded.frames) == 4
    assert np.array_equal(loaded.frames[2], trace.frames[2])
    assert loaded.detections[0][0]["bbox"]["x2"] == 3


def _det(x1, y1, x2, y2, cls=14, conf=0.9):
    return {"bbox": {"x1": x1, "y1": y1, "x2": x2, "y2": y2},
            "class_id": cls, "confidence": conf}


def test_compare_detections_exact_match():
    golden = [_det(0, 0, 10, 10), _det(50, 50, 80, 90, cls=15)]
    report = compare_detections(golden, list(golden))
    assert report.passes(0.99)
    assert report.matched == 2 and report.missed == 0 and report.spurious == 0


def test_compare_detections_missed_and_spurious():
    golden = [_det(0, 0, 10, 10)]
    produced = [_det(100, 100, 120, 120)]
    report = compare_detections(golden, produced)
    assert report.missed == 1 and report.spurious == 1
    assert not report.passes()


def test_compare_detections_class_mismatch():
    report = compare_detections([_det(0, 0, 10, 10, cls=14)],
                                [_det(0, 0, 10, 10, cls=15)])
    assert report.class_mismatches == 1
    assert not report.passes()


def test_compare_detections_iou_gate():
    report = compare_detections([_det(0, 0, 100, 100)], [_det(0, 0, 100, 99)])
    assert report.matched == 1
    assert report.min_iou < 0.999
    assert report.passes(0.95) and not report.passes(0.999)


# -- WildSceneSource (hard quality-metric scenes) -----------------------------

def test_wild_scene_deterministic():
    from telescope_cam_detection_tpu.utils.frames import WildSceneSource
    a = WildSceneSource(width=320, height=240, seed=11,
                        size_range=(24, 80)).frame_at(9)
    b = WildSceneSource(width=320, height=240, seed=11,
                        size_range=(24, 80)).frame_at(9)
    assert a.shape == (240, 320, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)


def test_wild_scene_boxes_valid_and_clipped():
    from telescope_cam_detection_tpu.utils.frames import WildSceneSource
    # seeds cover 0..max_targets target counts; every returned box must be
    # in-frame, positive-area, and correspond to >=30% visible body
    for seed in range(6):
        src = WildSceneSource(width=320, height=240, seed=seed,
                              size_range=(24, 80))
        for fid in (0, 13, 50):
            for x1, y1, x2, y2 in src.boxes_at(fid):
                assert 0 <= x1 < x2 <= 320
                assert 0 <= y1 < y2 <= 240


def test_wild_scene_target_count_varies_by_seed():
    from telescope_cam_detection_tpu.utils.frames import WildSceneSource
    counts = {len(WildSceneSource(width=160, height=120, seed=s,
                                  size_range=(16, 48)).targets)
              for s in range(12)}
    assert len(counts) >= 3, counts   # not all scenes identical difficulty


def test_wild_scene_targets_move_and_distractors_sway():
    from telescope_cam_detection_tpu.utils.frames import WildSceneSource
    src = WildSceneSource(width=320, height=240, seed=1, noise_sigma=0,
                          size_range=(24, 80), illumination_drift=0)
    assert src.targets, "seed 1 must have targets for this test"
    f0, f1 = src.frame_at(0), src.frame_at(3)
    assert not np.array_equal(f0, f1)
    b0, b1 = src.boxes_at(0), src.boxes_at(5)
    if b0 and b1:
        assert b0 != b1   # trajectories advance


def test_wild_scene_difficulty_axes():
    """The round-5 hard axes (VERDICT r4 #9): night crushes luminance,
    motion blur smears a moving target, occluders draw OVER targets, and
    each stays deterministic."""
    from telescope_cam_detection_tpu.utils.frames import WildSceneSource
    kw = dict(width=320, height=240, seed=11, size_range=(24, 80))
    base = WildSceneSource(**kw).frame_at(7)
    night = WildSceneSource(night=True, **kw).frame_at(7)
    assert night.mean() < base.mean() * 0.5
    assert np.array_equal(night,
                          WildSceneSource(night=True, **kw).frame_at(7))

    # a fast target must smear: compare its pasted body variance along
    # the motion axis via whole-frame difference from the unblurred render
    blur = WildSceneSource(motion_blur=True, **kw)
    assert not np.array_equal(blur.frame_at(7), base)
    # boxes are identical — blur changes pixels, not ground truth
    assert blur.boxes_at(7) == WildSceneSource(**kw).boxes_at(7)

    occ = WildSceneSource(n_occluders=2, **kw)
    assert len(occ.occluders) == 2
    assert not np.array_equal(occ.frame_at(7), base)


def test_wild_scene_species_mode_labels():
    from telescope_cam_detection_tpu.utils.frames import (
        NUM_SPECIES, WildSceneSource)
    src = WildSceneSource(width=320, height=240, seed=4, species_mode=True,
                          max_targets=4, size_range=(24, 80))
    assert src.targets, "seed 4 must place targets"
    for t in src.targets:
        assert 0 <= t["species"] < NUM_SPECIES
    labels = src.labels_at(0)
    for box, sid in labels:
        assert 0 <= sid < NUM_SPECIES
    # non-species mode reports -1 species and identical boxes contract
    plain = WildSceneSource(width=320, height=240, seed=4,
                            size_range=(24, 80))
    assert all(sid == -1 for _b, sid in plain.labels_at(0))


def test_hard_scene_profiles_cycle_and_validate():
    from telescope_cam_detection_tpu.train.data import (
        HardSceneDetectionDataset)
    ds = HardSceneDetectionDataset(n=10, capture_hw=(240, 320),
                                   input_hw=(96, 96), n_sources=10, seed=5)
    # default mixture covers all five axes across sources
    ds.load(0)
    for key in range(5):
        ds._source(key)
    kinds = {(s.night, s.motion_blur, bool(s.occluders))
             for s in ds._sources.values()}
    assert len(kinds) >= 3
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown hard-scene profile"):
        HardSceneDetectionDataset(n=4, profiles=("nope",))
    # single-profile restriction for axis-sliced evals
    only_night = HardSceneDetectionDataset(
        n=4, capture_hw=(240, 320), input_hw=(96, 96), n_sources=4,
        seed=5, profiles=("night",))
    only_night._source(1)
    assert all(s.night for s in only_night._sources.values())


def test_hard_scene_dataset_contract():
    from telescope_cam_detection_tpu.train.data import HardSceneDetectionDataset
    ds = HardSceneDetectionDataset(n=8, capture_hw=(240, 320),
                                   input_hw=(128, 128), class_id=14)
    assert len(ds) == 8
    img, lbl = ds.load(3)
    assert img.shape == (128, 128, 3) and lbl.shape == (6, 5)
    valid = lbl[lbl[:, 4] >= 0]
    for x1, y1, x2, y2, cls in valid:
        assert cls == 14.0
        assert 0 <= x1 < x2 <= 128 and 0 <= y1 < y2 <= 128
    # deterministic reload
    img2, lbl2 = ds.load(3)
    assert np.array_equal(img, img2) and np.array_equal(lbl, lbl2)
