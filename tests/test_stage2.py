import json

import numpy as np
import pytest

from telescope_cam_detection_tpu.pipeline.activity import (
    get_activity_pattern,
    is_species_likely_active,
)
from telescope_cam_detection_tpu.pipeline.enhancement import ImageEnhancer
from telescope_cam_detection_tpu.pipeline.species import (
    SpeciesClassifier,
    load_taxonomy,
)
from telescope_cam_detection_tpu.pipeline.two_stage import (
    EnhancementCache,
    TwoStageDetectionPipeline,
)


@pytest.fixture(scope="module")
def tiny_classifier(tmp_path_factory):
    tax = {str(i): {"common_name": f"Species {i}", "name": f"species_{i}",
                    "genus": f"Genus{i}", "family": f"Family{i}",
                    "order": f"Order{i}", "class": "Mammalia"}
           for i in range(16)}
    p = tmp_path_factory.mktemp("tax") / "taxonomy.json"
    p.write_text(json.dumps(tax))
    return SpeciesClassifier(model_name="eva02-tiny", num_classes=16,
                             input_size=56, taxonomy_file=str(p), seed=0)


def test_load_taxonomy_text(tmp_path):
    p = tmp_path / "tax.txt"
    p.write_text("Coyote\nBobcat\n")
    tax = load_taxonomy(str(p))
    assert tax["0"] == "Coyote" and tax["1"] == "Bobcat"
    assert load_taxonomy(str(tmp_path / "missing.json")) == {}


def test_hierarchical_label_bands(tiny_classifier):
    c = tiny_classifier
    assert c.get_hierarchical_label(3, 0.9) == ("Species 3", "species")
    assert c.get_hierarchical_label(3, 0.45) == ("Genus3", "genus")
    assert c.get_hierarchical_label(3, 0.35) == ("Family3", "family")
    assert c.get_hierarchical_label(3, 0.25) == ("Mammalia", "class")
    assert c.get_hierarchical_label(3, 0.05) == (None, None)


@pytest.mark.slow
def test_classifier_batched(tiny_classifier):
    crops = np.random.default_rng(0).integers(
        0, 256, (3, 56, 56, 3), dtype=np.uint8)
    results = tiny_classifier.classify_batch_uniform(crops, top_k=3)
    assert len(results) == 3
    for preds in results:
        for p in preds:
            assert set(p) == {"species_id", "species_name",
                              "taxonomic_level", "confidence"}
    single = tiny_classifier.classify(crops[0], top_k=3)
    assert isinstance(single, list)
    stats = tiny_classifier.get_stats()
    assert stats["total_classified"] == 4


def test_geographic_filter(tiny_classifier):
    tiny_classifier.enable_geographic_filter = True
    tiny_classifier.allowed_species = {"Species 0"}
    crops = np.zeros((1, 56, 56, 3), np.uint8)
    results = tiny_classifier.classify_batch_uniform(crops)
    for p in results[0]:
        assert p["species_name"] == "Species 0"
    tiny_classifier.enable_geographic_filter = False


def test_activity_patterns():
    assert get_activity_pattern("Great Horned Owl").value == "nocturnal"
    assert get_activity_pattern("Gambel's Quail").value == "diurnal"
    assert get_activity_pattern("Coyote").value == "crepuscular"
    assert get_activity_pattern("Weird Unknown Beast") is None
    # keyword heuristics
    assert get_activity_pattern("Some Random Owl").value == "nocturnal"
    assert is_species_likely_active("Great Horned Owl", "night")
    assert not is_species_likely_active("Gambel's Quail", "night")
    assert is_species_likely_active("Unknown Thing", "night")


def test_enhancement_cache():
    cache = EnhancementCache(max_entries=2)
    crop = np.random.default_rng(0).integers(0, 256, (40, 40, 3), np.uint8)
    key = EnhancementCache.crop_key(crop)
    assert cache.get(key) is None
    cache.put(key, crop * 0)
    assert (cache.get(key) == 0).all()
    # eviction
    for i in range(3):
        c = np.full((8, 8, 3), i, np.uint8)
        cache.put(EnhancementCache.crop_key(c), c)
    assert len(cache._cache) == 2
    assert cache.stats()["hits"] == 1


def test_two_stage_pipeline_batched(tiny_classifier):
    # random-init weights give ~uniform probs (<0.2); drop the hierarchy
    # bands so labels survive for this wiring test
    tiny_classifier.hierarchy_thresholds = {k: 0.0 for k in
                                            tiny_classifier.hierarchy_thresholds}
    pipe = TwoStageDetectionPipeline(
        species_classifier=tiny_classifier, min_crop_size=20,
        confidence_threshold=0.0, crop_batch_size_hw=56)
    frame = np.random.default_rng(1).integers(0, 256, (200, 200, 3), np.uint8)
    detections = [
        {"class_id": 15, "class_name": "cat", "confidence": 0.9,
         "bbox": {"x1": 20, "y1": 20, "x2": 120, "y2": 120},
         "time_of_day": "day"},
        {"class_id": 2, "class_name": "car", "confidence": 0.9,   # not routed
         "bbox": {"x1": 0, "y1": 0, "x2": 50, "y2": 50}},
        {"class_id": 14, "class_name": "bird", "confidence": 0.8,  # too small
         "bbox": {"x1": 0, "y1": 0, "x2": 8, "y2": 8}},
    ]
    out = pipe.process_detections(frame, detections)
    assert "species" in out[0]
    assert out[0]["taxonomic_level"] not in ("order", "class")
    assert "species" not in out[1]   # car never classified
    assert "species" not in out[2]   # crop below min size
    stats = pipe.get_stats()
    assert stats["total_skipped_small"] == 1
    assert stats["total_classified"] >= 1


def test_two_stage_crop_padding():
    pipe = TwoStageDetectionPipeline(crop_padding_percent=40)
    frame = np.zeros((100, 100, 3), np.uint8)
    crop = pipe.extract_crop(frame, {"x1": 40, "y1": 40, "x2": 60, "y2": 60})
    # 20px box + 40% padding -> 28px (clamped inside frame)
    assert crop.shape[0] == 28 and crop.shape[1] == 28


def test_clahe_enhancer_improves_contrast():
    enh = ImageEnhancer(method="clahe", bilateral_d=5)
    # low-contrast smooth gradient (dark night-vision-like image)
    ramp = np.linspace(40, 70, 64, dtype=np.float32)
    crop = np.broadcast_to(ramp[None, :, None], (64, 64, 3)).astype(np.uint8).copy()
    out = enh.enhance(crop)
    assert out.shape == crop.shape and out.dtype == np.uint8
    # dynamic range stretched well beyond the original 30 levels
    assert int(out.max()) - int(out.min()) > int(crop.max()) - int(crop.min())
    assert enh.get_stats()["total_enhanced"] == 1


def test_enhancer_none_passthrough():
    enh = ImageEnhancer(method="none")
    crop = np.ones((32, 32, 3), np.uint8)
    assert enh.enhance(crop) is crop


def _bright_crop():
    # bright AND high-contrast: auto must pass it through
    rng = np.random.default_rng(3)
    return rng.integers(60, 256, (64, 64, 3), np.uint8)


def _dark_crop():
    ramp = np.linspace(20, 50, 64, dtype=np.float32)
    return np.broadcast_to(ramp[None, :, None],
                           (64, 64, 3)).astype(np.uint8).copy()


def test_auto_enhancement_selects_by_image_statistics(monkeypatch):
    """method=auto (the reference's planned SNR-aware tier): dark or
    low-contrast crops get CLAHE, good crops pass through untouched."""
    from telescope_cam_detection_tpu.pipeline import time_of_day as tod_mod
    monkeypatch.setattr(tod_mod, "classify_time_of_day",
                        lambda now=None: tod_mod.TimeOfDay.DAY)
    enh = ImageEnhancer(method="auto", bilateral_d=5)
    bright = _bright_crop()
    assert enh.enhance(bright) is bright
    out = enh.enhance(_dark_crop())
    assert out is not None and not np.array_equal(out, _dark_crop())
    stats = enh.get_stats()
    assert stats["auto_passthrough"] == 1 and stats["auto_enhanced"] == 1


def test_auto_enhancement_more_aggressive_at_night(monkeypatch):
    """The planned 'time-based enhancement': a borderline crop that passes
    in daylight gets enhanced at night (thresholds scale by night boost)."""
    from telescope_cam_detection_tpu.pipeline import time_of_day as tod_mod
    # borderline: gray luma ~112 sits between the day threshold (90) and
    # the night-boosted one (135); gray contrast ~42 between 35 and 52.5
    rng = np.random.default_rng(5)
    borderline = rng.normal(110, 66, (64, 64, 3)).clip(0, 255).astype(np.uint8)
    enh = ImageEnhancer(method="auto", bilateral_d=5)

    monkeypatch.setattr(tod_mod, "classify_time_of_day",
                        lambda now=None: tod_mod.TimeOfDay.DAY)
    assert enh.enhance(borderline) is borderline

    monkeypatch.setattr(tod_mod, "classify_time_of_day",
                        lambda now=None: tod_mod.TimeOfDay.NIGHT)
    assert enh.enhance(borderline) is not borderline
    assert enh.auto_enhanced == 1 and enh.auto_passthrough == 1


@pytest.mark.slow
def test_rrdbnet_shapes():
    import jax, jax.numpy as jnp
    from telescope_cam_detection_tpu.models.rrdbnet import RRDBNet
    model = RRDBNet(n_blocks=1)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 64, 64, 3)


def test_enhancement_cache_hits_on_upscaled_output():
    """Real-ESRGAN outputs 4x the input shape; the cache must still hit
    (regression: shape guard forced 0% hit rate)."""

    class FakeUpscaler:
        calls = 0

        def enhance(self, crop):
            FakeUpscaler.calls += 1
            return np.repeat(np.repeat(crop, 4, 0), 4, 1)

    pipe = TwoStageDetectionPipeline(enhancer=FakeUpscaler())
    crop = np.random.default_rng(0).integers(0, 256, (32, 32, 3), np.uint8)
    out1 = pipe._enhance(crop)
    out2 = pipe._enhance(crop)
    assert FakeUpscaler.calls == 1          # second call was a cache hit
    assert out1.shape == (128, 128, 3)
    assert np.array_equal(out1, out2)
