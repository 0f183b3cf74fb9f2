"""Species substrate: the closed synthetic taxonomy (SPECIES_TABLE), the
Stage-2 crop dataset, the serving taxonomy file format, and — when the
trained checkpoint ships — the earned accuracy of the served classifier
(VERDICT r4 #2: Stage-2 must not ride random weights in every artifact).
"""
import json
import os

import numpy as np
import pytest

from telescope_cam_detection_tpu.utils.frames import (
    NUM_SPECIES, SPECIES_TABLE, species_taxonomy, species_texture)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPECIES_CKPT = os.path.join(REPO, "weights", "eva02_species.npz")
TAXONOMY = os.path.join(REPO, "weights", "species_taxonomy.json")


class TestSpeciesTable:
    def test_taxonomy_structure(self):
        assert NUM_SPECIES == 16
        genera = {sp["genus"] for sp in SPECIES_TABLE}
        families = {sp["family"] for sp in SPECIES_TABLE}
        assert len(genera) == 4 and len(families) == 2
        # 4 species per genus, 2 genera per family: real hierarchy for the
        # hierarchical-fallback path to exercise
        for g in genera:
            assert sum(sp["genus"] == g for sp in SPECIES_TABLE) == 4
        names = [sp["common_name"] for sp in SPECIES_TABLE]
        assert len(set(names)) == NUM_SPECIES

    def test_texture_deterministic_and_distinct(self):
        a1, m1 = species_texture(0, 64, 96, np.random.default_rng(5))
        a2, m2 = species_texture(0, 64, 96, np.random.default_rng(5))
        assert (a1 == a2).all() and (m1 == m2).all()
        assert a1.shape == (64, 96, 3) and a1.dtype == np.uint8
        assert m1.any() and not m1.all()   # elliptical body, not full rect
        # pattern families differ in structure: a striped body's LUMINANCE
        # alternates (two-tone), a plain body's is a smooth gradient
        striped, _ = species_texture(0, 64, 96, np.random.default_rng(1))
        plain, _ = species_texture(12, 64, 96, np.random.default_rng(1))
        lum = lambda t: t[m1].astype(np.float32).mean(-1)  # noqa: E731
        assert lum(striped).std() > lum(plain).std() + 10

    def test_taxonomy_json_feeds_serving_loader(self, tmp_path):
        tax = species_taxonomy()
        assert len(tax) == NUM_SPECIES
        p = tmp_path / "tax.json"
        p.write_text(json.dumps(tax))
        from telescope_cam_detection_tpu.pipeline.species import load_taxonomy
        loaded = load_taxonomy(str(p))
        assert loaded["0"]["genus"] == "Vittafelis"
        assert loaded["15"]["family"] == "Canidra"


class TestSpeciesCropDataset:
    def test_shapes_balance_determinism(self):
        from telescope_cam_detection_tpu.train.data import SpeciesCropDataset
        ds = SpeciesCropDataset(n=32, image_size=96, seed=3)
        assert len(ds) == 32 and ds.num_classes == NUM_SPECIES
        img, cid = ds.load(5)
        assert img.shape == (96, 96, 3) and img.dtype == np.uint8
        assert cid == 5 % NUM_SPECIES
        img2, _ = ds.load(5)
        assert (img == img2).all()
        # different seed -> different pixels (train/val separation is real)
        other = SpeciesCropDataset(n=32, image_size=96, seed=4)
        assert not (other.load(5)[0] == img).all()
        # balanced labels
        labels = [ds.load(i)[1] for i in range(32)]
        assert all(labels.count(c) == 2 for c in range(NUM_SPECIES))

    def test_batches_onehot(self):
        from telescope_cam_detection_tpu.train.data import SpeciesCropDataset
        ds = SpeciesCropDataset(n=20, image_size=64, seed=0)
        imgs, onehot = next(ds.batches(8, seed=1))
        assert imgs.shape == (8, 64, 64, 3)
        assert onehot.shape == (8, NUM_SPECIES)
        assert (onehot.sum(-1) == 1).all()


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(SPECIES_CKPT),
                    reason="species checkpoint not shipped yet")
class TestShippedCheckpoint:
    """Pins the quality of the committed Stage-2 artifact: if a future
    change to the renderer/preprocess silently breaks what the shipped
    weights learned, this fails before the bench does."""

    def test_served_top1_on_held_out_crops(self):
        import bench
        m = bench.eval_species_top1(n=48, batch=16)
        assert m is not None
        assert m["species_top1"] >= 0.75
        assert m["species_top5"] >= 0.95

    def test_fused_two_stage_serves_shipped_species(self):
        """The shipped species checkpoint rides the FUSED serving program
        (attach_classifier): one gated dispatch on a species-profile scene
        returns per-crop species top-k computed from the committed
        weights (quality itself is pinned by the host-path tests above —
        this pins the fused wiring)."""
        import json as _json
        import jax.numpy as jnp
        from telescope_cam_detection_tpu.models.convert import (
            cast_tree_like, load_variables)
        from telescope_cam_detection_tpu.pipeline.species import (
            SpeciesClassifier)
        from telescope_cam_detection_tpu.runtime.program import (
            DetectorProgram, FilterSettings, ProgramSpec)
        from telescope_cam_detection_tpu.train.data import (
            HardSceneDetectionDataset)
        with open(os.path.splitext(SPECIES_CKPT)[0] + ".json") as f:
            meta = _json.load(f)
        clf = SpeciesClassifier(model_name=meta["variant"],
                                num_classes=meta["num_classes"],
                                input_size=meta["input_size"],
                                param_dtype=jnp.float32)
        clf.variables = cast_tree_like(
            load_variables(SPECIES_CKPT,
                           reference_variables=clf.variables),
            clf.variables)
        hw = (160, 160)
        prog = DetectorProgram(
            ProgramSpec(detector_type="yolox", variant="yolox-nano",
                        input_hw=hw, gates="device", gate_lanes=2,
                        max_det=8, pre_nms_topk=40), seed=0)
        prog.update_filters(FilterSettings(conf_threshold=0.0,
                                           wildlife_only=False))
        prog.attach_classifier(clf.model, clf.variables,
                               input_size=meta["input_size"], max_crops=2,
                               crop_padding_percent=20, min_crop_size=8)
        ds = HardSceneDetectionDataset(n=4, input_hw=hw, seed=4242,
                                       profiles=("species",), n_sources=4)
        img, _lbls, _sids = ds.load_with_species(0)
        rows, aux = prog.detect_batch_gated(
            img.astype(np.uint8)[None], lanes=[0])
        # the fused readback carries species top-k slots for this frame
        assert aux["species_prob"].shape[0] == 1
        assert aux["species_prob"].shape[2] >= 5
        k = aux["species_prob"].shape[2]
        assert aux["species_id"].shape == (1, 2, k)
        p = aux["species_prob"][0]
        assert (np.diff(p, axis=-1) <= 1e-6).all()   # descending top-k

    def test_hierarchical_serving_labels(self):
        """The served classifier + shipped taxonomy produce species-level
        labels on confident crops and genus/family fallbacks otherwise —
        through SpeciesClassifier.classify_batch_uniform, the exact
        two-stage serving entry."""
        import jax.numpy as jnp
        from telescope_cam_detection_tpu.models.convert import (
            cast_tree_like, load_variables)
        from telescope_cam_detection_tpu.pipeline.species import (
            SpeciesClassifier)
        from telescope_cam_detection_tpu.train.data import SpeciesCropDataset
        with open(os.path.splitext(SPECIES_CKPT)[0] + ".json") as f:
            meta = json.load(f)
        clf = SpeciesClassifier(model_name=meta["variant"],
                                num_classes=meta["num_classes"],
                                input_size=meta["input_size"],
                                taxonomy_file=TAXONOMY,
                                param_dtype=jnp.float32)
        clf.variables = cast_tree_like(
            load_variables(SPECIES_CKPT,
                           reference_variables=clf.variables),
            clf.variables)
        ds = SpeciesCropDataset(n=8, image_size=meta["input_size"],
                                seed=9999)
        crops = np.stack([ds.load(i)[0] for i in range(8)])
        results = clf.classify_batch_uniform(crops, top_k=5)
        assert len(results) == 8
        flat = [p for r in results for p in r]
        assert flat, "classifier returned no predictions at all"
        levels = {p["taxonomic_level"] for p in flat}
        assert levels <= {"species", "genus", "family", "order", "class"}
        # a trained checkpoint answers most held-out crops at species level
        top = [r[0] for r in results if r]
        assert sum(p["taxonomic_level"] == "species" for p in top) >= 5
