"""Full system with the coordinator + Stage-2 path enabled: the reference's
§3.3 flow where Stage-2 classification runs inside the coordinator-thread
callback. Uses tiny models and a synthetic taxonomy."""
import json
import queue
import socket
import textwrap
import time

import numpy as np
import pytest

from telescope_cam_detection_tpu.system import TelescopeDetectionSystem


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def system(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sys2")
    tax = {str(i): {"common_name": f"Species {i}", "genus": f"G{i}",
                    "family": f"F{i}", "order": f"O{i}", "class": "Mammalia"}
           for i in range(16)}
    tax_path = tmp / "tax.json"
    tax_path.write_text(json.dumps(tax))
    port = _free_port()
    cfg = textwrap.dedent(f"""
        cameras:
          - id: cam1
            protocol: synthetic
            target_width: 128
            target_height: 128
            fps: 10
        detection:
          detector_type: yolox
          yolox: {{model_name: yolox-nano}}
          input_size: [128, 128]
          conf_threshold: 0.0
          wildlife_only: false
          min_box_area: 0
          max_detections: 6
          use_two_stage: true
          batching: {{enabled: true, max_batch_size: 2, max_batch_wait_ms: 20.0}}
        species_classification:
          enabled: true
          confidence_threshold: 0.0
          preprocessing: {{crop_padding_percent: 20, min_crop_size: 8}}
          inat_classifier:
            model_name: eva02-tiny
            num_classes: 16
            input_size: 56
            taxonomy_file: {tax_path}
            use_hierarchical: false
        performance:
          frame_queue_size: 2
          detection_queue_size: 10
        motion_filter: {{enabled: false}}
        time_of_day_filter: {{enabled: true}}
        snapshots: {{enabled: false}}
        web: {{host: 127.0.0.1, port: {port}}}
        camera_health: {{enabled: false}}
    """)
    cfg_path = tmp / "config.yaml"
    cfg_path.write_text(cfg)

    sys_obj = TelescopeDetectionSystem(str(cfg_path), load_weights=False)
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    # route every class to stage 2 so random-weight detections classify
    for pipe in (e.two_stage_pipeline for e in sys_obj.engines.values()):
        pipe.classify_classes = {i: "any" for i in range(80)}
    sys_obj.start(block=False)
    yield sys_obj, port
    sys_obj.stop()


@pytest.mark.slow
def test_two_stage_species_flow(system):
    sys_obj, port = system
    deadline = time.time() + 120
    result = None
    while time.time() < deadline:
        try:
            result = sys_obj.detection_queue.get(timeout=2)
        except queue.Empty:
            continue
        if result["detections"] and any(
                "species" in d for d in result["detections"]):
            break
    assert result is not None and result["detections"], "no detections flowed"
    annotated = [d for d in result["detections"] if "species" in d]
    assert annotated, f"no species annotations: {result['detections'][:1]}"
    d = annotated[0]
    assert d["species"].startswith("Species ")
    assert 0.0 <= d["species_confidence"] <= 1.0
    assert d["taxonomic_level"] == "species"
    assert "species_top_k" in d
    # stage-2 ran inside the coordinator callback (engine is in coord mode)
    assert sys_obj.engines["cam1"].coordinator is not None
    stats = sys_obj.coordinator.get_stats()
    assert stats["total_frames"] > 0


@pytest.mark.slow
def test_two_stage_stats_surface(system):
    sys_obj, _ = system
    pipe = sys_obj.engines["cam1"].two_stage_pipeline
    stats = pipe.get_stats()
    assert stats["total_detections"] > 0
    assert stats["classifier"]["total_classified"] > 0


@pytest.mark.slow
def test_bad_classifier_weights_fatal(tmp_path):
    """A configured Stage-2 weights path that fails to load must abort
    startup exactly like the detector path — not serve random-weight
    species labels from a 'healthy' system."""
    tax = {"0": {"common_name": "S", "genus": "G", "family": "F",
                 "order": "O", "class": "Mammalia"}}
    tax_path = tmp_path / "tax.json"
    tax_path.write_text(json.dumps(tax))
    bad = tmp_path / "nope.msgpack"
    bad.write_bytes(b"not a checkpoint")
    cfg = textwrap.dedent(f"""
        cameras:
          - id: cam1
            protocol: synthetic
            target_width: 64
            target_height: 64
        detection:
          detector_type: yolox
          yolox: {{model_name: yolox-nano}}
          input_size: [64, 64]
          use_two_stage: true
          batching: {{enabled: false}}
        species_classification:
          enabled: true
          inat_classifier:
            model_name: eva02-tiny
            num_classes: 4
            input_size: 56
            taxonomy_file: {tax_path}
            weights: {bad}
        web: {{host: 127.0.0.1, port: {_free_port()}}}
    """)
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(cfg)
    sys_obj = TelescopeDetectionSystem(str(cfg_path), load_weights=True)
    sys_obj.load_config()
    with pytest.raises(RuntimeError, match="classifier weights"):
        sys_obj.initialize_components()
