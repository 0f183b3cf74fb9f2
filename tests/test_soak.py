"""Production soak: run the FULL system for a sustained window and pin
resource stability — RSS growth bounded, thread count flat, pipeline
still flowing at the end, clean shutdown with zero leaked threads.

The reference has no equivalent (its longevity story is systemd
Restart=always + the external watchdog); a leak that survives 60 s of
saturated serving on this host would survive a night of 8-camera serving
in production. Slow tier: the value is the sustained wall-clock itself.
"""
import socket
import textwrap
import threading
import time

import numpy as np
import pytest

from telescope_cam_detection_tpu.system import TelescopeDetectionSystem

pytestmark = pytest.mark.slow

SOAK_SECONDS = 60.0


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _rss_mb():
    import resource
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _current_rss_mb():
    # ru_maxrss is a high-water mark; read the live value from /proc so a
    # transient spike during warmup doesn't mask later growth
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return _rss_mb()


@pytest.fixture
def soak_system(tmp_path):
    cfg = textwrap.dedent(f"""
        cameras:
          - id: cam1
            name: Soak One
            protocol: synthetic
            target_width: 320
            target_height: 240
            fps: 30
            enabled: true
          - id: cam2
            name: Soak Two
            protocol: synthetic
            target_width: 320
            target_height: 240
            fps: 30
            enabled: true
        detection:
          detector_type: yolox
          yolox: {{model_name: yolox-nano}}
          input_size: [128, 128]
          conf_threshold: 0.3
          nms_threshold: 0.45
          wildlife_only: false
          min_box_area: 0
          use_two_stage: false
          batching:
            enabled: true
            max_batch_size: 4
            max_batch_wait_ms: 25.0
        performance:
          frame_queue_size: 2
          detection_queue_size: 10
          empty_frame_filter: {{enabled: false}}
          sparse_detection: {{enabled: false}}
        motion_filter: {{enabled: false}}
        # round-3 features soak together: file watcher thread + clip-mode
        # saver with post-trigger recording (min_confidence 0.99 keeps
        # random-weight triggers rare; the buffer/writer machinery still
        # runs per frame) + person-box masking in the mask path
        system:
          hot_reload: {{enabled: true, poll_interval_seconds: 1.0}}
        privacy:
          enable_face_masking: true
          mask_person_boxes: true
          live_feed_detection_interval: 10
        snapshots:
          enabled: true
          save_mode: clip
          output_dir: {tmp_path}/clips
          trigger_classes: []
          min_confidence: 0.99
          cooldown_seconds: 10
          pre_buffer_seconds: 1
          fps: 10
          post_buffer_seconds: 2
          post_motion_extend: true
          max_post_seconds: 5
        web: {{host: 127.0.0.1, port: {_free_port()}}}
        camera_health:
          enabled: true
          check_interval_seconds: 2
          auto_restart: false
    """)
    path = tmp_path / "soak.yaml"
    path.write_text(cfg)
    sys_obj = TelescopeDetectionSystem(str(path), load_weights=False)
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    yield sys_obj
    sys_obj.stop()


def test_soak_resources_stable(soak_system):
    sys_obj = soak_system
    baseline_threads = threading.active_count()
    sys_obj.start(block=False)

    # warmup: compiles + caches + buffers all settle
    time.sleep(15.0)
    warm_rss = _current_rss_mb()
    warm_threads = threading.active_count()
    warm_frames = sum(c.get_stats()["frames_captured"]
                      for c in sys_obj.captures.values())
    warm_results = sum(e.get_stats()["frames_processed"]
                       for e in sys_obj.engines.values())

    time.sleep(SOAK_SECONDS)

    end_rss = _current_rss_mb()
    end_threads = threading.active_count()
    end_frames = sum(c.get_stats()["frames_captured"]
                     for c in sys_obj.captures.values())
    end_results = sum(e.get_stats()["frames_processed"]
                      for e in sys_obj.engines.values())

    # still flowing at the end, both stages
    assert end_frames > warm_frames + 10 * SOAK_SECONDS, \
        (warm_frames, end_frames)
    assert end_results > warm_results, (warm_results, end_results)
    # no unbounded RSS growth after warmup (numpy/JAX arenas jitter a few
    # MB; a real per-frame leak at 60 fps aggregate would be >>50 MB)
    growth = end_rss - warm_rss
    assert growth < 50.0, f"RSS grew {growth:.1f} MB during soak"
    # thread population flat: nothing spawns per-frame threads
    assert end_threads <= warm_threads + 2, (warm_threads, end_threads)

    sys_obj.stop()
    # clean shutdown: every component thread joined
    deadline = time.time() + 15
    while time.time() < deadline and \
            threading.active_count() > baseline_threads:
        time.sleep(0.2)
    leaked = [t.name for t in threading.enumerate()
              if t is not threading.main_thread() and t.is_alive()
              and not t.daemon]
    assert threading.active_count() <= baseline_threads + 1, \
        f"leaked threads: {[t.name for t in threading.enumerate()]}"
    assert not leaked, leaked
