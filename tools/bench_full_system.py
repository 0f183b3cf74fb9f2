"""BASELINE config 5: full system, 8 concurrent synthetic 1440p streams.

Boots the REAL TelescopeDetectionSystem (capture threads -> coordinator ->
engines -> processors -> web server with a live WS client), lets it reach
steady state, then measures aggregate inferred fps over a sampling window.
Prints one JSON line.

Env knobs:
  FS_CAMERAS=8       stream count
  FS_SECONDS=30      measurement window after warmup
  FS_WARMUP=45       warmup seconds (compiles + cache fill)
  FS_GATES=device    detection.gates (device|none)
  FS_PROFILE=1       sample all serving threads' stacks during the window
  FS_WS_CLIENTS=4    concurrent WebSocket /ws/detections clients
  FS_MJPEG_CLIENTS=4 concurrent MJPEG /video/feed/{cam} pullers (per-client
                     encode is the reference's real serving load,
                     web_server.py:875-947) — per-client fps is recorded so
                     serving-plane fan-out regressions are visible
  FS_TRAINED=1       serve weights/yolox_s_scene640.npz when present
"""
import json
import os
import socket
import sys
import tempfile
import textwrap
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def main():
    n_cams = int(os.environ.get("FS_CAMERAS", "8"))
    cam_fps = int(os.environ.get("FS_CAM_FPS", "40"))
    seconds = float(os.environ.get("FS_SECONDS", "30"))
    warmup = float(os.environ.get("FS_WARMUP", "45"))
    gates = os.environ.get("FS_GATES", "device")
    batch = int(os.environ.get("FS_BATCH", "16"))
    depth = int(os.environ.get("FS_DEPTH", "2"))
    port = _free_port()

    n_ws = int(os.environ.get("FS_WS_CLIENTS", "4"))
    n_mjpeg = int(os.environ.get("FS_MJPEG_CLIENTS", "4"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    trained = os.path.join(repo, "weights", "yolox_s_scene640.npz")
    weights_kind = "random"
    yolox_cfg = "{model_name: yolox-s}"
    if os.environ.get("FS_TRAINED", "1") != "0" and os.path.exists(trained):
        yolox_cfg = f"{{model_name: yolox-s, weights: {trained}}}"
        weights_kind = "trained"

    cams = "\n".join(
        f"  - {{id: cam{i}, name: Synth {i}, protocol: synthetic, "
        f"target_width: 2560, target_height: 1440, fps: {cam_fps}, "
        f"prerender: 24, enabled: true}}"
        for i in range(n_cams))
    cfg = "cameras:\n" + cams + "\n" + textwrap.dedent(f"""\
        detection:
          detector_type: yolox
          yolox: {yolox_cfg}
          input_size: [640, 640]
          conf_threshold: 0.25
          transfer: delta
          readback_topk: 64
          gates: {gates}
          batching:
            enabled: true
            max_batch_size: {batch}
            max_batch_wait_ms: 12
            pipeline_depth: {depth}
        performance:
          frame_queue_size: 2
          detection_queue_size: 10
          empty_frame_filter:
            enabled: true
            min_motion_area: 200
        motion_filter:
          enabled: true
        time_of_day_filter:
          enabled: true
        snapshots: {{enabled: false}}
        camera_health: {{enabled: true}}
        web: {{host: 127.0.0.1, port: {port}}}
    """)
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        f.write(cfg)
        cfg_path = f.name

    from telescope_cam_detection_tpu.system import TelescopeDetectionSystem
    sys_obj = TelescopeDetectionSystem(cfg_path,
                                       load_weights=(weights_kind == "trained"))
    sys_obj.load_config()
    sys_obj.validate_config()
    sys_obj.initialize_components()
    sys_obj.start(block=False)

    # concurrent serving clients (the reference's real load is N browsers
    # each pulling MJPEG + WS, web_server.py:875-947 per-client encode):
    # N WS clients draining detections + N MJPEG clients pulling frames,
    # all counted per client
    ws_messages = [0] * n_ws
    mjpeg_frames = [0] * n_mjpeg

    def ws_client(slot):
        # minimal raw WS client: handshake + read frames, count messages
        import base64
        time.sleep(5)
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            key = base64.b64encode(os.urandom(16)).decode()
            s.sendall((f"GET /ws/detections HTTP/1.1\r\nHost: x\r\n"
                       f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                       f"Sec-WebSocket-Key: {key}\r\n"
                       f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
            s.settimeout(5)
            hdr = b""
            while b"\r\n\r\n" not in hdr:
                hdr += s.recv(4096)
            # walk real WebSocket frames (server->client: no mask) instead
            # of counting 0x81 bytes — JSON payloads contain 0x81 too
            buf = bytearray(hdr.split(b"\r\n\r\n", 1)[1])
            while True:
                try:
                    data = s.recv(65536)
                except socket.timeout:
                    continue
                if not data:
                    return
                buf += data
                while True:
                    if len(buf) < 2:
                        break
                    ln, off = buf[1] & 0x7F, 2
                    if ln == 126:
                        if len(buf) < 4:
                            break
                        ln, off = int.from_bytes(buf[2:4], "big"), 4
                    elif ln == 127:
                        if len(buf) < 10:
                            break
                        ln, off = int.from_bytes(buf[2:10], "big"), 10
                    if len(buf) < off + ln:
                        break
                    if buf[0] & 0x0F == 0x1:   # text frame
                        ws_messages[slot] += 1
                    del buf[: off + ln]
        except Exception:
            pass

    def mjpeg_client(slot):
        # raw HTTP puller on /video/feed/{cam}: counts JPEG SOI markers in
        # the multipart stream (one per delivered frame)
        time.sleep(5)
        cam = f"cam{slot % n_cams}"
        try:
            s = socket.create_connection(("127.0.0.1", port), timeout=10)
            s.sendall((f"GET /video/feed/{cam} HTTP/1.1\r\nHost: x\r\n"
                       f"Connection: keep-alive\r\n\r\n").encode())
            s.settimeout(5)
            tail = b""   # SOI markers can straddle recv chunk boundaries
            while True:
                try:
                    data = s.recv(1 << 16)
                except socket.timeout:
                    continue
                if not data:
                    return
                chunk = tail + data
                mjpeg_frames[slot] += chunk.count(b"\xff\xd8\xff")
                tail = chunk[-2:]
        except Exception:
            pass

    for i in range(n_ws):
        threading.Thread(target=ws_client, args=(i,), daemon=True).start()
    for i in range(n_mjpeg):
        threading.Thread(target=mjpeg_client, args=(i,), daemon=True).start()

    def engine_frames():
        return sum(e.frames_processed for e in sys_obj.engines.values())

    time.sleep(warmup)
    # cProfile only instruments the calling thread (this one, which just
    # sleeps through the window) — the serving pipeline lives in capture/
    # coordinator/processor/web threads. StackSampler samples EVERY
    # thread's stack instead.
    prof = None
    if os.environ.get("FS_PROFILE"):
        from telescope_cam_detection_tpu.utils.profiling import StackSampler
        prof = StackSampler(interval=0.005)
        prof.start()
    f0, t0 = engine_frames(), time.time()
    d0 = sum(p.results_processed for p in sys_obj.processors.values())
    ws0, mj0 = list(ws_messages), list(mjpeg_frames)
    time.sleep(seconds)
    f1, t1 = engine_frames(), time.time()
    d1 = sum(p.results_processed for p in sys_obj.processors.values())
    ws1, mj1 = list(ws_messages), list(mjpeg_frames)
    if prof:
        prof.stop()
        sys.stderr.write(prof.format_report(30) + "\n")

    coord = sys_obj.coordinator.get_stats() if sys_obj.coordinator else {}
    caps = sum(c.get_stats().get("frames_captured", 0)
               for c in sys_obj.captures.values())
    result = {
        "config": 5, "name": f"full_system_{n_cams}cam_1440p",
        "cam_fps": cam_fps,
        "gates": gates, "max_batch": batch,
        "fps_inferred": round((f1 - f0) / (t1 - t0), 1),
        "fps_processed": round((d1 - d0) / (t1 - t0), 1),
        "per_camera_fps": round((f1 - f0) / (t1 - t0) / n_cams, 2),
        "coordinator_avg_batch": round(coord.get("avg_batch_size", 0), 2),
        "coordinator_dropped": coord.get("total_dropped", 0),
        "coordinator_avg_infer_ms": round(coord.get("avg_infer_ms", 0), 1),
        "weights": weights_kind,
        "ws_clients": n_ws,
        "mjpeg_clients": n_mjpeg,
        # per-client rates over the window: serving-plane fan-out must not
        # starve individual clients (or the coordinator — compare
        # fps_inferred against a 0-client run)
        "ws_msgs_per_client_per_s": [
            round((b - a) / (t1 - t0), 2) for a, b in zip(ws0, ws1)],
        "mjpeg_fps_per_client": [
            round((b - a) / (t1 - t0), 2) for a, b in zip(mj0, mj1)],
        "window_s": round(t1 - t0, 1),
    }
    sys_obj.stop()
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
