"""HTTP / WebSocket / MJPEG serving plane.

Byte-compatible with the reference's FastAPI surface (src/web_server.py:36-
1233) but built on stdlib ``ThreadingHTTPServer`` plus a hand-rolled RFC 6455
upgrade (utils/wsproto.py) since fastapi/uvicorn are not in this image:

  GET  /                         -> web/index.html
  GET  /app.js, /clips_browser   -> static assets
  GET  /health                   -> status + queue-utilization alerts
  GET  /cameras                  -> camera list
  GET  /stats                    -> per-component stats
  GET  /api/cameras/{id}/health|stats
  POST /api/cameras/{id}/restart
  GET  /api/cameras/health/summary
  GET  /api/system/stats         -> aggregate fps, HBM, queue depths
  GET  /api/system/stats/history -> sampled ring of the same (charts)
  GET  /api/clips[?camera=...]   -> product listing
  GET  /api/clips/{name}         -> serve product (Bearer token + traversal guard)
  POST /api/config/reload        -> hot reload
  GET  /api/config/current       -> redacted live config
  GET  /config_editor            -> web config editor page
  GET  /api/config/file          -> raw on-disk YAML (Bearer token)
  POST /api/config/validate      -> validate proposed YAML + diff (Bearer)
  POST /api/config/save          -> atomic write + hot reload (Bearer)
  GET  /api/zones                -> live collision zones per camera
  POST /api/zones                -> replace one camera's zones (editor)
  GET  /video/feed/{camera_id}   -> multipart MJPEG
  WS   /ws/detections            -> detection stream (skip-empty + 5s status
                                    + 1s heartbeat, reference :743-801)
"""
from __future__ import annotations

import json
import logging
import os
import queue
import socket
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional


from telescope_cam_detection_tpu import constants as C
from telescope_cam_detection_tpu.utils import wsproto
from telescope_cam_detection_tpu.utils.visualization import draw_detections

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

logger = logging.getLogger(__name__)

WEB_ROOT = Path(__file__).resolve().parent.parent.parent / "web"


class _WSClient:
    """A WebSocket client's socket + lock. Two hang classes are bounded:
    lock contention (pump broadcast vs handler pong replies — interleaved
    partial writes would corrupt RFC 6455 framing) AND the socket write
    itself (a frozen browser fills its TCP buffer and a blocking write never
    returns), which the per-connection settimeout covers."""

    SOCKET_TIMEOUT = 5.0

    def __init__(self, connection):
        self.connection = connection
        connection.settimeout(self.SOCKET_TIMEOUT)
        self.wfile = connection.makefile("wb")
        self.lock = threading.Lock()

    def send(self, frame: bytes) -> None:
        """Raises socket.timeout (OSError) if the client stalls."""
        with self.lock:
            self.wfile.write(frame)
            self.wfile.flush()

    def try_send(self, frame: bytes, timeout: float = 1.0) -> bool:
        """Returns False instead of raising/hanging on a stalled client."""
        if not self.lock.acquire(timeout=timeout):
            return False
        try:
            self.wfile.write(frame)
            self.wfile.flush()
            return True
        except OSError:  # includes socket.timeout
            return False
        finally:
            self.lock.release()

    def close(self) -> None:
        """Tear down the connection so the handler thread's blocking read
        unblocks and the client sees a FIN instead of a dead stream."""
        try:
            self.connection.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        try:
            self.connection.close()
        except OSError:
            pass


def _percentile_alerts(depth: int, maxsize: int, warning: float,
                       critical: float, name: str) -> List[Dict[str, Any]]:
    if maxsize <= 0:
        return []
    util = depth / maxsize
    if util >= critical:
        return [{"level": "critical", "queue": name,
                 "utilization": round(util, 2),
                 "message": f"{name} at {util:.0%} capacity"}]
    if util >= warning:
        return [{"level": "warning", "queue": name,
                 "utilization": round(util, 2),
                 "message": f"{name} at {util:.0%} capacity"}]
    return []


class WebServer:
    """Holds references to live components; never owns them."""

    def __init__(
        self,
        host: str = "0.0.0.0",
        port: int = 8000,
        detection_queue: Optional[queue.Queue] = None,
        cameras: Optional[List[Dict[str, Any]]] = None,
        captures: Optional[Dict[str, Any]] = None,       # camera_id -> capture
        engines: Optional[Dict[str, Any]] = None,
        processors: Optional[Dict[str, Any]] = None,
        coordinator=None,
        snapshot_saver=None,
        health_monitor=None,
        memory_manager=None,
        face_mask_cache=None,
        restart_callback: Optional[Callable[[str], bool]] = None,
        reload_callback: Optional[Callable[[], Dict[str, Any]]] = None,
        get_config: Optional[Callable[[], Dict[str, Any]]] = None,
        get_config_text: Optional[Callable[[], str]] = None,
        validate_config_callback: Optional[
            Callable[[str], Dict[str, Any]]] = None,
        save_config_callback: Optional[
            Callable[[str], Dict[str, Any]]] = None,
        set_zones_callback: Optional[Callable[[str, List[Dict[str, Any]]],
                                              Dict[str, Any]]] = None,
        get_zones_callback: Optional[Callable[[], Dict[str, Any]]] = None,
        mjpeg_fps: float = C.DEFAULT_MJPEG_FPS,
        jpeg_quality: int = C.DEFAULT_JPEG_QUALITY,
        clips_dir: str = "clips",
        queue_health: Optional[Dict[str, Any]] = None,
        trace_dir: str = "/tmp/tcd_traces",
    ):
        self.host = host
        self.port = port
        self.detection_queue = detection_queue
        self.cameras = cameras or []
        self.captures = captures or {}
        self.engines = engines or {}
        self.processors = processors or {}
        self.coordinator = coordinator
        self.snapshot_saver = snapshot_saver
        self.health_monitor = health_monitor
        self.memory_manager = memory_manager
        self.face_mask_cache = face_mask_cache
        self.restart_callback = restart_callback
        self.reload_callback = reload_callback
        self.get_config = get_config
        self.get_config_text = get_config_text
        self.validate_config_callback = validate_config_callback
        self.save_config_callback = save_config_callback
        self.set_zones_callback = set_zones_callback
        self.get_zones_callback = get_zones_callback
        self.mjpeg_fps = mjpeg_fps
        self.jpeg_quality = jpeg_quality
        self.clips_dir = Path(clips_dir)
        # profiler traces always land under this server-side path (the
        # endpoint accepts no client-chosen directory) and only one trace
        # may run at a time; capture requires the clips Bearer token
        self.trace_dir = Path(trace_dir)
        self._trace_lock = threading.Lock()
        self.queue_health = queue_health or {"enabled": True,
                                             "warning_threshold": 0.70,
                                             "critical_threshold": 0.90}

        self.latest_detections: Dict[str, Dict[str, Any]] = {}
        self._latest_lock = threading.Lock()
        self._ws_clients: List[Any] = []
        self._ws_lock = threading.Lock()
        self.start_time = time.time()
        self.camera_start_times: Dict[str, float] = {}

        self._httpd: Optional[ThreadingHTTPServer] = None
        self._serve_thread: Optional[threading.Thread] = None
        self._pump_thread: Optional[threading.Thread] = None
        self._running = threading.Event()

        # historical stats ring for the dashboard charts: one sample every
        # stats_history_interval seconds, an hour of retention
        self.stats_history_interval = 5.0
        self._stats_history: deque = deque(maxlen=720)
        self._history_stop = threading.Event()
        self._history_thread: Optional[threading.Thread] = None

    # ------------------------------------------------------------------ lifecycle
    def start(self) -> None:
        """Non-blocking start (run() is the blocking variant)."""
        if self._httpd is not None:
            return
        server = self

        class Handler(_Handler):
            web = server

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self._httpd.daemon_threads = True
        self._running.set()
        self._serve_thread = threading.Thread(
            target=self._httpd.serve_forever, name="web-server", daemon=True)
        self._serve_thread.start()
        self._pump_thread = threading.Thread(
            target=self._detection_pump, name="detection-pump", daemon=True)
        self._pump_thread.start()
        self._history_stop.clear()
        self._history_thread = threading.Thread(
            target=self._history_loop, name="stats-history", daemon=True)
        self._history_thread.start()
        logger.info("web server listening on %s:%d", self.host, self.port)

    def run(self) -> None:
        """Blocking serve (reference web_server.py:1168: uvicorn.run blocks)."""
        self.start()
        try:
            while self._running.is_set():
                time.sleep(0.5)
        except KeyboardInterrupt:
            pass

    def stop(self) -> None:
        self._running.clear()
        self._history_stop.set()
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
        with self._ws_lock:
            clients = list(self._ws_clients)
            self._ws_clients.clear()
        # close frames go out OUTSIDE _ws_lock with a bounded wait, so a
        # stalled client (full TCP buffer) cannot hang shutdown
        for client in clients:
            try:
                client.try_send(wsproto.encode_close(), timeout=0.5)
            except Exception:
                pass
            client.close()

    def set_camera_start_time(self, camera_id: str) -> None:
        self.camera_start_times[camera_id] = time.time()

    # ------------------------------------------------------------------ WS plane
    def _detection_pump(self) -> None:
        """Drain the shared detection queue; fan out to WS clients
        (reference :743-801 semantics: send when detections > 0, 5s status,
        1s heartbeat)."""
        last_status = 0.0
        last_heartbeat = 0.0
        while self._running.is_set():
            result = None
            if self.detection_queue is not None:
                try:
                    result = self.detection_queue.get(
                        timeout=C.QUEUE_GET_TIMEOUT_SECONDS)
                except queue.Empty:
                    result = None
            else:
                time.sleep(C.QUEUE_GET_TIMEOUT_SECONDS)
            now = time.time()
            if result is not None:
                cam = result.get("camera_id", "unknown")
                with self._latest_lock:
                    self.latest_detections[cam] = result
                if result.get("total_detections", 0) > 0:
                    self._broadcast(self._detection_message(result))
            # timers run every iteration — a busy camera must not starve
            # the 5s status updates (dashboard offline badges) or heartbeats
            if now - last_status >= C.WEBSOCKET_STATUS_INTERVAL_SECONDS:
                last_status = now
                last_heartbeat = now  # status doubles as a heartbeat
                self._broadcast({"type": "status",
                                 "timestamp": now,
                                 "cameras": self._camera_statuses()})
            elif now - last_heartbeat >= C.WEBSOCKET_HEARTBEAT_INTERVAL_SECONDS:
                last_heartbeat = now
                self._broadcast({"type": "heartbeat", "timestamp": now})

    @staticmethod
    def _detection_message(result: Dict[str, Any]) -> Dict[str, Any]:
        msg = {k: v for k, v in result.items() if k != "frame"}
        msg["type"] = "detections"
        return msg

    def _broadcast(self, message: Dict[str, Any]) -> None:
        with self._ws_lock:
            clients = list(self._ws_clients)
        if not clients:
            return
        try:
            frame = wsproto.encode_text(json.dumps(message, default=str))
        except (TypeError, ValueError):
            logger.exception("unserializable WS message")
            return
        dead = []
        for client in clients:
            try:
                if not client.try_send(frame, timeout=2.0):
                    dead.append(client)  # stalled: drop the client
            except (OSError, ValueError):
                dead.append(client)
        if dead:
            with self._ws_lock:
                for d in dead:
                    if d in self._ws_clients:
                        self._ws_clients.remove(d)
            for d in dead:  # outside the lock: unblock its handler thread
                d.close()

    # ------------------------------------------------------------------ payloads
    def _camera_statuses(self) -> List[Dict[str, Any]]:
        out = []
        for cam in self.cameras:
            cid = cam.get("id")
            cap = self.captures.get(cid)
            stats = cap.get_stats() if cap else {}
            out.append({"id": cid, "name": cam.get("name", cid),
                        "connected": stats.get("connected", False),
                        "fps": stats.get("fps", 0.0)})
        return out

    def health_payload(self) -> Dict[str, Any]:
        alerts: List[Dict[str, Any]] = []
        qh = self.queue_health
        if qh.get("enabled", True):
            warn = qh.get("warning_threshold", 0.70)
            crit = qh.get("critical_threshold", 0.90)
            if self.detection_queue is not None:
                alerts += _percentile_alerts(
                    self.detection_queue.qsize(),
                    self.detection_queue.maxsize or 0, warn, crit,
                    "detection_queue")
            if self.coordinator is not None:
                cstats = self.coordinator.get_stats()
                alerts += _percentile_alerts(
                    cstats.get("queue_depth", 0),
                    getattr(self.coordinator, "MAX_QUEUE_DEPTH", 60),
                    warn, crit, "coordinator_queue")
        status = "healthy"
        if any(a["level"] == "critical" for a in alerts):
            status = "critical"
        elif alerts:
            status = "warning"
        return {
            "status": status,
            "uptime_seconds": round(time.time() - self.start_time, 1),
            "cameras": self._camera_statuses(),
            "alerts": alerts,
        }

    def stats_payload(self) -> Dict[str, Any]:
        return {
            "cameras": {cid: cap.get_stats()
                        for cid, cap in self.captures.items()},
            "engines": {cid: e.get_stats() for cid, e in self.engines.items()},
            "processors": {cid: p.get_stats()
                           for cid, p in self.processors.items()},
            "coordinator": (self.coordinator.get_stats()
                            if self.coordinator else None),
            "snapshots": (self.snapshot_saver.get_stats()
                          if self.snapshot_saver else None),
        }

    def system_stats_payload(self) -> Dict[str, Any]:
        total_fps = sum(c.get_stats().get("fps", 0.0)
                        for c in self.captures.values())
        payload = {
            "timestamp": time.time(),
            "uptime_seconds": round(time.time() - self.start_time, 1),
            "aggregate_fps": round(total_fps, 2),
            "queue_depths": {
                "detection_queue": (self.detection_queue.qsize()
                                    if self.detection_queue else 0),
            },
            "device_memory": (self.memory_manager.get_stats()
                              if self.memory_manager else None),
            # cameras with a clip currently held open for post-trigger
            # recording (snapshots.post_buffer_seconds)
            "clips_recording": (self.snapshot_saver.clips_recording_now()
                                if self.snapshot_saver else []),
        }
        try:
            import resource
            payload["rss_mb"] = round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1)
        except Exception:
            pass
        return payload

    # ---- historical stats ---------------------------------------------------
    def _history_sample(self) -> Dict[str, Any]:
        """One compact sample of the headline numbers the dashboard charts."""
        cams = {cid: cap.get_stats().get("fps", 0.0)
                for cid, cap in self.captures.items()}
        sample: Dict[str, Any] = {
            "t": round(time.time(), 1),
            "fps": round(sum(cams.values()), 2),
            "cameras": {cid: round(v, 2) for cid, v in cams.items()},
            "queue": (self.detection_queue.qsize()
                      if self.detection_queue else 0),
        }
        lat = [e.get_stats().get("inference_time_ema_ms", 0.0)
               for e in self.engines.values()]
        lat = [v for v in lat if v]
        if lat:
            sample["infer_ms"] = round(sum(lat) / len(lat), 2)
        if self.memory_manager is not None:
            dm = self.memory_manager.get_stats() or {}
            frac = dm.get("memory_fraction")
            if isinstance(frac, (int, float)):
                sample["hbm_frac"] = round(float(frac), 4)
        return sample

    def _history_loop(self) -> None:
        while not self._history_stop.is_set():
            try:
                self._stats_history.append(self._history_sample())
            except Exception:  # sampling must never kill the thread
                logger.exception("stats history sample failed")
            self._history_stop.wait(self.stats_history_interval)

    def history_payload(self, minutes: Optional[float] = None) -> Dict[str, Any]:
        samples = list(self._stats_history)
        if minutes:
            cutoff = time.time() - minutes * 60.0
            samples = [s for s in samples if s["t"] >= cutoff]
        return {"interval_seconds": self.stats_history_interval,
                "samples": samples}

    def prometheus_payload(self) -> str:
        """Prometheus text exposition of every component's stats contract
        (the reference exposes stats only as JSON; /metrics makes the same
        numbers scrapeable without an adapter)."""
        lines: List[str] = []

        def emit(name: str, value, labels: Dict[str, str] = None,
                 mtype: str = "gauge") -> None:
            if not isinstance(value, (int, float)) or isinstance(value, bool):
                return
            if not any(l.startswith(f"# TYPE {name} ") for l in lines):
                lines.append(f"# TYPE {name} {mtype}")
            label_s = ""
            if labels:
                inner = ",".join(f'{k}="{v}"' for k, v in labels.items())
                label_s = "{" + inner + "}"
            lines.append(f"{name}{label_s} {value}")

        emit("tcd_uptime_seconds", round(time.time() - self.start_time, 1))
        for cid, cap in self.captures.items():
            s = cap.get_stats()
            emit("tcd_camera_fps", s.get("fps"), {"camera": cid})
            emit("tcd_camera_connected", int(bool(s.get("connected"))),
                 {"camera": cid})
            emit("tcd_camera_frames_total", s.get("frames_captured"),
                 {"camera": cid}, "counter")
            emit("tcd_camera_frames_dropped_total", s.get("frames_dropped"),
                 {"camera": cid}, "counter")
        for cid, e in self.engines.items():
            s = e.get_stats()
            emit("tcd_engine_frames_total", s.get("frames_processed"),
                 {"camera": cid}, "counter")
            emit("tcd_engine_inference_ms", s.get("inference_time_ms"),
                 {"camera": cid})
            emit("tcd_engine_skipped_sparse_total",
                 s.get("frames_skipped_sparse"), {"camera": cid}, "counter")
            emit("tcd_engine_skipped_empty_total",
                 s.get("frames_skipped_empty"), {"camera": cid}, "counter")
        for cid, pr in self.processors.items():
            s = pr.get_stats()
            emit("tcd_processor_results_total", s.get("results_processed"),
                 {"camera": cid}, "counter")
            emit("tcd_processor_detections_total", s.get("total_detections"),
                 {"camera": cid}, "counter")
            emit("tcd_latency_ms_p50", s.get("latency_ms_p50"),
                 {"camera": cid})
            emit("tcd_latency_ms_p95", s.get("latency_ms_p95"),
                 {"camera": cid})
        if self.coordinator is not None:
            s = self.coordinator.get_stats()
            emit("tcd_coordinator_queue_depth", s.get("queue_depth"))
            emit("tcd_coordinator_frames_total", s.get("total_frames"),
                 mtype="counter")
            emit("tcd_coordinator_dropped_total", s.get("total_dropped"),
                 mtype="counter")
            emit("tcd_coordinator_avg_batch_size", s.get("avg_batch_size"))
            emit("tcd_coordinator_avg_infer_ms", s.get("avg_infer_ms"))
        if self.memory_manager is not None:
            s = self.memory_manager.get_stats()
            emit("tcd_hbm_memory_fraction", s.get("memory_fraction"))
            emit("tcd_hbm_oom_total", s.get("oom_count"), mtype="counter")
        if self.detection_queue is not None:
            emit("tcd_detection_queue_depth", self.detection_queue.qsize())
        return "\n".join(lines) + "\n"

    def config_payload(self) -> Dict[str, Any]:
        if self.get_config is None:
            return {}
        cfg = json.loads(json.dumps(self.get_config(), default=str))
        for cam in cfg.get("cameras", []) or []:
            cam.pop("password", None)
            cam.pop("username", None)
        return cfg

    # ------------------------------------------------------------------ clips auth
    def verify_clips_token(self, auth_header: Optional[str]) -> bool:
        """Bearer token from TELESCOPE_CLIPS_TOKEN; public-with-warning when
        unset (reference web_server.py:120-158)."""
        token = os.environ.get("TELESCOPE_CLIPS_TOKEN")
        if not token:
            if not getattr(self, "_warned_public_clips", False):
                logger.warning("TELESCOPE_CLIPS_TOKEN not set; clips endpoint "
                               "is public")
                self._warned_public_clips = True
            return True
        if not auth_header or not auth_header.startswith("Bearer "):
            return False
        return auth_header[7:] == token

    def verify_admin_token(self, auth_header: Optional[str]) -> bool:
        """Strict variant for routes that mutate state or expose secrets
        (the config editor): unlike clips' public-with-warning posture,
        NO configured token means NO access — an unauthenticated client
        must never be able to rewrite config.yaml or read inline
        credentials from the raw file."""
        token = os.environ.get("TELESCOPE_CLIPS_TOKEN")
        if not token:
            if not getattr(self, "_warned_no_admin_token", False):
                logger.warning(
                    "TELESCOPE_CLIPS_TOKEN not set; config editor routes "
                    "are disabled (set the env var to enable)")
                self._warned_no_admin_token = True
            return False
        if not auth_header or not auth_header.startswith("Bearer "):
            return False
        return auth_header[7:] == token


class _Handler(BaseHTTPRequestHandler):
    web: WebServer  # injected subclass attribute
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # route to logging, not stderr
        logger.debug("%s " + fmt, self.address_string(), *args)

    # ---- helpers -----------------------------------------------------------
    def _json(self, payload: Any, code: int = 200) -> None:
        body = json.dumps(payload, default=str).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, code: int, detail: str) -> None:
        self._json({"detail": detail}, code)

    def _static(self, rel: str, content_type: str) -> None:
        path = WEB_ROOT / rel
        if not path.exists():
            self._error(404, f"{rel} not found")
            return
        body = path.read_bytes()
        self.send_response(200)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    # ---- GET ----------------------------------------------------------------
    def do_GET(self):  # noqa: N802
        path = self.path.split("?")[0].rstrip("/") or "/"
        try:
            if path == "/" :
                return self._static("index.html", "text/html")
            if path == "/app.js":
                return self._static("app.js", "application/javascript")
            if path == "/clips_browser":
                return self._static("clips.html", "text/html")
            if path == "/config_editor":
                return self._static("config.html", "text/html")
            if path == "/api/config/file":
                # raw file may contain inline camera credentials, unlike
                # the redacted /api/config/current — a token must be SET
                # and match (no public-when-unset fallback here)
                if not self.web.verify_admin_token(
                        self.headers.get("Authorization")):
                    return self._error(
                        401, "unauthorized (config editor requires "
                        "TELESCOPE_CLIPS_TOKEN to be configured)")
                if self.web.get_config_text is None:
                    return self._error(503, "config editor unavailable")
                return self._json({"text": self.web.get_config_text()})
            if path == "/health":
                return self._json(self.web.health_payload())
            if path == "/cameras":
                return self._json({"cameras": self.web._camera_statuses()})
            if path == "/stats":
                return self._json(self.web.stats_payload())
            if path == "/api/system/stats":
                return self._json(self.web.system_stats_payload())
            if path == "/api/system/stats/history":
                from urllib.parse import parse_qs, urlparse
                q = parse_qs(urlparse(self.path).query)
                try:
                    minutes = float(q["minutes"][0]) if "minutes" in q else None
                except (ValueError, IndexError):
                    minutes = None
                return self._json(self.web.history_payload(minutes))
            if path == "/metrics":
                body = self.web.prometheus_payload().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4; charset=utf-8")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if path == "/api/zones":
                if self.web.get_zones_callback is None:
                    return self._error(503, "zones unavailable")
                return self._json({"zones": self.web.get_zones_callback()})
            if path == "/api/cameras/health/summary":
                hm = self.web.health_monitor
                return self._json(hm.get_health_summary() if hm
                                  else {"cameras": {}})
            if path.startswith("/api/cameras/"):
                return self._camera_route(path)
            if path == "/api/config/current":
                return self._json(self.web.config_payload())
            if path == "/api/profiler/trace":
                return self._profiler_trace()
            if path == "/api/profiler/cpu":
                return self._profiler_cpu()
            if path == "/api/clips":
                return self._clips_list()
            if path.startswith("/api/clips/"):
                return self._clips_serve(path[len("/api/clips/"):])
            if path == "/clips_list":
                # Legacy alias kept for old clients: 307 redirect to
                # /api/clips (reference web_server.py:645-653).
                self.send_response(307)
                self.send_header("Location", "/api/clips")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            if path == "/video/feed":
                # Default-camera MJPEG (reference web_server.py:833-849).
                if not self.web.captures:
                    return self._json({"error": "No cameras available"})
                return self._mjpeg(next(iter(self.web.captures)))
            if path.startswith("/video/feed/"):
                return self._mjpeg(path[len("/video/feed/"):])
            if path == "/ws/detections":
                return self._websocket()
            self._error(404, "not found")
        except BrokenPipeError:
            pass
        except Exception:
            logger.exception("GET %s failed", path)
            try:
                self._error(500, "internal error")
            except Exception:
                pass

    def do_POST(self):  # noqa: N802
        path = self.path.split("?")[0].rstrip("/")
        try:
            if path == "/api/config/reload":
                if self.web.reload_callback is None:
                    return self._error(503, "reload unavailable")
                return self._json(self.web.reload_callback())
            if path in ("/api/config/validate", "/api/config/save"):
                # the editor surface (validate = dry run, save = atomic
                # write + reload); both require a CONFIGURED token — save
                # mutates the config file
                if not self.web.verify_admin_token(
                        self.headers.get("Authorization")):
                    return self._error(
                        401, "unauthorized (config editor requires "
                        "TELESCOPE_CLIPS_TOKEN to be configured)")
                is_save = path.endswith("save")
                cb = (self.web.save_config_callback if is_save
                      else self.web.validate_config_callback)
                if cb is None:
                    return self._error(503, "config editor unavailable")
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    if length <= 0 or length > 1 << 20:
                        return self._error(400, "bad body length")
                    body = json.loads(self.rfile.read(length))
                    text = body["text"]
                    if not isinstance(text, str):
                        raise TypeError("text must be a string")
                except (KeyError, ValueError, TypeError) as e:
                    return self._error(400, f"bad editor body: {e}")
                result = cb(text)
                # save reports success, validate reports valid — a failed
                # WRITE has valid:True but must still be a non-200
                ok = result.get("success" if is_save else "valid", False)
                return self._json(result, 200 if ok else 422)
            if path.startswith("/api/cameras/") and path.endswith("/restart"):
                cam_id = path[len("/api/cameras/"):-len("/restart")]
                if self.web.restart_callback is None:
                    return self._error(503, "restart unavailable")
                ok = self.web.restart_callback(cam_id)
                self.web.set_camera_start_time(cam_id)
                return self._json({"success": bool(ok), "camera_id": cam_id})
            if path == "/api/zones":
                # live zone editor: {"camera_id": ..., "zones": [...]}
                if self.web.set_zones_callback is None:
                    return self._error(503, "zones unavailable")
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    if length <= 0 or length > 1 << 20:
                        return self._error(400, "bad body length")
                    body = json.loads(self.rfile.read(length))
                    cam_id = str(body["camera_id"])
                    zones = body.get("zones") or []
                    if not isinstance(zones, list):
                        raise ValueError("zones must be a list")
                except (KeyError, ValueError, TypeError) as e:
                    return self._error(400, f"bad zones body: {e}")
                result = self.web.set_zones_callback(cam_id, zones)
                status = 200 if result.get("success") else 404
                return self._json(result, status)
            self._error(404, "not found")
        except BrokenPipeError:
            pass
        except Exception:
            logger.exception("POST %s failed", path)
            try:
                self._error(500, "internal error")
            except Exception:
                pass

    # ---- camera sub-routes ------------------------------------------------------
    def _camera_route(self, path: str) -> None:
        parts = path.strip("/").split("/")  # api cameras {id} {leaf}
        if len(parts) != 4:
            return self._error(404, "not found")
        cam_id, leaf = parts[2], parts[3]
        if leaf == "stats":
            engine = self.web.engines.get(cam_id)
            cap = self.web.captures.get(cam_id)
            proc = self.web.processors.get(cam_id)
            if engine is None and cap is None:
                return self._error(404, f"camera {cam_id} not found")
            return self._json({
                "camera_id": cam_id,
                "capture": cap.get_stats() if cap else None,
                "engine": engine.get_stats() if engine else None,
                "processor": proc.get_stats() if proc else None,
            })
        if leaf == "health":
            hm = self.web.health_monitor
            if hm is None:
                return self._error(503, "health monitor unavailable")
            summary = hm.get_health_summary().get("cameras", {})
            if cam_id not in summary:
                return self._error(404, f"camera {cam_id} not found")
            return self._json(summary[cam_id])
        return self._error(404, "not found")

    # ---- profiler --------------------------------------------------------------
    def _profiler_trace(self) -> None:
        """Capture a jax.profiler trace (device + host) for N seconds; returns
        the trace directory for TensorBoard/xprof. The reference had no
        tracer at all (SURVEY §5) — this is the TPU-native upgrade."""
        if not self.web.verify_clips_token(self.headers.get("Authorization")):
            return self._error(401, "unauthorized")
        from urllib.parse import parse_qs, urlparse
        query = parse_qs(urlparse(self.path).query)
        seconds = min(float(query.get("seconds", ["3"])[0]), 60.0)
        trace_dir = str(self.web.trace_dir)  # server-side, never client-chosen
        if not self.web._trace_lock.acquire(blocking=False):
            return self._error(409, "a trace is already running")
        try:
            import jax
            with jax.profiler.trace(trace_dir):
                time.sleep(seconds)
            return self._json({"success": True, "trace_dir": trace_dir,
                               "seconds": seconds,
                               "hint": "tensorboard --logdir " + trace_dir})
        except Exception as e:
            logger.exception("profiler trace failed")
            return self._json({"success": False, "error": str(e)}, 500)
        finally:
            self.web._trace_lock.release()

    def _profiler_cpu(self) -> None:
        """Sample every serving thread's stack for N seconds and return the
        hottest functions (own = where the CPU/blocking call sits, total =
        inclusive). The host-side complement of /api/profiler/trace: the
        device timeline says what the chip does, this says where the host
        core goes (capture/coordinator/processor/web threads — invisible
        to cProfile, which instruments a single thread)."""
        if not self.web.verify_clips_token(self.headers.get("Authorization")):
            return self._error(401, "unauthorized")
        from urllib.parse import parse_qs, urlparse
        query = parse_qs(urlparse(self.path).query)
        seconds = min(float(query.get("seconds", ["5"])[0]), 60.0)
        top = min(int(query.get("top", ["25"])[0]), 100)
        if not self.web._trace_lock.acquire(blocking=False):
            return self._error(409, "a profile is already running")
        try:
            from telescope_cam_detection_tpu.utils.profiling import (
                StackSampler)
            sampler = StackSampler(interval=0.005)
            sampler.start()
            time.sleep(seconds)
            sampler.stop()
            rep = sampler.report(top)
            rep["success"] = True
            return self._json(rep)
        except Exception as e:
            logger.exception("cpu profile failed")
            return self._json({"success": False, "error": str(e)}, 500)
        finally:
            self.web._trace_lock.release()

    # ---- clips -----------------------------------------------------------------
    def _clips_list(self) -> None:
        root = self.web.clips_dir
        clips: List[Dict[str, Any]] = []
        if root.exists():
            for p in sorted(root.rglob("*"),
                            key=lambda q: q.stat().st_mtime, reverse=True):
                if p.is_file() and p.suffix in (".jpg", ".mp4", ".json"):
                    clips.append({
                        "name": str(p.relative_to(root)),
                        "size": p.stat().st_size,
                        "mtime": p.stat().st_mtime,
                    })
                if len(clips) >= 500:
                    break
        self._json({"clips": clips})

    def _clips_serve(self, rel: str) -> None:
        if not self.web.verify_clips_token(self.headers.get("Authorization")):
            return self._error(401, "unauthorized")
        root = self.web.clips_dir.resolve()
        target = (root / rel).resolve()
        if not str(target).startswith(str(root) + os.sep):
            return self._error(403, "path traversal rejected")
        if not target.is_file():
            return self._error(404, "clip not found")
        ctype = {"jpg": "image/jpeg", "mp4": "video/mp4",
                 "json": "application/json"}.get(
            target.suffix.lstrip("."), "application/octet-stream")
        body = target.read_bytes()
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    # ---- MJPEG --------------------------------------------------------------------
    def _mjpeg(self, camera_id: str) -> None:
        cap = self.web.captures.get(camera_id)
        if cap is None or cv2 is None:
            return self._error(404, f"camera {camera_id} not found")
        self.send_response(200)
        self.send_header("Content-Type",
                         "multipart/x-mixed-replace; boundary=frame")
        self.end_headers()
        interval = 1.0 / max(self.web.mjpeg_fps, 1.0)
        try:
            while self.web._running.is_set():
                frame = cap.get_latest_frame()
                if frame is not None:
                    with self.web._latest_lock:
                        latest = self.web.latest_detections.get(camera_id)
                    if self.web.face_mask_cache is not None:
                        frame = self.web.face_mask_cache.mask_frame(
                            camera_id, frame, copy=False,
                            detections=(latest or {}).get("detections"))
                    if latest and latest.get("detections"):
                        frame = draw_detections(frame, latest["detections"],
                                                copy=False)
                    ok, jpeg = cv2.imencode(
                        ".jpg", frame,
                        [cv2.IMWRITE_JPEG_QUALITY, self.web.jpeg_quality])
                    if ok:
                        data = jpeg.tobytes()
                        self.wfile.write(b"--frame\r\n"
                                         b"Content-Type: image/jpeg\r\n"
                                         b"Content-Length: " +
                                         str(len(data)).encode() +
                                         b"\r\n\r\n" + data + b"\r\n")
                        self.wfile.flush()
                time.sleep(interval)
        except (BrokenPipeError, ConnectionResetError, OSError):
            pass

    # ---- WebSocket --------------------------------------------------------------------
    def _websocket(self) -> None:
        key = self.headers.get("Sec-WebSocket-Key")
        if (self.headers.get("Upgrade", "").lower() != "websocket"
                or not key):
            return self._error(400, "expected websocket upgrade")
        self.connection.sendall(wsproto.handshake_response(key))
        client = _WSClient(self.connection)
        with self.web._ws_lock:
            self.web._ws_clients.append(client)
        logger.info("WS client connected (%d total)",
                    len(self.web._ws_clients))
        reader = wsproto.FrameReader(self.connection.makefile("rb"))
        try:
            while self.web._running.is_set():
                try:
                    frame = reader.read_frame()
                except socket.timeout:
                    # settimeout applies to reads too; an idle (but healthy)
                    # client simply hasn't pinged — keep waiting unless the
                    # broadcast path already dropped and closed us
                    with self.web._ws_lock:
                        if client not in self.web._ws_clients:
                            break
                    continue
                if frame is None:
                    break
                opcode, payload = frame
                if opcode == wsproto.OP_CLOSE:
                    break
                if opcode == wsproto.OP_PING:
                    client.send(wsproto.encode_pong(payload))
                # inbound text messages are ignored (server-push protocol)
        except (OSError, ValueError):
            pass
        finally:
            with self.web._ws_lock:
                if client in self.web._ws_clients:
                    self.web._ws_clients.remove(client)
            self.close_connection = True
