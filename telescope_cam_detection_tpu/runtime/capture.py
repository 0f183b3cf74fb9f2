"""Stream capture layer: RTSP (OpenCV), FFmpeg-subprocess CPU decode,
file replay, and synthetic sources.

Design mirrors the reference's capture contracts (stream_capture.py:28-432,
stream_capture_gpu_ffmpeg.py:19-387) with one TPU-driven change: there is no
NVDEC on TPU hosts, so the FFmpeg variant decodes H.264 on CPU threads
(``-threads``) and hands raw BGR24 to the pipeline; frames move to the device
as uint8 inside the fused preprocess program.

All variants share: a capture thread, a bounded frame queue with drop-oldest
semantics (latest-frame-wins for live video), a lock-protected ``latest_frame``
for MJPEG, reconnect-with-backoff, and a get_stats() contract.
"""
from __future__ import annotations

import logging
import os
import subprocess
import threading
import time
from queue import Full, Queue
from typing import Any, Dict, Optional

import numpy as np

from telescope_cam_detection_tpu import constants as C
from telescope_cam_detection_tpu.utils.frames import SyntheticFrameSource

logger = logging.getLogger(__name__)

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def create_rtsp_url(camera: Dict[str, Any]) -> str:
    """Build the stream URL from a camera config entry (reference
    stream_capture.py:309-380 URL schemes)."""
    if camera.get("url"):
        return camera["url"]
    ip = camera.get("ip", "")
    user = camera.get("username", "")
    password = camera.get("password", "")
    stream = camera.get("stream", "main")
    protocol = camera.get("protocol", "rtsp-tcp")
    auth = f"{user}:{password}@" if user else ""

    if protocol in ("rtsp", "rtsp-tcp"):
        path = "h264Preview_01_main" if stream == "main" else "h264Preview_01_sub"
        return f"rtsp://{auth}{ip}:554/{path}"
    if protocol == "h265":
        path = "h265Preview_01_main" if stream == "main" else "h265Preview_01_sub"
        return f"rtsp://{auth}{ip}:554/{path}"
    if protocol == "onvif":
        return f"rtsp://{auth}{ip}:8000/onvif/{'main' if stream == 'main' else 'sub'}"
    if protocol == "neolink":
        port = camera.get("neolink_port", 8554)
        name = camera.get("neolink_name", camera.get("id", "camera"))
        return f"rtsp://{ip}:{port}/{name}/{stream}"
    raise ValueError(f"unknown protocol {protocol!r}")


class BaseStreamCapture:
    """Common thread/queue/stats machinery for all capture variants."""

    def __init__(
        self,
        frame_queue: Queue,
        camera_id: str = "cam1",
        camera_name: str = "Camera",
        target_width: Optional[int] = None,
        target_height: Optional[int] = None,
        max_failures: int = C.DEFAULT_MAX_RTSP_FAILURES,
        reconnect_delay: float = C.DEFAULT_RTSP_RECONNECT_DELAY_SECONDS,
    ):
        self.frame_queue = frame_queue
        self.camera_id = camera_id
        self.camera_name = camera_name
        self.target_width = target_width
        self.target_height = target_height
        self.max_failures = max_failures
        self.reconnect_delay = reconnect_delay

        self._thread: Optional[threading.Thread] = None
        self._running = threading.Event()
        self._frame_lock = threading.Lock()
        self._latest_frame: Optional[np.ndarray] = None

        self.frame_id = 0
        self.frames_captured = 0
        self.frames_dropped = 0
        self.consecutive_failures = 0
        self.reconnect_count = 0
        self.last_frame_time = 0.0
        self._fps = 0.0
        self._fps_count = 0
        self._fps_t0 = time.time()
        self._heartbeat_t = time.time()
        self.connected = False

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> bool:
        if self._thread is not None and self._thread.is_alive():
            return True
        if not self._connect():
            logger.error("[%s] initial connect failed", self.camera_id)
            return False
        self._running.set()
        self._thread = threading.Thread(
            target=self._capture_loop, name=f"capture-{self.camera_id}",
            daemon=True)
        self._thread.start()
        return True

    def stop(self) -> None:
        self._running.clear()
        if self._thread is not None:
            self._thread.join(timeout=C.THREAD_JOIN_TIMEOUT_SECONDS)
            if self._thread.is_alive():
                logger.critical("[%s] capture thread did not stop (leak)",
                                self.camera_id)
            self._thread = None
        self._disconnect()

    # -- overridables --------------------------------------------------------
    def _connect(self) -> bool:
        raise NotImplementedError

    def _disconnect(self) -> None:
        pass

    def _read_frame(self) -> Optional[np.ndarray]:
        raise NotImplementedError

    # -- loop -----------------------------------------------------------------
    def _capture_loop(self) -> None:
        while self._running.is_set():
            frame = None
            try:
                frame = self._read_frame()
            except Exception:
                logger.exception("[%s] read error", self.camera_id)
            if frame is None:
                self.consecutive_failures += 1
                if self.consecutive_failures >= self.max_failures:
                    self._reconnect()
                else:
                    time.sleep(C.ERROR_SLEEP_SECONDS)
                continue
            self.consecutive_failures = 0
            self._emit(frame)

    def _emit(self, frame: np.ndarray) -> None:
        if (self.target_width and self.target_height and cv2 is not None
                and (frame.shape[1] != self.target_width
                     or frame.shape[0] != self.target_height)):
            frame = cv2.resize(frame, (self.target_width, self.target_height))
        now = time.time()
        with self._frame_lock:
            self._latest_frame = frame
        item = {
            "frame": frame,
            "timestamp": now,
            "frame_id": self.frame_id,
            "camera_id": self.camera_id,
            "camera_name": self.camera_name,
        }
        self.frame_id += 1
        self.frames_captured += 1
        self.last_frame_time = now
        self._fps_count += 1
        dt = now - self._fps_t0
        if dt >= C.FPS_CALCULATION_INTERVAL_SECONDS:
            self._fps = self._fps_count / dt
            self._fps_count = 0
            self._fps_t0 = now
        if now - self._heartbeat_t >= C.CAPTURE_HEARTBEAT_SECONDS:
            # journald activity marker for the external watchdog
            logger.info("[%s] capture alive: %d frames, %.1f fps",
                        self.camera_id, self.frames_captured, self._fps)
            self._heartbeat_t = now
        try:
            self.frame_queue.put_nowait(item)
        except Full:
            # latest-frame-wins: evict the oldest, insert the new
            try:
                self.frame_queue.get_nowait()
            except Exception:
                pass
            try:
                self.frame_queue.put_nowait(item)
            except Full:
                pass
            self.frames_dropped += 1
            if self.frames_dropped % C.LOG_DROPPED_EVERY_N == 0:
                logger.warning("[%s] dropped %d frames (queue full)",
                               self.camera_id, self.frames_dropped)

    def _reconnect(self) -> None:
        logger.warning("[%s] reconnecting after %d failures", self.camera_id,
                       self.consecutive_failures)
        self._disconnect()
        self.connected = False
        time.sleep(self.reconnect_delay)
        if self._running.is_set() and self._connect():
            self.reconnect_count += 1
            self.consecutive_failures = 0

    # -- accessors -------------------------------------------------------------
    def get_latest_frame(self) -> Optional[np.ndarray]:
        with self._frame_lock:
            return None if self._latest_frame is None else self._latest_frame.copy()

    def get_stats(self) -> Dict[str, Any]:
        return {
            "camera_id": self.camera_id,
            "camera_name": self.camera_name,
            "connected": self.connected,
            "fps": round(self._fps, 2),
            "frames_captured": self.frames_captured,
            "frames_dropped": self.frames_dropped,
            "consecutive_failures": self.consecutive_failures,
            "reconnect_count": self.reconnect_count,
            "last_frame_time": self.last_frame_time,
            "is_running": self._running.is_set(),
        }


class RTSPStreamCapture(BaseStreamCapture):
    """OpenCV/FFMPEG RTSP capture with TCP transport and buffer=1 for minimum
    latency (reference stream_capture.py:88-175)."""

    def __init__(self, rtsp_url: str, frame_queue: Queue, use_tcp: bool = True,
                 buffer_size: int = 1, **kwargs):
        super().__init__(frame_queue, **kwargs)
        self.rtsp_url = rtsp_url
        self.use_tcp = use_tcp
        self.buffer_size = buffer_size
        self._cap = None

    def _connect(self) -> bool:
        if cv2 is None:
            logger.error("OpenCV unavailable")
            return False
        opts = [f"timeout;{C.RTSP_TIMEOUT_MICROSECONDS}"]
        if self.use_tcp:
            opts.append("rtsp_transport;tcp")
        os.environ["OPENCV_FFMPEG_CAPTURE_OPTIONS"] = "|".join(opts)
        cap = cv2.VideoCapture(self.rtsp_url, cv2.CAP_FFMPEG)
        if not cap.isOpened():
            return False
        cap.set(cv2.CAP_PROP_BUFFERSIZE, self.buffer_size)
        self._cap = cap
        self.connected = True
        return True

    def _disconnect(self) -> None:
        if self._cap is not None:
            self._cap.release()
            self._cap = None
        self.connected = False

    def _read_frame(self) -> Optional[np.ndarray]:
        if self._cap is None:
            return None
        ok, frame = self._cap.read()
        return frame if ok else None


class FFmpegStreamCapture(BaseStreamCapture):
    """FFmpeg subprocess decoding to raw BGR24 over stdout (CPU decode; the
    TPU-host replacement for the reference's NVDEC variant,
    stream_capture_gpu_ffmpeg.py:94-260). Requires known stream WxH."""

    def __init__(self, rtsp_url: str, frame_queue: Queue, width: int,
                 height: int, use_tcp: bool = True, decode_threads: int = 2,
                 extra_args: Optional[list] = None,
                 ffmpeg_binary: str = "ffmpeg", **kwargs):
        super().__init__(frame_queue, **kwargs)
        self.rtsp_url = rtsp_url
        self.width = width
        self.height = height
        self.use_tcp = use_tcp
        self.decode_threads = decode_threads
        self.extra_args = extra_args or []
        # overridable decoder binary: hermetic tests drive this capture
        # with a stub that emits deterministic BGR24 (no ffmpeg/cameras in
        # CI), and deployments can pin a specific ffmpeg build
        self.ffmpeg_binary = ffmpeg_binary
        self._proc: Optional[subprocess.Popen] = None
        self._frame_bytes = width * height * 3

    def _build_command(self) -> list:
        cmd = [self.ffmpeg_binary, "-nostdin", "-loglevel", "error"]
        if self.rtsp_url.startswith("rtsp"):
            cmd += ["-rtsp_transport", "tcp" if self.use_tcp else "udp"]
        cmd += ["-threads", str(self.decode_threads)]
        cmd += self.extra_args
        cmd += ["-i", self.rtsp_url,
                "-f", "rawvideo", "-pix_fmt", "bgr24",
                "-s", f"{self.width}x{self.height}", "pipe:1"]
        return cmd

    def _connect(self) -> bool:
        try:
            self._proc = subprocess.Popen(
                self._build_command(), stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL, bufsize=self._frame_bytes * 4)
        except (OSError, FileNotFoundError):
            logger.exception("ffmpeg spawn failed")
            return False
        self.connected = True
        return True

    def stop(self) -> None:
        # The capture thread may be BLOCKED in a pipe read on the decoder's
        # stdout; the base stop() joins the thread before _disconnect, so
        # kill the decoder first (after clearing the run flag, so the loop
        # can't treat the death as a failure and respawn) — the read
        # unblocks with EOF and the join completes instead of leaking the
        # thread (found driving the app against a live decoder subprocess).
        self._running.clear()
        proc = self._proc
        if proc is not None:
            proc.kill()
        super().stop()

    def _disconnect(self) -> None:
        proc, self._proc = self._proc, None
        if proc is not None:
            proc.kill()
            try:
                proc.wait(timeout=2)  # reap — avoid zombie ffmpeg
            except subprocess.TimeoutExpired:
                logger.warning("[%s] ffmpeg did not die cleanly", self.camera_id)
        self.connected = False

    def _read_frame(self) -> Optional[np.ndarray]:
        proc = self._proc
        if proc is None or proc.stdout is None:
            return None
        if proc.poll() is not None:  # process died
            return None
        # native exact-read (GIL-free) when the library is built
        from telescope_cam_detection_tpu.utils import native
        if native.available():
            buf_arr = native.read_exact(proc.stdout.fileno(),
                                        self._frame_bytes)
            if buf_arr is None:
                return None
            return buf_arr.reshape(self.height, self.width, 3)
        buf = proc.stdout.read(self._frame_bytes)
        if buf is None or len(buf) != self._frame_bytes:
            return None
        return np.frombuffer(buf, np.uint8).reshape(self.height, self.width, 3)


class FileStreamCapture(BaseStreamCapture):
    """Replay a video file (or image-sequence via cv2) at its native rate;
    loops at EOF. Used for recorded-trace benchmarks."""

    def __init__(self, path: str, frame_queue: Queue, loop: bool = True,
                 fps_limit: Optional[float] = None, **kwargs):
        super().__init__(frame_queue, **kwargs)
        self.path = path
        self.loop = loop
        self.fps_limit = fps_limit
        self._cap = None
        self._last_emit = 0.0

    def _connect(self) -> bool:
        if cv2 is None:
            return False
        cap = cv2.VideoCapture(self.path)
        if not cap.isOpened():
            return False
        self._cap = cap
        self.connected = True
        return True

    def _disconnect(self) -> None:
        if self._cap is not None:
            self._cap.release()
            self._cap = None
        self.connected = False

    def _read_frame(self) -> Optional[np.ndarray]:
        if self._cap is None:
            return None
        if self.fps_limit:
            wait = (self._last_emit + 1.0 / self.fps_limit) - time.time()
            if wait > 0:
                time.sleep(wait)
            self._last_emit = time.time()
        ok, frame = self._cap.read()
        if not ok and self.loop:
            self._cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
            ok, frame = self._cap.read()
        return frame if ok else None


class SyntheticStreamCapture(BaseStreamCapture):
    """Deterministic synthetic camera for hermetic tests and benches
    (protocol: "synthetic" in config)."""

    def __init__(self, frame_queue: Queue, width: int = 640, height: int = 640,
                 fps: float = 30.0, seed: int = 0, n_frames: Optional[int] = None,
                 prerender: int = 0, **kwargs):
        """prerender > 0: render that many frames ONCE at connect and serve
        them cyclically with zero per-frame cost. A real camera's decode
        runs in OpenCV/FFmpeg C++ threads; on a 1-core bench host the
        numpy synthesis (~8 ms/frame at 1440p) otherwise dominates the
        serving path being measured."""
        kwargs.setdefault("target_width", None)
        kwargs.setdefault("target_height", None)
        super().__init__(frame_queue, **kwargs)
        self._source = SyntheticFrameSource(width=width, height=height, seed=seed)
        self.fps = fps
        self.n_frames = n_frames
        self.prerender = int(prerender)
        self._cycle: Optional[list] = None
        self._idx = 0

    def _connect(self) -> bool:
        if self.prerender > 0 and self._cycle is None:
            self._cycle = [self._source.frame_at(i)
                           for i in range(self.prerender)]
        self.connected = True
        return True

    def _read_frame(self) -> Optional[np.ndarray]:
        if self.n_frames is not None and self._idx >= self.n_frames:
            time.sleep(C.ERROR_SLEEP_SECONDS)
            return None
        if self.fps > 0:
            time.sleep(1.0 / self.fps)
        if self._cycle is not None:
            frame = self._cycle[self._idx % len(self._cycle)]
        else:
            frame = self._source.frame_at(self._idx)
        self._idx += 1
        return frame


def create_stream_capture(camera: Dict[str, Any], frame_queue: Queue,
                          performance: Optional[Dict[str, Any]] = None
                          ) -> BaseStreamCapture:
    """Factory from a config camera entry (reference main.py:890-939)."""
    performance = performance or {}
    common = dict(
        camera_id=camera.get("id", "cam1"),
        camera_name=camera.get("name", camera.get("id", "Camera")),
        target_width=camera.get("target_width"),
        target_height=camera.get("target_height"),
        max_failures=performance.get("rtsp_max_failures",
                                     C.DEFAULT_MAX_RTSP_FAILURES),
        reconnect_delay=performance.get("rtsp_retry_delay",
                                        C.DEFAULT_RTSP_RECONNECT_DELAY_SECONDS),
    )
    protocol = camera.get("protocol", "rtsp-tcp")
    if protocol == "synthetic":
        return SyntheticStreamCapture(
            frame_queue,
            width=camera.get("target_width", 640),
            height=camera.get("target_height", 640),
            fps=camera.get("fps", 30.0),
            seed=camera.get("seed", 0),
            prerender=camera.get("prerender", 0),
            camera_id=common["camera_id"], camera_name=common["camera_name"])
    if protocol == "file":
        return FileStreamCapture(camera["path"], frame_queue,
                                 fps_limit=camera.get("fps"), **common)
    url = create_rtsp_url(camera)
    if camera.get("use_ffmpeg_subprocess"):
        return FFmpegStreamCapture(
            url, frame_queue,
            width=camera.get("target_width", 1920),
            height=camera.get("target_height", 1080),
            decode_threads=camera.get("decode_threads", 2),
            ffmpeg_binary=camera.get("ffmpeg_binary", "ffmpeg"), **common)
    return RTSPStreamCapture(url, frame_queue,
                             use_tcp=(protocol != "rtsp"),
                             buffer_size=camera.get("buffer_size", 1), **common)
