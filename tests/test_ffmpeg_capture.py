"""Hermetic FFmpegStreamCapture tests (VERDICT r4 #4a).

The FFmpeg capture variant is the production ingest path on TPU hosts (CPU
decode; reference stream_capture_gpu_ffmpeg.py:94-260 is the NVDEC
original) but this environment has no ffmpeg binary and no cameras — so it
had zero test coverage. These tests drive the REAL capture class against a
fake-ffmpeg stub: an executable that parses the same `-s WxH` argument and
writes deterministic raw BGR24 frames to stdout, optionally in ragged
partial chunks (exercising the exact-read path) or exiting after N frames
(exercising process-death detection -> reconnect -> respawn -> reap).
"""
import os
import stat
import subprocess
import time
from queue import Queue

import numpy as np
import pytest

from telescope_cam_detection_tpu.runtime.capture import FFmpegStreamCapture

STUB = r'''#!/usr/bin/env python3
"""fake ffmpeg: emit deterministic BGR24 frames to stdout.

Env knobs:
  FAKE_FFMPEG_FRAMES  frames to emit before exiting (default: forever)
  FAKE_FFMPEG_CHUNK   write in chunks of this many bytes with flushes
                      (default: whole frames) — forces short pipe reads
  FAKE_FFMPEG_FPS     pacing (default 120)
"""
import os, sys, time
args = sys.argv[1:]
size = args[args.index("-s") + 1]
w, h = (int(v) for v in size.split("x"))
n = int(os.environ.get("FAKE_FFMPEG_FRAMES", "-1"))
chunk = int(os.environ.get("FAKE_FFMPEG_CHUNK", "0"))
fps = float(os.environ.get("FAKE_FFMPEG_FPS", "120"))
out = sys.stdout.buffer
k = 0
while n < 0 or k < n:
    frame = bytes([(k * 7 + c) % 256 for c in range(3)]) * (w * h)
    if chunk:
        for i in range(0, len(frame), chunk):
            out.write(frame[i:i + chunk])
            out.flush()
            time.sleep(0.0005)
    else:
        out.write(frame)
        out.flush()
    k += 1
    time.sleep(1.0 / fps)
'''


@pytest.fixture
def fake_ffmpeg(tmp_path):
    p = tmp_path / "fake_ffmpeg"
    p.write_text(STUB)
    p.chmod(p.stat().st_mode | stat.S_IXUSR)
    return str(p)


def _capture(fake_ffmpeg, w=32, h=24, **kw):
    q = Queue(maxsize=4)
    cap = FFmpegStreamCapture(
        "rtsp://fake/stream", q, width=w, height=h,
        ffmpeg_binary=fake_ffmpeg, camera_id="ffcam",
        max_failures=2, reconnect_delay=0.05, **kw)
    return cap, q


def _drain_until(q, n, timeout=10.0):
    frames = []
    deadline = time.time() + timeout
    while len(frames) < n and time.time() < deadline:
        try:
            frames.append(q.get(timeout=0.2))
        except Exception:
            pass
    return frames


def test_frames_flow_with_exact_content(fake_ffmpeg, monkeypatch):
    """Decoded BGR24 frames arrive intact: shape, dtype, per-frame
    deterministic pixel values, monotonically advancing frame ids, and a
    live latest_frame for MJPEG."""
    cap, q = _capture(fake_ffmpeg)
    assert cap.start()
    try:
        frames = _drain_until(q, 5)
        assert len(frames) == 5
        seen = []
        for item in frames:
            f = item["frame"]
            assert f.shape == (24, 32, 3) and f.dtype == np.uint8
            # stub frame k is bytes (k*7, k*7+1, k*7+2) repeated
            b = int(f[0, 0, 0])
            assert (f[..., 0] == b).all()
            assert (f[..., 1] == np.uint8(b + 1)).all()
            assert (f[..., 2] == np.uint8(b + 2)).all()
            assert item["camera_id"] == "ffcam"
            seen.append(item["frame_id"])
        assert seen == sorted(seen)
        assert cap.get_latest_frame() is not None
        stats = cap.get_stats()
        assert stats["connected"] and stats["frames_captured"] >= 5
    finally:
        cap.stop()


def test_ragged_pipe_writes_exercise_exact_read(fake_ffmpeg, monkeypatch):
    """The decoder writing in partial chunks (short pipe reads) must not
    tear frames: the exact-read path (native read_exact or buffered read)
    reassembles full frames."""
    monkeypatch.setenv("FAKE_FFMPEG_CHUNK", "997")   # prime, not a divisor
    cap, q = _capture(fake_ffmpeg)
    assert cap.start()
    try:
        frames = _drain_until(q, 4)
        assert len(frames) == 4
        for item in frames:
            f = item["frame"]
            b = int(f[0, 0, 0])
            # a torn frame would mix values from adjacent frames
            assert (f[..., 0] == b).all()
    finally:
        cap.stop()


def test_decoder_death_reconnects_and_reaps(fake_ffmpeg, monkeypatch):
    """The stub exits after 3 frames: the capture loop must detect the
    dead process, reap it (no zombie), respawn, and keep delivering
    frames; reconnect_count records the episode."""
    monkeypatch.setenv("FAKE_FFMPEG_FRAMES", "3")
    cap, q = _capture(fake_ffmpeg)
    assert cap.start()
    try:
        first_proc = cap._proc
        frames = _drain_until(q, 5, timeout=30.0)
        assert len(frames) == 5   # > 3: at least one respawn happened
        assert cap.reconnect_count >= 1
        # the dead first process was reaped, not left a zombie
        assert first_proc is not None
        assert first_proc.returncode is not None
    finally:
        cap.stop()


def test_stop_kills_and_reaps_decoder(fake_ffmpeg):
    """stop() must terminate the ffmpeg child and wait() it (the
    reference's zombie-ffmpeg handling, stream_capture_gpu_ffmpeg.py:
    187-210)."""
    cap, q = _capture(fake_ffmpeg)
    assert cap.start()
    _drain_until(q, 2)
    proc = cap._proc
    assert proc is not None and proc.poll() is None   # alive mid-stream
    cap.stop()
    assert cap._proc is None
    assert proc.returncode is not None   # reaped
    assert not cap.get_stats()["is_running"]


def test_spawn_failure_reports_connect_error(tmp_path):
    """A missing decoder binary fails start() cleanly (no thread, no
    zombie state)."""
    q = Queue(maxsize=2)
    cap = FFmpegStreamCapture(
        "rtsp://fake/stream", q, width=8, height=8,
        ffmpeg_binary=str(tmp_path / "does_not_exist"), camera_id="ffcam")
    assert cap.start() is False
    assert not cap.get_stats()["connected"]


def test_build_command_shape(fake_ffmpeg):
    """The spawned argv mirrors the reference's decoder invocation
    (rtsp transport, thread count, rawvideo bgr24 to pipe)."""
    q = Queue(maxsize=2)
    cap = FFmpegStreamCapture(
        "rtsp://cam/stream", q, width=640, height=360, use_tcp=True,
        decode_threads=3, extra_args=["-an"], ffmpeg_binary="ffmpeg-x")
    cmd = cap._build_command()
    assert cmd[0] == "ffmpeg-x"
    assert cmd[cmd.index("-rtsp_transport") + 1] == "tcp"
    assert cmd[cmd.index("-threads") + 1] == "3"
    assert "-an" in cmd
    assert cmd[cmd.index("-pix_fmt") + 1] == "bgr24"
    assert cmd[cmd.index("-s") + 1] == "640x360"
    assert cmd[-1] == "pipe:1"
    # non-rtsp input (file replay through ffmpeg) omits the transport flag
    cap2 = FFmpegStreamCapture("/videos/clip.mp4", q, width=8, height=8)
    assert "-rtsp_transport" not in cap2._build_command()
