#!/usr/bin/env python3
"""External watchdog: restart the detection service when cameras freeze.

Counterpart of reference scripts/stream_watchdog.py:66-204 with two freshness
sources:

- ``--source health`` (default): poll the service's /health and /stats
  endpoints (independent process, so it survives a hung main process — when
  even HTTP is dead it restarts too).
- ``--source journald``: journald-native like the reference — read
  ``journalctl -u <unit> -o json`` and track each camera's last
  "[camera_id] capture alive" heartbeat (runtime/capture.py emits one per
  minute). Unlike the reference's text parsing (which re-derives timestamps
  from "Oct 06 18:55:02" strings with year-boundary patching,
  stream_watchdog.py:95-113), JSON export carries __REALTIME_TIMESTAMP
  directly. Works even when the web plane is disabled or wedged.

Restart actions are systemctl (and optionally docker) with a rate limit per
hour. Run as its own systemd unit (stream_watchdog.service).
"""
import argparse
import json
import logging
import subprocess
import sys
import time
import urllib.request

logger = logging.getLogger("watchdog")


def fetch(url: str, timeout: float = 5.0):
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return json.load(resp)


import re as _re

# First "[camera_id]" token anywhere in the message: the app's log format
# prefixes asctime/level/logger-name (main.py:25-27), so the bracket is NOT
# at the start of MESSAGE.
_CAM_MARKER = _re.compile(r"\[([A-Za-z0-9_.\-]+)\]")


def journald_last_activity(unit: str, window_s: float = 600.0,
                           _run=subprocess.run):
    """Last per-camera activity timestamps (epoch seconds) from journald.

    Scans the unit's recent journal (JSON export) for per-camera markers:
    the capture heartbeat, connect/reconnect lines, snapshot saves — any
    message containing a "[<camera_id>]" token. Returns {camera_id: ts} or
    None when the journal is unreadable.
    """
    base = ["journalctl", "-u", unit, "--since", f"-{int(window_s)}s",
            "--no-pager", "-o", "json", "-n", "10000"]
    # -g pre-filters to bracketed lines server-side so chatty request logs
    # cannot evict the once-per-minute heartbeats from the line cap;
    # retried without -g for journalctl builds lacking grep support.
    for cmd in (base + ["-g", r"\["], base):
        try:
            result = _run(cmd, capture_output=True, text=True, timeout=10)
        except (subprocess.TimeoutExpired, OSError) as e:
            logger.warning("journal query failed: %s", e)
            return None
        if result.returncode == 0:
            break
    else:
        logger.warning("journalctl rc=%d: %s", result.returncode,
                       (result.stderr or "").strip()[:200])
        return None
    last = {}
    for line in result.stdout.splitlines():
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        msg = rec.get("MESSAGE") or ""
        m = _CAM_MARKER.search(msg)
        if m is None:
            continue
        cam = m.group(1)
        try:
            ts = int(rec.get("__REALTIME_TIMESTAMP", 0)) / 1e6
        except (TypeError, ValueError):
            continue
        if ts > last.get(cam, 0.0):
            last[cam] = ts
    return last


def restart_service(unit: str, use_sudo: bool = True) -> bool:
    cmd = (["sudo"] if use_sudo else []) + ["systemctl", "restart", unit]
    logger.warning("restarting service: %s", " ".join(cmd))
    try:
        subprocess.run(cmd, check=True, timeout=60)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError):
        logger.exception("service restart failed")
        return False


def restart_docker(container: str, use_sudo: bool = True) -> bool:
    cmd = (["sudo"] if use_sudo else []) + ["docker", "restart", container]
    logger.warning("restarting container: %s", " ".join(cmd))
    try:
        subprocess.run(cmd, check=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError):
        logger.exception("docker restart failed")
        return False


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--interval", type=float, default=30.0)
    parser.add_argument("--freeze-threshold", type=float, default=120.0,
                        help="seconds without fresh frames = frozen")
    parser.add_argument("--service", default="telescope_detection.service")
    parser.add_argument("--neolink-container", default=None,
                        help="also restart this docker container (RTSP proxy)")
    parser.add_argument("--max-restarts-per-hour", type=int, default=3)
    parser.add_argument("--no-sudo", action="store_true")
    parser.add_argument("--dry-run", action="store_true")
    parser.add_argument("--source", default="health",
                        choices=["health", "journald"],
                        help="freshness source: poll /stats, or tail the "
                             "unit's journal (reference-style)")
    parser.add_argument("--cameras", default=None,
                        help="comma-separated camera ids to require activity "
                             "for (journald mode; default: any camera seen)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s watchdog: %(message)s")
    base = f"http://{args.host}:{args.port}"
    required = ([c.strip() for c in args.cameras.split(",") if c.strip()]
                if args.cameras else None)
    restart_times = []
    consecutive_http_failures = 0
    # journald mode without --cameras: remember camera ids past the query
    # window so a camera that has been dead longer than the window (watchdog
    # started after the failure, or silent past the window) stays monitored
    # instead of vanishing from the activity map. Entries age out after
    # FORGET_AFTER of absence: by then the freeze->restart cycle has had
    # several attempts, so a camera still missing was removed/renamed in
    # config — without the horizon it would trip restarts forever.
    seen_cameras: dict = {}  # camera id -> last journal timestamp

    while True:
        frozen = False
        reason = ""
        if args.source == "journald":
            window = max(args.freeze_threshold * 2, 600.0)
            activity = journald_last_activity(args.service, window)
            now = time.time()
            if activity is None:
                consecutive_http_failures += 1
                if consecutive_http_failures >= 3:
                    frozen = True
                    reason = "journal unreadable"
            else:
                consecutive_http_failures = 0
                for cid, ts in activity.items():
                    seen_cameras[cid] = max(seen_cameras.get(cid, 0.0), ts)
                forget_after = max(4 * args.freeze_threshold, 2 * window)
                for cid in [c for c, ts in seen_cameras.items()
                            if now - ts > forget_after]:
                    logger.warning("camera %s absent for %ds — dropping it "
                                   "from monitoring (removed from config?)",
                                   cid, int(now - seen_cameras[cid]))
                    del seen_cameras[cid]
                cams = (required if required is not None
                        else sorted(seen_cameras))
                if not cams:
                    # no camera line in the whole window: service silent
                    frozen = True
                    reason = (f"no camera activity in the journal for "
                              f"{int(window)}s")
                for cid in cams:
                    age = now - activity.get(cid, 0.0)
                    if age > args.freeze_threshold:
                        frozen = True
                        reason = (f"camera {cid} silent for {age:.0f}s"
                                  if cid in activity else
                                  f"camera {cid} absent from the journal")
                        break
        else:
            try:
                stats = fetch(f"{base}/stats")
                consecutive_http_failures = 0
                now = time.time()
                for cid, cam in (stats.get("cameras") or {}).items():
                    last = cam.get("last_frame_time", 0)
                    if last and now - last > args.freeze_threshold:
                        frozen = True
                        reason = f"camera {cid} frozen for {now - last:.0f}s"
                        break
            except OSError as e:
                consecutive_http_failures += 1
                if consecutive_http_failures >= 3:
                    frozen = True
                    reason = f"service unreachable ({e})"

        if frozen:
            restart_times = [t for t in restart_times if time.time() - t < 3600]
            if len(restart_times) >= args.max_restarts_per_hour:
                logger.error("%s — but restart budget exhausted "
                             "(%d/hour)", reason, args.max_restarts_per_hour)
            else:
                logger.warning("freeze detected: %s", reason)
                if args.dry_run:
                    logger.info("dry-run: would restart %s", args.service)
                else:
                    if args.neolink_container:
                        restart_docker(args.neolink_container,
                                       use_sudo=not args.no_sudo)
                    restart_service(args.service, use_sudo=not args.no_sudo)
                restart_times.append(time.time())
                consecutive_http_failures = 0
        time.sleep(args.interval)


if __name__ == "__main__":
    sys.exit(main())
