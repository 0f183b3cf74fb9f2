#!/usr/bin/env python3
"""External watchdog: restart the detection service when cameras freeze.

Counterpart of reference scripts/stream_watchdog.py:66-204, adapted to this
framework's observability: instead of tailing journald for per-camera log
lines, it polls the service's /health and /stats endpoints (independent
process, so it survives a hung main process — when even HTTP is dead it
restarts too). Restart actions are systemctl (and optionally docker) with a
rate limit per hour.

Run as its own systemd unit (stream_watchdog.service).
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
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s watchdog: %(message)s")
    base = f"http://{args.host}:{args.port}"
    restart_times = []
    consecutive_http_failures = 0

    while True:
        frozen = False
        reason = ""
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
