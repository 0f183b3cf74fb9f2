#!/usr/bin/env python3
"""Sample end-to-end detection latency from the WebSocket stream.

Counterpart of reference scripts/check_latency.py: connects to
ws://host/ws/detections, collects total_latency_ms from detection messages,
prints p50/p95/p99.
"""
import argparse
import base64
import json
import os
import socket
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from telescope_cam_detection_tpu.utils import wsproto  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--samples", type=int, default=50)
    parser.add_argument("--timeout", type=float, default=60.0)
    args = parser.parse_args()

    sock = socket.create_connection((args.host, args.port), timeout=10)
    key = base64.b64encode(os.urandom(16)).decode()
    sock.sendall((f"GET /ws/detections HTTP/1.1\r\nHost: {args.host}\r\n"
                  f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                  f"Sec-WebSocket-Key: {key}\r\n"
                  f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += sock.recv(4096)
    if b"101" not in resp.split(b"\r\n")[0]:
        print("websocket upgrade failed", file=sys.stderr)
        return 1

    reader = wsproto.FrameReader(sock.makefile("rb"))
    latencies = []
    deadline = time.time() + args.timeout
    while len(latencies) < args.samples and time.time() < deadline:
        frame = reader.read_frame()
        if frame is None:
            break
        opcode, payload = frame
        if opcode != wsproto.OP_TEXT:
            continue
        msg = json.loads(payload)
        if msg.get("type") == "detections" and "total_latency_ms" in msg:
            latencies.append(msg["total_latency_ms"])
            print(f"\r{len(latencies)}/{args.samples} samples", end="")
    sock.close()
    print()
    if not latencies:
        print("no detection messages received (scene may be empty)")
        return 1
    latencies.sort()

    def pct(p):
        return latencies[min(int(len(latencies) * p), len(latencies) - 1)]

    print(f"samples: {len(latencies)}")
    print(f"p50: {pct(0.50):.1f} ms | p95: {pct(0.95):.1f} ms | "
          f"p99: {pct(0.99):.1f} ms | max: {latencies[-1]:.1f} ms")
    budget = 100.0
    print("PASS" if pct(0.50) <= budget else "FAIL",
          f"(p50 budget {budget:.0f} ms)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
