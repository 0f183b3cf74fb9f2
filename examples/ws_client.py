#!/usr/bin/env python3
"""Minimal WebSocket client: print live detections from a running system.

  python examples/ws_client.py --host 127.0.0.1 --port 8000
"""
import argparse
import base64
import json
import os
import socket
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from telescope_cam_detection_tpu.utils import wsproto  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    args = parser.parse_args()

    sock = socket.create_connection((args.host, args.port), timeout=30)
    key = base64.b64encode(os.urandom(16)).decode()
    sock.sendall((f"GET /ws/detections HTTP/1.1\r\nHost: {args.host}\r\n"
                  f"Upgrade: websocket\r\nConnection: Upgrade\r\n"
                  f"Sec-WebSocket-Key: {key}\r\n"
                  f"Sec-WebSocket-Version: 13\r\n\r\n").encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        resp += sock.recv(4096)
    print("connected; streaming detections (ctrl-c to stop)")
    reader = wsproto.FrameReader(sock.makefile("rb"))
    try:
        while True:
            frame = reader.read_frame()
            if frame is None:
                break
            opcode, payload = frame
            if opcode != wsproto.OP_TEXT:
                continue
            msg = json.loads(payload)
            if msg.get("type") != "detections":
                continue
            for d in msg["detections"]:
                label = d.get("species") or d["class_name"]
                print(f"[{msg['camera_id']}] {label} "
                      f"{d['confidence']:.2f} "
                      f"(latency {msg.get('total_latency_ms', 0):.0f} ms)")
    except KeyboardInterrupt:
        pass
    finally:
        sock.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
