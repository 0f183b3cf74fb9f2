#!/usr/bin/env python3
"""Quick health check (counterpart of reference check_status.py)."""
import json
import sys
import urllib.request

host = sys.argv[1] if len(sys.argv) > 1 else "127.0.0.1:8000"
try:
    with urllib.request.urlopen(f"http://{host}/health", timeout=5) as resp:
        data = json.load(resp)
except OSError as e:
    print(f"UNREACHABLE: {e}")
    sys.exit(2)
print(f"status: {data['status']} (uptime {data['uptime_seconds']:.0f}s)")
for cam in data.get("cameras", []):
    print(f"  {cam['id']}: {'connected' if cam['connected'] else 'OFFLINE'} "
          f"{cam['fps']:.1f} fps")
for alert in data.get("alerts", []):
    print(f"  [{alert['level']}] {alert['message']}")
sys.exit(0 if data["status"] == "healthy" else 1)
