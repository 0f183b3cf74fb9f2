"""Signal-handling drill for the main.py entrypoint.

The reference installs SIGINT/SIGTERM handlers that stop the system once
(/root/reference/main.py signal wiring); a second signal during teardown
must not re-enter shutdown. Here that re-entry raised SystemExit inside
stop() (aborting device-client teardown with a C++ terminate) until
main.handle_signal gained a shutting-down guard — this test pins it by
booting the real entrypoint in a subprocess, waiting for the web plane,
and delivering two rapid SIGTERMs.

Runs on CPU via TCD_PLATFORM (the container's sitecustomize pins jax to
the TPU backend; jaxconfig re-overrides before backend init).
"""
import os
import signal
import socket
import subprocess
import sys
import textwrap
import time
import urllib.request

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_double_sigterm_exits_cleanly(tmp_path):
    port = _free_port()
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(textwrap.dedent(f"""\
        cameras:
          - {{id: cam0, name: Sig, protocol: synthetic,
              target_width: 256, target_height: 256, fps: 10, enabled: true}}
        detection:
          detector_type: yolox
          yolox: {{model_name: yolox-nano}}
          input_size: [160, 160]
          batching: {{enabled: true, max_batch_size: 2}}
        web: {{port: {port}}}
        snapshots: {{enabled: false}}
        """))
    env = dict(os.environ, TCD_PLATFORM="cpu", PYTHONPATH=REPO)
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "main.py"), "--config", str(cfg)],
        cwd=str(tmp_path), env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        deadline = time.monotonic() + 120
        up = False
        while time.monotonic() < deadline:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{port}/health", timeout=2):
                    up = True
                    break
            except OSError:
                if proc.poll() is not None:
                    break
                time.sleep(1.0)
        assert up, f"web plane never came up:\n{proc.stdout.read()[-3000:]}"

        proc.send_signal(signal.SIGTERM)
        time.sleep(0.2)  # land the repeat while stop() is tearing down
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=90)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate(timeout=30)

    assert proc.returncode == 0, f"exit {proc.returncode}:\n{out[-3000:]}"
    assert "system stopped" in out
    assert "terminate called" not in out
    assert "FATAL" not in out
