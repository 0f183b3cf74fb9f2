# TPU-native wildlife detection system.
# Base image must provide jax[tpu] for the target TPU VM (v5e). On a TPU VM
# the container needs --privileged (or the TPU device mounts) to reach the
# accelerator; everything else is pure Python + OpenCV.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        ffmpeg libgl1 libglib2.0-0 curl \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY telescope_cam_detection_tpu/ telescope_cam_detection_tpu/
COPY web/ web/
COPY scripts/ scripts/
COPY tools/ tools/
COPY main.py check_status.py fix_timestamps.py ./

# persistent XLA compile cache across container restarts
ENV TCD_XLA_CACHE_DIR=/cache/xla
VOLUME ["/cache", "/app/clips", "/app/config"]

EXPOSE 8000
HEALTHCHECK --interval=30s --timeout=5s --retries=3 \
    CMD curl -sf http://localhost:8000/health || exit 1

CMD ["python", "main.py", "--config", "config/config.yaml"]
