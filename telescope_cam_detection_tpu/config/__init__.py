from telescope_cam_detection_tpu.config.loader import (  # noqa: F401
    ConfigError,
    load_config,
    merge_camera_detection_config,
    validate_config,
    validate_model_files,
)
