#!/usr/bin/env python3
"""Entry point: python main.py [--config config/config.yaml]

TPU-native counterpart of the reference's main.py:1784-1840: build the
system from config, install SIGINT/SIGTERM handlers, start everything
(blocking on the web server), clean shutdown on signal.
"""
import argparse
import logging
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    parser = argparse.ArgumentParser(description="TPU wildlife detection system")
    parser.add_argument("--config", default="config/config.yaml")
    parser.add_argument("--no-weights", action="store_true",
                        help="skip loading model weights (random init)")
    parser.add_argument("--log-level", default="INFO")
    args = parser.parse_args()

    logging.basicConfig(
        level=getattr(logging, args.log_level.upper(), logging.INFO),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")

    from telescope_cam_detection_tpu.utils.jaxconfig import configure_jax
    configure_jax()
    from telescope_cam_detection_tpu.system import TelescopeDetectionSystem

    system = TelescopeDetectionSystem(args.config,
                                      load_weights=not args.no_weights)

    shutting_down = False

    def handle_signal(signum, frame):
        # a second signal while stop() is tearing down must not re-enter
        # the handler: SystemExit raised mid-stop aborts device-client
        # teardown uncleanly (observed: repeat SIGTERM during shutdown
        # crashed the TPU relay client with a C++ terminate)
        nonlocal shutting_down
        if shutting_down:
            logging.getLogger("main").info(
                "signal %d during shutdown; already stopping", signum)
            return
        shutting_down = True
        logging.getLogger("main").info("signal %d; shutting down", signum)
        system.stop()
        sys.exit(0)

    signal.signal(signal.SIGINT, handle_signal)
    signal.signal(signal.SIGTERM, handle_signal)

    system.load_config()
    system.validate_config()
    missing = system.validate_model_files()
    if missing and not args.no_weights:
        # configured model files that don't exist are fatal, like the
        # reference (main.py:348 validate_model_files blocks startup);
        # --no-weights explicitly opts into random-init smoke runs
        for msg in missing:
            logging.getLogger("main").error(msg)
        return 1
    for msg in missing:
        logging.getLogger("main").warning("%s (--no-weights: random init)",
                                          msg)
    system.initialize_components()
    try:
        system.start(block=True)
    finally:
        system.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
