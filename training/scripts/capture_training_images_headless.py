#!/usr/bin/env python3
"""Headless training-image capture (no display required).

The reference ships capture_training_images_headless.py as a separate
no-preview variant; our capture_training_images.py is headless by design, so
this entry point exists for operator muscle-memory parity and simply
delegates (same flags).
"""
import sys

from capture_training_images import main  # noqa: F401

if __name__ == "__main__":
    sys.exit(main())
