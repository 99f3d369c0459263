"""Activate the vendored ``google.protobuf`` mini-runtime when needed.

The sandbox image has no package index (pip cannot resolve any host), so
the ``protobuf`` dependency of ``transformWithStateInPandas`` can never
be installed. ``vendor/google/protobuf`` re-implements the required
subset from the public wire spec; this module makes it importable in BOTH
processes that need it:

- the current (driver) process, by prepending the vendor dir to
  ``sys.path``;
- Spark's Python *workers*, by prepending it to the ``PYTHONPATH``
  environment variable BEFORE the JVM launches — local-mode executors
  inherit the driver's environment and pass it to spawned workers.

Call ``ensure_protobuf()`` before building a SparkSession (package import
time is early enough for every repo entry point). If a real ``protobuf``
distribution is installed it wins: the vendor path is only added when the
import fails, so upgrading the environment transparently retires the shim.
"""

from __future__ import annotations

import os
import sys

VENDOR_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "vendor"
)


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable; returns True on success."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(os.path.join(VENDOR_DIR, "google", "protobuf")):
        return False
    if VENDOR_DIR not in sys.path:
        sys.path.insert(0, VENDOR_DIR)
    existing = os.environ.get("PYTHONPATH", "")
    parts = existing.split(os.pathsep) if existing else []
    if VENDOR_DIR not in parts:
        os.environ["PYTHONPATH"] = (
            VENDOR_DIR + os.pathsep + existing if existing else VENDOR_DIR
        )
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False
