"""Helpers for golden-parity tests against the read-only reference repo.

The reference at /root/reference is used ONLY as a numerical oracle inside
tests (imported read-only, never copied). All tests using it are skipped
when the reference checkout is absent.
"""
import os
import sys

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
