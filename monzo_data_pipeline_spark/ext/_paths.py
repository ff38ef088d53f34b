"""Repo-root constant for raw-session executor imports — stdlib only,
so codec modules (ext/jpeg.py) can share it without dragging
pyspark/pandas into their import graph. See ext/images.py for the
closure-cell usage pattern."""

from __future__ import annotations

import os

_PKG_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
