"""Batch twins of the streaming pipelines (filled in by streaming/ work)."""

from __future__ import annotations
