"""Deduplication query plans (filled in by operators/dedup.py work)."""

from __future__ import annotations
