"""Similarity / text-analysis / multimodal query plans (filled in by
operators/{similarity,text,multimodal}.py work)."""

from __future__ import annotations
