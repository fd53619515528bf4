"""Operator library: reference-parity wine transforms, validation,
dedup, similarity search, text analysis, multimodal plumbing."""
