"""Structured Streaming surface (SURVEY.md §2.10, phase 5 — additive)."""
