"""Scalar / per-record helper functions (SURVEY.md §2.2)."""
