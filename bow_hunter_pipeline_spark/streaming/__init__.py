"""Structured Streaming operators (SURVEY §2 H4 true-streaming forms)."""
