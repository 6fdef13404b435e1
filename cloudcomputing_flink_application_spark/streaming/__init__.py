"""Structured Streaming variants of the reference queries."""
