"""Structured Streaming wrappers over the same batch operators."""
