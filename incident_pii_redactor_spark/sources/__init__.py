"""Input sources: table readers and deterministic fixture synthesis."""
