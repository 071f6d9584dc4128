"""IO, golden-image harness, metrics."""
