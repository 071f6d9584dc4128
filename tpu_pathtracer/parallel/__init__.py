"""Multi-chip scaling: image-tile sharding over a device mesh."""
