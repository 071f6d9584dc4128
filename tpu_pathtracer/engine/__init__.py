"""Render engine: wavefront bounce loop + host-facing API."""
