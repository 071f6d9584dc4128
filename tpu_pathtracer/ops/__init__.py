"""Compute-path ops: RNG, intersection, BVH, materials, textures, sky."""
