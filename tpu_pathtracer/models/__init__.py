"""Scene families: analytic sphere scenes, triangle-mesh + BVH scenes."""
