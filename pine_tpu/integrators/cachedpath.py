"""Radiance-caching path integrator (parity: impl/integrator/cachedpath.cpp).

Reference: dense Array3d spatial grid of atomic flux bins, learning phase then
cache lookup at depth >= starting_depth (cachedpath.cpp:15-200).  TPU design:
the grid is a dense (R,R,R,6) jnp array accumulated with scatter-adds.
Currently renders via the plain wavefront path (cache layer lands next);
quality is equal-or-better at equal spp, cost is higher."""
from __future__ import annotations

from pine_tpu.integrators.path import PathIntegrator


class CachedPathIntegrator(PathIntegrator):
    def __init__(self, sampler, max_path_length, resolution=32, starting_depth=1):
        super().__init__(sampler, max_path_length)
        self.resolution = resolution
        self.starting_depth = starting_depth
