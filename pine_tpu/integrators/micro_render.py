"""Point-based GI (MicroRenderGI; parity: impl/integrator/micro_render.cpp).

Reference: surfel sampling over scene area, BSphere hierarchy, splat/gather
push-pull pyramid (micro_render.cpp:12-298).  TPU design: surfels as dense
arrays, gather via vectorized hierarchy traversal.  Currently renders via the
wavefront path tracer at equivalent quality settings."""
from __future__ import annotations

from pine_tpu.core.samplers import BlueSampler
from pine_tpu.integrators.path import PathIntegrator


class MicroRenderIntegrator(PathIntegrator):
    def __init__(self, point_count=2048):
        super().__init__(BlueSampler(16), 5)
        self.point_count = point_count
