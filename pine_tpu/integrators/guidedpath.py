"""Practical Path Guiding integrator (parity: impl/integrator/guidedpath.cpp).

Reference: adaptive binary SpatialTree of directional QuadTrees with
spp-doubling train iterations (spatial_tree.h, guidedpath.cpp:21-301).
TPU design: fixed-resolution SoA spatial grid of directional histograms
(SURVEY.md §7.7) accumulated by scatter-add, guiding/BSDF one-sample MIS.
Currently renders via the plain wavefront path (guiding layer lands next)."""
from __future__ import annotations

from pine_tpu.integrators.path import PathIntegrator


class GuidedPathIntegrator(PathIntegrator):
    pass
