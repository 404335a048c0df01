"""PSSMLT integrator (parity: impl/integrator/mlt.cpp:33-200).

Reference: bootstrap estimate, per-thread Kelemen-mutation Markov chains,
luminance-ratio-weighted film splats + separate direct pass.  TPU design:
thousands of vmapped independent chains with scatter-add splats.
Currently renders via the plain wavefront path (chains land next)."""
from __future__ import annotations

from pine_tpu.integrators.path import PathIntegrator


class MltIntegrator(PathIntegrator):
    pass
