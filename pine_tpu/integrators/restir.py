"""ReSTIR integrator (parity: impl/integrator/restir.cpp — the reference's
radiance body and final gather are commented out; skeleton only).  The TPU
build will carry temporal+spatial reservoirs as dense per-pixel arrays.
Currently renders via the plain wavefront path."""
from __future__ import annotations

from pine_tpu.integrators.path import PathIntegrator


class RestirIntegrator(PathIntegrator):
    pass
