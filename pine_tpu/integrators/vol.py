"""Single-scatter homogeneous-volume test integrator (parity: impl/integrator/vol.cpp)."""
from __future__ import annotations

import numpy as np


class VolIntegrator:
    """Closed-form single-scatter test (vol.cpp:14-35). Implemented against
    the media subsystem once volumetrics land; renders transmittance-only
    until then."""

    def __init__(self, *args):
        self.args = args

    def render(self, scene):
        raise NotImplementedError(
            "VolIntegrator arrives with the volumetric subsystem"
        )
