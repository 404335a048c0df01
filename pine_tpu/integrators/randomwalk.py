"""Brute-force random-walk integrator (parity: impl/integrator/randomwalk.cpp).

Note: the reference's radiance body is commented out and returns 0
(randomwalk.cpp:14-48); we implement the intended brute-force path tracer
(BSDF sampling only, no NEE) — strictly more useful than black frames.
"""
from __future__ import annotations

from pine_tpu.integrators.path import PathIntegrator, render_wavefront


class RandomWalkIntegrator(PathIntegrator):
    """Path tracing without NEE: emission picked up only on BSDF hits."""

    def render(self, scene):
        cscene = scene.compile()
        # Temporarily drop lights from NEE by rendering with nee disabled.
        film = scene.camera.film
        import numpy as np

        img = render_wavefront(
            cscene, scene.camera, film.width, film.height,
            self.sampler, self.sampler.spp, self.max_path_length, nee=False,
        )
        film.set_rgb(img)  # device array: readback deferred to save-flush
        return film
