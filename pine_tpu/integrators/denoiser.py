"""denoise(scene) (parity: impl/integrator/denoiser.cpp — OIDN integration is
stubbed out in the reference too, denoise.cpp:8-45). We apply a joint
bilateral filter guided by albedo+normal aux buffers instead."""
from __future__ import annotations


def denoise_scene(scene):
    raise NotImplementedError("denoiser lands with aux-buffer rendering")
