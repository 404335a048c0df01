"""Participating media (parity: src/pine/core/medium.h/.cpp, phase_function.h).

Host-side containers; the volumetric integration (equiangular light sampling,
delta tracking for VDB grids) plugs into the wavefront loop via
``sample_medium``/``transmittance`` hooks (integrator.cpp:49-81).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pine_tpu.core.vecmath import Pi, dot


class HgPhaseFunction:
    """Henyey-Greenstein (phase_function.h)."""

    def __init__(self, g=0.0):
        self.g = float(g)

    def p(self, cos_theta):
        g = self.g
        denom = 1 + g * g + 2 * g * cos_theta
        return (1 - g * g) / (4 * Pi * denom * jnp.sqrt(jnp.maximum(denom, 1e-8)))

    def sample(self, wi, u):
        """Sample direction; returns (wo, pdf)."""
        g = self.g
        if abs(g) < 1e-3:
            from pine_tpu.core.sampling import uniform_sphere

            wo = uniform_sphere(u)
            return wo, jnp.full(u.shape[:-1], 1 / (4 * Pi))
        sqr_term = (1 - g * g) / (1 + g - 2 * g * u[..., 0])
        cos_t = -(1 + g * g - sqr_term**2) / (2 * g)
        sin_t = jnp.sqrt(jnp.maximum(1 - cos_t**2, 0.0))
        phi = 2 * Pi * u[..., 1]
        from pine_tpu.core.vecmath import coordinate_system

        t, b = coordinate_system(wi)
        wo = (
            (sin_t * jnp.cos(phi))[..., None] * t
            + (sin_t * jnp.sin(phi))[..., None] * b
            + cos_t[..., None] * wi
        )
        return wo, self.p(dot(wo, wi))


class TwoLobeHgPhaseFunction:
    def __init__(self, g0, g1, w):
        self.l0 = HgPhaseFunction(g0)
        self.l1 = HgPhaseFunction(g1)
        self.w = float(w)

    def p(self, cos_theta):
        return (1 - self.w) * self.l0.p(cos_theta) + self.w * self.l1.p(cos_theta)

    def sample(self, wi, u):
        wo0, _ = self.l0.sample(wi, u)
        wo1, _ = self.l1.sample(wi, u)
        pick = (u[..., 0:1] < self.w)
        wo = jnp.where(pick, wo1, wo0)
        return wo, self.p(dot(wo, wi))


class CloudPhaseFunction(TwoLobeHgPhaseFunction):
    """HG + Draine mix for clouds ("CloudPF", phase_function.h:50-65);
    approximated by a fitted two-lobe HG (same shape class the reference fits
    its d -> {g_hg, g_d, a, w} parameters into)."""

    def __init__(self, d=0.5):
        g = float(np.exp(-0.990567 / (d + 1.67154)))
        super().__init__(g, -0.2, 0.3)
        self.d = d


class HomogeneousMedium:
    """Shape-bounded constant medium (medium.cpp:18-88)."""

    def __init__(self, shape, pf, sigma_a, sigma_s):
        self.shape = shape
        self.pf = pf
        self.sigma_a = np.asarray(sigma_a, np.float32)
        self.sigma_s = np.asarray(sigma_s, np.float32)
        self.sigma_t = self.sigma_a + self.sigma_s

    def get_aabb(self):
        return self.shape.get_aabb()


class VDBMedium:
    """NanoVDB density-grid medium (medium.cpp:90-135).  The .nvdb reader
    feeds a dense density grid + coarse majorant supergrid for delta
    tracking; lands with the volumetric milestone."""

    def __init__(self, *args):
        self.args = args
        raise NotImplementedError("VDBMedium lands with the volumetric milestone")
