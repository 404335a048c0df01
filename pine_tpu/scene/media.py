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


class GridMedium:
    """Heterogeneous density-grid medium (medium.cpp:90-290 semantics).

    A dense (X,Y,Z) density array positioned in world space by ``transform``
    (grid index space spans the unit cube before the transform).  Sampling
    uses null-collision delta tracking against the global majorant
    sigma_z * max(density) (medium.cpp:204-251); transmittance uses ratio
    tracking (medium.cpp:264-290).  Both run as bounded masked fori loops in
    the wavefront.
    """

    is_grid = True

    def __init__(self, density, transform, pf, sigma_a, sigma_s):
        density = np.asarray(density, np.float32)
        assert density.ndim == 3
        self.density = jnp.asarray(density)
        self.res = np.asarray(density.shape, np.int32)
        m = np.asarray(transform, np.float32)
        if m.shape == (4, 4):
            self.m = m
        else:
            self.m = np.eye(4, dtype=np.float32)
            self.m[:3, : m.shape[1]] = m
        self.m_inv = np.linalg.inv(self.m).astype(np.float32)
        self.pf = pf
        self.sigma_a = np.broadcast_to(np.asarray(sigma_a, np.float32).reshape(-1), (3,)).copy()
        self.sigma_s = np.broadcast_to(np.asarray(sigma_s, np.float32).reshape(-1), (3,)).copy()
        self.sigma_t = self.sigma_a + self.sigma_s
        # scalar averages drive the tracking like the reference
        # (medium.cpp:170-173 sigma_a_/sigma_s_/sigma_z_)
        self.sigma_a_bar = float(self.sigma_a.mean())
        self.sigma_s_bar = float(self.sigma_s.mean())
        self.sigma_z_bar = self.sigma_a_bar + self.sigma_s_bar
        self.max_density = float(density.max())
        self.sigma_maj = self.sigma_z_bar * self.max_density

    def get_aabb(self):
        corners = np.stack(
            [
                self.m[:3, :3] @ np.array([x, y, z], np.float32) + self.m[:3, 3]
                for x in (0, 1) for y in (0, 1) for z in (0, 1)
            ]
        )
        return corners.min(0), corners.max(0)

    # ---- device-side helpers -----------------------------------------------
    def local_of(self, p):
        mi = jnp.asarray(self.m_inv)
        return p @ mi[:3, :3].T + mi[:3, 3]

    def density_at(self, p):
        """Nearest-neighbour density lookup at world p (0 outside)."""
        q = self.local_of(p)
        res = jnp.asarray(np.asarray(self.res, np.float32))
        idx = jnp.floor(q * res).astype(jnp.int32)
        inside = jnp.all((q >= 0.0) & (q < 1.0), axis=-1)
        idx = jnp.clip(idx, 0, jnp.asarray(self.res) - 1)
        d = self.density[idx[..., 0], idx[..., 1], idx[..., 2]]
        return jnp.where(inside, d, 0.0)

    def bounds_interval(self, ro, rd):
        """Entry/exit t of the (transformed) unit-cube bounds."""
        mi = jnp.asarray(self.m_inv)
        o_l = ro @ mi[:3, :3].T + mi[:3, 3]
        d_l = rd @ mi[:3, :3].T
        inv = 1.0 / jnp.where(jnp.abs(d_l) < 1e-9, jnp.where(d_l < 0, -1e-9, 1e-9), d_l)
        t0 = (0.0 - o_l) * inv
        t1 = (1.0 - o_l) * inv
        tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
        return jnp.maximum(tn, 0.0), tf


class VDBMedium(GridMedium):
    """NanoVDB ``.nvdb`` density-grid medium (medium.cpp:152-213).

    PRL: VDBMedium(filename, transform, pf, sigma_a, sigma_s
    [, blackbody_intensity, temperature_scale]).  The minimal reader in
    io/nvdb.py densifies the file's "density" FloatGrid; the blackbody
    emission grids the reference scaffolds (and leaves commented out,
    medium.cpp:233-249) are not traced.
    """

    def __init__(self, filename, transform, pf, sigma_a, sigma_s,
                 blackbody_intensity=0.0, temperature_scale=1.0):
        from pine_tpu.io.nvdb import read_nvdb_density

        density, index_aabb = read_nvdb_density(filename)
        # world placement: like get_grid_info (medium.cpp:136-150), the grid's
        # index box maps into the unit cube which `transform` places in world
        transform = np.asarray(getattr(transform, "data", transform), np.float32)
        super().__init__(density, transform, pf, sigma_a, sigma_s)
        self.blackbody_intensity = float(blackbody_intensity)
        self.temperature_scale = float(temperature_scale)
