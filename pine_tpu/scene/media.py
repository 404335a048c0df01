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

    def __init__(self, density, transform, pf, sigma_a, sigma_s,
                 flame=None, temperature=None, blackbody_intensity=0.0,
                 temperature_scale=1.0):
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
        # blackbody emission (medium.cpp:181-251 + blackbody.cpp:12-74):
        # flame grid scales intensity; temperature grid tints by Planck color.
        # Grids share the density grid's index space (VDBMedium resamples).
        self.blackbody_intensity = float(blackbody_intensity)
        self.temperature_scale = float(temperature_scale)
        self.flame = None
        self.temperature = None
        self.bb_table = None
        self.emissive = flame is not None and self.blackbody_intensity > 0.0
        # host-side content digest: scene.content_key hashes device arrays by
        # shape only, so same-shaped grids with different voxels need this to
        # key separate compiled render programs
        import hashlib

        hsh = hashlib.blake2b(digest_size=8)
        hsh.update(density.tobytes())
        for g in (flame, temperature):
            if g is not None:
                hsh.update(np.asarray(g, np.float32).tobytes())
        self.grids_digest = hsh.hexdigest()
        if self.emissive:
            flame = np.asarray(flame, np.float32)
            assert flame.shape == density.shape, (flame.shape, density.shape)
            self.flame = jnp.asarray(flame)
            if temperature is not None:
                temperature = np.asarray(temperature, np.float32)
                assert temperature.shape == density.shape
                self.temperature = jnp.asarray(temperature)
                # the color table rides as an object attribute so the capture
                # walker passes it as a jit argument (core/capture.py)
                from pine_tpu.core.blackbody import _RGBS, _N, _T_MIN, _T_MAX

                self.bb_table = jnp.asarray(_RGBS)
                self._bb_n = _N
                self._bb_tmin = float(_T_MIN)
                self._bb_tmax = float(_T_MAX)

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

    def emission_at(self, p):
        """Blackbody radiance at world p (the reference's absorption-branch
        estimator, medium.cpp:233-249): intensity * flame(p), tinted by
        blackbody(temperature_scale * 4000 * T(p)) when a temperature grid
        exists.  -> (N,3); zeros when not emissive."""
        n = p.shape[0]
        if not self.emissive:
            return jnp.zeros((n, 3), jnp.float32)
        q = self.local_of(p)
        res = jnp.asarray(np.asarray(self.res, np.float32))
        idx = jnp.clip(jnp.floor(q * res).astype(jnp.int32), 0, jnp.asarray(self.res) - 1)
        inside = jnp.all((q >= 0.0) & (q < 1.0), axis=-1)
        fl = self.flame[idx[..., 0], idx[..., 1], idx[..., 2]]
        le = (self.blackbody_intensity * jnp.where(inside, fl, 0.0))[:, None]
        le = jnp.broadcast_to(le, (n, 3))
        if self.temperature is not None:
            T = self.temperature[idx[..., 0], idx[..., 1], idx[..., 2]]
            tk = jnp.clip(
                self.temperature_scale * 4000.0 * T, self._bb_tmin, self._bb_tmax
            )
            f = (tk - self._bb_tmin) / (self._bb_tmax - self._bb_tmin) * (self._bb_n - 1)
            i0 = jnp.clip(f.astype(jnp.int32), 0, self._bb_n - 2)
            w = (f - i0)[..., None]
            rgb = self.bb_table[i0] * (1 - w) + self.bb_table[i0 + 1] * w
            le = le * rgb
        return le

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
    io/nvdb.py densifies the file's "density" FloatGrid; "flames" and
    "temperature" grids (probed like medium.cpp:181-203) drive blackbody
    emission at absorption events (the explosion renders in the reference
    gallery), resampled nearest onto the density grid's index box when
    resolutions differ.
    """

    def __init__(self, filename, transform, pf, sigma_a, sigma_s,
                 blackbody_intensity=0.0, temperature_scale=1.0):
        from pine_tpu.io.nvdb import list_nvdb_grids, read_nvdb_density

        density, index_aabb = read_nvdb_density(filename)
        names = set(list_nvdb_grids(filename))

        def aligned(name):
            if name not in names:
                return None
            g, bbox = read_nvdb_density(filename, grid_name=name)
            if g.shape == density.shape:
                return g
            # nearest-resample onto the density grid's index box
            xs = [
                np.minimum(
                    (np.arange(density.shape[i]) * g.shape[i]) // density.shape[i],
                    g.shape[i] - 1,
                )
                for i in range(3)
            ]
            return g[np.ix_(xs[0], xs[1], xs[2])]

        # world placement: like get_grid_info (medium.cpp:136-150), the grid's
        # index box maps into the unit cube which `transform` places in world
        transform = np.asarray(getattr(transform, "data", transform), np.float32)
        super().__init__(
            density, transform, pf, sigma_a, sigma_s,
            flame=aligned("flames"), temperature=aligned("temperature"),
            blackbody_intensity=blackbody_intensity,
            temperature_scale=temperature_scale,
        )
