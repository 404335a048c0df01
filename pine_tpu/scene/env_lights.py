"""Environment lights: Atmosphere & ImageSky with 2-D importance sampling
(parity: src/pine/core/light.cpp:94-171, distribution.h).

The reference importance-samples through a binary-split spatial tree over a
density image; here a classic marginal/conditional CDF inversion over the same
density gives the identical target distribution with O(log) searchsorted on
device — fully vectorized across the NEE wavefront.

Directions map through ``uniform_sphere(sc)`` with y/z swapped, exactly like
the reference (light.cpp:100-115), so pdfs convert with the same 1/(4*Pi).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pine_tpu.core.sampling import uniform_sphere
from pine_tpu.core.vecmath import Pi, dot
from pine_tpu.scene.lights import EnvironmentLight, FLOAT_MAX


class Distribution2D:
    """Sampleable discrete 2-D density (distribution.h:40-62 equivalent)."""

    def __init__(self, density):
        d = np.maximum(np.asarray(density, np.float64), 0.0)
        h, w = d.shape
        self.h, self.w = h, w
        total = d.sum()
        if total <= 0:
            d = np.ones_like(d)
            total = d.sum()
        self.pdf_img = jnp.asarray((d / total * (h * w)).astype(np.float32))  # unit-square density
        marg = d.sum(axis=1)
        self.cdf_marg = jnp.asarray((np.cumsum(marg) / total).astype(np.float32))
        cond = np.cumsum(d, axis=1)
        cond = cond / np.maximum(cond[:, -1:], 1e-30)
        self.cdf_cond = jnp.asarray(cond.astype(np.float32))

    def sample(self, u2):
        """u2 (N,2) -> (sc (N,2) in [0,1]^2, pdf (N,) over unit square)."""
        row = jnp.searchsorted(self.cdf_marg, u2[..., 0], side="right")
        row = jnp.clip(row, 0, self.h - 1)
        cdf_rows = self.cdf_cond[row]
        col = jnp.clip(
            jnp.sum((cdf_rows < u2[..., 1:2]).astype(jnp.int32), axis=-1), 0, self.w - 1
        )
        sc = jnp.stack(
            [(col.astype(jnp.float32) + 0.5) / self.w, (row.astype(jnp.float32) + 0.5) / self.h],
            axis=-1,
        )
        pdf = self.pdf_img[row, col]
        return sc, pdf

    def pdf(self, sc):
        """sc (N,2) in [0,1]^2 -> density over unit square."""
        col = jnp.clip((sc[..., 0] * self.w).astype(jnp.int32), 0, self.w - 1)
        row = jnp.clip((sc[..., 1] * self.h).astype(jnp.int32), 0, self.h - 1)
        return self.pdf_img[row, col]


def _swap_yz(v):
    return jnp.stack([v[..., 0], v[..., 2], v[..., 1]], axis=-1)


def _sc_of_dir(wo):
    """Inverse of wo = swap_yz(uniform_sphere(sc))."""
    d = _swap_yz(wo)
    from pine_tpu.core.vecmath import phi2pi

    phi = phi2pi(d[..., 0], d[..., 1])
    return jnp.stack([phi / (2 * Pi), (1.0 - d[..., 2]) / 2.0], axis=-1)


def atmosphere_color(direction, sun_dir, n_samples=8, simulate_real_sun=False, xp=jnp):
    """Single-scatter Rayleigh+Mie sky (color.cpp:41-104), batched.

    ``xp`` picks the array backend: jnp at render time; np for the
    one-time importance-map build (host-side: no device readback).

    Deviation: the reference's sun-ward march uses squared distance where it
    means distance (color.cpp:76); we use the correct height term.
    """
    beta_r = xp.asarray([3.8e-6, 13.5e-6, 33.1e-6])
    beta_m = xp.asarray([21e-6, 21e-6, 21e-6])
    atmosphere_radius, planet_radius = 6420e3, 6360e3
    Hr, Hm = 1.0 / 7995.0, 1.0 / 1200.0
    n_light = n_samples // 2
    sun = xp.asarray(sun_dir, xp.float32)
    sun = sun / xp.linalg.norm(sun)

    mu = xp.sum(direction * sun, -1)
    phase_r = 3.0 / (16.0 * Pi) * (1.0 + mu * mu)
    g = 0.76
    phase_m = (
        3.0
        / (8.0 * Pi)
        * (1.0 - g * g)
        * (1.0 + mu * mu)
        / ((2.0 + g * g) * xp.power(xp.maximum(1.0 + g * g - 2.0 * g * mu, 1e-6), 1.5))
    )

    o = xp.asarray([0.0, planet_radius, 0.0])
    b = xp.sum(xp.broadcast_to(o, direction.shape) * direction, -1)
    c = float(np.dot([0, planet_radius, 0], [0, planet_radius, 0])) - atmosphere_radius**2
    tmax = -b + xp.sqrt(xp.maximum(b * b - c, 0.0))
    seg = tmax / n_samples

    sum_r = xp.zeros(direction.shape[:-1] + (3,))
    sum_m = xp.zeros(direction.shape[:-1] + (3,))
    od_r = xp.zeros(direction.shape[:-1])
    od_m = xp.zeros(direction.shape[:-1])
    dead = xp.zeros(direction.shape[:-1], bool)
    t_cur = xp.zeros(direction.shape[:-1])

    for i in range(n_samples):
        sp = o + (t_cur + seg * 0.5)[..., None] * direction
        height = xp.linalg.norm(sp, axis=-1) - planet_radius
        dead = dead | (height <= 0)
        # clamp exponents: below-ground samples (masked out by `dead`)
        # must not manufacture inf/NaN (overflow warnings on host; the
        # TPU backend drops into a permanent slow mode on non-finites)
        hr = xp.exp(xp.clip(-height * Hr, -60.0, 60.0)) * seg
        hm = xp.exp(xp.clip(-height * Hm, -60.0, 60.0)) * seg
        od_r = od_r + xp.where(dead, 0.0, hr)
        od_m = od_m + xp.where(dead, 0.0, hm)

        bl = xp.sum(sp * sun, -1)
        cl = xp.sum(sp * sp, -1) - atmosphere_radius**2
        lt_max = -bl + xp.sqrt(xp.maximum(bl * bl - cl, 0.0))
        seg_l = lt_max / max(n_light, 1)
        od_rl = xp.zeros_like(od_r)
        od_ml = xp.zeros_like(od_m)
        light_dead = xp.zeros_like(dead)
        lt = seg_l * 0.5
        for _ in range(n_light):
            lp = sp + lt[..., None] * sun
            hl = xp.linalg.norm(lp, axis=-1) - planet_radius
            light_dead = light_dead | (hl < 0)
            od_rl = od_rl + xp.where(
                light_dead, 0.0, xp.exp(xp.clip(-hl * Hr, -60.0, 60.0)) * seg_l
            )
            od_ml = od_ml + xp.where(
                light_dead, 0.0, xp.exp(xp.clip(-hl * Hm, -60.0, 60.0)) * seg_l
            )
            lt = lt + seg_l
        tau = beta_r * (od_r + od_rl)[..., None] + beta_m * (od_m + od_ml)[..., None]
        tr = xp.exp(-tau)
        ok = (~dead & ~light_dead)[..., None]
        sum_r = sum_r + xp.where(ok, tr * hr[..., None], 0.0)
        sum_m = sum_m + xp.where(ok, tr * hm[..., None], 0.0)
        t_cur = t_cur + seg

    color = sum_r * beta_r * phase_r[..., None] + sum_m * beta_m * phase_m[..., None]
    mult = xp.full(3, 5.0)
    if simulate_real_sun:
        sun_disk = (mu > 0.998)[..., None]
        color = color * xp.where(sun_disk, mult * 1000.0 * xp.asarray([1.0, 0.9, 0.8]), mult)
    else:
        color = color * mult
    return color


class Atmosphere(EnvironmentLight):
    """Procedural atmosphere with importance-sampled radiance map
    (light.cpp:94-125)."""

    is_delta = False

    def __init__(self, sun_direction, sun_color, image_size=(1024, 1024)):
        # 1024^2 matches the reference default (light.h:69) — at 256^2 the
        # ~0.5 deg sun disk spans under a pixel of the importance map and
        # sun-lit scenes get visibly noisier sampling
        self.sun_direction = np.asarray(sun_direction, np.float64)
        self.sun_direction /= np.linalg.norm(self.sun_direction)
        self.sun_direction = self.sun_direction.astype(np.float32)
        self.sun_color = np.asarray(sun_color, np.float32)
        w, h = image_size
        ys, xs = np.meshgrid(
            (np.arange(h, dtype=np.float32) + 0.5) / h,
            (np.arange(w, dtype=np.float32) + 0.5) / w, indexing="ij",
        )
        # host-side (numpy) build: a jnp build would round-trip ~1M lanes
        # through the device and read them back, which both crawls through
        # eager per-op dispatch and poisons the TPU dispatch path
        phi = xs.reshape(-1) * (2 * np.pi)
        cos_t = 1.0 - 2.0 * ys.reshape(-1)
        sin_t = np.sqrt(np.maximum(1.0 - cos_t**2, 0.0))
        wo = np.stack(
            [sin_t * np.cos(phi), cos_t, sin_t * np.sin(phi)], axis=-1
        ).astype(np.float32)  # y/z swapped uniform_sphere (light.cpp:100-115)
        col = atmosphere_color(
            wo, self.sun_direction, 8, simulate_real_sun=True, xp=np
        )
        density = np.linalg.norm(col, axis=-1).reshape(h, w)
        self.distr = Distribution2D(density)

    def color(self, wo):
        return jnp.asarray(self.sun_color) * atmosphere_color(
            wo, jnp.asarray(self.sun_direction), 8
        )

    def pdf(self, wo):
        return self.distr.pdf(_sc_of_dir(wo)) / (4 * Pi)

    def sample(self, p, u2, u1, ctx):
        n = p.shape[0]
        sc, pdf = self.distr.sample(u2)
        wo = _swap_yz(uniform_sphere(sc))
        le = jnp.asarray(self.sun_color) * atmosphere_color(
            wo, jnp.asarray(self.sun_direction), 8, simulate_real_sun=True
        )
        return dict(
            le=le,
            wo=wo,
            distance=jnp.full((n,), FLOAT_MAX, jnp.float32),
            pdf=pdf / (4 * Pi),
            valid=pdf > 0.0,
        )


class ImageSky(EnvironmentLight):
    """Equirect-ish HDR environment (light.cpp:127-171) — the reference maps
    through uniform_sphere of the unit square, not equirect; we match it."""

    is_delta = False

    def __init__(self, image, tint=(1.0, 1.0, 1.0), elevation=0.0, rotation=0.0):
        self.image = jnp.asarray(np.asarray(image, np.float32))
        self.tint = np.asarray(tint, np.float32)
        density = np.linalg.norm(np.asarray(image, np.float32), axis=-1)
        self.distr = Distribution2D(density)
        if elevation != 0.0 or rotation != 0.0:
            from pine_tpu.core.vecmath import rotate_x, rotate_y

            m = rotate_x(elevation * Pi) @ rotate_y(rotation * 2 * Pi)
            self.l2w = m[:3, :3].astype(np.float32)
            self.w2l = np.linalg.inv(self.l2w).astype(np.float32)
        else:
            self.l2w = self.w2l = None

    def _lookup(self, sc):
        h, w = self.image.shape[:2]
        x = jnp.clip((sc[..., 0] * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((sc[..., 1] * h).astype(jnp.int32), 0, h - 1)
        return jnp.asarray(self.tint) * self.image[y, x]

    def color(self, wo):
        if self.w2l is not None:
            wo = wo @ jnp.asarray(self.w2l).T
        return self._lookup(_sc_of_dir(wo))

    def pdf(self, wo):
        if self.w2l is not None:
            wo = wo @ jnp.asarray(self.w2l).T
        return self.distr.pdf(_sc_of_dir(wo)) / (4 * Pi)

    def sample(self, p, u2, u1, ctx):
        n = p.shape[0]
        sc, pdf = self.distr.sample(u2)
        wo = _swap_yz(uniform_sphere(sc))
        le = self._lookup(sc)
        if self.l2w is not None:
            wo = wo @ jnp.asarray(self.l2w).T
        return dict(
            le=le,
            wo=wo,
            distance=jnp.full((n,), FLOAT_MAX, jnp.float32),
            pdf=pdf / (4 * Pi),
            valid=pdf > 0.0,
        )
