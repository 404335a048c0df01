"""Lights (parity: src/pine/core/light.h/.cpp, lightsampler.cpp).

Host-side light objects; the wavefront NEE pass iterates over the (small,
static) light list and masks by the per-lane uniformly-chosen light index —
the TPU form of UniformLightSampler's dynamic variant dispatch.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pine_tpu.core.sampling import uniform_sphere
from pine_tpu.core.vecmath import Pi, dot, length, safe_normalize
from pine_tpu.scene import nodes as N

FLOAT_MAX = float(np.finfo(np.float32).max)


class Light:
    is_delta = False

    def sample(self, p, u2, u1, ctx):
        """Batched: p (N,3), u2 (N,2), u1 (N,) -> dict(le,wo,distance,pdf,valid)."""
        raise NotImplementedError


class PointLight(Light):
    is_delta = True

    def __init__(self, position, color):
        self.position = np.asarray(position, np.float32)
        self.color = np.asarray(color, np.float32)

    def sample(self, p, u2, u1, ctx):
        d = jnp.asarray(self.position) - p
        dist = length(d)
        wo = d / jnp.maximum(dist[..., None], 1e-20)
        return dict(
            le=jnp.broadcast_to(jnp.asarray(self.color), p.shape),
            wo=wo,
            distance=dist,
            pdf=dist**2,
            valid=jnp.ones(dist.shape, bool),
        )


class SpotLight(Light):
    is_delta = True

    def __init__(self, position, direction, color, falloff_radian, cutoff_additional_radian=0.0):
        self.position = np.asarray(position, np.float32)
        self.direction = np.asarray(direction, np.float64)
        self.direction = (self.direction / np.linalg.norm(self.direction)).astype(np.float32)
        self.color = np.asarray(color, np.float32)
        self.falloff_cos = float(np.cos(falloff_radian))
        self.cutoff_cos = float(np.cos(falloff_radian + cutoff_additional_radian))

    def sample(self, p, u2, u1, ctx):
        d = jnp.asarray(self.position) - p
        dist = length(d)
        wo = d / jnp.maximum(dist[..., None], 1e-20)
        cos = -dot(wo, jnp.asarray(self.direction))
        denom = max(self.falloff_cos - self.cutoff_cos, 1e-9)
        scale = jnp.where(
            cos > self.falloff_cos,
            1.0,
            jnp.where(cos > self.cutoff_cos, (cos - self.cutoff_cos) / denom, 0.0),
        )
        return dict(
            le=jnp.asarray(self.color) * scale[..., None],
            wo=wo,
            distance=dist,
            pdf=dist**2,
            valid=cos > self.cutoff_cos,
        )


class DirectionalLight(Light):
    is_delta = True

    def __init__(self, direction, color):
        d = np.asarray(direction, np.float64)
        self.direction = (d / np.linalg.norm(d)).astype(np.float32)
        self.color = np.asarray(color, np.float32)

    def sample(self, p, u2, u1, ctx):
        n = p.shape[0]
        return dict(
            le=jnp.broadcast_to(jnp.asarray(self.color), (n, 3)),
            wo=jnp.broadcast_to(jnp.asarray(self.direction), (n, 3)),
            distance=jnp.full((n,), 1e10, jnp.float32),
            pdf=jnp.ones((n,), jnp.float32),
            valid=jnp.ones((n,), bool),
        )


class AreaLight(Light):
    """Emissive geometry (light.cpp:55-69); `shape` is the host Shape and
    `material` the Emissive material whose color node is evaluated at the
    sampled point."""

    is_delta = False

    def __init__(self, shape, material, global_idx):
        self.shape = shape
        self.material = material
        self.global_idx = int(global_idx)

    def _sample_shape(self, p, u2, u1):
        from pine_tpu.scene import intersect as I
        from pine_tpu.scene import shapes as S

        n = p.shape[0]
        if isinstance(self.shape, S.Mesh):
            # area-proportional triangle pick via u1, uniform point via u2
            areas = self.shape.triangle_areas()
            cdf = jnp.asarray((np.cumsum(areas) / max(areas.sum(), 1e-20)).astype(np.float32))
            tri = jnp.clip(
                jnp.searchsorted(cdf, jnp.asarray(u1, jnp.float32)), 0, len(areas) - 1
            )
            v = jnp.asarray(self.shape.vertices)
            f = jnp.asarray(self.shape.indices.astype(np.int32))[tri]
            v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
            flip = (u2[:, 0] + u2[:, 1]) > 1.0
            uu = jnp.where(flip[:, None], 1.0 - u2, u2)
            sp = v0 + uu[:, 0:1] * (v1 - v0) + uu[:, 1:2] * (v2 - v0)
            nrm = jnp.cross(v1 - v0, v2 - v0)
            nlen = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
            nrm = nrm / jnp.maximum(nlen, 1e-20)
            dvec = sp - p
            dist = jnp.linalg.norm(dvec, axis=-1)
            w = dvec / jnp.maximum(dist[:, None], 1e-20)
            total_area = float(areas.sum())
            pdf = dist**2 / jnp.maximum(
                jnp.abs(jnp.sum(w * nrm, -1)) * total_area, 1e-20
            )
            return dict(p=sp, n=nrm, w=w, distance=dist, pdf=pdf)
        params = jnp.asarray(self.shape.params())
        rows = jnp.broadcast_to(params, (n,) + params.shape)
        return I.SAMPLE[self.shape.type_id](rows, p, u2)

    def sample(self, p, u2, u1, ctx):
        n = p.shape[0]
        ss = self._sample_shape(p, u2, u1)
        ectx = dict(p=ss["p"], n=ss["n"], uv=jnp.zeros((n, 2), jnp.float32))
        le = N.eval_vec3_node(self.material.color, ectx, n)
        # emissive only from the front face (material.h le: dot(wo, n) >= 0)
        front = dot(-ss["w"], ss["n"]) >= 0.0
        valid = front & (ss["pdf"] > 0.0) & jnp.any(le > 0.0, axis=-1)
        return dict(
            le=le, wo=ss["w"], distance=ss["distance"], pdf=ss["pdf"], valid=valid
        )


class EnvironmentLight(Light):
    """Base for Sky/Atmosphere/ImageSky: color(wo) + pdf(wo) for MIS."""

    def color(self, wo):
        raise NotImplementedError

    def pdf(self, wo):
        raise NotImplementedError


class Sky(EnvironmentLight):
    """Gradient sky (color.cpp sky_color; light.cpp:71-86)."""

    def __init__(self, sun_color):
        self.sun_color = np.asarray(sun_color, np.float32)

    def color(self, wo):
        t = wo[..., 1:2] / 2 + 0.7
        warm = jnp.asarray([1.0, 0.8, 0.6])
        cool = jnp.asarray([0.6, 0.8, 1.0])
        return jnp.asarray(self.sun_color) * jnp.square(warm + (cool - warm) * t)

    def pdf(self, wo):
        return jnp.full(wo.shape[:-1], 1.0 / (4 * Pi), jnp.float32)

    def sample(self, p, u2, u1, ctx):
        wo = uniform_sphere(u2)
        n = p.shape[0]
        return dict(
            le=self.color(wo),
            wo=wo,
            distance=jnp.full((n,), FLOAT_MAX, jnp.float32),
            pdf=jnp.full((n,), 1.0 / (4 * Pi), jnp.float32),
            valid=jnp.ones((n,), bool),
        )
