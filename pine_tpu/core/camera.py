"""ThinLenCamera (parity: src/pine/core/camera.cpp).

``gen_rays`` is the batched form of the reference's per-pixel ``gen_ray``:
p_film in [0,1]^2 maps to camera space as ``(p_film - 0.5) * 2 * fov2d`` with
fov2d = (fov * aspect, fov) (camera.cpp:13-33); thin-lens depth of field uses
polar disk sampling when len_radius > 0.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pine_tpu.core.sampling import sample_disk_polar
from pine_tpu.core.vecmath import look_at, safe_normalize


class ThinLenCamera:
    def __init__(self, film, from_p, to_p, fov, len_radius=0.0, focus_distance=1.0):
        self.film = film
        self.position = np.asarray(from_p, np.float32)
        self.c2w = look_at(from_p, to_p)  # (4,4), columns x,y,z,pos
        self.w2c = np.linalg.inv(self.c2w)
        self.fov = float(fov)
        self.fov2d = np.array([fov * film.aspect(), fov], np.float32)
        self.len_radius = float(len_radius)
        self.focus_distance = float(focus_distance)

    # device-side params for jit closures
    def params(self):
        return dict(
            position=jnp.asarray(self.position),
            rot=jnp.asarray(self.c2w[:3, :3]),
            fov2d=jnp.asarray(self.fov2d),
            len_radius=self.len_radius,
            focus_distance=self.focus_distance,
        )

    def gen_rays(self, p_film, u_lens):
        """p_film (...,2) in [0,1]^2, u_lens (...,2) -> (origin, direction)."""
        return gen_rays(self.params(), p_film, u_lens)


def gen_rays(cp, p_film, u_lens):
    pc = (p_film - 0.5) * 2.0 * cp["fov2d"]
    ones = jnp.ones(pc.shape[:-1] + (1,), pc.dtype)
    d_cam = jnp.concatenate([pc, ones], axis=-1)
    rot = cp["rot"]
    if cp["len_radius"] == 0.0:
        d = safe_normalize(d_cam @ rot.T)
        o = jnp.broadcast_to(cp["position"], d.shape)
        return o, d
    d_cam = safe_normalize(d_cam)
    p_focus = cp["focus_distance"] * d_cam / d_cam[..., 2:3]
    disk = cp["len_radius"] * sample_disk_polar(u_lens)
    p_len = jnp.concatenate([disk, jnp.zeros_like(disk[..., :1])], axis=-1)
    d = safe_normalize(p_focus - p_len) @ rot.T
    o = cp["position"] + p_len @ rot.T
    return o, safe_normalize(d)


def project(cam: ThinLenCamera, p):
    """World point -> film coords in [0,1]^2 (camera.cpp:34-38); host-side."""
    w2c = cam.w2c
    pc = (np.asarray(p) - cam.position) @ cam.c2w[:3, :3]
    pc = pc / pc[..., 2:3]
    return pc[..., :2] / cam.fov2d / 2.0 + 0.5
