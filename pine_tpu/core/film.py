"""Film: radiance accumulation buffer + tone mapping (parity: core/film.h/.cpp).

The reference guards scalar pixel writes with spin locks; here the film is a
dense ``(H, W, 4)`` array and integrators produce whole frames (or use
scatter-adds), so no locking exists.  ``y`` grows upward in world terms and the
PNG write flips vertically, matching ``save_image(..., invert_y=true)``
(film.cpp:12-15).
"""
from __future__ import annotations

import numpy as np

from pine_tpu.core import color as color_mod
from pine_tpu.io.image_io import save_image


class Film:
    def __init__(self, size, tone_mapper: str = "uncharted2"):
        # size is (width, height) as in PRL `Film([w, h])`.
        self.width = int(size[0])
        self.height = int(size[1])
        self.tone_mapper = tone_mapper
        self.pixels = np.zeros((self.height, self.width, 4), np.float32)

    @property
    def size(self):
        return (self.width, self.height)

    def aspect(self):
        return self.width / self.height

    def clear(self):
        self.pixels[:] = 0.0

    def set_rgb(self, rgb):
        """Store a full (H,W,3) radiance frame with alpha=1."""
        rgb = np.asarray(rgb, np.float32)
        assert rgb.shape == (self.height, self.width, 3), rgb.shape
        self.pixels[..., :3] = rgb
        self.pixels[..., 3] = 1.0

    def add_sample(self, p, rgb, weight=1.0):
        """Running-mean accumulation (film.cpp add_sample); p=(x,y)."""
        x, y = int(p[0]), int(p[1])
        alpha = self.pixels[y, x, 3] + weight
        self.pixels[y, x, :3] = (
            self.pixels[y, x, :3] * self.pixels[y, x, 3] + np.asarray(rgb) * weight
        ) / alpha
        self.pixels[y, x, 3] = alpha

    def add_radiance_splat(self, coords, rgb):
        """Batched MLT-style splat: coords (N,2) float pixel positions."""
        xs = np.clip(coords[:, 0].astype(np.int64), 0, self.width - 1)
        ys = np.clip(coords[:, 1].astype(np.int64), 0, self.height - 1)
        np.add.at(self.pixels[..., :3], (ys, xs), np.asarray(rgb, np.float32))

    def scale(self, factor):
        self.pixels *= factor

    def finalized(self, scale=1.0):
        """Return tone-mapped (H,W,3) in [0,1] (film.cpp finalize)."""
        import jax.numpy as jnp

        rgb = jnp.asarray(self.pixels[..., :3] * scale)
        mapped = color_mod.TONE_MAPPERS[self.tone_mapper](rgb)
        return np.asarray(mapped)

    def save(self, path, scale=1.0):
        save_image(path, self.finalized(scale), invert_y=True, encode_srgb=True)
