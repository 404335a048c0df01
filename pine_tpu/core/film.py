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


_DEFERRED_SAVES = []  # (path, device-or-host tonemapped image, invert_y)


def flush_deferred_saves():
    """Materialize and write all queued film saves.  Called once at script
    end (CLI) — the single point where device images are read back, because
    a readback permanently degrades TPU dispatch (core/capture.py)."""
    global _DEFERRED_SAVES
    pending, _DEFERRED_SAVES = _DEFERRED_SAVES, []
    for path, img, invert_y in pending:
        save_image(path, np.asarray(img), invert_y=invert_y, encode_srgb=True)


class Film:
    # the accumulated frame is a render OUTPUT: the capture walker must not
    # bind it as a program input (its appearance after the first render would
    # shift the jit-argument slots — core/capture.py)
    _capture_skip = ("_device_rgb",)

    def __init__(self, size, tone_mapper: str = "uncharted2"):
        # size is (width, height) as in PRL `Film([w, h])`.
        self.width = int(size[0])
        self.height = int(size[1])
        self.tone_mapper = tone_mapper
        self._pixels = np.zeros((self.height, self.width, 4), np.float32)
        self._device_rgb = None  # pending un-materialized device frame

    @property
    def pixels(self):
        if self._device_rgb is not None:
            rgb = np.asarray(self._device_rgb, np.float32)  # d2h: on demand
            self._device_rgb = None
            self._pixels[..., :3] = rgb
            self._pixels[..., 3] = 1.0
        return self._pixels

    @pixels.setter
    def pixels(self, v):
        self._device_rgb = None
        self._pixels = v

    @property
    def size(self):
        return (self.width, self.height)

    def aspect(self):
        return self.width / self.height

    def clear(self):
        self._device_rgb = None
        self._pixels[:] = 0.0

    def set_rgb(self, rgb):
        """Store a full (H,W,3) radiance frame with alpha=1.

        Device arrays are kept ON DEVICE until someone reads `.pixels` or the
        deferred save queue flushes — reading back mid-script poisons TPU
        dispatch for every later frame."""
        if isinstance(rgb, np.ndarray):
            assert rgb.shape == (self.height, self.width, 3), rgb.shape
            self._device_rgb = None
            self._pixels[..., :3] = np.asarray(rgb, np.float32)
            self._pixels[..., 3] = 1.0
        else:
            assert rgb.shape == (self.height, self.width, 3), rgb.shape
            self._device_rgb = rgb

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

    def finalized_device(self, scale=1.0):
        """Tone-mapped (H,W,3) as a DEVICE array (no readback)."""
        import jax.numpy as jnp

        if self._device_rgb is not None:
            rgb = self._device_rgb * scale
        else:
            rgb = jnp.asarray(self._pixels[..., :3] * scale)
        return color_mod.TONE_MAPPERS[self.tone_mapper](rgb)

    def finalized(self, scale=1.0):
        """Return tone-mapped (H,W,3) in [0,1] (film.cpp finalize)."""
        return np.asarray(self.finalized_device(scale))

    def save(self, path, scale=1.0):
        """Queue the tone-mapped frame; written at flush_deferred_saves()
        (script end).  The snapshot is immutable, so later renders into this
        film don't disturb queued frames."""
        _DEFERRED_SAVES.append((path, self.finalized_device(scale), True))
