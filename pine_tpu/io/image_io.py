"""Image file I/O (parity: core/fileio.cpp save_image/load_image via stb).

Pillow replaces stb_image; it is I/O-only, never on the device compute path.
"""
from __future__ import annotations

import os

import numpy as np


def save_image(path, rgb, invert_y=True, encode_srgb=True):
    """Write (H,W,3) float [0,1] (or uint8) image to PNG/JPG.

    Matches reference behavior: Array2d<vec3u8>::from applies ^(1/2.2) encode
    (array.h:37-44) and save_image flips Y (fileio.cpp).
    """
    from PIL import Image

    rgb = np.asarray(rgb)
    if rgb.dtype != np.uint8:
        rgb = np.clip(rgb, 0.0, 1.0)
        if encode_srgb:
            rgb = rgb ** (1.0 / 2.2)
        rgb = (rgb * 255.0 + 0.5).astype(np.uint8)
    if invert_y:
        rgb = rgb[::-1]
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    Image.fromarray(rgb).save(path)


def load_image(path, decode_srgb=True):
    """Read an image to (H,W,3) float32. 8-bit images get 2.2 gamma decode,
    matching the reference's sRGB handling of LDR textures."""
    from PIL import Image

    img = Image.open(path)
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[-1] == 4:
        arr = arr[..., :3]
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
        if decode_srgb:
            arr = arr**2.2
    else:
        arr = arr.astype(np.float32)
    return arr
