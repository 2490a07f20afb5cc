"""Texture ingestion + mipmaps — TPU-native counterpart of
Texture.{hpp,cpp} (stb_image load, flip-vertical, force RGBA8, upload as
RGBA8Unorm; Texture.cpp:6-20).

Decode happens on host (PIL if available, else our own PNG decoder);
the device-side representation is a tuple of f32[H, W, 4] mip levels in
HBM sampled by raster/sampling.py.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _decode(path):
    path = str(path)
    try:
        from PIL import Image
        img = np.asarray(Image.open(path).convert("RGBA"), np.uint8)
        return img
    except ImportError:
        if path.lower().endswith(".png"):
            from .png import read_png
            img = read_png(path)
            if img.shape[-1] == 3:
                img = np.concatenate(
                    [img, np.full(img.shape[:2] + (1,), 255, np.uint8)],
                    axis=-1)
            elif img.shape[-1] == 1:
                img = np.repeat(img, 3, axis=-1)
                img = np.concatenate(
                    [img, np.full(img.shape[:2] + (1,), 255, np.uint8)],
                    axis=-1)
            return img
        raise ValueError(f"no decoder available for {path}")


def load_texture(path, flip_vertical=True, generate_mips=True):
    """File -> tuple of f32[H, W, 4] mips (level 0 first).

    ``flip_vertical`` mirrors stbi_set_flip_vertically_on_load(true)
    (Texture.cpp:6): image row 0 becomes the BOTTOM of texture space.
    """
    img = _decode(path)
    if flip_vertical:
        img = img[::-1]
    base = jnp.asarray(img.astype(np.float32) / 255.0)
    if not generate_mips:
        return (base,)
    return build_mipmaps(base)


def from_array(array, flip_vertical=False, generate_mips=True):
    """uint8/float [H,W,3|4] array -> mip pyramid."""
    arr = np.asarray(array)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    if arr.shape[-1] == 3:
        arr = np.concatenate(
            [arr, np.ones(arr.shape[:2] + (1,), np.float32)], axis=-1)
    if flip_vertical:
        arr = arr[::-1]
    base = jnp.asarray(arr, jnp.float32)
    if not generate_mips:
        return (base,)
    return build_mipmaps(base)


def build_mipmaps(base):
    """Box-filter mip chain down to 1x1 (power-of-two dims assumed for
    exact halving; odd dims drop the last row/col like Metal's default
    mipmap generation does for NPOT)."""
    mips = [base]
    cur = base
    while cur.shape[0] > 1 or cur.shape[1] > 1:
        h = max(1, cur.shape[0] // 2)
        w = max(1, cur.shape[1] // 2)
        trimmed = cur[: h * 2 if cur.shape[0] > 1 else 1,
                      : w * 2 if cur.shape[1] > 1 else 1]
        if cur.shape[0] > 1 and cur.shape[1] > 1:
            nxt = trimmed.reshape(h, 2, w, 2, -1).mean(axis=(1, 3))
        elif cur.shape[0] > 1:
            nxt = trimmed.reshape(h, 2, 1, -1).mean(axis=1).reshape(h, 1, -1)
        else:
            nxt = trimmed.reshape(1, w, 2, -1).mean(axis=2)
        mips.append(nxt)
        cur = nxt
    return tuple(mips)


def checkerboard(size=256, squares=8, color_a=(1.0, 1.0, 1.0),
                 color_b=(0.2, 0.6, 0.2)):
    """Procedural test texture (grass-like default, standing in for
    Metal-Tutorial/assets/mc_grass.jpeg in tests/benches)."""
    y, x = np.mgrid[0:size, 0:size]
    cell = size // squares
    mask = ((x // cell) + (y // cell)) % 2 == 0
    img = np.where(mask[..., None], np.asarray(color_a, np.float32),
                   np.asarray(color_b, np.float32))
    rgba = np.concatenate([img, np.ones((size, size, 1), np.float32)],
                          axis=-1)
    return build_mipmaps(jnp.asarray(rgba))
