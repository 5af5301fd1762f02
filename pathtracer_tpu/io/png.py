"""PNG output and texture image loading.

Equivalent of the reference's writeImagePNG + clamp (internal/app/tracer/
pathtracer.go:32-59) and scenes.LoadImage (internal/app/scenes/scene.go:30-56).
"""
from __future__ import annotations

import numpy as np


def clamp_to_u8(img: np.ndarray) -> np.ndarray:
    """Clamp [0,1] floats to bytes like the reference (pathtracer.go:50-59):
    scale by 255 and clip."""
    return np.clip(img * 255.0, 0.0, 255.0).astype(np.uint8)


def write_png(path: str, img: np.ndarray) -> None:
    """img: [H, W, 3] float (linear, unclamped) -> 8-bit PNG."""
    from PIL import Image

    Image.fromarray(clamp_to_u8(img), mode="RGB").save(path)


def load_image(path: str) -> np.ndarray:
    """Decode PNG/JPEG to [H, W, 3] float32 in [0,1] (scene.go LoadImage
    converts to NRGBA; we normalize to float)."""
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0
    return arr
