"""PNG/RAW writer tests.

The .raw format must stay byte-compatible with the reference
(internal/app/raw/writer.go:11-35): big-endian int32 version major(1),
minor(0), width, height, then float32 RGB triplets.
"""
import os
import struct
import tempfile

import numpy as np

from pathtracer_tpu.io.png import clamp_to_u8, write_png
from pathtracer_tpu.io.raw import read_raw, write_raw


def test_raw_roundtrip_and_layout():
    img = np.random.default_rng(3).random((5, 7, 3)).astype(np.float32)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.raw")
        write_raw(p, img)
        with open(p, "rb") as f:
            major, minor, w, h = struct.unpack(">iiii", f.read(16))
            assert (major, minor, w, h) == (1, 0, 7, 5)
            first = struct.unpack(">f", f.read(4))[0]
            assert abs(first - float(img[0, 0, 0])) < 1e-7
        back = read_raw(p)
        np.testing.assert_allclose(back, img, rtol=1e-6)


def test_clamp_matches_reference_semantics():
    """pathtracer.go:50-59: scale by 255, clip to [0, 255]."""
    img = np.array([[[-0.5, 0.0, 0.5], [1.0, 2.0, 0.25]]])
    out = clamp_to_u8(img)
    assert out.tolist() == [[[0, 0, 127], [255, 255, 63]]]


def test_write_png(tmp_path):
    img = np.zeros((4, 6, 3), dtype=np.float32)
    img[..., 0] = 1.0
    p = tmp_path / "x.png"
    write_png(str(p), img)
    from PIL import Image

    back = np.asarray(Image.open(p))
    assert back.shape == (4, 6, 3)
    assert (back[..., 0] == 255).all() and (back[..., 1] == 0).all()


def test_canvas():
    """canvas.go:10-63 parity: indexed + mutex writes."""
    from pathtracer_tpu.io.canvas import Canvas

    c = Canvas(3, 2)
    c.write_pixel(2, 1, (0.1, 0.2, 0.3))
    c.write_pixel_mutex(0, 0, (1.0, 0.0, 0.0))
    np.testing.assert_allclose(c.pixel_at(2, 1), [0.1, 0.2, 0.3])
    np.testing.assert_allclose(c.pixel_at(0, 0), [1.0, 0.0, 0.0])
    img = np.ones((2, 3, 3), dtype=np.float32)
    c.blit(img)
    assert c.to_image().sum() == 18.0
