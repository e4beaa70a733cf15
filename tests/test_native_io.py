"""Native codec tests (rife_tpu/native/rife_io.cpp via ctypes).

The native library replaces the reference's vendored stb_image /
stb_image_write / libwebp wrappers (/root/reference/src/main.cpp:123-229):
PNG + JPEG-q100 + WebP-lossless encode, magic-probed decode, GIL-free.
Skipped cleanly when the toolchain or codec headers are absent
(rife_tpu/io/image.py falls back to PIL in that case — covered by the
runner/CLI tests either way).
"""

import numpy as np
import pytest

from rife_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native codec toolchain unavailable"
)

RNG = np.random.default_rng(5)


@pytest.fixture
def rgb():
    return RNG.integers(0, 256, (21, 33, 3)).astype(np.uint8)


@pytest.mark.parametrize("ext", ["png", "webp"])
def test_native_lossless_roundtrip(tmp_path, rgb, ext):
    """PNG and WebP are lossless in the reference's settings (webp lossless
    encode, webp_image.h:63-78) — decode(encode(x)) must be exact."""
    p = tmp_path / f"x.{ext}"
    native.encode_image(p, rgb)
    back = native.decode_image(p)
    np.testing.assert_array_equal(back, rgb)


def test_native_jpeg_q100_close(tmp_path):
    # JPEG is lossy even at q100 — use smooth image-like content, where the
    # DCT quantization error is small (random noise is pathological)
    gy, gx = np.mgrid[0:32, 0:48]
    smooth = np.stack(
        [(gy * 3) % 256, (gx * 2) % 256, ((gy + gx) * 2) % 256], -1
    ).astype(np.uint8)
    p = tmp_path / "x.jpg"
    native.encode_image(p, smooth)
    back = native.decode_image(p)
    assert back.shape == smooth.shape
    assert np.abs(back.astype(int) - smooth.astype(int)).mean() < 8


def test_native_decode_magic_probing(tmp_path, rgb):
    """Decode dispatches on container magic, not extension (the reference
    probes webp first regardless of name, main.cpp:156-170)."""
    p = tmp_path / "lying_extension.png"
    native.encode_image(tmp_path / "real.webp", rgb)
    (tmp_path / "lying_extension.png").write_bytes(
        (tmp_path / "real.webp").read_bytes()
    )
    back = native.decode_image(p)
    np.testing.assert_array_equal(back, rgb)


def test_native_matches_pil(tmp_path, rgb):
    """Cross-decoder agreement: PIL must read the native PNG bit-exactly."""
    from PIL import Image

    p = tmp_path / "x.png"
    native.encode_image(p, rgb)
    via_pil = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(via_pil, rgb)


def test_image_module_uses_native(tmp_path, rgb):
    from rife_tpu.io import image

    p = tmp_path / "x.png"
    image.encode_image(p, rgb)
    np.testing.assert_array_equal(image.decode_image(p), rgb)
