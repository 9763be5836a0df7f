"""Image IO / preprocessing round-trips."""

import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.utils import imgio


def test_load_save_roundtrip(tmp_path, rng):
    arr = rng.rand(20, 30, 3).astype(np.float32)
    p = str(tmp_path / "x.png")
    imgio.save_image(arr, p)
    loaded = imgio.load_image(p)
    assert loaded.shape == (20, 30, 3)
    assert loaded.dtype == np.float32
    np.testing.assert_allclose(loaded, np.clip(arr, 0, 1), atol=1 / 255 + 1e-6)


def test_preprocess_deprocess_inverse(rng):
    img = jnp.asarray(rng.rand(1, 8, 8, 3).astype(np.float32))
    x = imgio.preprocess(img)
    back = imgio.deprocess(x)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), rtol=1e-5, atol=1e-6)


def test_preprocess_custom_mean_std():
    img = jnp.full((1, 2, 2, 3), 0.5, jnp.float32)
    x = imgio.preprocess(img, mean=(0.5, 0.5, 0.5), std=(0.25, 0.5, 1.0))
    np.testing.assert_allclose(np.asarray(x), 0.0, atol=1e-7)


def test_to_nhwc():
    assert imgio.to_nhwc(np.zeros((4, 5, 3))).shape == (1, 4, 5, 3)
    assert imgio.to_nhwc(np.zeros((1, 4, 5, 3))).shape == (1, 4, 5, 3)
    with pytest.raises(ValueError):
        imgio.to_nhwc(np.zeros((4, 5, 2)))


def test_resize_device(rng):
    img = jnp.asarray(rng.rand(1, 16, 24, 3).astype(np.float32))
    out = imgio.resize_image(img, (32, 48))
    assert out.shape == (1, 32, 48, 3)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    # constant image stays constant under lanczos
    const = jnp.full((1, 10, 10, 3), 0.25, jnp.float32)
    out = imgio.resize_image(const, (23, 17))
    np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-5)


def test_scale_size():
    assert imgio.scale_size((100, 50), 200) == (200, 100)
    assert imgio.scale_size((50, 100), 200) == (100, 200)
    assert imgio.scale_size((100, 100), 64) == (64, 64)


def test_to_uint8_and_encode(rng):
    arr = rng.rand(8, 8, 3).astype(np.float32)
    u8 = imgio.to_uint8(arr[None])
    assert u8.shape == (8, 8, 3) and u8.dtype == np.uint8
    data = imgio.encode_image(arr, "JPEG")
    assert data[:2] == b"\xff\xd8"  # JPEG SOI
    data = imgio.encode_image(arr, "PNG")
    assert data[:4] == b"\x89PNG"


def test_load_image_uint8_path(tmp_path):
    import numpy as np
    from style_transfer_tpu.utils import imgio

    arr = (np.random.RandomState(0).rand(20, 24, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.png")
    imgio.save_image(arr.astype(np.float32) / 255.0, p)
    u8 = imgio.load_image(p, dtype=np.uint8)
    f32 = imgio.load_image(p)
    assert u8.dtype == np.uint8 and f32.dtype == np.float32
    np.testing.assert_allclose(u8.astype(np.float32) / 255.0, f32, atol=1e-7)
    # to_nhwc converts uint8 on device to the same floats
    np.testing.assert_allclose(
        np.asarray(imgio.to_nhwc(u8))[0], f32, atol=1e-7
    )
