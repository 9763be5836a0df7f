"""VGG-19 extractor: shapes, truncation, pooling modes, weight IO."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from style_transfer_tpu.models import vgg, weights


def test_layer_inventory():
    assert len(vgg.CONV_NAMES) == 16  # VGG-19: 16 conv layers + 3 fc (unused)
    assert vgg.LAYER_CHANNELS["conv1_1"] == 64
    assert vgg.LAYER_CHANNELS["conv5_4"] == 512
    assert vgg.conv_in_channels("conv1_1") == 3
    assert vgg.conv_in_channels("conv3_1") == 128
    assert vgg.conv_in_channels("conv5_2") == 512


def test_feature_shapes(tiny_params):
    params, _, _ = tiny_params
    x = jnp.zeros((1, 64, 48, 3))
    feats = vgg.extract_features(
        params, x, ["conv1_1", "conv2_1", "conv3_1", "conv4_2", "conv5_1", "pool5"]
    )
    assert feats["conv1_1"].shape == (1, 64, 48, 64)
    assert feats["conv2_1"].shape == (1, 32, 24, 128)
    assert feats["conv3_1"].shape == (1, 16, 12, 256)
    assert feats["conv4_2"].shape == (1, 8, 6, 512)
    assert feats["conv5_1"].shape == (1, 4, 3, 512)
    assert feats["pool5"].shape == (1, 2, 2, 512)


def test_forward_truncates_at_deepest_layer(tiny_params):
    """Requesting only shallow layers must not touch deep conv weights."""
    params, _, _ = tiny_params
    # poison the deep weights with NaN; a truncated forward never reads them
    poisoned = dict(params)
    poisoned["conv3_1"] = {
        "kernel": params["conv3_1"]["kernel"] * jnp.nan,
        "bias": params["conv3_1"]["bias"],
    }
    x = jnp.ones((1, 16, 16, 3))
    feats = vgg.extract_features(poisoned, x, ["conv1_1", "conv2_2"])
    for v in feats.values():
        assert np.isfinite(np.asarray(v)).all()


def test_relu_applied(tiny_params):
    params, _, _ = tiny_params
    x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 16, 3), jnp.float32)
    feats = vgg.extract_features(params, x, ["conv1_1"])
    assert float(np.asarray(feats["conv1_1"]).min()) >= 0.0


def test_pooling_modes_differ(tiny_params):
    params, _, _ = tiny_params
    x = jnp.asarray(np.random.RandomState(2).rand(1, 16, 16, 3), jnp.float32)
    favg = vgg.extract_features(params, x, ["conv2_1"], pooling="average")
    fmax = vgg.extract_features(params, x, ["conv2_1"], pooling="max")
    assert not np.allclose(np.asarray(favg["conv2_1"]), np.asarray(fmax["conv2_1"]))
    # max pool of nonneg activations dominates average pool
    pavg = vgg.extract_features(params, x, ["pool1"], pooling="average")["pool1"]
    pmax = vgg.extract_features(params, x, ["pool1"], pooling="max")["pool1"]
    assert (np.asarray(pmax) >= np.asarray(pavg) - 1e-6).all()


def test_compute_dtype_bf16(tiny_params):
    params, _, _ = tiny_params
    x = jnp.ones((1, 8, 8, 3))
    feats = vgg.extract_features(params, x, ["conv1_2"], compute_dtype=jnp.bfloat16)
    assert feats["conv1_2"].dtype == jnp.bfloat16


def test_deepest_layer():
    assert vgg.deepest_layer(["conv1_1", "conv4_2", "conv3_1"]) == "conv4_2"
    assert vgg.deepest_layer(["pool3", "conv3_4"]) == "pool3"
    with pytest.raises(ValueError):
        vgg.deepest_layer(["conv9_9"])


def test_weights_npz_roundtrip(tmp_path, tiny_params):
    params, mean, std = tiny_params
    path = str(tmp_path / "vgg.npz")
    weights.save_npz(path, params, mean, std)
    loaded, lmean, lstd = weights.load_npz(path)
    np.testing.assert_allclose(lmean, mean)
    np.testing.assert_allclose(lstd, std)
    for name in vgg.CONV_NAMES:
        np.testing.assert_array_equal(
            np.asarray(loaded[name]["kernel"]), np.asarray(params[name]["kernel"])
        )


def test_weights_npz_bgr_flip(tmp_path, tiny_params):
    """meta.bgr=1 swaps conv1_1 input channels so the runtime stays RGB."""
    params, mean, std = tiny_params
    path = str(tmp_path / "vgg_bgr.npz")
    weights.save_npz(path, params, mean, std, bgr=True)
    loaded, _, _ = weights.load_npz(path)
    np.testing.assert_array_equal(
        np.asarray(loaded["conv1_1"]["kernel"]),
        np.asarray(params["conv1_1"]["kernel"])[:, :, ::-1, :],
    )
    # other layers untouched
    np.testing.assert_array_equal(
        np.asarray(loaded["conv2_1"]["kernel"]), np.asarray(params["conv2_1"]["kernel"])
    )


def test_weights_npz_shape_validation(tmp_path, tiny_params):
    params, mean, std = tiny_params
    bad = {k: dict(v) for k, v in params.items()}
    bad["conv1_1"] = {"kernel": jnp.zeros((3, 3, 3, 32)), "bias": jnp.zeros((32,))}
    path = str(tmp_path / "bad.npz")
    weights.save_npz(path, bad, mean, std)
    with pytest.raises(ValueError, match="conv1_1.kernel"):
        weights.load_npz(path)


def test_random_fixture_deterministic():
    p1, _, _ = weights.random_fixture(0)
    p2, _, _ = weights.random_fixture(0)
    np.testing.assert_array_equal(
        np.asarray(p1["conv1_1"]["kernel"]), np.asarray(p2["conv1_1"]["kernel"])
    )


def test_vgg16_family(tiny_params):
    """VGG-16: 13 convs, same losses/pipeline, arch inferred from params."""
    import jax

    from style_transfer_tpu.models.weights import random_fixture

    assert len(vgg.conv_names("vgg16")) == 13
    assert "conv3_4" not in vgg.conv_names("vgg16")
    params16, mean, std = random_fixture(0, arch="vgg16")
    assert vgg.infer_arch(params16) == "vgg16"
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    feats = vgg.extract_features(
        params16, x, ("conv1_1", "conv3_3", "conv5_1"), arch="vgg16"
    )
    assert feats["conv3_3"].shape == (1, 8, 8, 256)
    assert feats["conv5_1"].shape == (1, 2, 2, 512)
    with pytest.raises(ValueError, match="conv3_4"):
        vgg.extract_features(params16, x, ("conv3_4",), arch="vgg16")


def test_infer_arch_rejects_unknown():
    with pytest.raises(ValueError, match="no supported arch"):
        vgg.infer_arch({"convX": {}})


def test_start_conv_resumes_mid_block(tiny_params):
    """start_conv hands over a mid-block activation: running conv4_1+conv4_2
    outside and resuming with start_block=4, start_conv=2 must reproduce the
    full forward's deeper activations."""
    import jax
    import jax.numpy as jnp

    from style_transfer_tpu.models import vgg as V

    params, mean, std = tiny_params
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3).astype(np.float32))
    full = V.extract_features(params, x, ("conv4_2", "conv5_1"), shard_divisor=None)
    # reproduce conv4_2 by hand from pool3
    upto = V.extract_features(params, x, ("pool3",), shard_divisor=None)
    y = upto["pool3"]
    for name in ("conv4_1", "conv4_2"):
        p = params[name]
        y = jax.nn.relu(V._conv(y, p["kernel"], p["bias"]))
    np.testing.assert_allclose(np.asarray(y), np.asarray(full["conv4_2"]), atol=1e-5)
    rest = V.extract_features(
        params, y, ("conv5_1",), shard_divisor=None, start_block=4, start_conv=2
    )
    np.testing.assert_allclose(
        np.asarray(rest["conv5_1"]), np.asarray(full["conv5_1"]), atol=1e-5
    )
