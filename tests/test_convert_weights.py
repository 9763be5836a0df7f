"""Weight converter tests: torch OIHW and caffe (cout,cin,kh,kw) -> HWIO npz,
verified numerically against a torch conv reference."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "scripts")

from convert_weights import _TORCH_FEATURE_IDX, convert_caffe_npz, convert_torch  # noqa: E402

from style_transfer_tpu.models import vgg, weights  # noqa: E402


def _random_torch_state_dict(seed=0):
    import torch

    r = np.random.RandomState(seed)
    sd = {}
    for name, idx in zip(vgg.CONV_NAMES, _TORCH_FEATURE_IDX["vgg19"]):
        cin, cout = vgg.conv_in_channels(name), vgg.LAYER_CHANNELS[name]
        sd[f"features.{idx}.weight"] = torch.tensor(
            r.randn(cout, cin, 3, 3).astype(np.float32) * 0.05
        )
        sd[f"features.{idx}.bias"] = torch.tensor(r.randn(cout).astype(np.float32) * 0.01)
    return sd


def test_torch_conversion_matches_torch_conv(tmp_path):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    sd = _random_torch_state_dict()
    src = str(tmp_path / "vgg.pth")
    dst = str(tmp_path / "vgg.npz")
    torch.save(sd, src)
    convert_torch(src, dst)

    params, mean, std = weights.load_npz(dst)

    # one conv layer forward: torch NCHW vs our NHWC must agree
    x = np.random.RandomState(1).randn(1, 3, 8, 8).astype(np.float32)
    w = sd["features.0.weight"]
    b = sd["features.0.bias"]
    ref = F.conv2d(torch.tensor(x), w, b, padding=1).numpy()  # NCHW

    import jax.numpy as jnp
    from style_transfer_tpu.models.vgg import _conv

    ours = _conv(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        params["conv1_1"]["kernel"],
        params["conv1_1"]["bias"],
    )
    np.testing.assert_allclose(
        np.asarray(ours), ref.transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(mean, [0.485, 0.456, 0.406], rtol=1e-6)


def test_caffe_npz_conversion(tmp_path):
    r = np.random.RandomState(2)
    flat = {}
    for name in vgg.CONV_NAMES:
        cin, cout = vgg.conv_in_channels(name), vgg.LAYER_CHANNELS[name]
        flat[f"{name}_w"] = r.randn(cout, cin, 3, 3).astype(np.float32)
        flat[f"{name}_b"] = r.randn(cout).astype(np.float32)
    src = str(tmp_path / "caffe.npz")
    dst = str(tmp_path / "vgg.npz")
    np.savez(src, **flat)
    convert_caffe_npz(src, dst)

    params, mean, std = weights.load_npz(dst)
    # loader flips conv1_1 input channels (meta.bgr): column 0 of the loaded
    # HWIO kernel equals caffe's input channel 2 (B<->R swap)
    np.testing.assert_allclose(
        np.asarray(params["conv1_1"]["kernel"])[:, :, 0, :],
        flat["conv1_1_w"].transpose(2, 3, 1, 0)[:, :, 2, :],
        rtol=1e-6,
    )
    # caffe normalization: std == 1/255, mean in RGB order
    np.testing.assert_allclose(std, [1 / 255.0] * 3, rtol=1e-6)
    np.testing.assert_allclose(mean, [123.68 / 255, 116.779 / 255, 103.939 / 255], rtol=1e-5)


def test_caffe_npz_rejects_bad_shapes(tmp_path):
    flat = {f"{n}_w": np.zeros((1, 1, 3, 3), np.float32) for n in vgg.CONV_NAMES}
    flat.update({f"{n}_b": np.zeros(1, np.float32) for n in vgg.CONV_NAMES})
    src = str(tmp_path / "bad.npz")
    np.savez(src, **flat)
    with pytest.raises(ValueError, match="unexpected caffe shape"):
        convert_caffe_npz(src, str(tmp_path / "out.npz"))


def test_torch_vgg16_conversion(tmp_path):
    import torch

    r = np.random.RandomState(1)
    sd = {}
    for name, idx in zip(vgg.conv_names("vgg16"), _TORCH_FEATURE_IDX["vgg16"]):
        cin, cout = vgg.conv_in_channels(name, "vgg16"), vgg.layer_channels("vgg16")[name]
        sd[f"features.{idx}.weight"] = torch.tensor(
            r.randn(cout, cin, 3, 3).astype(np.float32) * 0.05
        )
        sd[f"features.{idx}.bias"] = torch.tensor(r.randn(cout).astype(np.float32) * 0.01)
    pth = str(tmp_path / "vgg16.pth")
    torch.save(sd, pth)
    dst = str(tmp_path / "vgg16.npz")
    convert_torch(pth, dst, arch="vgg16")

    params, mean, std = weights.load_npz(dst)
    assert vgg.infer_arch(params) == "vgg16"
    assert set(params) == set(vgg.conv_names("vgg16"))
    w = np.asarray(params["conv3_3"]["kernel"])
    ref = sd["features.14.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(w, ref)
