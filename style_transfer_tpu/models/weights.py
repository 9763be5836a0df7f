"""VGG-19 weight loading: local-file based, with test fixtures.

The reference ships a deploy prototxt and fetches the caffemodel with a
download script (SURVEY.md section 2 row 14, reconstructed). This environment
has no network and no pretrained weights on disk, so the runtime reads weights
from a local ``.npz`` and a converter script
(``scripts/convert_weights.py``) produces that ``.npz`` offline from a
torch/caffe export. Tests and benches use the random fixture
(:func:`style_transfer_tpu.models.vgg.init_params`) — same compute path,
different values.

``.npz`` schema
---------------
- ``<layer>.kernel``: (3, 3, cin, cout) float32, HWIO (converters transpose
  from torch OIHW / caffe (cout, cin, kh, kw));
- ``<layer>.bias``: (cout,) float32;
- ``meta.mean`` / ``meta.std``: (3,) float32, the input normalization the
  weights were trained with (RGB, [0,1]-range pipeline);
- ``meta.bgr``: scalar {0,1} — set by the caffe converter, makes the loader
  swap kernel input channels of conv1_1 so the runtime stays RGB end to end.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from style_transfer_tpu.models import vgg
from style_transfer_tpu.utils.imgio import IMAGENET_MEAN, IMAGENET_STD

Params = Dict[str, Dict[str, jnp.ndarray]]


def save_npz(
    path: str,
    params: Params,
    mean=IMAGENET_MEAN,
    std=IMAGENET_STD,
    bgr: bool = False,
    arch: str = None,
) -> None:
    flat = {}
    for name, p in params.items():
        flat[f"{name}.kernel"] = np.asarray(p["kernel"], np.float32)
        flat[f"{name}.bias"] = np.asarray(p["bias"], np.float32)
    flat["meta.mean"] = np.asarray(mean, np.float32)
    flat["meta.std"] = np.asarray(std, np.float32)
    flat["meta.bgr"] = np.asarray(1 if bgr else 0, np.int32)
    flat["meta.arch"] = np.asarray(arch or vgg.infer_arch(params))
    np.savez(path, **flat)


def load_npz(path: str) -> Tuple[Params, np.ndarray, np.ndarray]:
    """Load (params, mean, std). Validates shapes against the declared arch
    (``meta.arch``, defaulting to VGG-19 for older files)."""
    with np.load(path) as z:
        mean = z.get("meta.mean", np.asarray(IMAGENET_MEAN, np.float32))
        std = z.get("meta.std", np.asarray(IMAGENET_STD, np.float32))
        bgr = int(z.get("meta.bgr", 0))
        arch = str(z.get("meta.arch", vgg.DEFAULT_ARCH))
        channels = vgg.layer_channels(arch)
        params: Params = {}
        for name in vgg.conv_names(arch):
            kernel = np.asarray(z[f"{name}.kernel"], np.float32)
            bias = np.asarray(z[f"{name}.bias"], np.float32)
            cin, cout = vgg.conv_in_channels(name, arch), channels[name]
            if kernel.shape != (3, 3, cin, cout):
                raise ValueError(
                    f"{name}.kernel: expected (3, 3, {cin}, {cout}), got {kernel.shape}"
                )
            if bias.shape != (cout,):
                raise ValueError(f"{name}.bias: expected ({cout},), got {bias.shape}")
            if bgr and name == "conv1_1":
                kernel = kernel[:, :, ::-1, :]  # caffe weights read BGR input
            params[name] = {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)}
    return params, mean, std


def random_fixture(
    seed: int = 0, arch: str = vgg.DEFAULT_ARCH
) -> Tuple[Params, np.ndarray, np.ndarray]:
    """Deterministic random VGG weights + default normalization (tests/bench)."""
    import jax

    params = vgg.init_params(jax.random.PRNGKey(seed), arch=arch)
    return params, np.asarray(IMAGENET_MEAN, np.float32), np.asarray(IMAGENET_STD, np.float32)
