"""Image I/O and on-device preprocessing.

The reference loads/saves with PIL and keeps a NumPy float pipeline on the
host, preprocessing into Caffe's input space (BGR, mean-subtracted, 0-255)
(SURVEY.md section 2 row 2, reconstructed). Here PIL is used only at the very
edges (decode/encode); everything in between is a device-resident float32
RGB-in-[0,1] pipeline, and scale changes happen with an on-device resize so
the multi-scale scheduler never round-trips through the host.

Arrays are NHWC (TPU-native layout: channels last rides the 128-lane minor
dimension).
"""

from __future__ import annotations

import io
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

# Normalization constants live with the *weights* (different weight conversions
# expect different input spaces); these are the defaults used by the random
# fixture and by torch-converted VGG weights.
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def load_image(path: str, dtype=np.float32) -> np.ndarray:
    """Decode an image file to RGB, shape (H, W, 3).

    ``dtype=np.float32`` (default) returns values in [0, 1]. Pass
    ``np.uint8`` to defer the [0, 1] conversion: :func:`to_nhwc` converts
    uint8 on device, so the host->device transfer moves 4x fewer bytes —
    worth it when the device link is thin (e.g. a tunneled TPU).
    """
    with Image.open(path) as im:
        im = im.convert("RGB")
        arr = np.asarray(im, dtype=np.uint8)
    if dtype == np.uint8:
        return arr
    return np.asarray(arr, dtype) / dtype(255.0)


def save_image(arr, path: str) -> None:
    """Encode a float RGB array in [0, 1] (H, W, 3) or (1, H, W, 3) to a file."""
    Image.fromarray(to_uint8(arr)).save(path)


def encode_image(arr, format: str = "JPEG", quality: int = 85) -> bytes:
    """Encode to an in-memory JPEG/PNG (used by the web monitor and snapshots)."""
    buf = io.BytesIO()
    im = Image.fromarray(to_uint8(arr))
    if format.upper() == "JPEG":
        im.save(buf, format="JPEG", quality=quality)
    else:
        im.save(buf, format=format.upper())
    return buf.getvalue()


def to_uint8(arr) -> np.ndarray:
    """Clip a float image in [0, 1] to uint8. Accepts (H, W, 3) or (1, H, W, 3);
    already-uint8 arrays (stylize(output_dtype="uint8")) pass through."""
    arr = np.asarray(jax.device_get(arr))
    if arr.ndim == 4:
        if arr.shape[0] != 1:
            raise ValueError(f"expected batch of 1, got shape {arr.shape}")
        arr = arr[0]
    if arr.dtype == np.uint8:
        return arr
    arr = np.asarray(arr, np.float32)
    return (np.clip(arr, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)


@jax.jit
def quantize_u8(image: jnp.ndarray) -> jnp.ndarray:
    """Device-side counterpart of :func:`to_uint8`: (1, H, W, 3) float ->
    (H, W, 3) uint8 on device, bit-matching the host path (clip to [0,1],
    *255, +0.5, truncate) — so the result crosses the host link at 1/4 the
    bytes before an 8-bit file save."""
    x = jnp.clip(image[0].astype(jnp.float32), 0.0, 1.0) * 255.0 + 0.5
    return x.astype(jnp.uint8)


def to_nhwc(arr) -> jnp.ndarray:
    """(H, W, 3) -> (1, H, W, 3) float32 device array.

    uint8 input is transferred as-is and scaled to [0, 1] *on device* (4x
    less host->device traffic); float input is assumed to already be [0, 1].
    """
    is_uint8 = np.dtype(getattr(arr, "dtype", np.float32)) == np.uint8
    arr = jnp.asarray(arr)
    if arr.ndim == 3:
        arr = arr[None]
    if arr.ndim != 4 or arr.shape[-1] != 3:
        raise ValueError(f"expected (H, W, 3) or (N, H, W, 3), got {arr.shape}")
    if is_uint8:
        return _u8_to_unit(arr)
    return arr.astype(jnp.float32)


@jax.jit
def _u8_to_unit(arr: jnp.ndarray) -> jnp.ndarray:
    return arr.astype(jnp.float32) / 255.0


def preprocess(image: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    """RGB [0,1] NHWC -> network input space. Runs on device, fuses into the net."""
    mean = jnp.asarray(mean, dtype=image.dtype)
    std = jnp.asarray(std, dtype=image.dtype)
    return (image - mean) / std


def deprocess(x: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    """Inverse of :func:`preprocess`."""
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return x * std + mean


def resize_image(image: jnp.ndarray, size: Tuple[int, int], method: str = "lanczos3") -> jnp.ndarray:
    """On-device high-quality resize of an NHWC image to (H, W) = ``size``.

    Replaces the reference's host-side PIL/Lanczos resize between scales
    (SURVEY.md section 2 row 2): the multi-scale pyramid stays HBM-resident.
    """
    n, _, _, c = image.shape
    h, w = size
    out = jax.image.resize(image, (n, h, w, c), method=method)
    # lanczos3 overshoots near edges; stylization images live in [0, 1].
    return jnp.clip(out, 0.0, 1.0)


def scale_size(size: Tuple[int, int], long_side: int) -> Tuple[int, int]:
    """Proportionally scale (H, W) so the longer side equals ``long_side``."""
    h, w = size
    if h >= w:
        return long_side, max(1, round(w * long_side / h))
    return max(1, round(h * long_side / w)), long_side
