"""From-scratch VGG-19 feature extractor, TPU-first.

The reference runs VGG-19 through pycaffe (``caffe.Net`` over a deploy
prototxt + caffemodel; SURVEY.md section 2 row 8, reconstructed). This is a
clean-room functional JAX implementation:

- NHWC layout with HWIO kernels — channels ride the 128-wide lane dimension,
  convs lower straight onto the MXU;
- parameters are a plain pytree ``{layer: {"kernel", "bias"}}`` so the whole
  extractor is a pure function (jit/grad/shard_map compose freely);
- configurable compute dtype (bfloat16 on TPU by default at call sites;
  parameters stay float32) and pooling mode (`average` matches the Gatys
  recommendation the reference family uses; `max` matches stock VGG);
- the forward stops at the deepest requested layer — the multi-scale loop at
  small scales never pays for conv5_x if its losses end at conv4_2.

Layer names follow the classic Caffe naming: ``conv1_1 .. conv5_4`` (returned
activations are post-ReLU, which is what Gram/content losses consume) and
``pool1 .. pool5``.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Iterable, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp

# (block, convs-in-block, channels): VGG-19 = 2,2,4,4,4 convs of 64..512.
_BLOCKS = ((1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512), (5, 4, 512))

CONV_NAMES: tuple = tuple(
    f"conv{b}_{i}" for b, n, _ in _BLOCKS for i in range(1, n + 1)
)
POOL_NAMES: tuple = tuple(f"pool{b}" for b, _, _ in _BLOCKS)
#: All capturable activation names, in forward order.
LAYER_NAMES: tuple = tuple(
    name
    for b, n, _ in _BLOCKS
    for name in [f"conv{b}_{i}" for i in range(1, n + 1)] + [f"pool{b}"]
)

#: channel count of each conv layer's output.
LAYER_CHANNELS: Dict[str, int] = {}
for _b, _n, _c in _BLOCKS:
    for _i in range(1, _n + 1):
        LAYER_CHANNELS[f"conv{_b}_{_i}"] = _c
    LAYER_CHANNELS[f"pool{_b}"] = _c


def conv_in_channels(name: str) -> int:
    """Input channel count of a conv layer."""
    idx = CONV_NAMES.index(name)
    if idx == 0:
        return 3
    prev = CONV_NAMES[idx - 1]
    # first conv of a block reads the previous block's width
    if name.endswith("_1"):
        return LAYER_CHANNELS[prev]
    return LAYER_CHANNELS[prev]


def init_params(rng: jax.Array, dtype=jnp.float32) -> Dict[str, Dict[str, jnp.ndarray]]:
    """He-normal random VGG-19 parameters (the test/bench fixture path).

    Real runs load converted pretrained weights via
    :mod:`style_transfer_tpu.models.weights`; random weights exercise the
    identical compute path (SURVEY.md section 4: fixture weights for tests, no
    pretrained weights available offline).
    """
    params = {}
    for name in CONV_NAMES:
        cin, cout = conv_in_channels(name), LAYER_CHANNELS[name]
        rng, sub = jax.random.split(rng)
        fan_in = 3 * 3 * cin
        kernel = jax.random.normal(sub, (3, 3, cin, cout), dtype) * jnp.sqrt(2.0 / fan_in)
        params[name] = {"kernel": kernel, "bias": jnp.zeros((cout,), dtype)}
    return params


def _conv(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """3x3 SAME conv, NHWC/HWIO, in the compute dtype.

    The TPU MXU accumulates bf16 products in fp32 internally; rounding only
    happens at the output. Inputs/outputs stay in one dtype deliberately — a
    ``preferred_element_type=fp32`` output would make the backward transposed
    conv mix an fp32 cotangent with bf16 kernels, which
    ``conv_general_dilated`` rejects. fp32 accumulation where it matters
    numerically (Gram/losses) lives in the loss layer instead.
    """
    y = jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(x.dtype)


def _pool(x: jnp.ndarray, mode: str, shard_divisor: Optional[int] = None) -> jnp.ndarray:
    """2x2 stride-2 pooling (SAME edge semantics), TPU- and SPMD-aware.

    Two mathematically identical implementations, chosen per call:

    - **reshape-and-reduce** (default): reverse-mode is a broadcast that
      fuses into neighbouring ops. Strided-slice gradients instead lower to
      interior-pad scatters that TPU executes ~4x slower, and max-of-slices
      gradients to select chains ~30x slower (measured at 1024x1024x64 on
      v5e), so this is the fast path.
    - **slice-and-combine**: used when the image height axis is sharded over
      ``shard_divisor`` devices and the pooled height would stop being
      divisible by it. XLA's SPMD partitioner miscompiles the *backward* of
      conv + reshape-pool chains once per-shard extents drop below one
      window (observed: gradients off by >1e2 at depth 5 on a forced
      8-device mesh, while slice pooling stays bit-exact), so tiny deep
      layers take the exact path; they contribute negligible time.

    Written without ``lax.reduce_window``, which fails reverse-mode AD
    inside ``lax.scan`` (JAX 0.9.0). Odd edges are handled by replicating
    the last row/column, which for a 2x2 window reproduces exclude-padding
    averaging exactly (duplicated values average/max to themselves).
    """
    n, h, w, c = x.shape
    if h % 2:
        x = jnp.concatenate([x, x[:, -1:]], axis=1)
        h += 1
    if w % 2:
        x = jnp.concatenate([x, x[:, :, -1:]], axis=2)
        w += 1
    reshape_safe = shard_divisor is None or (h // 2) % shard_divisor == 0
    if reshape_safe:
        x = x.reshape(n, h // 2, 2, w // 2, 2, c)
        if mode == "average":
            return jnp.mean(x, axis=(2, 4), dtype=x.dtype)
        if mode == "max":
            return jnp.max(x, axis=(2, 4))
    else:
        a = x[:, 0::2, 0::2]
        b = x[:, 1::2, 0::2]
        cc = x[:, 0::2, 1::2]
        d = x[:, 1::2, 1::2]
        if mode == "average":
            return (a + b + cc + d) * jnp.asarray(0.25, x.dtype)
        if mode == "max":
            return jnp.maximum(jnp.maximum(a, b), jnp.maximum(cc, d))
    raise ValueError(f"unknown pooling mode {mode!r}")


def deepest_layer(layers: Iterable[str]) -> str:
    """The forward-order-latest of ``layers``."""
    order = {n: i for i, n in enumerate(LAYER_NAMES)}
    layers = list(layers)
    for name in layers:
        if name not in order:
            raise ValueError(f"unknown VGG-19 layer {name!r}; valid: {LAYER_NAMES}")
    return max(layers, key=order.__getitem__)


def extract_features(
    params: Mapping[str, Mapping[str, jnp.ndarray]],
    x: jnp.ndarray,
    layers: Sequence[str],
    *,
    pooling: str = "average",
    compute_dtype: Optional[jnp.dtype] = None,
    shard_divisor: Optional[int] = None,
) -> Dict[str, jnp.ndarray]:
    """Run VGG-19 on preprocessed NHWC input, returning requested activations.

    Truncates the forward at the deepest requested layer. Activations are
    returned in ``compute_dtype`` (callers' losses upcast where fp32
    accumulation matters). Pass ``shard_divisor`` = mesh size when the H
    axis is sharded so pooling picks its SPMD-exact path for tiny extents
    (see :func:`_pool`).
    """
    if not layers:
        raise ValueError("no layers requested")
    wanted = set(layers)
    stop = deepest_layer(layers)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    feats: Dict[str, jnp.ndarray] = {}
    for b, n, _ in _BLOCKS:
        for i in range(1, n + 1):
            name = f"conv{b}_{i}"
            p = params[name]
            x = jax.nn.relu(_conv(x, p["kernel"], p["bias"]))
            if name in wanted:
                feats[name] = x
            if name == stop:
                return feats
        name = f"pool{b}"
        x = _pool(x, pooling, shard_divisor)
        if name in wanted:
            feats[name] = x
        if name == stop:
            return feats
    return feats


class VGG19:
    """Thin convenience wrapper binding params + pooling + compute dtype.

    The functional core is :func:`extract_features`; this object only carries
    configuration (it contains no traced state and is safe to close over in
    jitted functions).
    """

    def __init__(self, params, *, pooling: str = "average", compute_dtype=None):
        self.params = params
        self.pooling = pooling
        self.compute_dtype = compute_dtype

    def __call__(self, x: jnp.ndarray, layers: Sequence[str]) -> Dict[str, jnp.ndarray]:
        return extract_features(
            self.params, x, layers, pooling=self.pooling, compute_dtype=self.compute_dtype
        )

    @classmethod
    def random(cls, seed: int = 0, **kw) -> "VGG19":
        return cls(init_params(jax.random.PRNGKey(seed)), **kw)


# Classic Gatys selections (the defaults the reference family uses,
# SURVEY.md section 2 rows 6-7, reconstructed).
DEFAULT_CONTENT_LAYERS = ("conv4_2",)
DEFAULT_STYLE_LAYERS = ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1")
