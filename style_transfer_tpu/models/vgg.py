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

# Model family: convs-per-block for each supported VGG variant. Widths are
# shared (64..512). The reference family runs VGG-19; VGG-16 is the same
# construction with 3-conv deep blocks and loads from the same .npz schema.
ARCH_BLOCKS: Dict[str, tuple] = {
    "vgg19": (2, 2, 4, 4, 4),
    "vgg16": (2, 2, 3, 3, 3),
}
_WIDTHS = (64, 128, 256, 512, 512)
DEFAULT_ARCH = "vgg19"


def blocks(arch: str = DEFAULT_ARCH) -> tuple:
    """((block_index, convs_in_block, channels), ...) for an architecture."""
    try:
        nconvs = ARCH_BLOCKS[arch]
    except KeyError:
        raise ValueError(f"unknown arch {arch!r}; supported: {sorted(ARCH_BLOCKS)}")
    return tuple((b + 1, n, _WIDTHS[b]) for b, n in enumerate(nconvs))


def conv_names(arch: str = DEFAULT_ARCH) -> tuple:
    return tuple(f"conv{b}_{i}" for b, n, _ in blocks(arch) for i in range(1, n + 1))


def layer_names(arch: str = DEFAULT_ARCH) -> tuple:
    """All capturable activation names, in forward order."""
    return tuple(
        name
        for b, n, _ in blocks(arch)
        for name in [f"conv{b}_{i}" for i in range(1, n + 1)] + [f"pool{b}"]
    )


def layer_channels(arch: str = DEFAULT_ARCH) -> Dict[str, int]:
    """Output channel count of every capturable layer."""
    out: Dict[str, int] = {}
    for b, n, c in blocks(arch):
        for i in range(1, n + 1):
            out[f"conv{b}_{i}"] = c
        out[f"pool{b}"] = c
    return out


# VGG-19 module-level constants (the default family, used by most callers).
CONV_NAMES: tuple = conv_names()
POOL_NAMES: tuple = tuple(f"pool{b}" for b, _, _ in blocks())
LAYER_NAMES: tuple = layer_names()
LAYER_CHANNELS: Dict[str, int] = layer_channels()


def conv_in_channels(name: str, arch: str = DEFAULT_ARCH) -> int:
    """Input channel count of a conv layer."""
    names = conv_names(arch)
    channels = layer_channels(arch)
    idx = names.index(name)
    if idx == 0:
        return 3
    return channels[names[idx - 1]]


def init_params(
    rng: jax.Array, dtype=jnp.float32, arch: str = DEFAULT_ARCH
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """He-normal random VGG parameters (the test/bench fixture path).

    Real runs load converted pretrained weights via
    :mod:`style_transfer_tpu.models.weights`; random weights exercise the
    identical compute path (SURVEY.md section 4: fixture weights for tests, no
    pretrained weights available offline).
    """
    channels = layer_channels(arch)
    params = {}
    for name in conv_names(arch):
        cin, cout = conv_in_channels(name, arch), channels[name]
        rng, sub = jax.random.split(rng)
        fan_in = 3 * 3 * cin
        kernel = jax.random.normal(sub, (3, 3, cin, cout), dtype) * jnp.sqrt(2.0 / fan_in)
        params[name] = {"kernel": kernel, "bias": jnp.zeros((cout,), dtype)}
    return params


def infer_arch(params: Mapping[str, object]) -> str:
    """Which supported architecture a parameter pytree belongs to."""
    keys = set(params.keys())
    for arch in ARCH_BLOCKS:
        if keys == set(conv_names(arch)):
            return arch
    raise ValueError(
        f"parameter keys match no supported arch {sorted(ARCH_BLOCKS)}: "
        f"{sorted(keys)[:6]}..."
    )


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


def deepest_layer(layers: Iterable[str], arch: str = DEFAULT_ARCH) -> str:
    """The forward-order-latest of ``layers``."""
    names = layer_names(arch)
    order = {n: i for i, n in enumerate(names)}
    layers = list(layers)
    for name in layers:
        if name not in order:
            raise ValueError(f"unknown {arch} layer {name!r}; valid: {names}")
    return max(layers, key=order.__getitem__)


def extract_features(
    params: Mapping[str, Mapping[str, jnp.ndarray]],
    x: jnp.ndarray,
    layers: Sequence[str],
    *,
    pooling: str = "average",
    compute_dtype: Optional[jnp.dtype] = None,
    shard_divisor: Optional[int] = 8,
    arch: str = DEFAULT_ARCH,
    remat: bool = False,
    start_block: int = 1,
    start_conv: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Run a VGG variant on preprocessed NHWC input, returning requested
    activations.

    ``start_block > 1`` treats ``x`` as the pooled output of block
    ``start_block - 1`` and runs only the remaining blocks — the entry
    point for fused front-block kernels (``ops/pallas/block1.py``), which
    hand over the pool output and take responsibility for every earlier
    activation. ``start_conv > 0`` additionally treats ``x`` as the
    post-ReLU output of that many convs *within* the start block (a fused
    kernel that ends mid-block, e.g. a conv pair covering
    conv4_1+conv4_2, hands over conv4_2's activation and the remaining
    convs of the block run here).

    Truncates the forward at the deepest requested layer. Activations are
    returned in ``compute_dtype`` (callers' losses upcast where fp32
    accumulation matters). ``shard_divisor`` makes pooling pick its
    SPMD-exact path once pooled heights stop dividing it (see
    :func:`_pool`); pass the mesh size when the H axis is sharded. The
    default of 8 is *safe by default* for meshes up to the v5e-8 slice —
    a caller who shards over a mesh without passing the kwarg still gets
    correct gradients, at a negligible cost (the exact path only engages on
    heights that aren't multiples of 2*divisor, i.e. small/odd extents).
    Pass ``None`` only for provably unsharded use to allow the fast path
    everywhere.

    ``remat=True`` checkpoints each conv *block*: between forward and
    backward only block boundaries and requested activations stay live, and
    each block's backward recomputes just that block's interior. (Blockwise
    is the right granularity — checkpointing the whole extractor makes the
    backward re-store every activation during its one recompute and
    *increases* peak memory, measured 17.9 GB vs 16.5 GB at 4K on v5e.)
    """
    if not layers:
        raise ValueError("no layers requested")
    wanted = set(layers)
    stop = deepest_layer(layers, arch)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)

    feats: Dict[str, jnp.ndarray] = {}
    for b, n, _ in blocks(arch):
        if b < start_block:
            continue
        skip = start_conv if b == start_block else 0
        names = [f"conv{b}_{i}" for i in range(skip + 1, n + 1)]
        pool_name = f"pool{b}"
        block_stop = stop if (stop in names or stop == pool_name) else None

        def block_fn(bparams, x, names=names, pool_name=pool_name, block_stop=block_stop):
            bf: Dict[str, jnp.ndarray] = {}
            for name in names:
                p = bparams[name]
                x = jax.nn.relu(_conv(x, p["kernel"], p["bias"]))
                if name in wanted:
                    bf[name] = x
                if name == block_stop:
                    return x, bf
            x = _pool(x, pooling, shard_divisor)
            if pool_name in wanted:
                bf[pool_name] = x
            return x, bf

        if remat:
            block_fn = jax.checkpoint(block_fn)
        bparams = {name: params[name] for name in names}
        x, block_feats = block_fn(bparams, x)
        feats.update(block_feats)
        if block_stop is not None:
            return feats
    return feats


class VGG:
    """Thin convenience wrapper binding params + pooling + compute dtype.

    The functional core is :func:`extract_features`; this object only carries
    configuration (it contains no traced state and is safe to close over in
    jitted functions). The architecture is inferred from the parameter keys.
    """

    def __init__(self, params, *, pooling: str = "average", compute_dtype=None):
        self.params = params
        self.arch = infer_arch(params)
        self.pooling = pooling
        self.compute_dtype = compute_dtype

    def __call__(self, x: jnp.ndarray, layers: Sequence[str]) -> Dict[str, jnp.ndarray]:
        return extract_features(
            self.params,
            x,
            layers,
            pooling=self.pooling,
            compute_dtype=self.compute_dtype,
            arch=self.arch,
        )

    @classmethod
    def random(cls, seed: int = 0, arch: str = DEFAULT_ARCH, **kw) -> "VGG":
        return cls(init_params(jax.random.PRNGKey(seed), arch=arch), **kw)


#: Backwards-compatible alias (the default family).
VGG19 = VGG


# Classic Gatys selections (the defaults the reference family uses,
# SURVEY.md section 2 rows 6-7, reconstructed).
DEFAULT_CONTENT_LAYERS = ("conv4_2",)
DEFAULT_STYLE_LAYERS = ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv5_1")
