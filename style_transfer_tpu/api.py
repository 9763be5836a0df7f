"""Stylization API: the orchestrator tying scheduler, losses, optimizer, mesh.

Equivalent of the reference's ``StyleTransfer`` class (SURVEY.md section 2
row 3, reconstructed): build the model, capture content/style targets, run
the coarse-to-fine optimize loop, emit progress. The core is pure-functional
(jitted target capture + jitted scan-of-steps with donated carries); this
module is the thin stateful wrapper around it.

Hot-loop structure per scale (SURVEY.md section 3.1, rebuilt TPU-first):

1. ``capture`` (jitted, once per scale): preprocess + VGG forward for the
   content image and each style image; blend style Grams on device.
2. ``run_chunk`` (jitted, donated): ``lax.scan`` of N optimizer steps — each
   step is VGG forward + backward, fused loss, Adam/L-BFGS update — entirely
   on device. The host sees only per-chunk loss arrays.

There is exactly one XLA compilation per (scale shape, chunk length); the
scale ladder is static (schedule.py) so compile count is known ahead of time.
"""

from __future__ import annotations

import dataclasses
import threading
import time
import warnings
from collections import OrderedDict, deque
from functools import partial
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from style_transfer_tpu.models import vgg as vgg_mod
from style_transfer_tpu.models.weights import random_fixture
from style_transfer_tpu.ops import losses as L
from style_transfer_tpu.optim import OptimizerSpec, make_step_fn
from style_transfer_tpu.parallel import mesh as mesh_mod
from style_transfer_tpu import schedule as schedule_mod
from style_transfer_tpu.schedule import build_plan, chunk_lengths
from style_transfer_tpu.utils import imgio
from style_transfer_tpu.utils.ckpt import flatten_opt_state, restore_opt_state
from style_transfer_tpu.utils.progress import Callback, ProgressEvent


@dataclasses.dataclass(frozen=True)
class StylizeConfig:
    """All stylization knobs (the CLI maps flags 1:1 onto this)."""

    size: Union[int, Tuple[int, int]] = 512  # long side, or exact (H, W)
    min_scale: int = 256
    scale_factor: float = 2.0
    iterations: Sequence[int] = (500,)
    chunk_size: int = 50

    content_layers: Sequence[str] = vgg_mod.DEFAULT_CONTENT_LAYERS
    style_layers: Sequence[str] = vgg_mod.DEFAULT_STYLE_LAYERS
    content_layer_weights: Optional[Sequence[float]] = None
    style_layer_weights: Optional[Sequence[float]] = None

    content_weight: float = 1.0
    style_weight: float = 256.0
    tv_weight: float = 2.0
    style_blend_weights: Optional[Sequence[float]] = None
    style_scale: float = 1.0  # style image long side relative to current scale

    optimizer: OptimizerSpec = OptimizerSpec()
    init: str = "content"  # "content" | "random" | "mean"
    seed: int = 0

    # Iterate averaging (Polyak/EMA): the returned/displayed image is an
    # exponential moving average of the optimizer iterates (decay per step),
    # which smooths Adam oscillation artifacts; the raw image keeps
    # optimizing. 0 disables (the raw final iterate is returned).
    avg_decay: float = 0.0

    # Convergence-matched stopping (driver config 4, BASELINE.json:10):
    # stop a scale early when the relative chunk-mean loss improvement stays
    # below ``stop_tol`` for ``stop_patience`` consecutive chunks. 0 disables.
    stop_tol: float = 0.0
    stop_patience: int = 2

    # Fused Pallas epilogue kernels, dispatched exactly where they measure
    # faster in context (see StyleTransfer._loss_fns): currently the TV
    # loss+gradient kernel, on a single TPU device. False = the plain-XLA
    # oracle objective everywhere.
    use_fused: bool = True
    # Fused W-pair-packed block-1 Pallas kernel (ops/pallas/block1_packed.py):
    # conv1_1+ReLU+conv1_2+ReLU+avg-pool and the conv1_1 Gram in one pass
    # from the preprocessed image, with every buffer packed two W-pixels
    # per 128-lane register. Measured 3.5x faster than XLA's conv path on
    # the block-1 subgraph at 1024px (6.2 vs 21.8 ms/it — ARCHITECTURE.md),
    # which was ~60% of the whole optimizer step. None = auto: on for
    # single-device TPU runs when structurally eligible (average pooling,
    # block-1 feature needs limited to conv1_1's Gram, non-remat regime).
    # True forces it (interpret mode off-TPU, tests), False disables.
    packed_block1: Optional[bool] = None
    # Fused block-2 Pallas kernel (ops/pallas/block2.py): the same one-pass
    # structure for conv2_1+ReLU+conv2_2+ReLU+avg-pool and the conv2_1
    # Gram (block 2 was the post-block-1 profile leader at ~10 ms/it of
    # T(2,128)-layout conv/ReLU fusions at 1024px — ARCHITECTURE.md).
    # Composes downstream of the packed block-1 kernel and requires it to
    # be active. Same tri-state semantics as packed_block1.
    packed_block2: Optional[bool] = None
    # Fused block-3 kernels (ops/pallas/conv_pair.py): VGG-19's 4-conv
    # block 3 as two fused conv pairs — conv3_1+conv3_2 with the conv3_1
    # Gram, then conv3_3+conv3_4 with the pool. Once blocks 1-2 were
    # fused, ~6.8 ms/it of T(2,128)-layout relayout forms clustered at the
    # pool2-to-conv3_1 custom-call boundary; chaining pairs is free
    # (custom-call operands and results are all row-major), so fusing
    # block 3 pushes the boundary tax to quarter resolution. VGG-19 only
    # (VGG-16's 3-conv block 3 doesn't split into pairs); requires
    # packed_block2. Same tri-state semantics.
    packed_block3: Optional[bool] = None
    # Fused block 4: the front pair (conv4_1+conv4_2 — emitting conv4_2's
    # activation, the classic content layer, plus conv4_1's style Gram)
    # chained into the tail pair (conv4_3+conv4_4+pool4), so the Pallas
    # chain runs through pool4 and block 5 is the only XLA segment left.
    # Measured 23.3 -> 17.2 ms/it at 1024px (the remaining XLA block-4
    # convs were NOT near roofline: the ones feeding the content/Gram
    # losses ran in whole-tensor T(2,128) batch-in-sublanes forms at
    # 3-7x their roofline cost). The front pair ALONE measured slower
    # (1024px 46.4 -> 42.3 it/s: it leaves a fresh custom-call seam at
    # conv4_3), so auto mode engages only when the whole block can chain
    # — tail layers unrequested and even pool extents; an explicit True
    # additionally forces the front pair where only it fits. Same
    # tri-state semantics as packed_block1; requires packed_block3.
    packed_block4: Optional[bool] = None
    # EXPERIMENTAL: run VGG block 1 through the round-2 fused Pallas kernel
    # (ops/pallas/block1.py — conv1_2+ReLU+avg-pool+conv1_1-Gram in one
    # pass). The kernel wins 2x standalone but XLA's layout assignment
    # reorganizes the neighbouring convs around the custom call's forced
    # row-major layouts and gives the win back in the full step (numbers
    # in ARCHITECTURE.md), so it is OFF by default; structural eligibility
    # (average pooling, no block-1 feature losses) still applies. Takes
    # precedence over packed_block1 when explicitly opted into.
    fused_block1: bool = False
    # Pipeline device chunks: dispatch chunk k+1 before fetching chunk k's
    # losses, so the device never idles on per-chunk host work (loss fetch
    # over the transport, callbacks, Python). Semantically identical to the
    # sequential loop — early stop rolls the speculative chunk back from
    # device-side copies. None = auto: on, except at resolutions where the
    # auto-remat memory regime applies (the rollback/get_state copies cost
    # a few image-sized buffers of HBM headroom).
    pipeline_chunks: Optional[bool] = None
    # Sanitizer (SURVEY.md section 5): verify every fetched loss term is
    # finite and raise with run coordinates otherwise. Host-side only — the
    # compiled programs are unchanged (combine with --debug-nans for
    # device-level tracing).
    debug_checks: bool = False

    # Gradient rematerialization: recompute the VGG forward inside the
    # backward instead of storing every activation. None = auto — enabled
    # once per-device pixels reach the threshold for the dispatched path:
    # REMAT_AUTO_PIXELS on the XLA path (4K stylization stores ~10 GB of
    # activations otherwise and fails to compile on a single v5e's 16 GB
    # HBM — hardware-probed round 4), extended to REMAT_AUTO_PIXELS_FUSED
    # when the full Pallas chain dispatches (its custom VJPs store lean
    # bf16/int8 residuals; 4096x4096 measured to fit AND run 1.46x faster
    # than the rematerialized step). Measured remat cost at 1024px was
    # ~+22% step time, so smaller scales keep the stored-activation path.
    remat: Optional[bool] = None

    # Snap the scale ladder onto the fused Pallas kernel grid (W on the
    # 32/64/128/256 sublane grids, H on 16 — schedule.snap_to_fused_grid):
    # an off-grid size (e.g. 1360 px) otherwise silently loses the whole
    # ~2-3x kernel tier to the XLA fallback (the kernels' compile envelope
    # only holds on the 16-row sublane grid, ops/pallas/vmem.py). Only the
    # sizes the OPTIMIZER runs at change (by at most SNAP_TOLERANCE = 4%);
    # the delivered image is always resized back to the exact requested
    # size on device. None = auto: on for TPU runs with use_fused; False
    # keeps exact sizes everywhere (a warning names the nearest fused
    # size when that costs the kernel tier); True forces snapping off-TPU
    # (tests).
    grid_snap: Optional[bool] = None

    # Background-compile later scales' programs (worker threads) while the
    # current scale optimizes; hand-over happens through the persistent
    # compilation cache. Cuts multi-scale cold-start wall-clock roughly by
    # the number of scales. Ignored under a mesh (aval shardings would have
    # to be replicated here; multi-chip runs are long enough not to care).
    warm_compile: bool = True

    def end_size(self, content_hw: Tuple[int, int]) -> Tuple[int, int]:
        if isinstance(self.size, int):
            return imgio.scale_size(content_hw, self.size)
        h, w = self.size
        return int(h), int(w)


#: Per-device pixel count at which StylizeConfig.remat=None turns itself on
#: (XLA / partially-fused paths — they store the full fp32/bf16 activation
#: set, ~10 GB at 4K, which fails to compile on a 16 GB v5e without remat).
REMAT_AUTO_PIXELS = 2560 * 2560

#: Extended auto-remat threshold for shapes where the FULL fused Pallas
#: chain (packed block 1 through block 4's tail pair) dispatches: the
#: chain's custom VJPs store bf16 block-boundary residuals plus int8 ReLU
#: masks instead of the XLA path's activation set, measured (v5e, round-4
#: remat probe) to fit 4096x4096 with the stored-activation backward at
#: 1.46x the rematerialized step rate (3.98 vs 2.72 it/s). The bound sits
#: just past 4096^2 — the largest shape hardware-validated without remat;
#: anything bigger still rematerializes.
REMAT_AUTO_PIXELS_FUSED = 4096 * 4096 + 1


def _full_chain_dispatches(
    h: int,
    w: int,
    *,
    packed: Tuple[bool, bool, bool, bool],
    all_layers: Sequence[str],
    n_dev: Optional[int],
) -> bool:
    """True when an (h, w) image will run the FULL Pallas chain — packed
    block 1 through block 4's tail pair — mirroring the dispatch gates in
    ``objective``. Used only to pick the auto-remat threshold: the chain's
    custom VJPs store lean bf16/int8 residuals, so remat=None stays off
    through REMAT_AUTO_PIXELS_FUSED (measured at 4096x4096 on v5e); any
    partial/XLA coverage keeps the conservative REMAT_AUTO_PIXELS.

    ``packed`` is the (block1, block2, block3, block4) eligibility tuple;
    ``n_dev`` is the mesh device count, or None off-mesh."""
    from style_transfer_tpu.ops.pallas import vmem as VM

    if not all(packed):
        return False
    # evenness at every pool boundary down to the tail pair's input
    # (image, pool1, pool2, pool3)
    if h % 16 or w % 16:
        return False

    def _rows_ok(rows: int) -> bool:
        # mesh shards must be clean, even, and >= the 4-row halo
        return n_dev is None or (
            rows % (2 * n_dev) == 0 and rows // n_dev >= 4
        )

    if not all(_rows_ok(h // d) for d in (1, 2, 4, 8)):
        return False
    if not VM.block1_fits(w):
        return False
    if {"conv4_3", "conv4_4", "pool4"} & set(all_layers):
        return False  # tail pair would be skipped (b4_tail_ok)
    segs = (
        (w // 2, 64, 128, True, True),
        (w // 4, 128, 256, False, True),
        (w // 4, 256, 256, True, False),
        (w // 8, 256, 512, False, True),
        (w // 8, 512, 512, True, False),
    )
    return all(
        VM.segment_impl(sw, ci, cm, pool=p, gram=g) is not None
        for sw, ci, cm, p, g in segs
    )

def _pipeline_auto(cfg: "StylizeConfig", pixels_per_device: int) -> bool:
    """The per-scale pipelining decision (shared by the optimize loop and
    the background compile warmer so they request identical programs):
    pipeline unless the in-flight records' state snapshots (a few
    image-sized buffers each) would eat HBM headroom in the memory-tight
    large-image regime. Deliberately keyed to REMAT_AUTO_PIXELS, NOT the
    fused-chain extension: a no-remat 4096px step already raises residency
    by the stored residuals, so the snapshot copies stay off there."""
    if cfg.pipeline_chunks is not None:
        return cfg.pipeline_chunks
    return pixels_per_device < REMAT_AUTO_PIXELS


#: In-flight chunks in the pipelined optimize loop. Depth 1 still starves
#: the device at small scales on high-latency transports (~3 host
#: round-trips per chunk vs ~60 ms of device time per 256px chunk); depth 2
#: keeps it busy as long as host THROUGHPUT suffices. Each in-flight chunk
#: holds one set of rollback/get_state copies.
_PIPELINE_DEPTH = 2


@dataclasses.dataclass
class _PendingChunk:
    """A dispatched-but-not-yet-processed optimizer chunk (pipelined loop).

    Every field is a device handle created at dispatch time: ``run_chunk``
    returns the post-chunk state twice — once as the primary carries (which
    the NEXT chunk's dispatch donates) and once as snapshot outputs routed
    through ``optimization_barrier`` so they occupy their own buffers. The
    record is therefore complete the moment the chunk is dispatched, and
    its ``image``/``ema``/``opt_state`` survive later donations (early-stop
    rollback and ``ProgressEvent.get_state`` read them safely).
    """

    n: int
    done_iters: int
    loss_seq: dict
    snap: Optional[jnp.ndarray]
    image: Optional[jnp.ndarray] = None
    ema: Optional[jnp.ndarray] = None
    opt_state: object = None


def _style_size(style_hw, scale_hw, style_scale: float) -> Tuple[int, int]:
    """Even-rounded style-image size for a scale (shared by the optimize
    loop and the background compile warmer so they request equal shapes)."""
    long_side = max(32, int(round(max(scale_hw) * style_scale)))
    sh, sw = imgio.scale_size(style_hw, long_side)
    return sh - sh % 2, sw - sw % 2


#: Largest per-device element count the XLA:TPU toolchain compiles for one
#: tensor. Programs whose block-1 activation (H, W, 64 — the largest tensor
#: any VGG program materializes, 64 channels at full resolution) crosses
#: 2**31 elements crash the compiler before buffer assignment, on the plain
#: XLA path and the Pallas path alike. Empirically bisected on v5e
#: (round 5): a 5632x5632 capture compiles (5632^2*64 = 2.03e9), 5888x5888
#: does not (2.22e9) — and 6144/7168/8192 fail identically with the Pallas
#: tier force-disabled, so the limit is the toolchain's, not a kernel or
#: HBM bound (5888^2*64*2 bytes = 4.1 GB of 16 GB HBM). The limit is
#: PER DEVICE: H-sharding over a mesh divides exactly this tensor, which is
#: how >5792px sizes are meant to run (parallel/mesh.py; an 8-device mesh
#: lifts the square ceiling past 16K).
TPU_MAX_TENSOR_ELEMENTS = 2 ** 31


def resolution_ceiling_excess(
    sizes, n_dev: int = 1
) -> Optional[Tuple[int, int]]:
    """First (H, W) from ``sizes`` whose per-device block-1 activation
    exceeds :data:`TPU_MAX_TENSOR_ELEMENTS` (None = everything compiles).
    Pure and host-only, so the single-chip resolution ceiling is testable
    without TPU hardware."""
    for h, w in sizes:
        if -(-h // n_dev) * w * 64 > TPU_MAX_TENSOR_ELEMENTS:
            return (h, w)
    return None


class StyleTransfer:
    """Stateful wrapper: model weights + mesh + jit caches.

    ``params=None`` uses the deterministic random VGG-19 fixture (tests,
    benches; SURVEY.md section 4) — pass weights from
    :func:`style_transfer_tpu.models.weights.load_npz` for real stylization.
    """

    def __init__(
        self,
        params=None,
        *,
        mean=None,
        std=None,
        pooling: str = "average",
        compute_dtype=None,
        mesh=None,
    ):
        if params is None:
            params, fmean, fstd = random_fixture(0)
            mean = fmean if mean is None else mean
            std = fstd if std is None else std
        self.mean = np.asarray(imgio.IMAGENET_MEAN if mean is None else mean, np.float32)
        self.std = np.asarray(imgio.IMAGENET_STD if std is None else std, np.float32)
        self.pooling = pooling
        if compute_dtype is None:
            compute_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        self.compute_dtype = compute_dtype
        self.mesh = mesh
        self.arch = vgg_mod.infer_arch(params)
        self.params = mesh_mod.replicate(params, mesh)
        # LRU of jitted program sets; bounded so a server sweeping config
        # values (weights, learning rates) can't grow traced programs +
        # compiled executables without limit.
        self._prog_cache: "OrderedDict[str, tuple]" = OrderedDict()
        self._prog_cache_max = 8
        # (program key, plan shapes) combos already background-warmed this
        # process: their executables are jit-cached in-process, so spawning
        # warm threads again (a serving loop) would only burn host CPU
        # re-lowering programs that are already compiled. Bounded FIFO (a
        # serving loop sees unbounded distinct shapes); a run that fails
        # mid-way removes its key again so a retry re-warms.
        self._warmed_keys: "OrderedDict[tuple, bool]" = OrderedDict()
        self._warmed_keys_max = 64

    # ---------------------------------------------------------------- model

    def _features(
        self, params, image: jnp.ndarray, layers: Sequence[str], remat: bool = False
    ) -> Dict[str, jnp.ndarray]:
        """Preprocess + VGG forward on an NHWC [0,1] image.

        ``params`` is threaded as an explicit argument everywhere (never
        closed over inside ``jit``): a closed-over pytree would be baked into
        each compiled program as ~20 MB of embedded constants, bloating every
        XLA compile, the persistent compilation cache, and the
        executable-load path.
        """
        x = imgio.preprocess(image, self.mean, self.std)
        x = mesh_mod.constrain_spatial(x, self.mesh)
        return vgg_mod.extract_features(
            params,
            x,
            layers,
            pooling=self.pooling,
            compute_dtype=self.compute_dtype,
            shard_divisor=self.mesh.devices.size if self.mesh is not None else None,
            arch=self.arch,
            remat=remat,
        )

    def _gram_fn(self, cfg: StylizeConfig):
        if cfg.use_fused:
            from style_transfer_tpu.ops.pallas import gram as pgram

            return pgram.gram_matrix
        return L.gram_matrix

    def _loss_fns(self, cfg: StylizeConfig) -> dict:
        """Fused-epilogue dispatch into :func:`ops.losses.objective_terms`.

        Routes exactly the kernels that measured faster in context
        (ops/pallas/epilogue.py; numbers in ARCHITECTURE.md): currently the
        fused TV loss+gradient kernel (36.28 -> 36.00 ms/it at 1024px,
        8.44 -> 8.34 at 512px). The fused content/style epilogues measured
        *slower* in context (61 ms/it at 1024px — pallas_call is an
        optimization barrier around the conv4_2 producer) and stay opt-in
        API. Under a mesh the TV kernel rides a shard_map wrapper (per-device
        kernel + ppermute halo + psum, ep.make_sharded_tv_loss); non-TPU
        backends take the oracle path (interpret-mode Pallas would be pure
        overhead outside tests).
        """
        if cfg.use_fused and jax.default_backend() == "tpu":
            from style_transfer_tpu.ops.pallas import epilogue as ep

            if self.mesh is None:
                def tv_dispatch(image):
                    # The fused kernel flattens to (H, W*C); Mosaic wants
                    # (8, 128)-granular blocks on the last two dims and only
                    # 128-aligned flattened widths were validated on
                    # hardware. Unaligned widths (e.g. --size 1000) take the
                    # oracle — a shape decision made at trace time, so the
                    # compiled program pays nothing for the check.
                    if (image.shape[2] * image.shape[3]) % 128 == 0:
                        return ep.tv_loss(image)
                    return L.tv_loss(image)
            else:
                # Sharded runs get the shard_map-wrapped kernel: per-device
                # Pallas TV over the local rows, one-row ppermute halos,
                # psum'd loss (ops/pallas/epilogue.py). Same lane-alignment
                # gate, plus clean H shards.
                n_dev = self.mesh.devices.size
                sharded_tv = ep.make_sharded_tv_loss(self.mesh, mesh_mod.SPATIAL_AXIS)

                def tv_dispatch(image):
                    if (
                        image.shape[1] % n_dev == 0
                        and (image.shape[2] * image.shape[3]) % 128 == 0
                    ):
                        return sharded_tv(image)
                    return L.tv_loss(image)

            return {"tv_loss_fn": tv_dispatch}
        return {}

    def _block1_structurally_eligible(self, cfg: StylizeConfig) -> bool:
        """Whether a fused block-1 kernel can carry the objective's first
        block at all: average pooling, no block-1 activation demanded
        beyond conv1_1's Gram, at least one deeper layer to feed. Under a
        mesh the packed kernel rides its shard_map wrapper
        (ops/pallas/block1_packed.make_sharded_block1)."""
        if self.pooling != "average":
            return False
        b1 = {"conv1_1", "conv1_2", "pool1"}
        if set(cfg.content_layers) & b1:
            return False
        if set(cfg.style_layers) & (b1 - {"conv1_1"}):
            return False
        # at least one deeper layer, so pool1 feeds something
        return any(
            l not in b1 for l in list(cfg.content_layers) + list(cfg.style_layers)
        )

    def _block1_eligible(self, cfg: StylizeConfig) -> bool:
        """The round-2 experimental kernel (ops/pallas/block1.py): explicit
        opt-in only (it measured slower in the full step — ARCHITECTURE.md),
        and single-device only (plain pallas_call, no shard_map wrapper)."""
        return (
            cfg.fused_block1
            and cfg.use_fused
            and self.mesh is None
            and self._block1_structurally_eligible(cfg)
        )

    def _packed_block1_eligible(self, cfg: StylizeConfig) -> bool:
        """The packed kernel (ops/pallas/block1_packed.py): auto-dispatched
        on TPU (the measured winner), forceable for interpret-mode tests."""
        if not cfg.use_fused or cfg.packed_block1 is False or cfg.fused_block1:
            return False
        if cfg.packed_block1 is None and jax.default_backend() != "tpu":
            return False
        return self._block1_structurally_eligible(cfg)

    def _packed_block2_eligible(self, cfg: StylizeConfig) -> bool:
        """The fused block-2 kernel (ops/pallas/block2.py): requires the
        packed block-1 kernel (it consumes that kernel's pool1 output) and
        the analogous structural conditions one block deeper. Under a mesh
        the pair rides its shard_map wrapper
        (ops/pallas/conv_pair.make_sharded_pair)."""
        if cfg.packed_block2 is False:
            return False
        if not self._packed_block1_eligible(cfg):
            return False
        if cfg.packed_block2 is None and jax.default_backend() != "tpu":
            return False
        b2 = {"conv2_1", "conv2_2", "pool2"}
        if set(cfg.content_layers) & b2:
            return False
        if set(cfg.style_layers) & (b2 - {"conv2_1"}):
            return False
        b12 = b2 | {"conv1_1", "conv1_2", "pool1"}
        return any(
            l not in b12 for l in list(cfg.content_layers) + list(cfg.style_layers)
        )

    def _packed_block3_eligible(self, cfg: StylizeConfig) -> bool:
        """The fused block-3 conv pairs (ops/pallas/conv_pair.py): require
        the block-2 kernel upstream, the 4-conv VGG-19 block shape, and
        the analogous structural conditions one block deeper."""
        if cfg.packed_block3 is False or not self._packed_block2_eligible(cfg):
            return False
        if cfg.packed_block3 is None and jax.default_backend() != "tpu":
            return False
        if self.arch != "vgg19":
            return False
        b3 = {"conv3_1", "conv3_2", "conv3_3", "conv3_4", "pool3"}
        if set(cfg.content_layers) & b3:
            return False
        if set(cfg.style_layers) & (b3 - {"conv3_1"}):
            return False
        shallow = b3 | {"conv1_1", "conv1_2", "pool1", "conv2_1", "conv2_2", "pool2"}
        return any(
            l not in shallow
            for l in list(cfg.content_layers) + list(cfg.style_layers)
        )

    def _packed_block4_eligible(self, cfg: StylizeConfig) -> bool:
        """The fused block-4 pairs: auto-dispatched on TPU like blocks 2-3.
        In auto mode the objective engages block 4 only when the WHOLE
        block can chain (front pair conv4_1+conv4_2 AND tail pair
        conv4_3+conv4_4+pool4, measured 23.3 -> 17.2 ms/it at 1024px);
        the front pair alone measured slower (it leaves a fresh
        custom-call seam at conv4_3) and runs only under an explicit
        ``packed_block4=True``. Requires the block-3 pairs upstream.
        conv4_2's activation IS one of the front pair's outputs, so it may
        appear in content or style layers; conv4_1 exists only as its Gram
        (style ok, content not)."""
        if cfg.packed_block4 is False or not self._packed_block3_eligible(cfg):
            return False
        if cfg.packed_block4 is None and jax.default_backend() != "tpu":
            return False
        if "conv4_1" in cfg.content_layers:
            return False
        return True

    def _prog_key(self, cfg: StylizeConfig) -> str:
        """Program-cache key: exactly the fields that shape the traced
        computation (layers, loss weights, optimizer, fusion/remat choices) —
        schedule fields like iterations or stop_tol don't retrace, so configs
        that differ only in scheduling reuse the same jit wrappers and
        therefore the same compiled executables across stylize() calls."""
        return repr(
            (
                tuple(cfg.content_layers),
                tuple(cfg.content_layer_weights or ()),
                tuple(cfg.style_layers),
                tuple(cfg.style_layer_weights or ()),
                cfg.content_weight,
                cfg.style_weight,
                cfg.tv_weight,
                cfg.optimizer,
                cfg.use_fused,
                cfg.fused_block1,
                cfg.packed_block1,
                cfg.packed_block2,
                cfg.packed_block3,
                cfg.packed_block4,
                cfg.remat,
                cfg.avg_decay,
            )
        )

    def _build_objective(self, cfg, *, c_weights, s_weights, all_layers,
                         gram_fn, loss_fns, fused_b1, packed_b1, packed_b2,
                         packed_b3, packed_b4):
        """Build the loss closure ``objective(params, image, c_targets,
        s_targets) -> (loss, terms)`` with every kernel-dispatch decision
        baked in. Split out of :meth:`_programs` so tests can trace the
        REAL dispatch at any static shape (``jax.eval_shape`` — no compile,
        no compute) and pin it against :func:`_full_chain_dispatches`, the
        auto-remat mirror of these gates (tests/test_api.py::
        test_full_chain_mirror_matches_real_dispatch): if the mirror said
        True while a segment silently fell back to XLA, remat=None could
        stay off past REMAT_AUTO_PIXELS with partial-chain residency and
        exhaust HBM at 4K."""
        def objective(params, image, c_targets, s_targets):
            image = mesh_mod.constrain_spatial(image, self.mesh)
            n_dev = self.mesh.devices.size if self.mesh is not None else 1
            pixels = image.shape[1] * image.shape[2] // n_dev
            remat_limit = (
                REMAT_AUTO_PIXELS_FUSED
                if _full_chain_dispatches(
                    image.shape[1],
                    image.shape[2],
                    packed=(packed_b1, packed_b2, packed_b3, packed_b4),
                    all_layers=all_layers,
                    n_dev=n_dev if self.mesh is not None else None,
                )
                else REMAT_AUTO_PIXELS
            )
            use_remat = bool(
                cfg.remat or (cfg.remat is None and pixels >= remat_limit)
            )
            gram_overrides = None
            # The packed kernels additionally gate on the traced shape (even
            # extents). In the auto-remat (memory-tight) regime each kernel
            # call is wrapped in jax.checkpoint: its backward residuals (the
            # first activation + ReLU mask, ~3 GB at 4K for block 1) are
            # then recomputed inside that block's backward and freed after,
            # instead of living across the whole step — only the small
            # inter-block pool boundaries persist, the same storage shape
            # the XLA blockwise-remat path has.
            # Scoped-VMEM gates: each kernel dispatches only inside its
            # HARDWARE-validated compile envelope (ops/pallas/vmem.py, with
            # the measured per-shape table). The two-conv kernels (packed
            # block 1, the pairs) are validated both ways up to effective
            # width w*c/64 = 2048; at the 4096px scale's eff-4096 shapes
            # their bodies exceed the 16 MB scoped budget in at least one
            # direction, so there each two-conv segment is decomposed into
            # two single-conv kernels (ops/pallas/conv_single.py, ~half the
            # body) and block 1 — which has no singles form — runs on XLA
            # with the chain starting at block 2. At eff 2048 exactly (the
            # 2048px ladder) both forms compile but singles measured 18%
            # faster (vmem.segment_impl docstring), so that edge also runs
            # singles.
            from style_transfer_tpu.ops.pallas import vmem as VM

            if (
                packed_b1
                and image.shape[1] % 2 == 0
                and image.shape[2] % 2 == 0
                and (
                    VM.block1_fits(image.shape[2])
                    or VM.segment_impl(
                        image.shape[2] // 2, 64, 128, pool=True, gram=True
                    )
                    is not None
                )
                and (
                    self.mesh is None
                    # mesh shards must be clean, even, and >= the 4-row halo
                    or (
                        image.shape[1] % (2 * n_dev) == 0
                        and image.shape[1] // n_dev >= 4
                    )
                )
            ):
                ckpt = jax.checkpoint if use_remat else (lambda f: f)
                x = imgio.preprocess(image, self.mean, self.std)
                if self.compute_dtype is not None:
                    x = x.astype(self.compute_dtype)
                gram_overrides = {}
                if VM.block1_fits(image.shape[2]):
                    from style_transfer_tpu.ops.pallas import block1_packed as B1P

                    b1_fn = (
                        B1P.block1_packed
                        if self.mesh is None
                        else B1P.make_sharded_block1(self.mesh, mesh_mod.SPATIAL_AXIS)
                    )
                    p1, p2 = params["conv1_1"], params["conv1_2"]
                    pool1, g1 = ckpt(b1_fn)(
                        x, p1["kernel"], p1["bias"], p2["kernel"], p2["bias"]
                    )
                    if "conv1_1" in s_weights:
                        gram_overrides["conv1_1"] = g1
                else:
                    # Beyond the packed kernel's validated envelope (the
                    # one-pass backward measured 17.79M scoped VMEM at the
                    # 4096px scale): block 1 runs on the XLA path and the
                    # Pallas chain starts at block 2 over its pool output.
                    # L.gram_matrix (not the Pallas gram) because conv1_1
                    # may be H-sharded here and the jnp einsum partitions
                    # cleanly under GSPMD.
                    want1 = (
                        ("conv1_1", "pool1")
                        if "conv1_1" in s_weights
                        else ("pool1",)
                    )
                    f1 = vgg_mod.extract_features(
                        params,
                        x,
                        want1,
                        pooling=self.pooling,
                        compute_dtype=None,
                        shard_divisor=n_dev if self.mesh is not None else None,
                        arch=self.arch,
                        remat=use_remat,
                    )
                    pool1 = f1["pool1"]
                    if "conv1_1" in s_weights:
                        gram_overrides["conv1_1"] = L.gram_matrix(f1["conv1_1"])
                covered = {"conv1_1"}
                start_block, handoff, start_conv = 2, pool1, 0

                from style_transfer_tpu.ops.pallas import block2 as B2F
                from style_transfer_tpu.ops.pallas import conv_pair as CP
                from style_transfer_tpu.ops.pallas import conv_single as CSG

                def _mesh_rows_ok(t):
                    # mesh shards must be clean, even, and >= the 4-row halo
                    return self.mesh is None or (
                        t.shape[1] % (2 * n_dev) == 0
                        and t.shape[1] // n_dev >= 4
                    )

                def _seg_fn(impl, *, pool, gram, block2=False):
                    """Kernel callable for one two-conv segment, per the
                    vmem-gated implementation choice: the fused pair
                    inside its validated envelope, the singles
                    decomposition beyond it, W-tiled singles beyond
                    THAT (eff > 4096, the 5120..8192px ladders)."""
                    if impl == "wide":
                        return CSG.make_wide_pair_of_singles(
                            pool=pool, gram=gram, mesh=self.mesh,
                            axis=mesh_mod.SPATIAL_AXIS,
                        )
                    if impl == "singles":
                        return CSG.make_pair_of_singles(
                            pool=pool, gram=gram, mesh=self.mesh,
                            axis=mesh_mod.SPATIAL_AXIS,
                        )
                    if self.mesh is not None:
                        return CP.make_sharded_pair(
                            self.mesh, mesh_mod.SPATIAL_AXIS,
                            pool=pool, gram=gram,
                        )
                    if block2:
                        return B2F.block2_fused
                    return CP.pair_gram if gram else CP.pair_pool

                # chain the fused block-2 kernel off block 1's pool output
                # (post-block-1 profile leader; shape gate: even pooled dims)
                b2_impl = VM.segment_impl(
                    pool1.shape[2], 64, 128, pool=True, gram=True
                )
                if (
                    packed_b2
                    and pool1.shape[1] % 2 == 0
                    and pool1.shape[2] % 2 == 0
                    and b2_impl is not None
                    and _mesh_rows_ok(pool1)
                ):
                    b2_fn = _seg_fn(b2_impl, pool=True, gram=True, block2=True)
                    q1, q2 = params["conv2_1"], params["conv2_2"]
                    pool2, g21 = ckpt(b2_fn)(
                        pool1, q1["kernel"], q1["bias"], q2["kernel"], q2["bias"]
                    )
                    if "conv2_1" in s_weights:
                        gram_overrides["conv2_1"] = g21
                    covered.add("conv2_1")
                    start_block, handoff = 3, pool2
                    # ... and block 3 as two fused conv pairs off pool2
                    b3f_impl = VM.segment_impl(
                        pool2.shape[2], 128, 256, pool=False, gram=True
                    )
                    b3t_impl = VM.segment_impl(
                        pool2.shape[2], 256, 256, pool=True, gram=False
                    )
                    if (
                        packed_b3
                        and pool2.shape[1] % 2 == 0
                        and pool2.shape[2] % 2 == 0
                        and b3f_impl is not None
                        and b3t_impl is not None
                        and _mesh_rows_ok(pool2)
                    ):
                        p_gram = _seg_fn(b3f_impl, pool=False, gram=True)
                        p_pool = _seg_fn(b3t_impl, pool=True, gram=False)
                        w31, w32 = params["conv3_1"], params["conv3_2"]
                        w33, w34 = params["conv3_3"], params["conv3_4"]
                        y32, g31 = ckpt(p_gram)(
                            pool2, w31["kernel"], w31["bias"],
                            w32["kernel"], w32["bias"],
                        )
                        pool3 = ckpt(p_pool)(
                            y32, w33["kernel"], w33["bias"],
                            w34["kernel"], w34["bias"],
                        )
                        if "conv3_1" in s_weights:
                            gram_overrides["conv3_1"] = g31
                        covered.add("conv3_1")
                        start_block, handoff = 4, pool3
                        # ... and block 4: the front pair (conv4_1+conv4_2 —
                        # its two outputs are exactly the objective's needs
                        # there: conv4_2's activation for the content loss,
                        # conv4_1's Gram for the style loss) chained into
                        # the tail pair (conv4_3+conv4_4+pool4), so the
                        # Pallas chain runs through pool4 and no XLA conv
                        # is left adjacent to a custom-call seam at block-4
                        # resolution (1024px A/B: 23.3 -> 17.2 ms/it). The
                        # front pair ALONE measured slower (it leaves a
                        # fresh seam at conv4_3), so auto dispatch engages
                        # only when the whole-block chain can: tail layers
                        # unrequested and pool-even extents. Explicit
                        # packed_block4=True still forces the front pair.
                        b4_tail = {"conv4_3", "conv4_4", "pool4"}
                        b4f_impl = VM.segment_impl(
                            pool3.shape[2], 256, 512, pool=False, gram=True
                        )
                        b4t_impl = VM.segment_impl(
                            pool3.shape[2], 512, 512, pool=True, gram=False
                        )
                        b4_tail_ok = (
                            not (b4_tail & set(all_layers))
                            and pool3.shape[1] % 2 == 0
                            and pool3.shape[2] % 2 == 0
                            and b4t_impl is not None
                            and _mesh_rows_ok(pool3)
                        )
                        if packed_b4 and b4f_impl is not None and _mesh_rows_ok(pool3) and (
                            b4_tail_ok or cfg.packed_block4 is True
                        ):
                            p4_gram = _seg_fn(b4f_impl, pool=False, gram=True)
                            w41, w42 = params["conv4_1"], params["conv4_2"]
                            y42, g41 = ckpt(p4_gram)(
                                pool3, w41["kernel"], w41["bias"],
                                w42["kernel"], w42["bias"],
                            )
                            if "conv4_1" in s_weights:
                                gram_overrides["conv4_1"] = g41
                            covered.update(("conv4_1", "conv4_2"))
                            start_block, handoff = 4, y42
                            start_conv = 2
                            if b4_tail_ok:
                                p4_pool = _seg_fn(
                                    b4t_impl, pool=True, gram=False
                                )
                                w43, w44 = params["conv4_3"], params["conv4_4"]
                                pool4 = ckpt(p4_pool)(
                                    y42, w43["kernel"], w43["bias"],
                                    w44["kernel"], w44["bias"],
                                )
                                covered.update(b4_tail)
                                start_block, handoff = 5, pool4
                                start_conv = 0
                deeper = tuple(l for l in all_layers if l not in covered)
                # conv5_1 — the deepest default style layer — is consumed
                # ONLY as its Gram; when it is the sole remaining layer the
                # fused conv+Gram kernel (ops/pallas/conv_gram.py) computes
                # that Gram directly from streamed conv rows and the ENTIRE
                # VGG forward+backward runs in Pallas (no XLA conv remains
                # to be re-tiled at the custom-call seam).
                cg_impl = VM.gram_tail_impl(handoff.shape[2], 512)
                if (
                    deeper == ("conv5_1",)
                    and start_block == 5
                    and "conv5_1" not in c_weights
                    and cg_impl is not None
                    and (
                        self.mesh is None
                        or (
                            handoff.shape[1] % n_dev == 0
                            and handoff.shape[1] // n_dev >= 2
                        )
                    )
                ):
                    if cg_impl == "conv_gram":
                        from style_transfer_tpu.ops.pallas import conv_gram as CG

                        cg_fn = (
                            CG.conv_gram
                            if self.mesh is None
                            else CG.make_sharded_conv_gram(
                                self.mesh, mesh_mod.SPATIAL_AXIS
                            )
                        )
                    else:
                        # beyond conv_gram's envelope (eff > 2048 — the
                        # 8192px scale's conv5_1): the W-chunked single
                        # kernel computes the same Gram (vmem.gram_tail_impl)
                        cg_fn = (
                            CSG.gram_tail
                            if self.mesh is None
                            else CSG.make_sharded_gram_tail(
                                self.mesh, mesh_mod.SPATIAL_AXIS
                            )
                        )
                    w51 = params["conv5_1"]
                    gram_overrides["conv5_1"] = ckpt(cg_fn)(
                        handoff, w51["kernel"], w51["bias"]
                    )
                    deeper = ()
                if deeper:
                    feats = vgg_mod.extract_features(
                        params,
                        mesh_mod.constrain_spatial(handoff, self.mesh),
                        deeper,
                        pooling=self.pooling,
                        compute_dtype=None,
                        shard_divisor=n_dev if self.mesh is not None else None,
                        arch=self.arch,
                        remat=use_remat,
                        start_block=start_block,
                        start_conv=start_conv,
                    )
                else:
                    feats = {}
                if "conv4_2" in covered and "conv4_2" in all_layers:
                    feats = dict(feats)
                    feats["conv4_2"] = y42
                gram_overrides = gram_overrides or None
            # round-2 experimental kernel (explicit opt-in): even extents
            # and W <= 1024 — the Mosaic toolchain crashes compiling it at
            # W=2048 (ARCHITECTURE.md), so larger scales of a multi-scale
            # ladder fall back to the XLA path.
            elif (
                fused_b1
                and image.shape[1] % 2 == 0
                and image.shape[2] % 2 == 0
                and image.shape[2] <= 1024
            ):
                # Fused block 1: the whole block — conv1_1 (one im2col MXU
                # contraction), conv1_2, both ReLUs, the 2x2 average pool,
                # and the conv1_1 Gram — runs in one Pallas pass from the
                # preprocessed image, so no block-1 activation (or its
                # gradient) ever round-trips through HBM relayouts
                # (ops/pallas/block1.py, ARCHITECTURE.md).
                from style_transfer_tpu.ops.pallas import block1 as B1

                x = imgio.preprocess(image, self.mean, self.std)
                if self.compute_dtype is not None:
                    x = x.astype(self.compute_dtype)
                p1 = params["conv1_1"]
                pool1, g1 = B1.block1_full(
                    x, p1["kernel"], p1["bias"],
                    params["conv1_2"]["kernel"], params["conv1_2"]["bias"],
                )
                deeper = tuple(l for l in all_layers if l != "conv1_1")
                feats = vgg_mod.extract_features(
                    params,
                    pool1,
                    deeper,
                    pooling=self.pooling,
                    compute_dtype=None,
                    shard_divisor=None,
                    arch=self.arch,
                    remat=use_remat,
                    start_block=2,
                )
                if "conv1_1" in s_weights:
                    gram_overrides = {"conv1_1": g1}
            else:
                feats = self._features(params, image, all_layers, remat=use_remat)
            return_terms = L.objective_terms(
                feats,
                gram_overrides=gram_overrides,
                content_targets=c_targets,
                style_targets=s_targets,
                content_layer_weights=c_weights,
                style_layer_weights=s_weights,
                image=image,
                content_weight=cfg.content_weight,
                style_weight=cfg.style_weight,
                tv_weight=cfg.tv_weight,
                gram_fn=gram_fn,
                **loss_fns,
            )
            return return_terms["loss"], return_terms
        return objective

    def _programs(self, cfg: StylizeConfig):
        """The per-config jitted program set (capture/init/step/upsample)."""
        key = self._prog_key(cfg)
        cached = self._prog_cache.get(key)
        if cached is not None:
            self._prog_cache.move_to_end(key)
            return cached

        c_weights = L.normalize_layer_weights(cfg.content_layers, cfg.content_layer_weights)
        s_weights = L.normalize_layer_weights(cfg.style_layers, cfg.style_layer_weights)
        all_layers = tuple(dict.fromkeys(list(cfg.content_layers) + list(cfg.style_layers)))
        gram_fn = self._gram_fn(cfg)
        loss_fns = self._loss_fns(cfg)

        @jax.jit
        def capture_content(params, content_img):
            return self._features(params, content_img, tuple(cfg.content_layers))

        @jax.jit
        def capture_style(params, style_img):
            feats = self._features(params, style_img, tuple(cfg.style_layers))
            return {k: gram_fn(v) for k, v in feats.items()}

        fused_b1 = self._block1_eligible(cfg)
        packed_b1 = self._packed_block1_eligible(cfg)
        packed_b2 = self._packed_block2_eligible(cfg)
        packed_b3 = self._packed_block3_eligible(cfg)
        packed_b4 = self._packed_block4_eligible(cfg)

        objective = self._build_objective(
            cfg, c_weights=c_weights, s_weights=s_weights,
            all_layers=all_layers, gram_fn=gram_fn, loss_fns=loss_fns,
            fused_b1=fused_b1, packed_b1=packed_b1, packed_b2=packed_b2,
            packed_b3=packed_b3, packed_b4=packed_b4,
        )

        @jax.jit
        def init_opt_state(image):
            return cfg.optimizer.build().init(image)

        def _snap(image, ema):
            show = ema if cfg.avg_decay > 0 else image
            return jnp.clip(show[0], 0.0, 1.0)

        @partial(
            jax.jit,
            static_argnames=("n", "snapshot"),
            donate_argnames=("image", "ema", "opt_state"),
        )
        def run_chunk(params, image, ema, opt_state, c_targets, s_targets, *, n, snapshot):
            step, _ = make_step_fn(
                lambda im: objective(params, im, c_targets, s_targets), cfg.optimizer
            )
            decay = jnp.float32(cfg.avg_decay)

            def body(carry, _):
                image, ema, opt_state = carry
                image, opt_state, aux = step(image, opt_state)
                if cfg.avg_decay > 0:
                    # Polyak/EMA of iterates (ema starts at the init image, so
                    # no bias correction is needed); the averaged image is the
                    # displayed/saved result, the raw image keeps optimizing.
                    ema = decay * ema + (1.0 - decay) * image
                return (image, ema, opt_state), aux

            (image, ema, opt_state), loss_seq = jax.lax.scan(
                body, (image, ema, opt_state), None, length=n
            )
            # snapshot=True (pipelined loop): state copies emitted as extra
            # outputs rather than a separate copy program — each dispatch is
            # a full transport round-trip, and the chunk loop needs these to
            # survive the NEXT chunk's donation (ProgressEvent.get_state and
            # the early-stop rollback). They are routed through
            # optimization_barrier so they are DISTINCT HLO values from the
            # primary carries — buffer independence by construction, not by
            # the backend happening to give duplicate outputs separate
            # buffers (a future XLA that aliases identical outputs would
            # otherwise break every pipelined run with "Array has been
            # deleted"). snapshot=False (sequential loop, the memory-tight
            # auto-remat regime): the copies are image-sized buffers the 4K
            # HBM budget cannot spare, and the loop processes each chunk
            # BEFORE the next dispatch donates the primaries, so it reads
            # the primary handles directly; only the clipped display image
            # (async-safe get_image, e.g. the web monitor thread) is a
            # dedicated output.
            if snapshot:
                snap_img, snap_ema, snap_opt = jax.lax.optimization_barrier(
                    (image, ema, opt_state)
                )
                return image, ema, opt_state, loss_seq, (
                    _snap(snap_img, snap_ema), snap_img, snap_ema, snap_opt
                )
            return image, ema, opt_state, loss_seq, (_snap(image, ema),)

        @partial(jax.jit, static_argnames="size")
        def upsample(image, *, size):
            out = imgio.resize_image(image, size)
            return mesh_mod.constrain_spatial(out, self.mesh)

        programs = (capture_content, capture_style, init_opt_state, run_chunk, upsample)
        self._prog_cache[key] = programs
        while len(self._prog_cache) > self._prog_cache_max:
            self._prog_cache.popitem(last=False)
        return programs

    # ------------------------------------------------------------- stylize

    def stylize(
        self,
        content: np.ndarray,
        styles: Union[np.ndarray, Sequence[np.ndarray]],
        config: Optional[StylizeConfig] = None,
        *,
        callback: Optional[Callback] = None,
        init_image: Optional[np.ndarray] = None,
        resume_state: Optional[dict] = None,
        output_dtype: str = "float32",
    ) -> np.ndarray:
        """Run the full multi-scale stylization; returns RGB (H, W, 3).

        ``content``/``styles`` are float RGB [0,1] arrays (H, W, 3) as
        produced by :func:`style_transfer_tpu.utils.imgio.load_image`.
        ``output_dtype="uint8"`` quantizes on device before the final fetch
        (matching ``imgio.to_uint8`` exactly) — a 4x smaller transfer, which
        matters on thin host<->device links when the result is headed for
        an 8-bit image file anyway. Default returns float RGB in [0, 1].
        """
        if output_dtype not in ("float32", "uint8"):
            raise ValueError(f"output_dtype must be float32 or uint8, got {output_dtype!r}")
        cfg = config or StylizeConfig()
        if isinstance(styles, np.ndarray) or (
            hasattr(styles, "ndim") and getattr(styles, "ndim", 0) == 3
        ):
            styles = [styles]
        styles = list(styles)
        if not styles:
            raise ValueError("need at least one style image")
        blend = cfg.style_blend_weights or [1.0] * len(styles)
        if len(blend) != len(styles):
            raise ValueError(f"{len(styles)} styles but {len(blend)} blend weights")

        # Device-resident once: every scale resizes these on device, and a
        # host-side numpy array here would re-upload the full-resolution
        # content (50 MB fp32 at 2048px) across the host<->device link at
        # EVERY scale of the pyramid (~0.3 s/scale on a tunneled link).
        content_t = jnp.asarray(imgio.to_nhwc(content))
        style_ts = [jnp.asarray(imgio.to_nhwc(s)) for s in styles]

        # jitted building blocks — cached per config on the instance, so
        # repeated stylize() calls (a serving loop) reuse traced programs
        # and their compiled executables instead of rebuilding closures.
        capture_content, capture_style, init_opt_state, run_chunk, upsample = (
            self._programs(cfg)
        )

        # ---- the multi-scale loop (SURVEY.md section 3.1 outer loop)

        requested_size = cfg.end_size(content_t.shape[1:3])
        grid_snap = cfg.grid_snap
        if grid_snap is None:
            grid_snap = cfg.use_fused and jax.default_backend() == "tpu"
        plan = build_plan(
            requested_size,
            cfg.iterations,
            min_scale=cfg.min_scale,
            factor=cfg.scale_factor,
            grid_snap=grid_snap,
        )
        # Odd sizes are rounded to even (VGG's five 2x pooling stages). Warn
        # when the rounding changes what the user explicitly asked for: both
        # dims of a (H, W) request, or the long side of an integer request
        # (the aspect-derived short side was never explicitly requested).
        delivered = (
            schedule_mod._round_even(requested_size[0]),
            schedule_mod._round_even(requested_size[1]),
        )
        explicitly_changed = (
            delivered != tuple(requested_size)
            if not isinstance(cfg.size, int)
            else max(delivered) != max(requested_size)
        )
        if explicitly_changed:
            warnings.warn(
                f"requested output size {tuple(requested_size)} rounded to "
                f"{delivered} (sizes are rounded to even for VGG pooling)",
                stacklevel=2,
            )
        if plan[-1].size != delivered:
            # grid_snap moved the ladder onto the fused kernel grid: the
            # optimizer runs at the snapped sizes (<= 4% change) and the
            # result is resized back to the exact requested size below.
            warnings.warn(
                f"scale sizes snapped to the fused kernel grid (final "
                f"optimize at {plan[-1].size}, output resized to "
                f"{delivered}); pass grid_snap=False for exact-size "
                f"optimization on the XLA path",
                stacklevel=2,
            )
        if (
            self.pooling != "average"
            and cfg.use_fused
            and jax.default_backend() == "tpu"
            and cfg.packed_block1 is not False
        ):
            # The fused VGG chain's kernels implement average pooling only
            # (the 2x2 row-pair mean folds into the conv epilogues;
            # api._block1_structurally_eligible): max pooling runs the XLA
            # path. Say so — a user benchmarking --pooling max would
            # otherwise conclude the framework is ~2-3x slower than
            # advertised with no hint why.
            warnings.warn(
                f"pooling={self.pooling!r} disables the fused Pallas VGG "
                f"chain (its kernels fold 2x2 AVERAGE pooling into the conv "
                f"epilogues); this run uses the XLA path, ~2-3x slower at "
                f"the kernel tier. Use pooling='average' (the reference "
                f"default) for full speed",
                stacklevel=2,
            )
        if (
            not grid_snap
            and cfg.use_fused
            and jax.default_backend() == "tpu"
            and schedule_mod.snap_to_fused_grid(delivered) != delivered
        ):
            warnings.warn(
                f"size {delivered} is off the fused kernel grid (W % 32/64/"
                f"128 for blocks 1-2/3/4 — ops/pallas/vmem.py): the Pallas "
                f"kernel tier falls back to XLA (~2-3x slower). Nearest "
                f"fused-friendly size: "
                f"{schedule_mod.snap_to_fused_grid(delivered)}; or pass "
                f"grid_snap=True to snap automatically",
                stacklevel=2,
            )
        if jax.default_backend() == "tpu":
            n_dev = self.mesh.devices.size if self.mesh is not None else 1
            sizes = []
            for s in plan:
                sizes.append(s.size)
                for st_t in style_ts:
                    sizes.append(
                        _style_size(st_t.shape[1:3], s.size, cfg.style_scale)
                    )
            over = resolution_ceiling_excess(sizes, n_dev)
            if over is not None:
                hw_max = TPU_MAX_TENSOR_ELEMENTS * n_dev // 64
                raise ValueError(
                    f"size {over} exceeds the single-device TPU resolution "
                    f"ceiling: its block-1 activation ({over[0]}x{over[1]}x64 "
                    f"= {over[0] * over[1] * 64 / 2 ** 31:.2f} * 2^31 elements "
                    f"per device) crashes the XLA:TPU compiler (empirical "
                    f"boundary: 5632^2 compiles, 5888^2 does not — "
                    f"api.TPU_MAX_TENSOR_ELEMENTS). With {n_dev} device(s) "
                    f"H*W must stay <= {hw_max} (square <= "
                    f"{int(hw_max ** 0.5)}px). Shard over a mesh "
                    f"(StyleTransfer(mesh=...)) — H-sharding divides exactly "
                    f"this tensor — or reduce --size / --style-scale."
                )
        key = jax.random.PRNGKey(cfg.seed)
        image: Optional[jnp.ndarray] = None

        # ---- pipeline XLA compiles: scale k+1..N compile while scale k runs.
        # Worker threads lower+compile each later scale's programs; the
        # persistent compilation cache (enabled below) hands the results to
        # the main loop's jit calls, which then deserialize instead of
        # recompiling. Best-effort: any warming failure leaves the normal
        # compile path untouched.
        warm_key = (
            self._prog_key(cfg),
            tuple((s.size, s.iterations) for s in plan),
            cfg.chunk_size,
            cfg.style_scale,
            content_t.shape,
            tuple(s.shape for s in style_ts),
        )
        warm_cancel = None
        if (
            cfg.warm_compile
            and self.mesh is None
            and len(plan) > 1
            and warm_key not in self._warmed_keys
        ):
            self._warmed_keys[warm_key] = True
            # FIFO eviction only re-enables a redundant warm, never breaks one
            while len(self._warmed_keys) > self._warmed_keys_max:
                self._warmed_keys.popitem(last=False)
            _ensure_compile_cache()

            params_aval = jax.tree_util.tree_map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), self.params
            )
            content_full_aval = jax.ShapeDtypeStruct(content_t.shape, jnp.float32)
            style_full_avals = [
                jax.ShapeDtypeStruct(st.shape, jnp.float32) for st in style_ts
            ]

            def _warm_scale(scale, prev_size, cancel):
                h, w = scale.size
                img_aval = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
                steps = [lambda: upsample.lower(content_full_aval, size=(h, w)).compile()]
                if prev_size is not None:
                    prev_aval = jax.ShapeDtypeStruct((1, *prev_size, 3), jnp.float32)
                    steps.append(lambda: upsample.lower(prev_aval, size=(h, w)).compile())
                steps.append(lambda: capture_content.lower(params_aval, img_aval).compile())
                seen = set()
                for st_aval in style_full_avals:
                    ssize = _style_size(st_aval.shape[1:3], (h, w), cfg.style_scale)
                    if ssize in seen:
                        continue
                    seen.add(ssize)
                    steps.append(
                        lambda a=st_aval, s=ssize: upsample.lower(a, size=s).compile()
                    )
                    s_aval = jax.ShapeDtypeStruct((1, *ssize, 3), jnp.float32)
                    steps.append(
                        lambda a=s_aval: capture_style.lower(params_aval, a).compile()
                    )
                c_t_aval = jax.eval_shape(capture_content, params_aval, img_aval)
                # gram shapes are style-size independent; any captured size works
                g_aval = jax.eval_shape(
                    capture_style,
                    params_aval,
                    jax.ShapeDtypeStruct((1, *next(iter(seen)), 3), jnp.float32),
                )
                s_t_aval = {
                    l: jax.ShapeDtypeStruct(g.shape, jnp.float32)
                    for l, g in g_aval.items()
                }
                opt_aval = jax.eval_shape(init_opt_state, img_aval)
                ema_aval = (
                    img_aval
                    if cfg.avg_decay > 0
                    else jax.ShapeDtypeStruct((1, 1, 1, 3), jnp.float32)
                )
                snapshot = _pipeline_auto(cfg, h * w)  # warmer is mesh-None only
                for n in sorted(set(chunk_lengths(scale.iterations, cfg.chunk_size))):
                    steps.append(
                        lambda n=n: run_chunk.lower(
                            params_aval, img_aval, ema_aval, opt_aval, c_t_aval,
                            s_t_aval, n=n, snapshot=snapshot,
                        ).compile()
                    )
                for step in steps:
                    if cancel.is_set():
                        return
                    step()

            # Daemon threads, not a ThreadPoolExecutor: executor workers are
            # non-daemon and are joined at interpreter exit, so an early
            # return/exception would leave the process hanging on in-flight
            # multi-minute XLA compiles. Daemon threads die with the process;
            # the cancel event stops them between compile steps.
            warm_cancel = threading.Event()
            warm_pool = [
                threading.Thread(
                    target=_safe_warm,
                    args=(_warm_scale, scale, plan[i - 1].size, warm_cancel),
                    name=f"st-warmc-{scale.index}",
                    daemon=True,
                )
                for i, scale in enumerate(plan[1:], start=1)
            ]
            for t in warm_pool:
                t.start()

        completed_ok = False
        try:
            # --resume: skip completed scales, restore image + optimizer state
            # (SURVEY.md section 5, checkpoint/resume).
            resume_scale = resume_iters = -1
            resume_opt_leaves = None
            if resume_state is not None:
                resume_scale = int(resume_state["scale_index"])
                resume_iters = int(resume_state["iteration"])
                resume_opt_leaves = list(resume_state["opt_state_leaves"])
                if resume_scale >= len(plan):
                    raise ValueError(
                        f"checkpoint at scale {resume_scale} but plan has {len(plan)} scales"
                    )

            for scale in plan:
                if scale.index < resume_scale:
                    continue
                h, w = scale.size
                content_s = upsample(content_t, size=(h, w))
                c_targets = capture_content(self.params, content_s)

                gram_list: Dict[str, list] = {l: [] for l in cfg.style_layers}
                for st in style_ts:
                    st_s = upsample(st, size=_style_size(st.shape[1:3], (h, w), cfg.style_scale))
                    grams = capture_style(self.params, st_s)
                    for l in cfg.style_layers:
                        gram_list[l].append(grams[l])
                s_targets = {l: L.blend_grams(gs, blend) for l, gs in gram_list.items()}
                s_targets = mesh_mod.replicate(s_targets, self.mesh)

                averaging = cfg.avg_decay > 0
                if scale.index == resume_scale:
                    image = mesh_mod.shard_image(
                        jnp.asarray(resume_state["image"], jnp.float32), self.mesh
                    )
                    if image.shape != (1, h, w, 3):
                        raise ValueError(
                            f"checkpoint image shape {image.shape} does not match "
                            f"scale {scale.index} shape (1, {h}, {w}, 3)"
                        )
                    opt_state = restore_opt_state(init_opt_state(image), resume_opt_leaves)
                    done_iters = min(resume_iters, scale.iterations)
                    if averaging:
                        ema = mesh_mod.shard_image(
                            jnp.asarray(
                                resume_state.get("ema", resume_state["image"]),
                                jnp.float32,
                            ),
                            self.mesh,
                        )
                else:
                    if image is None:
                        image = self._init_image(cfg, content_s, init_image, key, (h, w))
                        # jnp.copy: image and ema are both donated to run_chunk
                        # and must not alias the same buffer.
                        ema = jnp.copy(image) if averaging else None
                    else:
                        image = upsample(image, size=(h, w))
                        if averaging:
                            ema = upsample(ema, size=(h, w))
                    image = mesh_mod.shard_image(image, self.mesh)
                    if averaging:
                        ema = mesh_mod.shard_image(ema, self.mesh)
                    opt_state = init_opt_state(image)
                    done_iters = 0
                if not averaging:
                    # the program still threads an (unused) ema carry; keep it
                    # trivially small so the default path pays nothing.
                    ema = jnp.zeros((1, 1, 1, 3), jnp.float32)

                # ---- per-scale chunked optimize loop.
                #
                # Pipelined (default): chunk k+1 is dispatched *before* chunk
                # k's losses are fetched, so per-chunk host work (the loss
                # fetch round-trip, callbacks, Python) overlaps device
                # compute instead of idling it — measured ~70 ms/chunk of
                # host overhead over the device transport, i.e. most of the
                # wall-clock at small scales. Semantics match the sequential
                # loop exactly: chunk k's pre-donation outputs are kept as
                # device-side copies, so an early stop decided at chunk k
                # discards the speculative chunk k+1 and restores k's state,
                # and ProgressEvent.get_state reads the copies rather than
                # the donated buffers.
                n_dev = self.mesh.devices.size if self.mesh is not None else 1
                pipeline = _pipeline_auto(cfg, h * w // n_dev)

                prev_mean = None
                stall = 0
                t_prev = 0.0

                def _process(rec: "_PendingChunk") -> bool:
                    """Fetch a dispatched chunk's losses, run debug checks,
                    the early-stop decision, and the callback. Returns True
                    when the run should stop after this chunk."""
                    nonlocal prev_mean, stall, t_prev
                    losses = {
                        k: np.asarray(v) for k, v in jax.device_get(rec.loss_seq).items()
                    }
                    now = time.perf_counter()
                    dt = now - t_prev
                    t_prev = now

                    if cfg.debug_checks:
                        bad = {k: v for k, v in losses.items() if not np.isfinite(v).all()}
                        if bad:
                            raise FloatingPointError(
                                f"non-finite loss terms {sorted(bad)} at scale "
                                f"{scale.index} ({h}x{w}), iteration {rec.done_iters}"
                            )

                    # Early-stop decision comes BEFORE the callback so the
                    # final event of an early-stopped run carries done=True
                    # (snapshot savers and the web UI key off it).
                    stop = False
                    if cfg.stop_tol > 0:
                        mean_loss = float(np.mean(losses["loss"]))
                        if prev_mean is not None:
                            rel = abs(prev_mean - mean_loss) / max(abs(prev_mean), 1e-12)
                            stall = stall + 1 if rel < cfg.stop_tol else 0
                            stop = stall >= cfg.stop_patience
                        prev_mean = mean_loss

                    if callback is not None:
                        is_last = scale.index == plan[-1].index and (
                            rec.done_iters >= scale.iterations or stop
                        )

                        def _state(
                            img=rec.image, opt=rec.opt_state, it=rec.done_iters,
                            sc=scale.index, em=rec.ema,
                        ):
                            state = {
                                "image": np.asarray(jax.device_get(img)),
                                "opt_state_leaves": flatten_opt_state(opt),
                                "scale_index": np.asarray(sc),
                                "iteration": np.asarray(it),
                            }
                            if em is not None:
                                state["ema"] = np.asarray(jax.device_get(em))
                            return state

                        callback(
                            ProgressEvent(
                                scale_index=scale.index,
                                num_scales=len(plan),
                                size=(h, w),
                                iteration=rec.done_iters,
                                total_iterations=scale.iterations,
                                losses=losses,
                                its_per_sec=rec.n / dt if dt > 0 else float("inf"),
                                get_image=lambda s=rec.snap: np.asarray(jax.device_get(s)),
                                done=is_last,
                                get_state=_state,
                            )
                        )
                    return stop

                # Up to _PIPELINE_DEPTH chunks stay in flight: on
                # high-latency transports one chunk ahead is not enough at
                # small scales (host round-trips per chunk exceed the
                # device's chunk time), so the device would still starve
                # between chunks. Every chunk carries its own state
                # snapshot (extra run_chunk outputs), so the record is
                # complete at dispatch and survives later donations.
                queue: deque = deque()
                stopped = False
                while done_iters < scale.iterations:
                    n = min(cfg.chunk_size, scale.iterations - done_iters)
                    if not queue:
                        t_prev = time.perf_counter()
                    image, ema, opt_state, loss_seq, state = run_chunk(
                        self.params, image, ema, opt_state, c_targets, s_targets,
                        n=n, snapshot=pipeline,
                    )
                    done_iters += n
                    if pipeline:
                        snap, img_c, ema_c, opt_c = state
                    else:
                        # sequential: each chunk is processed before the next
                        # dispatch donates these, so the primaries are safe
                        (snap,) = state
                        img_c, ema_c, opt_c = image, ema, opt_state
                    queue.append(
                        _PendingChunk(
                            n=n, done_iters=done_iters, loss_seq=loss_seq,
                            snap=snap, image=img_c,
                            # without averaging, ema is the dummy (1,1,1,3)
                            # carry — keep it out of checkpoint state
                            ema=ema_c if averaging else None,
                            opt_state=opt_c,
                        )
                    )
                    depth = _PIPELINE_DEPTH if pipeline else 0
                    while len(queue) > depth:
                        rec = queue.popleft()
                        if _process(rec):
                            # Early stop decided at this chunk: discard any
                            # speculative in-flight chunks, restore its state.
                            image = rec.image
                            if averaging:
                                ema = rec.ema
                            done_iters = rec.done_iters
                            queue.clear()
                            stopped = True
                            break
                    if stopped:
                        break

                # Drain the in-flight chunks (pipelined mode); stop
                # decisions are moot — the scale is complete either way.
                while queue:
                    _process(queue.popleft())

            result = ema if cfg.avg_decay > 0 else image
            if tuple(result.shape[1:3]) != delivered:
                # grid_snap optimized at a fused-grid size: restore the
                # exact requested size on device (lanczos3, same resampler
                # as every inter-scale upsample).
                result = upsample(result, size=delivered)
            if output_dtype == "uint8":
                final = np.asarray(jax.device_get(imgio.quantize_u8(result)))
            else:
                final = np.clip(np.asarray(jax.device_get(result))[0], 0.0, 1.0)
            completed_ok = True
            return final
        finally:
            if warm_cancel is not None:
                warm_cancel.set()
                if not completed_ok:
                    # the cancel aborts warm threads between compile steps;
                    # un-mark the key so a retry warms the missing scales
                    self._warmed_keys.pop(warm_key, None)

    # ---------------------------------------------------------------- misc

    def _init_image(self, cfg, content_s, init_image, key, size):
        h, w = size
        if init_image is not None:
            img = imgio.to_nhwc(init_image)
            return imgio.resize_image(img, (h, w))
        if cfg.init == "content":
            return content_s
        if cfg.init == "random":
            noise = jax.random.uniform(key, (1, h, w, 3), jnp.float32, 0.0, 1.0)
            return noise
        if cfg.init == "mean":
            return jnp.full((1, h, w, 3), 0.5, jnp.float32)
        raise ValueError(f"unknown init mode {cfg.init!r}")
def _ensure_compile_cache() -> None:
    """Enable the persistent XLA compilation cache if the user hasn't.

    The cache both de-duplicates compiles across processes (bench reruns,
    CLI invocations) and is the hand-over channel for the background
    compile pipeline in :meth:`StyleTransfer.stylize`.

    JAX deserializes and runs executables from this directory, so it must be
    private to the user: a world-writable shared path (e.g. /tmp) would let
    another local user pre-seed poisoned executables. Use a 0700 per-user
    cache dir and refuse directories we don't own.
    """
    import os

    try:
        if jax.config.jax_compilation_cache_dir is not None:
            return
        base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache"
        )
        path = os.path.join(base, "style_transfer_tpu", "xla")
        os.makedirs(path, mode=0o700, exist_ok=True)
        if os.stat(path).st_uid != os.getuid():
            return
        os.chmod(path, 0o700)
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache even fast compiles (default threshold is 1s): programs that
        # lower quickly must still land in the cache or the warm-compile
        # hand-over silently misses them.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass


def _safe_warm(fn, *args) -> None:
    """Run a warm-compile task, swallowing errors (warming is best-effort)."""
    try:
        fn(*args)
    except Exception:
        pass
