"""Scoped-VMEM dispatch gates for the Pallas kernel tier.

Mosaic allocates each kernel's body temporaries (the halo concats, the
fp32 tap accumulators and their per-chunk products, the ReLU/edge-mask
intermediates) from a 16 MiB "scoped VMEM" stack; a kernel whose body
peak exceeds it fails to COMPILE ("Scoped allocation with size ... and
limit 16.00M exceeded"). Round 3 gated dispatch on an activation-width
heuristic (``w*c/64 <= 2048`` per W-chunk) that modeled only the fp32
accumulators W-chunking shrinks; the full-width bf16 body values it
ignored (the row-extended concats ``pe``/``y1e``/``dy2``/``da2``/
``dpre1``, which chunking CANNOT shrink because the 3x3 taps reach
across chunk edges) put every pair/block-1 kernel at effective width
4096 over the limit in at least one direction. This module replaces
that heuristic with per-kernel, per-direction gates pinned to the
HARDWARE-measured envelope below, plus byte estimators that document
the structural reason.

Measured envelope (v5e, this machine, round 4 probes — the same table
is asserted by ``tests/test_vmem.py`` and re-checkable on hardware via
``scripts/validate_kernels.py``). "eff" = w * c_out / 64, the per-row
VMEM cost normalization; shapes are the natural block shapes of the
512..4096px multi-scale ladder:

==========  =====================  ====  ===========  ===========
kernel      shape (w, cin, cmid)    eff  forward      backward
==========  =====================  ====  ===========  ===========
pair        every eff<=2048 shape  2048  ok           ok
            with w % 16 == 0
pair        2048,  64, 128 (b2)    4096  ok           FAIL 17.70M
pair        1024, 128, 256 (b3f)   4096  ok           FAIL 19.91M
pair        1024, 256, 256 (b3t)   4096  FAIL 17.51M  FAIL
pair        512,  512, 512 (b4f)   4096  FAIL 21.00M  FAIL
pair        512,  512, 512 (b4t)   4096  FAIL 17.83M  FAIL
pair        260,   64, 128          520  FAIL 20.20M  --
pair        264,   64, 128          528  ok (504 s!)  ok (3.7 s)
pair        272,   64, 128          544  ok (2.8 s)   ok (2.9 s)
single      260,   64, 128 (gram)   520  ok (16.9 s)  ok (17.3 s)
pair        264@h512, 64, 128       528  ok (102 s)   ok
single      264@h512, 64, 128       528  ok (156 s)   ok
block1      w2=2048 (4096px)       4096  ok           FAIL 17.79M
block1      w2<=1024               2048  ok           ok
conv_gram   256, 512, 512          2048  ok           ok
conv_gram   512, 512, 512          4096  ok (127 s)   ok
single      every probed shape,    4096  ok           ok
            eff <= 4096
single      2048, 128, 256 (8K b3) 8192  FAIL 20.00M  --
single      1024, 512, 512 (8K b4) 8192  FAIL 16.50M  --
==========  =====================  ====  ===========  ===========

**Sublane alignment is part of the envelope.** The three 260/264/272
rows are the round-4 misalignment probe: widths off the 16-row bf16
sublane grid (W is the second-minor axis of every NHWC kernel operand,
so Mosaic tiles it in 16-row bf16 sublanes) make both the VMEM peak and
the compile time unpredictable — at w=260 a shape whose eff (520) sits
at a QUARTER of the pair envelope fails scoped VMEM at 20.20M, and at
w=264 (8-multiple but not 16) the forward compiles for 504 seconds.
The round-5 ``@h512`` rows re-probe w=264 at a production height (the
block-2 1024px-ladder height): there the kernels compile CORRECTLY and
run faster than XLA (pair 1.32x, singles 1.11x — VALIDATE_r05), but
compile time stays pathological (102 s and 156 s vs ~3 s aligned), so
the verdict is unchanged: misaligned widths stay off the kernels — a
multi-scale ladder would pay minutes of unpredictable Mosaic compile
per kernel per scale — and ``schedule.snap_to_fused_grid`` moves the
ladder onto the grid instead, where both the speed and the ~3 s
compiles are guaranteed.
Only w % 16 == 0 restores both the measured envelope and sane (~3 s)
compile times, so every gate below requires ``_aligned(w)``; misaligned
widths (e.g. the w=650 block-2 segment of a 1300px stylization) fall
back to XLA, which handles any shape at predictable compile cost. The
alignment gate is scoped to real Mosaic compiles (``_mosaic()``):
off-TPU, Pallas runs in interpret mode, where neither the scoped-VMEM
stack nor the misalignment pathology exists, so forced
(``packed_block*=True``) interpret-mode dispatch keeps working at any
width — the kernel test suite depends on that, and tests that pin the
HARDWARE gating do it via the explicit ``tpu=True`` kwarg. The
singles DID compile at w=260, but at ~17 s per direction per kernel —
an unbounded-feeling stall multiplied across ~8 kernels x scales — so
they are gated to the aligned grid too. Sub-tile widths (w < 16, one
padded sublane tile) stay in: the driver's 64px-image compile contract
has exercised pair@8 and conv_gram@4 on hardware every round.

**The envelope is measured in the chain's layout context.** Mosaic
compiles after XLA layout assignment (``needs_layout_passes``), so the
same kernel at the same shape can peak differently depending on what
produces its input. A round-5 bisect on v5e: ``pair_pool`` at the
1024px block-4 shape (1,128,128,512) fails scoped VMEM at 18.03M
(grad) / 21.53M (fwd-only) when its input is a raw **jit parameter**,
yet compiles in ~10 s when the input is any on-device intermediate —
which is the only way the api chain ever calls a kernel (every input
is an upstream kernel/preprocess output). A layout-transparent
``optimization_barrier`` does NOT restore the envelope; a real
producer op does. The gates below therefore model the chain's
(intermediate-input) envelope, and ``scripts/validate_kernels.py``
probes chain-style by default (``--param-input`` reproduces the
parameter-layout variant).

The pattern: at eff 4096 the H-tile bottoms out at 2 rows, so the
kernels' fixed +2/+4 extension rows stop amortizing — a pair/block-1
BODY alone (one ~(tile+4)-row bf16 value per pipeline stage, ~5 stages,
plus two fp32 chunk accumulators) crosses 16 MiB, and the two-conv
structure gives Mosaic nothing to free mid-body. The single-conv
kernels (``conv_single.py``) carry half that body (one conv per pass,
gate recomputed from the stored activation instead of an int8-mask
input) and fit the same shapes with ~5 MiB of headroom, so dispatch
decomposes a pair into two singles where the pair envelope ends — and
already AT its edge (eff 2048), where a full-step A/B measured the lean
singles bodies 18% faster than the pair (``segment_impl`` docstring).
"""

from __future__ import annotations

import jax

from style_transfer_tpu.ops.pallas.block1_packed import _w_chunks

#: Mosaic's per-kernel scoped-VMEM budget on v5e (bytes).
SCOPED_LIMIT = 16 * 2**20

#: Effective width (w * c_out / 64) up to which BOTH directions of the
#: two-conv kernels (pairs, packed block 1) are compile-validated.
PAIR_EFF_LIMIT = 2048

#: bf16 sublane tile on the W (second-minor) axis. Widths off this grid
#: void the measured envelope (module docstring, misalignment probe):
#: w=260 fails scoped VMEM at a quarter of the eff limit, w=264 takes
#: 504 s to compile. Every gate requires ``_aligned(w)``.
SUBLANE = 16


def _mosaic() -> bool:
    """Whether dispatched kernels will really be compiled by Mosaic.
    Off-TPU, Pallas runs in interpret mode (each kernel module's
    ``_interpret()``): there is no scoped-VMEM stack and no sublane-
    misalignment compile pathology, so the alignment gate must not
    apply — forced (``packed_block*=True``) interpret-mode dispatch,
    which the kernel test suite relies on, keeps working at any width.
    Tests pin the TPU behavior from CPU via the ``tpu=`` gate kwarg."""
    return jax.default_backend() == "tpu"


def _aligned(w: int, tpu: bool | None = None) -> bool:
    """Widths the measured envelope is valid for: multiples of the bf16
    sublane tile, plus sub-tile widths (w < 16, one padded tile — the
    driver's 64px-image compile contract has exercised pair kernels at
    block-4 width 8 on hardware every round). Large off-grid widths are
    the pathology (module docstring) — but ONLY under a real Mosaic
    compile: in interpret mode every width is fine, so off-TPU this
    returns True unless ``tpu=True`` pins the hardware semantics."""
    if not (_mosaic() if tpu is None else tpu):
        return True
    return w % SUBLANE == 0 or w < SUBLANE

#: Effective width up to which the single-conv kernels (conv_single,
#: conv_gram) are compile-validated, per W-chunk after splitting.
SINGLE_EFF_LIMIT = 4096


def _eff(w: int, cout: int) -> int:
    return w * cout // 64


def pair_fits(
    w: int, cin: int, cmid: int, *, pool: bool, gram: bool,
    tpu: bool | None = None,
) -> bool:
    """True when the conv-pair kernel (``conv_pair.py`` /
    ``block2.py``) compiles at this shape in BOTH directions.

    The measured envelope is eff <= 2048 regardless of cin/pool/gram:
    every eff-2048 shape of the production ladder passes both ways
    (including block 4's 9.4 MB of weights — constant operands ride the
    pipeline window allocation, not the scoped stack), and every
    eff-4096 shape fails at least one way (table above). The envelope
    only holds on the 16-row sublane grid (module docstring): w=260
    fails scoped VMEM at eff 520 and w=264 compiles for 504 s, so
    misaligned widths are out regardless of eff."""
    del cin, pool, gram  # direction-worst-case is eff-determined
    return _aligned(w, tpu) and _eff(w, cmid) <= PAIR_EFF_LIMIT


def single_fits(
    w: int, cin: int, cout: int, *, pool: bool, gram: bool,
    tpu: bool | None = None,
) -> bool:
    """True when the single-conv kernel (``conv_single.py``) compiles at
    this shape in both directions: eff <= 4096 (probed at every 4096px-
    scale block shape) AND the width W-chunks cleanly to eff <= 2048 per
    fp32 accumulator chunk (``_w_chunks``; a width that cannot split —
    e.g. 2047 — would compile the accumulator full-width). Misaligned
    widths compiled in the probe (w=260: ok) but at ~17 s per direction
    per kernel vs ~3 s aligned, so the gate keeps them on XLA (module
    docstring)."""
    del cin, gram
    if not _aligned(w, tpu):
        return False
    eff = _eff(w, cout)
    if eff <= 2048:
        return True
    if eff > SINGLE_EFF_LIMIT:
        return False
    n = _w_chunks(w, cout)
    if eff // n > 2048:
        return False
    if pool and n > 1 and (w // n) % 2:
        return False
    return True


#: Halo columns each side of a wide-dispatch W slice (conv_single.
#: make_wide_single). 8 columns = half a sublane tile, so owned widths
#: on the 16 grid keep every slice width on the 16 grid; the conv's
#: column reach is 1, the backward's dpre reach adds 1 more, and the
#: remaining 6 columns absorb the kernels' own SAME-padded slice-edge
#: garbage with even (pool-pairable) alignment to spare.
WIDE_HALO = 8

#: Largest W-slice count the wide dispatch will try. 8 slices take the
#: largest conceivable per-slice eff (SINGLE_EFF_LIMIT-bounded) down 8x;
#: past that the per-slice halo overhead (16/ow columns) stops being
#: negligible and the shape is better served by the mesh axis.
WIDE_MAX_SLICES = 8


def wide_owned(w: int, n: int) -> int:
    """Owned columns per W slice when ``w`` splits into ``n`` wide
    slices: ceil(w / n) rounded UP to the sublane grid, so every slice
    width (owned + 2 * WIDE_HALO) stays 16-aligned and n * owned covers
    w (the tail slice's surplus is zero-padded and Gram-masked)."""
    a = -(-w // n)
    return -(-a // SUBLANE) * SUBLANE


def wide_slices(
    w: int, cin: int, cout: int, *, pool: bool, gram: bool,
    tpu: bool | None = None,
):
    """W-slice count for the wide-singles dispatch
    (``conv_single.make_wide_single``), or ``None``.

    The single kernels' measured envelope ends at eff 4096 (the probed
    8K block shapes fail scoped VMEM: (2048, .., 256) at 20.00M,
    (1024, .., 512) at 16.50M — module table). Beyond it the wide
    dispatch splits W at the JAX level into ``n`` slices of
    ``ceil16(w/n)`` owned columns + ``WIDE_HALO`` halo columns each
    side, every slice back inside the single envelope; this gate
    returns the smallest such ``n`` (>= 2). ``None`` when the plain
    single already fits (callers should prefer it — no halo overhead)
    or when no slice count lands inside the envelope."""
    if not _aligned(w, tpu):
        return None
    if single_fits(w, cin, cout, pool=pool, gram=gram, tpu=tpu):
        return None
    for n in range(2, WIDE_MAX_SLICES + 1):
        ow = wide_owned(w, n)
        if single_fits(ow + 2 * WIDE_HALO, cin, cout, pool=pool,
                       gram=gram, tpu=tpu):
            return n
    return None


def segment_impl(
    w: int, cin: int, cmid: int, *, pool: bool, gram: bool,
    tpu: bool | None = None,
):
    """Implementation choice for one two-conv block segment
    (conv a: cin->cmid [+Gram], conv b: cmid->cmid [+pool]):
    ``'pair'`` (fused two-conv kernel), ``'singles'`` (two single-conv
    kernels), ``'wide'`` (two W-tiled singles — eff > 4096, the
    5120..8192px ladders), or ``None`` (XLA).

    Singles are not just the beyond-the-pair-envelope fallback: AT the
    pair envelope's edge (eff 2048, the 2048px ladder's shapes) both
    forms compile but both bottom out at the same halved 2-row backward
    tile, and there the pair's larger fused body schedules worse than
    two lean bodies — full-step A/B on v5e (round 4): singles 16.18 it/s
    vs pairs 13.72 at 2048px (+18%). Below that (eff < 2048; in the
    power-of-two ladders that means eff <= 1024, where 8-row tiles
    amortize the halos) the pair's saved mid-activation HBM round-trip
    wins, so pairs keep those shapes."""
    eff = _eff(w, cmid)
    if eff < PAIR_EFF_LIMIT and pair_fits(
        w, cin, cmid, pool=pool, gram=gram, tpu=tpu
    ):
        return "pair"
    if single_fits(
        w, cin, cmid, pool=False, gram=gram, tpu=tpu
    ) and single_fits(w, cmid, cmid, pool=pool, gram=False, tpu=tpu):
        return "singles"
    # pair_fits ⊂ single_fits here: a shape the pair envelope admits at
    # eff == PAIR_EFF_LIMIT (the only eff the first branch skipped) is
    # inside the singles envelope too, so the singles branch above has
    # already taken it — no trailing pair fallback exists.
    def _coverable(cin_, pool_, gram_):
        # the wide wrapper runs a conv that fits plainly as ONE slice,
        # so per-conv coverage is single OR wide
        return single_fits(
            w, cin_, cmid, pool=pool_, gram=gram_, tpu=tpu
        ) or wide_slices(
            w, cin_, cmid, pool=pool_, gram=gram_, tpu=tpu
        ) is not None

    if _coverable(cin, False, gram) and _coverable(cmid, pool, False):
        # Beyond the single envelope (eff > 4096 — the 5120..8192px
        # ladders' block shapes): W-tiled singles, each slice back
        # inside the measured envelope (conv_single.make_wide_single).
        return "wide"
    return None


def block1_fits(w_img: int, tpu: bool | None = None) -> bool:
    """True when the packed block-1 kernel (``block1_packed.py``)
    compiles at this image width in BOTH directions. Forward passes
    through w2 = 2048 (the 4096px scale); the one-pass backward needs
    its W-chunk escalation there (17.79M scoped at the forward's 2
    chunks, fits at ``_w_chunks_bwd``'s 8 — see that docstring), so the
    envelope is eff <= 4096 AND the backward escalation must land its
    fp32 accumulator chunks at the probed eff <= 512 (a width that
    cannot split, e.g. w2 = 2047, stays on XLA)."""
    from style_transfer_tpu.ops.pallas.block1_packed import _w_chunks_bwd

    w2 = w_img // 2
    if not _aligned(w2, tpu):  # kernel width = packed half-width (docstring)
        return False
    eff = _eff(w2, 128)
    if eff <= PAIR_EFF_LIMIT:
        return True
    if eff > SINGLE_EFF_LIMIT:
        return False
    return eff // _w_chunks_bwd(w2, 128) <= 512


def conv_gram_fits(w: int, cout: int, tpu: bool | None = None) -> bool:
    """True when the fused conv+Gram kernel (``conv_gram.py``) compiles
    at this shape in both directions (validated at eff 2048 = the
    4096px scale's conv5_1; it has no W-chunked form — beyond it the
    dispatch decomposes to the W-chunked single kernel, see
    :func:`gram_tail_impl`). Sublane-aligned widths only, like every
    gate (module docstring)."""
    return _aligned(w, tpu) and _eff(w, cout) <= PAIR_EFF_LIMIT


def gram_tail_impl(w: int, cout: int, tpu: bool | None = None):
    """Implementation choice for a Gram-only conv tail (conv5_1 when it
    is the sole remaining style layer): ``'conv_gram'`` (the fused
    conv+Gram kernel, ``conv_gram.py``) inside its envelope,
    ``'single'`` (the W-chunked single kernel with the activation
    discarded, ``conv_single.gram_tail``) beyond it — an 8192px run's
    conv5_1 (w=512, eff 4096) lands there — or ``None`` (XLA)."""
    if conv_gram_fits(w, cout, tpu):
        return "conv_gram"
    if single_fits(w, cout, cout, pool=False, gram=True, tpu=tpu):
        return "single"
    return None


# --------------------------------------------------------- byte estimators
#
# Structural estimates of the kernel-BODY peak Mosaic allocates from the
# scoped stack. These document the mechanism (what scales, what
# chunking can and cannot shrink) and reproduce the measured backward
# numbers within ~1.5 MB; the forward peaks depend on Mosaic scheduling
# details (how many of the 9 tap patches are in flight) that a static
# sum cannot pin down, which is why the GATES above use the measured
# envelope rather than these estimates.


def pair_bwd_scoped_bytes(w: int, cin: int, cmid: int, *, pool: bool,
                          gram: bool) -> int:
    """Estimated backward body peak for a conv-pair kernel. Measured:
    17.70M at (2048, 64, 128, pool, gram) — estimate 17.5M; 19.91M at
    (1024, 128, 256, gram) — estimate 17.5M + the gram S-product."""
    from style_transfer_tpu.ops.pallas.conv_pair import _tile_for

    tile = _tile_for(w, cmid, backward=True)
    n = _w_chunks(w, cmid)
    cw = w // n
    it = 2  # bf16
    m2e = (tile + 4) * w * cmid                    # int8 mask concat
    dy2 = (tile + 4) * w * cmid * it               # unpooled cotangent
    da2 = (tile + 4) * w * cmid * it               # gated cotangent
    r1e = (tile + 2) * w * cmid * it               # residual concat
    acc = (tile + 2) * cw * cmid * 4               # fp32 tap accumulator
    g = (tile + 2) * cw * cmid * 4 if gram else 0  # fp32 Gram term
    dpre1 = (tile + 2) * w * cmid * it             # mid cotangent
    return m2e + dy2 + da2 + r1e + 2 * acc + g + dpre1


def single_bwd_scoped_bytes(w: int, cin: int, cout: int, *, pool: bool,
                            gram: bool) -> int:
    """Estimated backward body peak for a single-conv kernel — roughly
    half the pair's: one activation concat (the gate source), one
    cotangent concat, one dpre, one fp32 accumulator chunk."""
    from style_transfer_tpu.ops.pallas.conv_pair import _tile_for

    tile = _tile_for(w, cout, backward=True)
    n = _w_chunks(w, cout)
    cw = w // n
    it = 2
    ye = (tile + 2) * w * cout * it
    de = (tile + 2) * w * cout * it
    dpre = (tile + 2) * w * cout * it
    acc = tile * cw * cin * 4
    g = (tile + 2) * cw * cout * 4 if gram else 0
    return ye + de + dpre + 2 * acc + g
