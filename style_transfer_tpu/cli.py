"""Command-line interface.

Mirrors the reference's argparse surface (SURVEY.md section 2 row 1,
reconstructed: content/style paths, output, size, weights, layers, devices,
iterations, seed, init, web port) and maps flags 1:1 onto
:class:`style_transfer_tpu.api.StylizeConfig`. Kept deliberately thin so a
backfilled real reference CLI is a rename-level change (SURVEY.md section 7,
hard part 6).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from style_transfer_tpu.models.vgg import DEFAULT_CONTENT_LAYERS, DEFAULT_STYLE_LAYERS


class _ListLayers(argparse.Action):
    """--list-layers: print each architecture's capturable layers and exit."""

    def __init__(self, option_strings, dest, **kw):
        kw.setdefault("nargs", 0)
        super().__init__(option_strings, dest, **kw)

    def __call__(self, parser, namespace, values, option_string=None):
        from style_transfer_tpu.models.vgg import ARCH_BLOCKS, layer_names

        for arch in sorted(ARCH_BLOCKS):
            print(f"{arch}: " + " ".join(layer_names(arch)))
        parser.exit(0)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="style_transfer_tpu",
        description="TPU-native neural style transfer (Gatys VGG-19 family).",
    )
    from style_transfer_tpu import __version__

    p.add_argument("content", help="content image path")
    p.add_argument("styles", nargs="+", help="style image path(s)")
    p.add_argument("-o", "--output", default="out.png", help="output image path")
    p.add_argument("--version", action="version", version=f"%(prog)s {__version__}")
    p.add_argument("--list-layers", action=_ListLayers,
                   help="print capturable layer names per architecture and exit")

    g = p.add_argument_group("scales")
    g.add_argument("-s", "--size", type=int, default=512, help="final long side in px")
    g.add_argument("--min-scale", type=int, default=256, help="coarsest long side in px")
    g.add_argument("--scale-factor", type=float, default=2.0, help="per-scale growth factor")
    g.add_argument(
        "-i", "--iterations", type=int, nargs="+", default=[500],
        help="iterations per scale, coarse to fine (last repeats)",
    )

    g = p.add_argument_group("objective")
    g.add_argument("--content-weight", type=float, default=1.0)
    g.add_argument("--style-weight", type=float, default=256.0)
    g.add_argument("--tv-weight", type=float, default=2.0)
    g.add_argument("--content-layers", nargs="+", default=list(DEFAULT_CONTENT_LAYERS))
    g.add_argument("--style-layers", nargs="+", default=list(DEFAULT_STYLE_LAYERS))
    g.add_argument("--content-layer-weights", type=float, nargs="+", default=None)
    g.add_argument("--style-layer-weights", type=float, nargs="+", default=None)
    g.add_argument(
        "--style-blend-weights", type=float, nargs="+", default=None,
        help="relative weight per style image (multi-style Gram blending)",
    )
    g.add_argument("--style-scale", type=float, default=1.0,
                   help="style image long side relative to the current scale")
    g.add_argument("--pooling", choices=["average", "max"], default="average")

    g = p.add_argument_group("optimizer")
    g.add_argument("--optimizer", choices=["adam", "lbfgs"], default="adam")
    g.add_argument("--lr", "--learning-rate", dest="lr", type=float, default=0.05)
    g.add_argument("--lbfgs-memory", type=int, default=10)
    g.add_argument("--linesearch-tol", type=float, default=1e-3,
                   help="absolute epsilon on the L-BFGS Wolfe conditions "
                        "(absorbs bf16 gradient noise at megapixel sizes)")
    g.add_argument("--init", default="content",
                   help="'content', 'random', 'mean', or a path to an init image")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--avg-decay", type=float, default=0.0,
                   help="EMA decay for iterate averaging: the saved/displayed "
                        "image is a moving average of the optimizer iterates "
                        "(0 disables)")
    g.add_argument("--stop-tol", type=float, default=0.0,
                   help="relative per-chunk loss improvement below which a scale "
                        "stops early (0 disables; convergence-matched runs)")
    g.add_argument("--stop-patience", type=int, default=2)

    g = p.add_argument_group("model weights")
    g.add_argument("--weights", default=None,
                   help="VGG-19 .npz weights (see scripts/convert_weights.py)")
    g.add_argument("--random-weights", action="store_true",
                   help="use the deterministic random fixture (tests/benches)")
    g.add_argument("--arch", choices=["vgg19", "vgg16"], default="vgg19",
                   help="model family for --random-weights (.npz files carry "
                        "their own meta.arch)")

    g = p.add_argument_group("execution")
    g.add_argument("--devices", type=int, default=None,
                   help="shard spatially over the first N devices (default: all "
                        "when >1 device is visible; 0 disables sharding)")
    g.add_argument("--precision", choices=["bf16", "fp32"], default=None,
                   help="activation compute dtype (default: bf16 on TPU)")
    g.add_argument("--unfused", action="store_true",
                   help="disable the fused Pallas epilogue kernels (currently "
                        "the TV loss+gradient kernel; TPU single-device only) "
                        "and run the plain-XLA oracle objective everywhere")
    g.add_argument("--remat", choices=["auto", "on", "off"], default="auto",
                   help="recompute the VGG forward in the backward instead of "
                        "storing activations (auto: on at >=2560^2 px/device)")
    g.add_argument("--no-pipeline", action="store_true",
                   help="process chunks sequentially instead of dispatching "
                        "one chunk ahead (bit-identical results; only host "
                        "scheduling differs)")
    g.add_argument("--packed-block1", choices=["auto", "on", "off"], default="auto",
                   help="the W-pair-packed fused block-1 Pallas kernel "
                        "(auto: on for eligible single-device TPU runs — "
                        "see ARCHITECTURE.md for measured numbers)")
    g.add_argument("--packed-block2", choices=["auto", "on", "off"], default="auto",
                   help="the fused block-2 Pallas kernel (chains off the "
                        "packed block-1 kernel; same auto semantics)")
    g.add_argument("--packed-block3", choices=["auto", "on", "off"], default="auto",
                   help="the fused block-3 conv-pair Pallas kernels "
                        "(VGG-19 only; chains off block 2; same semantics)")
    g.add_argument("--packed-block4", choices=["auto", "on", "off"], default="auto",
                   help="the fused block-4 chain (front pair conv4_1+conv4_2 "
                        "+ tail pair conv4_3+conv4_4+pool4, then the conv5_1 "
                        "conv+Gram kernel when eligible); auto engages only "
                        "when the whole block can chain, 'on' additionally "
                        "forces the front pair alone (measured slower — see "
                        "ARCHITECTURE.md)")
    g.add_argument("--fused-block1", action="store_true",
                   help="EXPERIMENTAL: run VGG block 1 through the round-2 "
                        "fused Pallas kernel (measured slower in the full "
                        "step on v5e — see ARCHITECTURE.md)")
    g.add_argument("--grid-snap", choices=["auto", "on", "off"], default="auto",
                   help="snap the scale ladder onto the fused Pallas kernel "
                        "grid (W%%32/64/128 keeps blocks 1-2/3/4 fused) when "
                        "the requested size is off-grid; the optimizer runs "
                        "at the snapped sizes (<=4%% change) and the output "
                        "is resized back to the exact requested size (auto: "
                        "on for TPU runs unless --unfused)")
    g.add_argument("--chunk-size", type=int, default=50,
                   help="optimizer steps per device dispatch / host sync")
    g.add_argument("--print-every", type=int, default=25)

    g = p.add_argument_group("observability")
    g.add_argument("--web", action="store_true", help="serve a live progress page")
    g.add_argument("--port", type=int, default=8080, help="web monitor port")
    g.add_argument("--host", default="127.0.0.1", help="web monitor bind host")
    g.add_argument("--browser", action="store_true",
                   help="open the live progress page in the default browser "
                        "(implies --web)")
    g.add_argument("--snapshot-every", type=int, default=0,
                   help="save the in-progress image every N iterations (0 off)")
    g.add_argument("--metrics-out", default=None, help="write run metrics JSON here")
    g.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace into this directory")
    g.add_argument("--checkpoint-dir", default=None,
                   help="periodically checkpoint {image, opt state, schedule position}")
    g.add_argument("--checkpoint-every", type=int, default=200,
                   help="iterations between checkpoints (with --checkpoint-dir)")
    g.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --checkpoint-dir")
    g.add_argument("--debug-nans", action="store_true",
                   help="jax.config.jax_debug_nans: trap NaNs inside compiled code")
    g.add_argument("--debug-checks", action="store_true",
                   help="verify every fetched loss term is finite; raise with "
                        "scale/iteration coordinates otherwise")
    return p


def load_config_defaults(parser: argparse.ArgumentParser, path: str) -> None:
    """Overlay a TOML table onto the parser defaults (CLI flags still win).

    Keys use the flag names with ``-`` or ``_`` (``style-weight = 1e3``).
    Unknown keys are an error — typos in configs must not pass silently.
    """
    import tomllib

    with open(path, "rb") as f:
        table = tomllib.load(f)
    valid = {a.dest for a in parser._actions}
    overlay = {}
    for key, value in table.items():
        dest = key.replace("-", "_")
        if dest not in valid:
            raise SystemExit(f"error: unknown config key {key!r} in {path}")
        overlay[dest] = value
    parser.set_defaults(**overlay)


def main(argv: Optional[List[str]] = None) -> int:
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", default=None)
    pre_args, rest = pre.parse_known_args(argv)

    parser = build_parser()
    parser.add_argument("--config", default=None,
                        help="TOML file of flag defaults (CLI flags override)")
    if pre_args.config:
        load_config_defaults(parser, pre_args.config)
    args = parser.parse_args(argv)

    # Pin the platform before any jax compute when the user forces CPU.
    import os

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from style_transfer_tpu.api import StyleTransfer, StylizeConfig
    from style_transfer_tpu.models.weights import load_npz, random_fixture
    from style_transfer_tpu.optim import OptimizerSpec
    from style_transfer_tpu.parallel.mesh import make_mesh
    from style_transfer_tpu.utils import imgio
    from style_transfer_tpu.utils.progress import MetricsRecorder, Printer, fanout

    if args.weights:
        params, mean, std = load_npz(args.weights)
    elif args.random_weights:
        params, mean, std = random_fixture(0, arch=args.arch)
    else:
        print(
            "error: no VGG-19 weights. Pass --weights vgg19.npz (convert with "
            "scripts/convert_weights.py) or --random-weights for a fixture run.",
            file=sys.stderr,
        )
        return 2

    n_dev = len(jax.devices())
    mesh = None
    if args.devices is None:
        if n_dev > 1:
            mesh = make_mesh()
    elif args.devices > 1:
        mesh = make_mesh(args.devices)

    compute_dtype = None
    if args.precision == "bf16":
        compute_dtype = jnp.bfloat16
    elif args.precision == "fp32":
        compute_dtype = jnp.float32

    st = StyleTransfer(
        params, mean=mean, std=std, pooling=args.pooling,
        compute_dtype=compute_dtype, mesh=mesh,
    )

    import numpy as np

    # uint8 until on-device conversion: 4x less host->device traffic.
    content = imgio.load_image(args.content, dtype=np.uint8)
    styles = [imgio.load_image(s, dtype=np.uint8) for s in args.styles]

    init_image = None
    init_mode = args.init
    if init_mode not in ("content", "random", "mean"):
        init_image = imgio.load_image(init_mode, dtype=np.uint8)
        init_mode = "content"

    cfg = StylizeConfig(
        size=args.size,
        min_scale=args.min_scale,
        scale_factor=args.scale_factor,
        iterations=tuple(args.iterations),
        chunk_size=args.chunk_size,
        content_layers=tuple(args.content_layers),
        style_layers=tuple(args.style_layers),
        content_layer_weights=args.content_layer_weights,
        style_layer_weights=args.style_layer_weights,
        content_weight=args.content_weight,
        style_weight=args.style_weight,
        tv_weight=args.tv_weight,
        style_blend_weights=args.style_blend_weights,
        style_scale=args.style_scale,
        optimizer=OptimizerSpec(
            args.optimizer, learning_rate=args.lr, memory_size=args.lbfgs_memory,
            linesearch_tol=args.linesearch_tol,
        ),
        init=init_mode,
        seed=args.seed,
        avg_decay=args.avg_decay,
        stop_tol=args.stop_tol,
        stop_patience=args.stop_patience,
        use_fused=not args.unfused,
        packed_block1={"auto": None, "on": True, "off": False}[args.packed_block1],
        packed_block2={"auto": None, "on": True, "off": False}[args.packed_block2],
        packed_block3={"auto": None, "on": True, "off": False}[args.packed_block3],
        packed_block4={"auto": None, "on": True, "off": False}[args.packed_block4],
        fused_block1=args.fused_block1,
        grid_snap={"auto": None, "on": True, "off": False}[args.grid_snap],
        pipeline_chunks=False if args.no_pipeline else None,
        debug_checks=args.debug_checks,
        remat={"auto": None, "on": True, "off": False}[args.remat],
    )

    metrics = MetricsRecorder()
    callbacks = [Printer(every=args.print_every), metrics]

    if args.snapshot_every > 0:
        from style_transfer_tpu.utils.snapshots import SnapshotSaver

        callbacks.append(SnapshotSaver(args.output, every=args.snapshot_every))

    web_server = None
    if args.web or args.browser:
        from style_transfer_tpu.web import WebMonitor

        web_server = WebMonitor(host=args.host, port=args.port)
        web_server.start()
        callbacks.append(web_server.callback)
        url = f"http://{args.host}:{args.port}/"
        print(f"live view: {url}", flush=True)
        if args.browser:
            import webbrowser

            webbrowser.open(url)

    ckpt = None
    if args.checkpoint_dir:
        from style_transfer_tpu.utils.ckpt import CheckpointManager

        ckpt = CheckpointManager(args.checkpoint_dir, every=args.checkpoint_every)
        callbacks.append(ckpt.callback)

    profile_ctx = None
    if args.profile_dir:
        profile_ctx = jax.profiler.trace(args.profile_dir)
        profile_ctx.__enter__()

    try:
        resume_state = ckpt.latest() if (ckpt and args.resume) else None
        out = st.stylize(
            content,
            styles,
            cfg,
            callback=fanout(*callbacks),
            init_image=init_image,
            resume_state=resume_state,
            # headed straight for an 8-bit file: quantize on device, fetch
            # 4x less over the host link
            output_dtype="uint8",
        )
    finally:
        if profile_ctx is not None:
            profile_ctx.__exit__(None, None, None)
        if web_server is not None:
            web_server.stop()

    imgio.save_image(out, args.output)
    print(f"saved {args.output}", flush=True)
    if args.metrics_out:
        metrics.dump(args.metrics_out)
        print(f"metrics -> {args.metrics_out}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
