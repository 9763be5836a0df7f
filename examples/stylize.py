#!/usr/bin/env python3
"""Library-API walkthrough: multi-scale, multi-style stylization with
checkpointing, a live web view, and metrics — the programmatic twin of the
CLI (see README for the CLI forms).

Run with real weights:
    python scripts/convert_weights.py torch vgg19.pth vgg19.npz
    python examples/stylize.py content.jpg style.jpg --weights vgg19.npz

Without weights it falls back to the deterministic random fixture (useful
to exercise the pipeline; the output is texture-like, not a stylization).
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

# runnable straight from a checkout: python examples/stylize.py ...
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("content")
    p.add_argument("styles", nargs="+")
    p.add_argument("--weights", default=None)
    p.add_argument("-o", "--output", default="out.png")
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--iterations", type=int, nargs="+", default=[500, 300, 200])
    args = p.parse_args()

    from style_transfer_tpu import StyleTransfer, StylizeConfig
    from style_transfer_tpu.models.weights import load_npz, random_fixture
    from style_transfer_tpu.optim import OptimizerSpec
    from style_transfer_tpu.utils.imgio import load_image, save_image
    from style_transfer_tpu.utils.progress import Printer, fanout

    if args.weights:
        params, mean, std = load_npz(args.weights)
    else:
        print("no --weights given: using the random fixture (pipeline demo only)")
        params, mean, std = random_fixture(0)

    st = StyleTransfer(params, mean=mean, std=std)

    # uint8 load: the [0,1] conversion happens on device (4x less transfer)
    content = load_image(args.content, dtype=np.uint8)
    styles = [load_image(s, dtype=np.uint8) for s in args.styles]

    cfg = StylizeConfig(
        size=args.size,
        min_scale=min(256, args.size),     # coarse-to-fine ladder start
        iterations=tuple(args.iterations),  # per scale, last repeats
        style_blend_weights=None,          # e.g. [0.7, 0.3] for two styles
        optimizer=OptimizerSpec("adam", learning_rate=0.05),
        avg_decay=0.99,                    # Polyak-averaged output image
        stop_tol=1e-3,                     # convergence-matched early stop
    )
    out = st.stylize(content, styles, cfg, callback=fanout(Printer(every=50)))
    save_image(out, args.output)
    print(f"saved {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
