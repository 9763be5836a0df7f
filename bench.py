"""Perf harness (BASELINE.json:2): optimizer iterations/sec at 512/1024px and
wall-clock for the 2048px multi-scale stylization.

Prints ONE JSON line:
  {"metric": "wallclock_2048px_multiscale", "value": <s>, "unit": "s",
   "vs_baseline": <60.0 / value>, ...extra}

``vs_baseline`` is the speedup against the driver's <60 s @2048px target
(BASELINE.json:5; the reference publishes no numbers, BASELINE.json:13), so
values > 1.0 beat the target. Extra keys carry its/sec at 512/1024px.

Progress goes to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def measure_its_per_sec(st, content, style, size: int, iters: int, cfg_kw):
    """Steady-state optimizer iterations/sec at a fixed size (compile excluded
    via a warmup chunk). Returns ``(median, max)`` over the steady chunks —
    median is the headline (robust on a shared device); max is informational.
    """
    from style_transfer_tpu.api import StylizeConfig

    rates = []

    def cb(ev):
        rates.append(ev.its_per_sec)

    cfg = StylizeConfig(
        size=size, min_scale=size, iterations=(iters,), chunk_size=max(10, iters // 4),
        **cfg_kw,
    )
    st.stylize(content, style, cfg, callback=cb)
    # first chunk includes XLA compile; drop it, report steady chunks
    steady = rates[1:] or rates
    return statistics.median(steady), max(steady)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="style_transfer_tpu perf harness")
    p.add_argument("--size", type=int, default=2048, help="final long side for the wall-clock run")
    p.add_argument("--iterations", type=int, nargs="+", default=[250, 200, 150, 100])
    p.add_argument("--quick", action="store_true", help="512px its/sec only (fast CI)")
    p.add_argument("--unfused", action="store_true")
    p.add_argument("--skip-rates", action="store_true", help="skip 512/1024 its/sec probes")
    p.add_argument("--cold", action="store_true",
                   help="skip the warm pass; the wall-clock then includes XLA "
                        "compiles (cache-state dependent)")
    args = p.parse_args(argv)

    import jax

    # Persistent compilation cache (repeat bench runs skip recompiles) —
    # the library's hardened per-user 0700 path, NOT a world-writable /tmp
    # dir another local user could pre-seed with poisoned executables.
    from style_transfer_tpu.api import _ensure_compile_cache

    _ensure_compile_cache()

    import numpy as np

    from style_transfer_tpu.api import StyleTransfer, StylizeConfig
    from style_transfer_tpu.optim import OptimizerSpec
    from style_transfer_tpu.parallel.mesh import make_mesh

    backend = jax.default_backend()
    n_dev = len(jax.devices())
    mesh = make_mesh() if n_dev > 1 else None
    log(f"backend={backend} devices={n_dev} mesh={'1d' if mesh else 'none'}")

    st = StyleTransfer(mesh=mesh)  # fixture weights: perf is value-independent
    r = np.random.RandomState(0)
    content = r.rand(2048, 2048, 3).astype(np.float32)
    style = r.rand(1024, 1024, 3).astype(np.float32)

    cfg_kw = dict(
        use_fused=not args.unfused,
        optimizer=OptimizerSpec("adam", learning_rate=0.05),
    )

    extra = {"backend": backend, "devices": n_dev, "fused": not args.unfused}

    if args.quick:
        args.skip_rates = False  # --quick IS the 512px rate probe

    if not args.skip_rates:
        t0 = time.time()
        med, mx = measure_its_per_sec(st, content, style, 512, 120, cfg_kw)
        extra["its_per_sec_512"] = round(med, 2)
        extra["its_per_sec_512_max"] = round(mx, 2)
        log(f"512px: {extra['its_per_sec_512']} it/s median ({time.time()-t0:.0f}s)")
        if not args.quick:
            t0 = time.time()
            med, mx = measure_its_per_sec(st, content, style, 1024, 60, cfg_kw)
            extra["its_per_sec_1024"] = round(med, 2)
            extra["its_per_sec_1024_max"] = round(mx, 2)
            log(f"1024px: {extra['its_per_sec_1024']} it/s median ({time.time()-t0:.0f}s)")

    if args.quick:
        value = extra["its_per_sec_512"]
        print(json.dumps({
            "metric": "its_per_sec_512px",
            "value": value,
            "unit": "it/s",
            "vs_baseline": 1.0,
            **extra,
        }))
        return 0

    # The headline: full coarse-to-fine run to `--size`, convergence-matched
    # early stopping per scale.
    cfg = StylizeConfig(
        size=args.size,
        min_scale=256,
        iterations=tuple(args.iterations),
        chunk_size=25,
        stop_tol=2e-3,
        stop_patience=2,
        **cfg_kw,
    )

    if not args.cold:
        # Warm pass: compiles every program of the real run — per scale one
        # of each distinct chunk length (the full chunk plus the remainder
        # specialization when the count isn't chunk-aligned) — so the timed
        # run below measures steady-state capability rather than XLA compile
        # time / compilation-cache state. --cold skips this.
        from style_transfer_tpu.schedule import chunk_lengths

        warm_cfg = StylizeConfig(
            size=args.size,
            min_scale=256,
            iterations=tuple(
                sum(set(chunk_lengths(i, cfg.chunk_size))) for i in args.iterations
            ),
            chunk_size=cfg.chunk_size,
            **cfg_kw,
        )
        t0 = time.time()
        st.stylize(content, style, warm_cfg)
        log(f"warm pass: {time.time()-t0:.1f}s")

    # Two timed runs, report the faster (standard practice for wall-clock
    # on a shared device — a transient co-tenant burst measured 5x on one
    # run while the adjacent runs were nominal; both runs are reported).
    # Per-scale wall-clock attributes time between callback events to the
    # event's scale (the first chunk of a scale absorbs its target capture).
    runs = []
    best_scales: dict = {}
    for rep in range(1 if args.cold else 2):
        scale_seconds: dict = {}
        last_t = [time.time()]

        def scale_cb(ev):
            now = time.time()
            key = f"scale{ev.scale_index}_{ev.size[0]}x{ev.size[1]}"
            scale_seconds[key] = scale_seconds.get(key, 0.0) + (now - last_t[0])
            last_t[0] = now

        t0 = time.time()
        st.stylize(content, style, cfg, callback=scale_cb)
        runs.append(time.time() - t0)
        if runs[-1] == min(runs):
            best_scales = scale_seconds
        log(f"{args.size}px multi-scale (run {rep + 1}): {runs[-1]:.1f}s "
            f"{ {k: round(v, 2) for k, v in scale_seconds.items()} }")
    wall = min(runs)
    extra["wallclock_runs"] = [round(r, 2) for r in runs]
    extra["per_scale_seconds"] = {k: round(v, 2) for k, v in best_scales.items()}

    print(json.dumps({
        "metric": f"wallclock_{args.size}px_multiscale",
        "value": round(wall, 2),
        "unit": "s",
        "vs_baseline": round(60.0 / wall, 3),
        **extra,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
