"""Re-sweep per-point optimal batch sizes under the FIXED bench harness
(VERDICT r4 next #8).

The r2/r3 sweeps disagreed at 448px (int8: B64 2,696 in r2's table vs
B96 2,585 chosen in r3) within what the r4 post-mortem showed was window
noise — each r4 window paid a fixed ~20 ms D2H sync over 0.1-0.4 s of
steps.  bench.py now sizes windows by TIME (>= 2 s of steps), so the
sync amortizes to <= ~1% and a batch sweep under the same harness is
trustworthy.  This script reuses bench.py's own bench_forward /
bench_int8 / _time_calls verbatim so the winner is directly the number
bench.py will report.

Run manually, ONE JAX process at a time (see .claude/skills/verify):
    python scripts/tpu_sweep_batch.py [--point fwd448|int8_448|fwd224|int8_224]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import bench

bench._setup_compilation_cache()   # share bench.py's persistent XLA
                                   # cache: the 448px compiles through
                                   # the tunnel dominate a cold sweep

SWEEPS = {
    # point -> (fn, kwargs-constant, batch candidates)
    "fwd448": (bench.bench_forward,
               dict(image_size=448, num_classes=600),
               (64, 96, 128, 192)),
    "int8_448": (bench.bench_int8,
                 dict(image_size=448, num_classes=600),
                 (64, 96, 128)),
    "fwd224": (bench.bench_forward,
               dict(image_size=224, num_classes=393),
               (256, 512, 1024)),
    "int8_224": (bench.bench_int8,
                 dict(image_size=224, num_classes=393),
                 # the int8 curve peaks BELOW the bf16-optimal batch
                 # (halved activation bytes): r5 measured 14,186@B128 >
                 # 13,804@B96 > 13,071@B64 > 11,972@B192 > 11,319@B256
                 (64, 96, 128, 192, 256)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--point", action="append", choices=sorted(SWEEPS),
                    help="sweep only these points (default: all)")
    args = ap.parse_args()
    points = args.point or list(SWEEPS)

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    results = {}
    for point in points:
        fn, kw, batches = SWEEPS[point]
        rows = {}
        for b in batches:
            try:
                rate, flops, _ = fn(batch_size=b, **kw)
            except Exception as e:  # OOM at the largest batch is data too
                print(f"{point} B{b}: FAILED {type(e).__name__}: {e}",
                      flush=True)
                rows[b] = None
                continue
            tflops = (flops * (rate / b) / 1e12) if flops else None
            rows[b] = round(rate, 1)
            print(f"{point} B{b}: {rate:,.1f} img/s"
                  + (f"  ({tflops:.1f} TFLOP/s)" if tflops else ""),
                  flush=True)
        ok = {b: r for b, r in rows.items() if r}
        best = max(ok, key=ok.get) if ok else None
        results[point] = {"rates": rows, "best_batch": best}
        print(f"{point}: best B{best}", flush=True)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
