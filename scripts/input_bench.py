"""Host input-pipeline throughput benchmark (no device needed).

Measures batches/sec of the tf.data and Grain train pipelines over a real
or synthetic TFRecord split — the tool for sizing grain_workers and
deciding tfdata-vs-grain on a given host (on real TPU hosts the input
pipeline, not the 62 ms step, decides whether the chip starves — see
ARCHITECTURE.md "Measured performance").

Usage:
    python scripts/input_bench.py [--pattern 'recs/train-*'] \
        [--dataset mpii] [--batch 64] [--image_size 224] [--batches 50] \
        [--grain_workers 0 4 8]
With no --pattern, a synthetic split is generated.
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def consume(it, n_batches, warm=30):
    # warm past lazy setup AND internal prefetch buffers (grain's iterator
    # prefetches hundreds of elements; timing fewer batches than the
    # buffer holds measures a memcpy, not the pipeline)
    for _ in range(warm):
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    return n_batches / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pattern", default=None)
    ap.add_argument("--dataset", default="mpii")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--batches", type=int, default=150)
    ap.add_argument("--synthetic_examples", type=int, default=512)
    ap.add_argument("--grain_workers", type=int, nargs="*",
                    default=[0, 4])
    args = ap.parse_args()

    from attentionalpoolingaction_tpu.data import grain_pipeline, pipeline
    from attentionalpoolingaction_tpu.data.datasets import get_dataset
    from attentionalpoolingaction_tpu.data.records import (
        write_synthetic_dataset)

    spec = get_dataset(args.dataset)
    pattern = args.pattern
    if pattern is None:
        d = tempfile.mkdtemp(prefix="input_bench_")
        pattern = os.path.join(d, "train.tfrecord")
        write_synthetic_dataset(pattern, spec, args.synthetic_examples,
                                image_size=args.image_size + 32)
        print(f"synthetic split: {args.synthetic_examples} examples "
              f"at {pattern}")

    kw = dict(batch_size=args.batch, image_size=args.image_size,
              transfer_uint8=True)

    it = pipeline.make_train_iterator(pattern, spec,
                                      shard_by_process=False, **kw)
    rate = consume(it, args.batches)
    print(f"tf.data:            {rate:7.2f} batches/s "
          f"({rate * args.batch:8.0f} img/s)")

    for workers in args.grain_workers:
        it = grain_pipeline.make_train_iterator(
            pattern, spec, num_workers=workers, **kw)
        rate = consume(it, args.batches)
        print(f"grain (workers={workers}): {rate:7.2f} batches/s "
              f"({rate * args.batch:8.0f} img/s)")


if __name__ == "__main__":
    main()
