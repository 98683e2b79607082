"""Serving throughput/latency benchmark: does handler-thread decode pay?

The round-4 serving refactor moved JPEG decode/resize out of the
DynamicBatcher's single worker thread (where it serialized with device
dispatch, pre-r4 `predict_bytes` wiring) into the concurrent HTTP
handler threads (`Predictor.preprocess` per request, batcher coalesces
PREPROCESSED arrays through `predict_preprocessed`).  This script
measures both wirings under the same concurrent open-loop load, plus an
HTTP end-to-end number on the production path:

  worker-decode  — clients submit raw JPEG bytes; the batcher fn is
                   predict_bytes (decode serializes with dispatch)
  handler-decode — clients decode first (modeling HTTP handler threads),
                   submit float arrays; batcher fn is
                   predict_preprocessed (worker thread = dispatch only)
  http-e2e       — real ThreadingHTTPServer via serve_cli.make_server,
                   concurrent http.client POSTs to /predict

Reported per wiring: requests/sec and client-side p50/p99 latency.

Run on the TPU host:
    python scripts/serving_bench.py [--clients 16] [--requests 400]
Smoke-test off-TPU:
    python scripts/serving_bench.py --cpu --tiny --clients 4 --requests 40
"""

import argparse
import http.client
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:   # logic smoke-test off-TPU (env var is too late:
    jax.config.update("jax_platforms", "cpu")   # sitecustomize imports jax)

import cv2
import jax.numpy as jnp
import numpy as np

from attentionalpoolingaction_tpu import serve_cli, serving
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.models.action_model import ActionModel


def make_predictor(tiny: bool, buckets):
    cfg = TrainConfig(
        dataset="mpii",
        backbone="resnet_v1_50" if tiny else "resnet_v1_101",
        pooling="attention", rank=1,
        image_size=64 if tiny else 224,
        batch_size=4, learning_rate=1e-3, grad_clip_norm=10.0,
        lr_schedule="constant", bf16_backbone=not tiny,
        **({"resize_min": 72} if tiny else {}))
    model = ActionModel(num_classes=393, backbone=cfg.backbone,
                        pooling=cfg.pooling, rank=cfg.rank,
                        dtype=jnp.bfloat16 if cfg.bf16_backbone
                        else jnp.float32)
    variables = model.init(
        jax.random.key(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)), train=False)
    return serving.Predictor(cfg, variables["params"],
                             variables["batch_stats"], buckets=buckets)


def make_jpegs(n, size):
    """Distinct JPEGs, stored larger than the serving crop so per-request
    decode+resize is real host work (the thing the two wirings differ on).
    Natural-image-ish gradients compress to realistic sizes (~50-150 KB at
    448px source), unlike uint8 noise which defeats JPEG entirely."""
    rng = np.random.default_rng(0)
    blobs = []
    for _ in range(n):
        y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
        img = np.stack([
            127 + 120 * np.sin(2 * np.pi * (rng.uniform(1, 4) * x +
                                            rng.uniform())),
            127 + 120 * np.sin(2 * np.pi * (rng.uniform(1, 4) * y +
                                            rng.uniform())),
            127 + 120 * np.sin(2 * np.pi * rng.uniform(1, 3) * (x + y)),
        ], -1).clip(0, 255).astype(np.uint8)
        img += rng.integers(0, 20, img.shape, np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        assert ok
        blobs.append(bytes(buf.tobytes()))
    return blobs


def drive(n_clients, n_requests, request_fn):
    """Closed-loop load: n_clients threads issue requests back-to-back
    until n_requests total complete.  Returns (wall_s, latencies)."""
    latencies = []
    lock = threading.Lock()
    counter = {"n": 0}
    errors = []

    def client(tid):
        while True:
            with lock:
                if counter["n"] >= n_requests:
                    return
                i = counter["n"]
                counter["n"] += 1
            t0 = time.perf_counter()
            try:
                request_fn(i, tid)
            except Exception as exc:  # pragma: no cover - surfaced below
                with lock:
                    errors.append(exc)
                return
            dt = time.perf_counter() - t0
            with lock:
                latencies.append(dt)

    threads = [threading.Thread(target=client, args=(t,))
               for t in range(n_clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise errors[0]
    return wall, sorted(latencies)


def report(name, wall, lats, n):
    p50 = lats[len(lats) // 2]
    p99 = lats[min(len(lats) - 1, int(len(lats) * 0.99))]
    print(f"  {name:14s}: {n / wall:8.1f} req/s   "
          f"p50 {p50 * 1e3:6.1f} ms   p99 {p99 * 1e3:6.1f} ms")
    return n / wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--requests", type=int, default=400)
    ap.add_argument("--max_batch", type=int, default=32)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--source_px", type=int, default=448,
                    help="stored JPEG side (decode+resize cost)")
    ap.add_argument("--tiny", action="store_true",
                    help="resnet50 @64px for smoke tests")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (handled pre-parse)")
    ap.add_argument("--only", default="worker,handler,http",
                    help="comma list of wirings to run (worker/handler/"
                         "http) — re-measure one without paying for all")
    args = ap.parse_args()
    only = set(args.only.split(","))
    print("backend:", jax.devices())

    buckets = (1, 8, 32) if args.max_batch >= 32 else (1, args.max_batch)
    pred = make_predictor(args.tiny, buckets)
    pred.warmup()
    blobs = make_jpegs(64, args.source_px if not args.tiny else 96)
    print(f"{len(blobs)} JPEGs, ~{np.mean([len(b) for b in blobs])/1e3:.0f} "
          f"KB each; {args.clients} clients x {args.requests} requests, "
          f"max_batch={args.max_batch} max_wait={args.max_wait_ms}ms")

    # wiring 1 (pre-r4): raw bytes through the batcher; the single worker
    # thread decodes every image of every coalesced batch, serial with
    # device dispatch
    r_worker = r_handler = None
    if "worker" in only:
        b1 = serving.DynamicBatcher(
            lambda bb: pred.predict_bytes(bb, topk=1),
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
        wall, lats = drive(
            args.clients, args.requests,
            lambda i, tid: b1.submit(
                blobs[i % len(blobs)]).result(timeout=60))
        b1.stop()
        r_worker = report("worker-decode", wall, lats, args.requests)

    # wiring 2 (production): decode in the client thread (stand-in for
    # the HTTP handler thread), batcher coalesces arrays
    if "handler" in only:
        b2 = serving.DynamicBatcher(
            lambda imgs: pred.predict_preprocessed(imgs, topk=1),
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
        wall, lats = drive(
            args.clients, args.requests,
            lambda i, tid: b2.submit(
                pred.preprocess(blobs[i % len(blobs)])).result(timeout=60))
        b2.stop()
        r_handler = report("handler-decode", wall, lats, args.requests)

    # production path end-to-end: real HTTP server, concurrent POSTs
    if "http" in only:
        server = serve_cli.make_server(pred, "127.0.0.1", 0, topk=1,
                                       max_batch=args.max_batch,
                                       max_wait_ms=args.max_wait_ms)
        host, port = server.server_address[:2]
        st = threading.Thread(target=server.serve_forever, daemon=True)
        st.start()
        conns = [http.client.HTTPConnection(host, port, timeout=60)
                 for _ in range(args.clients)]

        def http_req(i, tid):
            c = conns[tid]
            c.request("POST", "/predict", blobs[i % len(blobs)])
            resp = c.getresponse()
            body = resp.read()
            assert resp.status == 200, (resp.status, body[:200])

        wall, lats = drive(args.clients, args.requests, http_req)
        report("http-e2e", wall, lats, args.requests)
        server.shutdown()
        server.batcher.stop()
        server.server_close()

    if r_worker and r_handler:
        print(f"handler-thread decode: "
              f"{100 * (r_handler / r_worker - 1):+.1f}% "
              f"throughput vs the pre-r4 worker-decode wiring")


if __name__ == "__main__":
    main()
