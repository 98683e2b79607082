"""AOT export artifacts (jax.export): roundtrip parity with the live
Predictor, symbolic-batch coverage, int8 variant, dtype dispatch."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentionalpoolingaction_tpu import export as export_lib
from attentionalpoolingaction_tpu import serving
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.models.action_model import ActionModel


def _tiny_cfg(**kw):
    return TrainConfig(dataset="mpii", backbone="resnet_v1_50",
                       pooling="attention", rank=1, image_size=64,
                       batch_size=4, bf16_backbone=False, resize_min=72,
                       **kw)


def _variables(cfg):
    model = ActionModel(num_classes=393, backbone=cfg.backbone,
                        pooling=cfg.pooling, rank=cfg.rank)
    return model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)),
                      train=False)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = _tiny_cfg()
    v = _variables(cfg)
    live = serving.Predictor(cfg, v["params"], v["batch_stats"],
                             buckets=(2, 4))
    out = str(tmp_path_factory.mktemp("aot") / "artifact")
    manifest = export_lib.export_predictor(live, out)
    return cfg, live, out, manifest


def test_manifest_and_files(artifact):
    cfg, _, out, manifest = artifact
    assert manifest["format_version"] == export_lib.FORMAT_VERSION
    assert manifest["config"]["image_size"] == 64
    assert manifest["buckets"] == [2, 4]
    assert set(manifest["input_dtypes"]) == {"uint8", "float32"}
    assert "tpu" in manifest["platforms"]  # deployable artifact even
    # when exported from a CPU dev box
    files = set(os.listdir(out))
    assert {"manifest.json", "weights.npz", "fwd_uint8.bin",
            "fwd_float32.bin"} <= files
    # manifest on disk == returned manifest
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f) == manifest


def test_roundtrip_matches_live_predictor(artifact):
    """Exported artifact reproduces the live predictor bit-for-bit on
    uint8 AND float32 inputs, including padded odd batch sizes (the
    symbolic batch dim must not perturb numerics)."""
    _, live, out, _ = artifact
    loaded = export_lib.load_exported(out)
    assert loaded.buckets == live.buckets
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 255, (5, 64, 64, 3), np.uint8)   # 5 -> chunks 4+1
    np.testing.assert_array_equal(loaded.predict_arrays(u8),
                                  live.predict_arrays(u8))
    f32 = rng.normal(size=(3, 64, 64, 3)).astype(np.float32)
    np.testing.assert_array_equal(loaded.predict_arrays(f32),
                                  live.predict_arrays(f32))
    # stats flow through the shared bucketing machinery
    snap = loaded.stats.snapshot()
    assert snap["serving_device_dispatches_total"] == 3
    assert snap["serving_padded_items_total"] == 2   # 5->pad1(2-bucket)+3->4


def test_predict_bytes_parity(artifact):
    """The full request path (cv2 decode/resize -> uint8 dispatch) gives
    identical topk through the artifact."""
    import cv2

    _, live, out, _ = artifact
    loaded = export_lib.load_exported(out)
    rng = np.random.default_rng(2)
    ok, buf = cv2.imencode(".jpg",
                           rng.integers(0, 255, (80, 80, 3), np.uint8))
    assert ok
    blob = bytes(buf.tobytes())
    assert loaded.predict_bytes([blob]) == live.predict_bytes([blob])


def test_unexported_dtype_raises(artifact):
    _, live, _, _ = artifact
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        export_lib.export_predictor(live, d, input_dtypes=(np.uint8,))
        loaded = export_lib.load_exported(d)
        with pytest.raises(TypeError, match="uint8"):
            loaded.predict_arrays(np.zeros((1, 64, 64, 3), np.float32))


def test_float32_only_artifact_warmup(artifact, tmp_path):
    """ExportedPredictor.warmup defaults to the MANIFEST's dtypes: a
    float32-only artifact must warm up (serve_cli startup path) instead
    of crashing on the base class's uint8 default."""
    _, live, _, _ = artifact
    out = str(tmp_path / "f32_only")
    export_lib.export_predictor(live, out, input_dtypes=(np.float32,))
    loaded = export_lib.load_exported(out)
    loaded.warmup()   # crashed before the warmup override (r3 review)
    with pytest.raises(TypeError, match="float32"):
        loaded.predict_arrays(np.zeros((1, 64, 64, 3), np.uint8))


def test_serve_cli_rejects_checkpoint_flags_with_exported_dir():
    """--exported_dir + checkpoint-only flags is a loud UsageError, not a
    silent model-selection misconfiguration (--ema dropped => wrong
    weights served)."""
    from absl import app as absl_app
    from absl.testing import flagsaver

    from attentionalpoolingaction_tpu import serve_cli

    serve_cli.FLAGS.mark_as_parsed()
    for kw, pat in ((dict(ema=True), "--ema"),
                    (dict(step=7), "--step"),
                    (dict(set=["ema_decay=0.9"]), "--set"),
                    (dict(int8=True), "--int8"),
                    (dict(workdir="/tmp/x"), "--workdir"),
                    # even at the default value: the manifest's config
                    # wins, so an explicit --config is a loud error, not
                    # a silently-ignored model selection
                    (dict(config="mpii_rank1_224"), "--config")):
        with flagsaver.flagsaver(exported_dir="/nonexistent", **kw):
            with pytest.raises(absl_app.UsageError, match=pat):
                serve_cli.main([])


def test_int8_artifact_roundtrip(tmp_path):
    """The quantized BN-folded path exports too (int8 weight leaves ship
    through the raw-bytes npz), matching its live predictor exactly."""
    cfg = _tiny_cfg()
    v = _variables(cfg)
    live = serving.Predictor(cfg, v["params"], v["batch_stats"],
                             int8=True, buckets=(2,))
    out = str(tmp_path / "int8_artifact")
    manifest = export_lib.export_predictor(live, out,
                                           input_dtypes=(np.uint8,))
    assert manifest["int8"] is True
    assert any(leaf["dtype"] == "int8" for leaf in manifest["leaves"])
    loaded = export_lib.load_exported(out)
    assert loaded.int8
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    np.testing.assert_array_equal(loaded.predict_arrays(u8),
                                  live.predict_arrays(u8))


def test_data_parallel_predictor_refuses_export(tmp_path):
    cfg = _tiny_cfg()
    v = _variables(cfg)
    if len(jax.local_devices()) < 2:
        pytest.skip("needs multi-device mesh")
    live = serving.Predictor(cfg, v["params"], v["batch_stats"],
                             buckets=(8,), data_parallel=True)
    with pytest.raises(ValueError, match="data_parallel"):
        export_lib.export_predictor(live, str(tmp_path / "x"))


def test_exported_data_parallel_load(artifact):
    """A single-device artifact loads in data-parallel mode: buckets
    round up to chip multiples, the batch shards over all local devices,
    and probabilities equal the single-device load exactly."""
    if len(jax.local_devices()) < 2:
        pytest.skip("needs multi-device mesh")
    _, _, out, _ = artifact
    plain = export_lib.load_exported(out)
    dp = export_lib.load_exported(out, data_parallel=True)
    n = len(jax.local_devices())
    assert dp.mesh is not None
    assert all(b % n == 0 for b in dp.buckets)
    rng = np.random.default_rng(4)
    u8 = rng.integers(0, 255, (5, 64, 64, 3), np.uint8)
    np.testing.assert_array_equal(dp.predict_arrays(u8),
                                  plain.predict_arrays(u8))
    # the dispatch really spans the mesh
    pad = dp.buckets[0]
    logits = dp._fwd(dp._weights, np.zeros((pad, 64, 64, 3), np.uint8))
    assert len(logits.sharding.device_set) == n


def test_exported_http_serving(artifact):
    """serve_cli.make_server runs unchanged over an ExportedPredictor —
    the AOT artifact plugs into the same HTTP/batching stack."""
    import http.client
    import threading

    from attentionalpoolingaction_tpu import serve_cli

    _, _, out, _ = artifact
    loaded = export_lib.load_exported(out)
    server = serve_cli.make_server(loaded, "127.0.0.1", 0, topk=3,
                                   max_batch=4, max_wait_ms=1.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["status"] == "ok"
        assert health["dataset"] == "mpii"
        import cv2

        ok, buf = cv2.imencode(".jpg", np.zeros((70, 70, 3), np.uint8))
        assert ok
        conn.request("POST", "/predict", body=bytes(buf.tobytes()))
        res = json.loads(conn.getresponse().read())
        assert len(res["topk"]) == 3
    finally:
        server.shutdown()
        server.batcher.stop()
        server.server_close()


def test_exported_predictor_rejects_clips(artifact):
    """AOT artifacts export the per-image forward only: a video request
    gets a clear error dict, not a shape crash."""
    _, _, out, _ = artifact
    loaded = export_lib.load_exported(out)
    assert not loaded.supports_clips
    res = loaded.predict_clip_bytes([b"x"])
    assert "error" in res and "per-image" in res["error"]


def test_clip_artifact_roundtrip(tmp_path):
    """A clip-configured predictor exports the video forward too: the
    loaded artifact serves predict_clip_bytes identically to the live
    predictor (same TSN subsampling, same clip length from the
    manifest)."""
    import cv2

    cfg = _tiny_cfg(clip_frames=2)
    v = _variables(cfg)
    live = serving.Predictor(cfg, v["params"], v["batch_stats"],
                             buckets=(2,))
    out = str(tmp_path / "clip_artifact")
    manifest = export_lib.export_predictor(live, out)
    assert manifest["clip_frames"] == 2
    assert {"clip_uint8.bin", "clip_float32.bin"} <= set(os.listdir(out))
    loaded = export_lib.load_exported(out)
    assert loaded.supports_clips and loaded.clip_t == 2
    rng = np.random.default_rng(0)
    blobs = []
    for i in range(5):
        ok, buf = cv2.imencode(
            ".jpg", rng.integers(0, 255, (80, 80, 3), np.uint8))
        assert ok
        blobs.append(bytes(buf.tobytes()))
    assert loaded.predict_clip_bytes(blobs, topk=3) == \
        live.predict_clip_bytes(blobs, topk=3)
    # image artifacts (clip_frames=1, default include_clip=False) still
    # reject video requests — covered by
    # test_exported_predictor_rejects_clips


def test_int8_static_calibration_artifact_roundtrip(tmp_path):
    """Static activation scales are weight LEAVES (0-d float32) since the
    hot-reload refactor — they must ship through the npz and reproduce
    the live statically-calibrated predictor exactly."""
    cfg = _tiny_cfg()
    v = _variables(cfg)
    rng = np.random.default_rng(7)
    calib = rng.normal(size=(2, 64, 64, 3)).astype(np.float32) * 30
    live = serving.Predictor(cfg, v["params"], v["batch_stats"],
                             int8=True, buckets=(2,),
                             calibration_images=calib)
    assert live._weights[2], "static scales expected"
    out = str(tmp_path / "int8_static_artifact")
    manifest = export_lib.export_predictor(live, out,
                                           input_dtypes=(np.uint8,))
    # the scale leaves are scalar float32 entries in the manifest
    assert any(leaf["dtype"] == "float32" and leaf["shape"] == []
               for leaf in manifest["leaves"])
    loaded = export_lib.load_exported(out)
    u8 = rng.integers(0, 255, (3, 64, 64, 3), np.uint8)
    np.testing.assert_array_equal(loaded.predict_arrays(u8),
                                  live.predict_arrays(u8))


def test_serve_cli_follow_flag_validation(tmp_path):
    """--follow composes with --step best (track the keep-best slot) but
    is a UsageError with an immutable artifact or a pinned numeric step."""
    from absl import app as absl_app

    from absl.testing import flagsaver

    from attentionalpoolingaction_tpu import serve_cli

    serve_cli.FLAGS.mark_as_parsed()
    empty = str(tmp_path / "empty_workdir")
    with flagsaver.flagsaver(follow=True, exported_dir=empty):
        with pytest.raises(absl_app.UsageError, match="immutable"):
            serve_cli.main([])
    with flagsaver.flagsaver(follow=True, workdir=empty, step="7"):
        with pytest.raises(absl_app.UsageError, match="pinned"):
            serve_cli.main([])
    # --follow --step best passes validation (fails later on the missing
    # checkpoint, not on flag combination)
    with flagsaver.flagsaver(follow=True, workdir=empty, step="best"):
        with pytest.raises(FileNotFoundError):
            serve_cli.main([])
