"""Serving path: BN-folded functional forward + post-training int8.

The float folded forward must match `ActionModel.apply` (same weights,
eval mode) tightly — it is a re-derivation of the same network with BN
algebraically folded, so any padding/stride/fold mistake shows up as a
logit mismatch.  The int8 path is then validated against the float folded
forward (quantization noise bounds, not exactness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentionalpoolingaction_tpu.models.action_model import ActionModel
from attentionalpoolingaction_tpu.models import inference as inf


def _make_model(pooling="attention", backbone="resnet_v1_50", classes=11):
    model = ActionModel(num_classes=classes, backbone=backbone,
                        pooling=pooling, rank=2)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    # a train step so batch_stats are non-trivial (mean!=0, var!=1)
    warm = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    _, upd = model.apply(variables, warm, train=True,
                         mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}
    return model, variables


def test_folded_float_matches_flax():
    model, variables = _make_model()
    images = jax.random.normal(jax.random.key(2), (2, 64, 64, 3))
    want = model.apply(variables, images)["logits"]
    folded = inf.fold_backbone(variables, "resnet_v1_50")
    got = inf.folded_forward(folded, variables["params"]["head"], images,
                             backbone="resnet_v1_50", dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got["logits"]), np.asarray(want),
                               rtol=1e-4,
                               atol=1e-4 * np.abs(np.asarray(want)).max())


def test_folded_pose_variant_matches_flax():
    model, variables = _make_model(pooling="pose_attention")
    images = jax.random.normal(jax.random.key(3), (2, 64, 64, 3))
    want = model.apply(variables, images)
    folded = inf.fold_backbone(variables, "resnet_v1_50")
    got = inf.folded_forward(folded, variables["params"]["head"], images,
                             backbone="resnet_v1_50", dtype=jnp.float32,
                             pose_head=variables["params"]["pose_head"])
    for k in ("logits", "pose_heatmaps"):
        w = np.asarray(want[k])
        np.testing.assert_allclose(np.asarray(got[k]), w, rtol=1e-4,
                                   atol=1e-4 * np.abs(w).max())


def test_folded_avg_head_matches_flax():
    model, variables = _make_model(pooling="avg")
    images = jax.random.normal(jax.random.key(4), (2, 64, 64, 3))
    want = model.apply(variables, images)["logits"]
    folded = inf.fold_backbone(variables, "resnet_v1_50")
    got = inf.folded_forward(folded, variables["params"]["head"], images,
                             backbone="resnet_v1_50", pooling="avg",
                             dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got["logits"]), np.asarray(want),
                               rtol=1e-4,
                               atol=1e-4 * np.abs(np.asarray(want)).max())


def _cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@pytest.mark.parametrize("static_scales", [False, True])
def test_int8_close_to_float(static_scales):
    _, variables = _make_model()
    images = jax.random.normal(jax.random.key(5), (2, 64, 64, 3))
    folded = inf.fold_backbone(variables, "resnet_v1_50")
    head = variables["params"]["head"]
    ref = inf.folded_forward(folded, head, images, backbone="resnet_v1_50",
                             dtype=jnp.float32)
    act_scales = None
    if static_scales:
        act_scales = inf.calibrate_act_scales(
            folded, head, [images], backbone="resnet_v1_50")
        assert "conv1" in act_scales and all(
            s > 0 for s in act_scales.values())
    q = inf.quantize_folded(folded)
    got = inf.folded_forward(q, head, images, backbone="resnet_v1_50",
                             act_scales=act_scales, dtype=jnp.float32)
    # int8 PTQ over ~50 conv layers: feature direction must survive
    assert _cosine(got["features"], ref["features"]) > 0.98
    assert _cosine(got["logits"], ref["logits"]) > 0.9


def test_dot_1x1_matches_conv():
    """The dot_1x1 probe (1x1 convs as 2D dot_general — see the _conv
    docstring's measured TPU verdict) must be numerically equivalent to
    the lax.conv path: bit-exact on int8 (integer accumulation) and
    ~exact on float."""
    _, variables = _make_model()
    images = jax.random.normal(jax.random.key(6), (2, 64, 64, 3))
    folded = inf.fold_backbone(variables, "resnet_v1_50")
    head = variables["params"]["head"]
    f_conv = inf.folded_forward(folded, head, images,
                                backbone="resnet_v1_50", dtype=jnp.float32)
    f_dot = inf.folded_forward(folded, head, images,
                               backbone="resnet_v1_50", dtype=jnp.float32,
                               dot_1x1=True)
    w = np.asarray(f_conv["logits"])
    np.testing.assert_allclose(np.asarray(f_dot["logits"]), w, rtol=1e-4,
                               atol=1e-4 * np.abs(w).max())
    q = inf.quantize_folded(folded)
    scales = inf.calibrate_act_scales(folded, head, [images],
                                      backbone="resnet_v1_50")
    q_conv = inf.folded_forward(q, head, images, backbone="resnet_v1_50",
                                act_scales=scales, dtype=jnp.float32)
    q_dot = inf.folded_forward(q, head, images, backbone="resnet_v1_50",
                               act_scales=scales, dtype=jnp.float32,
                               dot_1x1=True)
    np.testing.assert_array_equal(np.asarray(q_conv["features"]),
                                  np.asarray(q_dot["features"]))


def test_quantize_roundtrip_error_bounded():
    _, variables = _make_model()
    folded = inf.fold_backbone(variables, "resnet_v1_50")
    q = inf.quantize_folded(folded)
    layer = folded["conv1"]
    ql = q["conv1"]
    # dequantized kernel*bn_scale must reconstruct kernel*bn_scale within
    # one quantization step per channel
    w = np.asarray(layer["kernel"]) * np.asarray(layer["scale"])
    wq = np.asarray(ql["kernel_q"], np.float32) * np.asarray(ql["scale"])
    step = np.abs(np.asarray(layer["kernel"])).max(axis=(0, 1, 2)) / 127.0
    bound = step * np.abs(np.asarray(layer["scale"])) + 1e-7
    assert (np.abs(w - wq) <= bound[None, None, None, :] + 1e-6).all()


def test_int8_eval_step_and_evaluate(tmp_path):
    """cfg.eval_int8 routes evaluate() through the quantized path; the
    step is checkpoint-swappable without retracing (eval_cli --follow)."""
    from attentionalpoolingaction_tpu import evaluate as eval_lib
    from attentionalpoolingaction_tpu.config import TrainConfig
    from attentionalpoolingaction_tpu.data.records import (
        write_synthetic_dataset)
    from attentionalpoolingaction_tpu.data.datasets import get_dataset
    from attentionalpoolingaction_tpu import train as train_lib

    spec = get_dataset("mpii")
    write_synthetic_dataset(str(tmp_path / "val.tfrecord"), spec, 6,
                            image_size=72, seed=1)
    cfg = TrainConfig(dataset="mpii", backbone="resnet_v1_50",
                      pooling="attention", rank=1, image_size=64,
                      batch_size=4, learning_rate=1e-3,
                      grad_clip_norm=10.0, lr_schedule="constant",
                      bf16_backbone=False, resize_min=72,
                      eval_pattern=str(tmp_path / "val.tfrecord"),
                      eval_batch_size=4, eval_int8=True)
    state, _, _, _ = train_lib.create_state(cfg)
    res = eval_lib.evaluate(cfg, state)
    assert res["num_examples"] == 6
    assert np.isfinite(res["mAP"])

    # swapping in a new state re-quantizes but reuses the compiled step
    step = eval_lib.make_int8_eval_step(cfg)
    imgs = np.zeros((2, 64, 64, 3), np.float32)
    a = step(state.params, state.batch_stats, imgs)
    state2, _, _, _ = train_lib.create_state(cfg)  # fresh pytree ids
    b = step(state2.params, state2.batch_stats, imgs)
    assert a.shape == b.shape == (2, 393)


def test_int8_eval_step_on_mesh(tmp_path):
    """eval_int8 under an 8-device data mesh: the quantized forward shards
    over the batch like the regular eval step and matches the unsharded
    int8 logits."""
    from attentionalpoolingaction_tpu import evaluate as eval_lib
    from attentionalpoolingaction_tpu import train as train_lib
    from attentionalpoolingaction_tpu.config import TrainConfig

    cfg = TrainConfig(dataset="mpii", backbone="resnet_v1_50",
                      pooling="attention", rank=1, image_size=64,
                      batch_size=8, learning_rate=1e-3,
                      grad_clip_norm=10.0, lr_schedule="constant",
                      bf16_backbone=False, resize_min=72,
                      mesh_shape=(8,), eval_batch_size=8, eval_int8=True)
    state, _, _, _ = train_lib.create_state(cfg)
    mesh = eval_lib.mesh_from_config(cfg)
    assert mesh is not None
    imgs = np.asarray(jax.random.normal(
        jax.random.key(8), (8, 64, 64, 3)) * 32, np.float32)
    sharded = eval_lib.make_int8_eval_step(cfg, mesh)(
        state.params, state.batch_stats, imgs)
    single = eval_lib.make_int8_eval_step(cfg)(
        state.params, state.batch_stats, imgs)
    # sharded reduction order shifts the dynamic activation scales by
    # ~1ulp -> per-mille logit wiggle; identity is not expected, closeness is
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=5e-3, atol=5e-2)


def test_make_int8_forward_jits():
    _, variables = _make_model()
    images = jax.random.normal(jax.random.key(6), (2, 64, 64, 3))
    fwd = inf.make_int8_forward(variables, backbone="resnet_v1_50",
                                calibration_batches=[images],
                                dtype=jnp.float32)
    out = fwd(images)
    assert out["logits"].shape == (2, 11)
    assert np.isfinite(np.asarray(out["logits"])).all()
