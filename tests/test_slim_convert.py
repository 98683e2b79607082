"""Slim-checkpoint converter: export->convert roundtrip + merge semantics.

The true reference-parity gate ("bit-faithful logits", SURVEY.md section 7
step 2) needs the real reference checkpoint, unavailable this session
(empty mount).  These tests pin the converter mechanics instead: the name
map is exercised in both directions through a real TF checkpoint on disk,
and restored weights must reproduce the exact model logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentionalpoolingaction_tpu import checkpoint as ckpt_lib
from attentionalpoolingaction_tpu.models import ActionModel


@pytest.fixture(scope="module")
def model_and_vars():
    model = ActionModel(num_classes=7, backbone="resnet_v1_50",
                        pooling="attention")
    rng = jax.random.key(42)
    variables = model.init(rng, jnp.zeros((1, 64, 64, 3)), train=False)
    # make batch_stats non-trivial so the roundtrip actually checks them
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    _, updates = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": updates["batch_stats"]}
    return model, variables


def test_roundtrip_all_backbone_vars(tmp_path, model_and_vars):
    model, variables = model_and_vars
    path = str(tmp_path / "slim" / "model.ckpt")
    n = ckpt_lib.export_slim_checkpoint(
        variables, path, model_scope="resnet_v1_50")
    # resnet50: 53 convs + 53 BNs (4 tensors each) = 265
    assert n == 265

    conv = ckpt_lib.convert_slim_checkpoint(
        path, model_scope="resnet_v1_50")
    flat_c = ckpt_lib._flatten(conv["params"])
    flat_p = ckpt_lib._flatten(variables["params"]["resnet"])
    assert set(p[1:] for p in flat_c if p[0] == "resnet") == set(flat_p)

    # every leaf identical after merge
    merged = ckpt_lib.merge_pretrained(variables, conv)
    for coll in ("params", "batch_stats"):
        a = ckpt_lib._flatten(variables[coll])
        b = ckpt_lib._flatten(merged[coll])
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=str(k))


def test_converted_weights_reproduce_logits(tmp_path, model_and_vars):
    model, variables = model_and_vars
    path = str(tmp_path / "slim2" / "model.ckpt")
    ckpt_lib.export_slim_checkpoint(variables, path,
                                    model_scope="resnet_v1_50")
    conv = ckpt_lib.convert_slim_checkpoint(path, model_scope="resnet_v1_50")

    # fresh init with different seed, then overlay the converted backbone
    fresh = model.init(jax.random.key(7), jnp.zeros((1, 64, 64, 3)),
                       train=False)
    merged = ckpt_lib.merge_pretrained(fresh, conv)
    # heads differ (excluded), so compare backbone features via a
    # head-identical copy: overlay original head params onto merged
    merged["params"]["head"] = variables["params"]["head"]

    x = jax.random.normal(jax.random.key(3), (2, 64, 64, 3))
    want = model.apply(variables, x)["logits"]
    got = model.apply(merged, x)["logits"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_merge_shape_mismatch_raises(model_and_vars):
    _, variables = model_and_vars
    bad = {"params": {"resnet": {"conv1": {
        "kernel": np.zeros((3, 3, 3, 64), np.float32)}}}}
    with pytest.raises(ValueError, match="shape mismatch"):
        ckpt_lib.merge_pretrained(variables, bad)


def test_merge_unknown_var_raises(model_and_vars):
    _, variables = model_and_vars
    bad = {"params": {"resnet": {"conv9": {
        "kernel": np.zeros((1, 1, 3, 4), np.float32)}}}}
    with pytest.raises(KeyError, match="conv9"):
        ckpt_lib.merge_pretrained(variables, bad)


def test_merge_exclude(model_and_vars):
    _, variables = model_and_vars
    conv = {"params": {"resnet": {"conv1": {
        "kernel": np.ones_like(
            np.asarray(variables["params"]["resnet"]["conv1"]["kernel"]))}}}}
    merged = ckpt_lib.merge_pretrained(variables, conv,
                                       exclude=("resnet/conv1",))
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["resnet"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["resnet"]["conv1"]["kernel"]))


def test_real_imagenet_checkpoint_layout(tmp_path, model_and_vars):
    """Every real TF-slim ImageNet ResNet checkpoint carries classifier
    vars (logits/{weights,biases}, (1,1,2048,1000)) and often mean_rgb /
    global_step.  The converter must skip them (they have no Flax
    counterpart) so --init_checkpoint fine-tuning works on real
    checkpoints, not just backbone-only exports."""
    import tensorflow as tf

    model, variables = model_and_vars
    path = str(tmp_path / "slim_full" / "model.ckpt")
    ckpt_lib.export_slim_checkpoint(variables, path,
                                    model_scope="resnet_v1_50")
    # append classifier-scope vars the way slim's train job writes them
    tf1 = tf.compat.v1
    graph = tf1.Graph()
    with graph.as_default():
        reader = tf.train.load_checkpoint(path)
        tf_vars = {
            name: tf1.get_variable(name, initializer=tf1.constant(
                reader.get_tensor(name)))
            for name in reader.get_variable_to_shape_map()}
        extra = {
            "resnet_v1_50/logits/weights":
                np.zeros((1, 1, 2048, 1000), np.float32),
            "resnet_v1_50/logits/biases": np.zeros((1000,), np.float32),
            "resnet_v1_50/mean_rgb": np.zeros((3,), np.float32),
            "global_step": np.int64(123456),
        }
        for name, val in extra.items():
            tf_vars[name] = tf1.get_variable(
                name, initializer=tf1.constant(val))
        saver = tf1.train.Saver(var_list=tf_vars)
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, path, write_meta_graph=False)

    conv = ckpt_lib.convert_slim_checkpoint(path, model_scope="resnet_v1_50")
    flat = ckpt_lib._flatten(conv["params"])
    assert not any("logits" in p or "mean_rgb" in p for p in flat)
    # the documented fine-tune workflow: merge must not raise
    merged = ckpt_lib.merge_pretrained(variables, conv)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["resnet"]["conv1"]["kernel"]),
        np.asarray(variables["params"]["resnet"]["conv1"]["kernel"]))


def test_orbax_dir_warm_start(tmp_path):
    """create_state(init_checkpoint=<orbax dir>) warm-starts the backbone
    from a previous run's CheckpointManager directory."""
    import dataclasses

    from attentionalpoolingaction_tpu import train as train_lib
    from attentionalpoolingaction_tpu.config import TrainConfig

    cfg = TrainConfig(dataset="mpii", backbone="resnet_v1_50",
                      pooling="attention", image_size=64, batch_size=2,
                      bf16_backbone=False, lr_schedule="constant")
    state, _, _, _ = train_lib.create_state(cfg)
    ckdir = str(tmp_path / "prev_run")
    mgr = ckpt_lib.make_manager(ckdir)
    ckpt_lib.save(mgr, state)
    mgr.wait_until_finished()

    cfg2 = dataclasses.replace(cfg, init_checkpoint=ckdir, seed=99)
    state2, _, _, _ = train_lib.create_state(cfg2)
    np.testing.assert_array_equal(
        np.asarray(state2.params["resnet"]["conv1"]["kernel"]),
        np.asarray(state.params["resnet"]["conv1"]["kernel"]))
    # head stays fresh (excluded) — different seeds give different values
    assert not np.array_equal(
        np.asarray(state2.params["head"]["attn_w"]),
        np.asarray(state.params["head"]["attn_w"]))


def test_name_map_examples():
    """Pin the exact slim <-> flax name correspondence."""
    cases = {
        "resnet_v1_101/conv1/weights":
            ("params", ("resnet", "conv1", "kernel")),
        "resnet_v1_101/conv1/BatchNorm/gamma":
            ("params", ("resnet", "conv1_bn", "scale")),
        "resnet_v1_101/conv1/BatchNorm/moving_variance":
            ("batch_stats", ("resnet", "conv1_bn", "var")),
        "resnet_v1_101/block3/unit_23/bottleneck_v1/conv2/weights":
            ("params", ("resnet", "block3/unit_23", "conv2", "kernel")),
        "resnet_v1_101/block1/unit_1/bottleneck_v1/shortcut/BatchNorm/beta":
            ("params", ("resnet", "block1/unit_1", "shortcut_bn", "bias")),
    }
    for slim, want in cases.items():
        got = ckpt_lib._map_slim_name(slim, "resnet_v1_101")
        assert got == want, (slim, got)
        back = ckpt_lib._map_flax_path(want[0], want[1], "resnet_v1_101")
        assert back == slim, (want, back)
