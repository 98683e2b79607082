"""Unit tests: config presets/overrides, LR schedules, decay masking,
feature-size arithmetic, loss functions."""

import jax.numpy as jnp
import numpy as np
import pytest

from attentionalpoolingaction_tpu import config as config_lib
from attentionalpoolingaction_tpu import train as train_lib


def test_presets_cover_baseline_configs():
    names = set(config_lib.PRESETS)
    # every BASELINE.json config has a preset...
    assert {"mpii_rank1_224", "hico_multilabel", "mpii_pose_attention",
            "hmdb51_rgb", "mpii_rank5_450_mesh"} <= names
    # ...plus the TPU-native extensions (keep this list exact so a new
    # preset is a conscious decision, not drift)
    assert names - {"mpii_rank1_224", "hico_multilabel",
                    "mpii_pose_attention", "hmdb51_rgb",
                    "mpii_rank5_450_mesh"} == {"hmdb51_clip8"}
    for name, cfg in config_lib.PRESETS.items():
        assert cfg.pooling in ("avg", "attention", "pose_attention")


def test_get_config_overrides():
    cfg = config_lib.get_config("mpii_rank1_224", batch_size=64,
                                learning_rate=0.5)
    assert cfg.batch_size == 64 and cfg.learning_rate == 0.5
    with pytest.raises(TypeError):
        config_lib.get_config("mpii_rank1_224", not_a_field=1)


def test_parse_overrides_literals():
    out = config_lib.parse_overrides(
        ["batch_size=64", "bf16_backbone=False", "lr_schedule=cosine",
         "mesh_shape=(4,2)"])
    assert out == {"batch_size": 64, "bf16_backbone": False,
                   "lr_schedule": "cosine", "mesh_shape": (4, 2)}


def test_resize_defaults():
    cfg = config_lib.get_config("mpii_rank1_224")
    assert cfg.resize_min_resolved == 256
    assert cfg.resize_max_resolved == 512
    cfg450 = config_lib.get_config("mpii_rank5_450_mesh")
    assert cfg450.resize_min_resolved == round(450 * 256 / 224)


def test_compilation_cache_dir_populates(tmp_path):
    """compilation_cache_dir turns on JAX's persistent executable cache
    (fast preemption-restart re-jits); entries land in the given dir."""
    import jax

    cache = tmp_path / "xla_cache"
    cfg = config_lib.TrainConfig(compilation_cache_dir=str(cache))
    train_lib.setup_compilation_cache(cfg)
    try:
        @jax.jit
        def probe(x):
            return (x * 3.0 + 1.0).sum()

        float(probe(jnp.arange(2048.0)))
        assert any(cache.iterdir()), "no cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
    # None leaves JAX defaults untouched
    train_lib.setup_compilation_cache(
        config_lib.TrainConfig(compilation_cache_dir=None))
    assert jax.config.jax_compilation_cache_dir is None


@pytest.mark.parametrize("size,expected", [
    (224, 7), (448, 14), (450, 15), (64, 2), (96, 3)])
def test_feature_size(size, expected):
    assert train_lib.feature_size(size) == expected


def test_bench_vs_last_round_gated_on_metric_name(tmp_path, monkeypatch):
    """bench's regression compare only pairs same-metric rounds: a CPU dev
    run after a TPU round must not emit a spurious ~0.05x REGRESSION note
    (platform and batch are embedded in the metric name)."""
    import json

    import bench

    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    tpu_metric = ("resnet101_attnpool_fwd_images_per_sec_per_chip"
                  "_224px_bf16_b512_tpu")
    (tmp_path / "BENCH_r07.json").write_text(json.dumps(
        {"parsed": {"metric": tpu_metric, "value": 9000.0}}))
    assert bench._last_round_parsed(tpu_metric)["value"] == 9000.0
    cpu_metric = tpu_metric.replace("b512_tpu", "b8_cpu")
    assert bench._last_round_parsed(cpu_metric) is None
    # newest round wins even with a lower number; every parsed field
    # comes back (train/int8/448px points are regression-checked too)
    (tmp_path / "BENCH_r08.json").write_text(json.dumps(
        {"parsed": {"metric": tpu_metric, "value": 8000.0,
                    "train_images_per_sec_per_chip": 2000.0}}))
    parsed = bench._last_round_parsed(tpu_metric)
    assert parsed["value"] == 8000.0
    assert parsed["train_images_per_sec_per_chip"] == 2000.0
    # malformed newest file -> no comparison, no crash
    (tmp_path / "BENCH_r09.json").write_text("not json")
    assert bench._last_round_parsed(tpu_metric) is None


def test_lr_schedules():
    for sched_name in ("constant", "cosine", "exponential"):
        cfg = config_lib.get_config(
            "mpii_rank1_224", lr_schedule=sched_name, warmup_steps=10,
            num_steps=100)
        sched = train_lib.make_learning_rate(cfg)
        v0 = float(sched(0))
        v10 = float(sched(10))
        assert v0 == pytest.approx(0.0, abs=1e-6)  # warmup start
        assert v10 == pytest.approx(cfg.learning_rate, rel=1e-3)


def test_exponential_staircase():
    cfg = config_lib.get_config("mpii_rank1_224", lr_schedule="exponential",
                                lr_decay_steps=10, lr_decay_rate=0.5)
    sched = train_lib.make_learning_rate(cfg)
    assert float(sched(9)) == pytest.approx(cfg.learning_rate)
    assert float(sched(10)) == pytest.approx(cfg.learning_rate * 0.5)
    assert float(sched(25)) == pytest.approx(cfg.learning_rate * 0.25)


def test_decay_mask_excludes_bn_and_biases():
    params = {
        "resnet": {"conv1": {"kernel": jnp.zeros((3, 3))},
                   "conv1_bn": {"scale": jnp.zeros(3),
                                "bias": jnp.zeros(3)}},
        "head": {"attn_w": jnp.zeros((4, 5, 1)),
                 "attn_b": jnp.zeros((5, 1)),
                 "sal_w": jnp.zeros((4, 1)),
                 "sal_b": jnp.zeros((1,))},
    }
    mask = train_lib._decay_mask(params)
    assert mask["resnet"]["conv1"]["kernel"] is True
    assert mask["resnet"]["conv1_bn"]["scale"] is False
    assert mask["resnet"]["conv1_bn"]["bias"] is False
    assert mask["head"]["attn_w"] is True
    assert mask["head"]["attn_b"] is False
    assert mask["head"]["sal_w"] is True


def test_classification_loss_multilabel_vs_softmax():
    logits = jnp.asarray([[2.0, -1.0, 0.5]])
    l_soft = train_lib.classification_loss(
        logits, jnp.asarray([0]), multi_label=False)
    np.testing.assert_allclose(
        float(l_soft),
        -np.log(np.exp(2.0) / np.exp([2.0, -1.0, 0.5]).sum()), rtol=1e-5)
    l_multi = train_lib.classification_loss(
        logits, jnp.asarray([[1.0, 0.0, 1.0]]), multi_label=True)
    assert float(l_multi) > 0


def test_classification_loss_mask():
    logits = jnp.zeros((4, 5))
    labels = jnp.zeros((4,), jnp.int32)
    mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    masked = train_lib.classification_loss(
        logits, labels, multi_label=False, mask=mask)
    full = train_lib.classification_loss(logits, labels, multi_label=False)
    np.testing.assert_allclose(float(masked), float(full), rtol=1e-6)


def test_label_smoothing_changes_loss():
    logits = jnp.asarray([[3.0, 0.0, 0.0]])
    labels = jnp.asarray([0])
    a = train_lib.classification_loss(logits, labels, multi_label=False)
    b = train_lib.classification_loss(logits, labels, multi_label=False,
                                      label_smoothing=0.1)
    assert float(b) > float(a)


def test_freeze_bn_keeps_stats():
    import numpy as np_

    from attentionalpoolingaction_tpu.data.datasets import get_dataset

    cfg = config_lib.TrainConfig(
        dataset="mpii", backbone="resnet_v1_50", pooling="attention",
        image_size=64, batch_size=2, bf16_backbone=False,
        learning_rate=1e-3, lr_schedule="constant", freeze_bn=True)
    spec = get_dataset("mpii")
    state, _, model, tx = train_lib.create_state(cfg)
    step = train_lib.make_train_step(model, spec, cfg, tx)
    batch = {
        "image": jnp.asarray(
            np_.random.default_rng(0).normal(size=(2, 64, 64, 3)),
            jnp.float32),
        "label": jnp.asarray([1, 2], jnp.int32),
        "transform": jnp.tile(jnp.asarray([1, 1, 0, 0, 0], jnp.float32),
                              (2, 1)),
    }
    import jax

    before = jax.tree.map(lambda x: np_.asarray(x).copy(),
                          state.batch_stats)
    new_state, _ = step(state, batch)
    after = new_state.batch_stats
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np_.testing.assert_array_equal(np_.asarray(a), np_.asarray(b))


def test_grad_accum_matches_full_batch():
    """grad_accum_steps=2 with freeze_bn must produce the SAME update as
    the full-batch step (mean of equal-sized microbatch grads == the
    full-batch grad), and metrics average to the full-batch values.
    Divisibility errors are loud."""
    import jax

    from attentionalpoolingaction_tpu.data.datasets import get_dataset

    def mk(accum):
        return config_lib.TrainConfig(
            dataset="mpii", backbone="resnet_v1_50", pooling="attention",
            image_size=64, batch_size=4, bf16_backbone=False,
            learning_rate=1e-2, lr_schedule="constant", freeze_bn=True,
            grad_clip_norm=None, grad_accum_steps=accum)

    spec = get_dataset("mpii")
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(4, 64, 64, 3)), jnp.float32),
        "label": jnp.asarray([1, 2, 3, 4], jnp.int32),
        "transform": jnp.tile(jnp.asarray([1, 1, 0, 0, 0], jnp.float32),
                              (4, 1)),
    }
    cfg1, cfg2 = mk(1), mk(2)
    s1, _, model, tx1 = train_lib.create_state(cfg1)
    s2 = jax.tree.map(lambda x: jnp.array(x), s1)
    step1 = train_lib.make_train_step(model, spec, cfg1, tx1)
    step2 = train_lib.make_train_step(model, spec, mk(2),
                                      train_lib.make_optimizer(cfg2))
    n1, m1 = step1(s1, batch)
    n2, m2 = step2(s2, batch)
    np.testing.assert_allclose(float(m1["loss/total"]),
                               float(m2["loss/total"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]),
                               float(m2["grad_norm"]), rtol=1e-4)
    worst = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(n1.params), jax.tree.leaves(n2.params)))
    assert worst < 1e-5, worst

    # indivisible batch is a loud error
    bad = {k: v[:3] for k, v in batch.items()}
    with pytest.raises(ValueError, match="grad_accum_steps"):
        step2(jax.tree.map(lambda x: jnp.array(x), n2), bad)


def test_grad_accum_on_mesh():
    """The microbatch scan composes with the mesh train step: the
    reshaped batch keeps its microbatch dim sharded over 'data' and the
    step matches the accum=1 mesh step under freeze_bn."""
    import jax

    from attentionalpoolingaction_tpu.data.datasets import get_dataset
    from attentionalpoolingaction_tpu.parallel import mesh as mesh_lib

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")

    def mk(accum):
        return config_lib.TrainConfig(
            dataset="mpii", backbone="resnet_v1_50", pooling="attention",
            image_size=64, batch_size=16, bf16_backbone=False,
            learning_rate=1e-2, lr_schedule="constant", freeze_bn=True,
            grad_clip_norm=None, grad_accum_steps=accum, mesh_shape=(8,))

    spec = get_dataset("mpii")
    rng = np.random.default_rng(1)
    batch = {
        "image": np.asarray(rng.normal(size=(16, 64, 64, 3)), np.float32),
        "label": rng.integers(0, 393, 16).astype(np.int32),
        "transform": np.tile(np.asarray([1, 1, 0, 0, 0], np.float32),
                             (16, 1)),
    }
    mesh = mesh_lib.make_mesh((8,), ("data",))
    cfg1, cfg2 = mk(1), mk(2)
    s1, _, model, tx1 = train_lib.create_state(cfg1)
    s2 = jax.tree.map(lambda x: jnp.array(x), s1)
    step1 = train_lib.make_train_step(model, spec, cfg1, tx1, mesh)
    step2 = train_lib.make_train_step(model, spec, cfg2,
                                      train_lib.make_optimizer(cfg2), mesh)
    n1, m1 = step1(s1, mesh_lib.shard_batch(batch, mesh))
    n2, m2 = step2(s2, mesh_lib.shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m1["loss/total"]),
                               float(m2["loss/total"]), rtol=1e-5)
    worst = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(n1.params), jax.tree.leaves(n2.params)))
    assert worst < 1e-4, worst


class _FakeStatefulIterator:
    """Counting iterator with Grain's get_state/set_state protocol: state
    is the number of batches pulled; batch i is [i, i]."""

    def __init__(self, n=10):
        self.n = n
        self.pos = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self.pos >= self.n:
            raise StopIteration
        self.pos += 1
        return {"x": np.full((2,), self.pos - 1, np.int32)}

    def get_state(self):
        return {"pos": self.pos}

    def set_state(self, state):
        self.pos = state["pos"]


def test_stateful_prefetch_state_tracks_consumed_not_prefetched():
    """StatefulPrefetchIterator runs the inner iterator AHEAD for H2D
    overlap, but get_state() must describe the last CONSUMED batch — a
    checkpoint+restore mid-stream must not skip the in-flight prefetched
    batches (VERDICT r3 missing #3)."""
    from attentionalpoolingaction_tpu.data.pipeline import (
        StatefulPrefetchIterator)

    inner = _FakeStatefulIterator(n=10)
    it = StatefulPrefetchIterator(inner, size=3)
    assert it.get_state() == {"pos": 0}       # nothing consumed yet
    got = [int(next(it)["x"][0]) for _ in range(4)]
    assert got == [0, 1, 2, 3]
    assert inner.pos > 4                      # really prefetching ahead
    assert it.get_state() == {"pos": 4}       # ...but state says consumed

    # "restore" into a fresh pipeline from the checkpointed state: the
    # stream continues exactly where consumption stopped
    inner2 = _FakeStatefulIterator(n=10)
    it2 = StatefulPrefetchIterator(inner2, size=3)
    it2.set_state({"pos": 4})
    rest = [int(b["x"][0]) for b in it2]
    assert rest == [4, 5, 6, 7, 8, 9]         # nothing skipped, clean EOI
    assert it2.get_state() == {"pos": 10}

    # batches land on device (jax arrays), i.e. H2D already dispatched
    b = next(StatefulPrefetchIterator(_FakeStatefulIterator(), size=2))
    import jax
    assert isinstance(b["x"], jax.Array)


def test_stateful_prefetch_set_state_discards_inflight():
    """set_state mid-stream must drop already-prefetched batches (they
    belong to the abandoned position) and continue from the new one."""
    from attentionalpoolingaction_tpu.data.pipeline import (
        StatefulPrefetchIterator)

    it = StatefulPrefetchIterator(_FakeStatefulIterator(n=8), size=3)
    next(it), next(it)                        # consumed 0, 1; prefetch ahead
    it.set_state({"pos": 6})
    assert [int(b["x"][0]) for b in it] == [6, 7]


def test_echo_iterator_repeats_and_checkpoints():
    """EchoIterator yields each inner batch E times; its state pairs the
    inner position with the echo phase so a mid-echo restore replays the
    in-flight batch's REMAINING echoes exactly."""
    from attentionalpoolingaction_tpu.data.pipeline import EchoIterator

    it = EchoIterator(_FakeStatefulIterator(n=4), echo=3)
    vals = [int(next(it)["x"][0]) for _ in range(7)]
    assert vals == [0, 0, 0, 1, 1, 1, 2]       # 2 echoes of batch 2 left

    state = it.get_state()
    assert state["phase"] == 1                  # batch 2 echoed once
    it2 = EchoIterator(_FakeStatefulIterator(n=4), echo=3)
    it2.set_state(state)
    rest = [int(b["x"][0]) for b in it2]
    assert rest == [2, 2, 3, 3, 3]              # remaining echoes + batch 3

    # cycle boundary: phase-0 state must NOT replay the consumed batch
    it3 = EchoIterator(_FakeStatefulIterator(n=4), echo=3)
    for _ in range(3):
        next(it3)                               # batch 0 fully consumed
    s3 = it3.get_state()
    assert s3 == {"inner_before": {"pos": 1}, "phase": 0}
    it4 = EchoIterator(_FakeStatefulIterator(n=4), echo=3)
    it4.set_state(s3)
    assert int(next(it4)["x"][0]) == 1

    # echoed repeats are the SAME object (device batch reuse, no extra H2D)
    it5 = EchoIterator(_FakeStatefulIterator(n=2), echo=2)
    a, b = next(it5), next(it5)
    assert a is b

    # stateless inner: echoing works, checkpointing is refused loudly
    it6 = EchoIterator(iter([{"x": np.zeros(1)}] * 2), echo=2)
    next(it6)
    import pytest
    with pytest.raises(AttributeError):
        it6.get_state()
    with pytest.raises(ValueError):
        EchoIterator(iter([]), echo=0)


def test_echo_iterator_checkpoint_right_after_mid_echo_restore():
    """A checkpoint taken mid-echo AFTER a mid-echo restore (no batch
    boundary crossed in between) must re-save the restored inner_before,
    not the construction-time inner state — the checkpoint-every-step
    preemption corner."""
    from attentionalpoolingaction_tpu.data.pipeline import EchoIterator

    it = EchoIterator(_FakeStatefulIterator(n=6), echo=3)
    for _ in range(4):
        next(it)                                # batch 1 echoed once
    saved = it.get_state()
    assert saved["phase"] == 1

    it2 = EchoIterator(_FakeStatefulIterator(n=6), echo=3)
    it2.set_state(saved)
    next(it2)                                   # phase 1 -> 2, same batch
    resaved = it2.get_state()
    assert resaved["inner_before"] == saved["inner_before"]
    assert resaved["phase"] == 2

    it3 = EchoIterator(_FakeStatefulIterator(n=6), echo=3)
    it3.set_state(resaved)
    # one echo of batch 1 left, then batch 2 starts
    vals = [int(next(it3)["x"][0]) for _ in range(2)]
    assert vals == [1, 2]


def test_normalize_iter_state_echo_toggles():
    from attentionalpoolingaction_tpu.train import _normalize_iter_state

    plain = {"pos": 7}
    wrapped = {"inner_before": {"pos": 7}, "phase": 2}
    assert _normalize_iter_state(plain, 1) == plain
    assert _normalize_iter_state(plain, 3) == {
        "inner_before": plain, "phase": 0}
    assert _normalize_iter_state(wrapped, 3) == wrapped
    assert _normalize_iter_state(wrapped, 1) == plain      # drops echoes
