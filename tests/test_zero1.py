"""ZeRO-1 optimizer-state sharding (SURVEY.md section 2.3 ZeRO/FSDP row):
momentum shards over the data axis, params stay replicated, training is
numerically identical to pure DP."""

import jax
import jax.numpy as jnp
import numpy as np

from attentionalpoolingaction_tpu import train as train_lib
from attentionalpoolingaction_tpu.config import TrainConfig
from attentionalpoolingaction_tpu.data.datasets import get_dataset
from attentionalpoolingaction_tpu.parallel import mesh as mesh_lib


def _cfg(**kw):
    base = dict(
        dataset="mpii", backbone="resnet_v1_50", pooling="attention",
        image_size=64, batch_size=16, bf16_backbone=False,
        learning_rate=1e-3, grad_clip_norm=10.0, lr_schedule="constant",
        mesh_shape=(8,))
    base.update(kw)
    return TrainConfig(**base)


def _batch(cfg, spec, rng):
    b = cfg.batch_size
    return {
        "image": rng.normal(size=(b, cfg.image_size, cfg.image_size, 3)
                            ).astype(np.float32),
        "label": rng.integers(0, spec.num_classes, b).astype(np.int32),
        "transform": np.tile(
            np.array([1.0, 1.0, 0.0, 0.0, 0.0], np.float32), (b, 1)),
    }


def test_zero1_shards_momentum_and_matches_dp(rng):
    cfg = _cfg(zero1=True)
    spec = get_dataset(cfg.dataset)
    state1, _, model, tx = train_lib.create_state(cfg)
    state2 = jax.tree.map(lambda x: jnp.array(x), state1)
    batch = _batch(cfg, spec, rng)
    mesh = mesh_lib.make_mesh((8,), ("data",))

    z_step = train_lib.make_train_step(model, spec, cfg, tx, mesh)
    sz, mz = z_step(state1, mesh_lib.shard_batch(batch, mesh))

    # momentum leaves really shard over 'data'; params stay replicated
    mu = sz.opt_state
    sharded = [l for l in jax.tree.leaves(mu)
               if hasattr(l, "sharding")
               and not l.sharding.is_fully_replicated]
    assert sharded, "no optimizer-state leaf was sharded"
    conv1_mu = [l for l in sharded if l.ndim == 4 and l.shape[:3] ==
                (7, 7, 3)]
    assert conv1_mu and "data" in str(conv1_mu[0].sharding.spec)
    assert jax.tree.leaves(sz.params)[0].sharding.is_fully_replicated

    # numerics: ZeRO-1 == plain DP
    cfg_dp = _cfg(zero1=False)
    dp_step = train_lib.make_train_step(model, spec, cfg_dp, tx, mesh)
    sd, md = dp_step(state2, mesh_lib.shard_batch(batch, mesh))
    np.testing.assert_allclose(float(mz["loss/total"]),
                               float(md["loss/total"]), rtol=1e-5)
    worst = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(sz.params), jax.tree.leaves(sd.params)))
    assert worst < 1e-5


def test_zero1_resume(rng, tmp_path):
    """Checkpoint written under ZeRO-1 shardings restores and resumes to
    the same result as a continuous run."""
    import itertools

    from attentionalpoolingaction_tpu import checkpoint as ckpt_lib

    cfg = _cfg(zero1=True, batch_size=8, checkpoint_every=2)
    spec = get_dataset(cfg.dataset)
    batch = _batch(cfg, spec, rng)
    it = lambda: itertools.repeat(batch)

    sA, _ = train_lib.train(cfg, train_iter=it(), num_steps=4)
    mgr = ckpt_lib.make_manager(tmp_path / "ck_z1")
    train_lib.train(cfg, train_iter=it(), num_steps=2,
                    checkpoint_manager=mgr)
    mgr.wait_until_finished()
    sB, _ = train_lib.train(cfg, train_iter=it(), num_steps=4,
                            checkpoint_manager=mgr)
    mgr.wait_until_finished()  # drain the async save before pytest exits
    assert int(sB.step) == 4
    worst = max(float(jnp.abs(a - b).max()) for a, b in zip(
        jax.tree.leaves(sA.params), jax.tree.leaves(sB.params)))
    assert worst < 1e-5
