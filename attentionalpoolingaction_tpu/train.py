"""Training driver: loss assembly, optimizer, jit/pjit train step, loop.

TPU-native replacement for the reference's slim.learning.train driver
(SURVEY.md sections 2.1 "Train driver" and 3.1): one fused XLA program per
step (forward + losses + backward + optimizer update + gradient psum over
the mesh ``data`` axis), donated state buffers, Orbax checkpoints.
"""

from __future__ import annotations

import logging
import signal
import threading
import time
from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from attentionalpoolingaction_tpu import config as config_lib
from attentionalpoolingaction_tpu.data.datasets import get_dataset
from attentionalpoolingaction_tpu.models.factory import get_model
from attentionalpoolingaction_tpu.ops import heatmap as hm
from attentionalpoolingaction_tpu.parallel import mesh as mesh_lib

log = logging.getLogger(__name__)


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # parameter EMA (config.ema_decay — slim's moving_average_decay);
    # None (an empty pytree node) when disabled, so checkpoints and
    # shardings are unchanged unless the feature is on
    ema_params: Any = None


def setup_compilation_cache(cfg: config_lib.TrainConfig) -> None:
    """Enable JAX's persistent compilation cache when the config asks for
    one: a preemption restart (or eval_cli --follow restart) then reloads
    the train/eval executables from disk in seconds instead of paying the
    ~30-40s TPU compile again.  Threshold overrides make even quick
    programs cacheable (the defaults skip sub-second compiles)."""
    if not cfg.compilation_cache_dir:
        return
    jax.config.update("jax_compilation_cache_dir",
                      cfg.compilation_cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def feature_size(image_size: int) -> int:
    """Output spatial size of the stride-32 ResNet-v1 tail (five ceil-div-2
    stages: conv1/2, pool/2, block1/2, block2/2, block3/2; block4 stride 1)."""
    s = image_size
    for _ in range(5):
        s = -(-s // 2)
    return s


def make_learning_rate(cfg: config_lib.TrainConfig):
    if cfg.lr_schedule == "constant":
        sched = optax.constant_schedule(cfg.learning_rate)
    elif cfg.lr_schedule == "cosine":
        sched = optax.cosine_decay_schedule(
            cfg.learning_rate, cfg.num_steps - cfg.warmup_steps)
    elif cfg.lr_schedule == "exponential":
        # slim's exponential_decay(staircase=True) (SURVEY.md section 2.1)
        sched = optax.exponential_decay(
            cfg.learning_rate, cfg.lr_decay_steps, cfg.lr_decay_rate,
            staircase=True)
    else:
        raise ValueError(cfg.lr_schedule)
    if cfg.warmup_steps:
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, cfg.learning_rate, cfg.warmup_steps),
             sched], [cfg.warmup_steps])
    return sched


def _decay_mask(params):
    """Weight decay applies to conv/dense kernels and pooling weights, not to
    BN scale/offset or biases (slim's regularizer placement)."""
    def mask(path, x):
        del x
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return name in ("kernel", "attn_w", "sal_w")
    return jax.tree_util.tree_map_with_path(mask, params)


def make_optimizer(cfg: config_lib.TrainConfig):
    sched = make_learning_rate(cfg)
    if cfg.optimizer == "momentum":
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask),
            optax.sgd(sched, momentum=cfg.momentum),
        )
    elif cfg.optimizer == "adamw":
        tx = optax.adamw(sched, weight_decay=cfg.weight_decay,
                         mask=_decay_mask)
    else:
        raise ValueError(cfg.optimizer)
    if cfg.grad_clip_norm:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)
    return tx


def classification_loss(logits, labels, *, multi_label: bool,
                        label_smoothing: float = 0.0, mask=None):
    """Softmax CE (MPII/HMDB) or per-class sigmoid CE (HICO) — SURVEY.md
    section 3.1 step 7."""
    if multi_label:
        per = optax.sigmoid_binary_cross_entropy(logits, labels).sum(-1)
    else:
        num_classes = logits.shape[-1]
        onehot = jax.nn.one_hot(labels, num_classes)
        if label_smoothing:
            onehot = (onehot * (1 - label_smoothing)
                      + label_smoothing / num_classes)
        per = optax.softmax_cross_entropy(logits, onehot)
    if mask is not None:
        return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(per)


def pose_targets(batch, *, image_size: int, num_joints: int,
                 sigma: float = 1.0):
    """Render device-side pose heatmap targets at feature-map resolution,
    consistent with the preprocessing crop/flip (transform carried by the
    pipeline — data/preprocessing.py docstring)."""
    fs = feature_size(image_size)
    stride = image_size / fs
    t = batch["transform"]  # (B, 5): scale_y, scale_x, oy, ox, flip

    def per_example(kps, vis, tr):
        kps_c, vis_c = hm.transform_keypoints(
            kps, vis, scale_y=tr[0], scale_x=tr[1], offset_y=tr[2],
            offset_x=tr[3], flip=tr[4] > 0, width=image_size)
        kps_f = kps_c / stride
        return hm.render_gaussian_heatmaps(kps_f, vis_c, fs, fs,
                                           sigma=sigma), vis_c

    heat, vis = jax.vmap(per_example)(
        batch["keypoints"], batch["visibility"], t)
    # background channel: 1 - strongest joint response (pose head predicts
    # num_joints + 1 channels)
    bg = jnp.clip(1.0 - jnp.max(heat, axis=-1, keepdims=True), 0.0, 1.0)
    target = jnp.concatenate([heat, bg], axis=-1)
    vis_b = jnp.concatenate([vis, jnp.ones_like(vis[..., :1])], axis=-1)
    return target, vis_b


def normalize_images(images):
    """Device-side VGG mean subtraction for uint8-transferred batches
    (4x less host->device traffic than f32); float inputs pass through
    (already normalized on host)."""
    from attentionalpoolingaction_tpu.data.preprocessing import (
        B_MEAN, G_MEAN, R_MEAN)

    if jnp.issubdtype(images.dtype, jnp.integer):
        return images.astype(jnp.float32) - jnp.asarray(
            [R_MEAN, G_MEAN, B_MEAN], jnp.float32)
    return images


def make_loss_fn(model, spec, cfg: config_lib.TrainConfig):
    def loss_fn(params, batch_stats, batch, train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        images = normalize_images(batch["image"])
        if train and not cfg.freeze_bn:
            out, updates = model.apply(
                variables, images, train=True,
                mutable=["batch_stats"])
            new_stats = updates["batch_stats"]
        else:
            # freeze_bn: normalize with the (e.g. ImageNet) running stats,
            # gradients still flow to BN scale/bias — the standard slim
            # fine-tuning recipe for small batches
            out = model.apply(variables, images)
            new_stats = batch_stats

        cls_loss = classification_loss(
            out["logits"], batch["label"], multi_label=spec.multi_label,
            label_smoothing=cfg.label_smoothing, mask=batch.get("mask"))
        metrics = {"loss/cls": cls_loss}
        total = cls_loss
        if cfg.pooling == "pose_attention" and spec.has_pose:
            target, visb = pose_targets(
                batch, image_size=cfg.image_size,
                num_joints=spec.num_joints)
            pose_loss = hm.pose_l2_loss(out["pose_heatmaps"], target, visb)
            metrics["loss/pose"] = pose_loss
            total = total + cfg.pose_loss_weight * pose_loss
        metrics["loss/total"] = total
        return total, (new_stats, metrics)

    return loss_fn


def create_state(cfg: config_lib.TrainConfig, *, rng=None) -> TrainState:
    spec = get_dataset(cfg.dataset)
    model = build_model(cfg)
    rng = rng if rng is not None else jax.random.key(cfg.seed)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    if cfg.freeze_bn and not cfg.init_checkpoint:
        # frozen BN normalizes with the RUNNING stats; without a
        # pretrained init those are the (0, 1) init values — legal (tests,
        # scratch experiments) but almost never what a real run wants
        log.warning(
            "freeze_bn=True with no init_checkpoint: BN will normalize "
            "with init-value running stats; the fine-tune presets expect "
            "an ImageNet/slim init_checkpoint")
    if cfg.init_checkpoint:
        # fine-tune init, new-head scopes excluded — the reference's
        # _get_init_fn (SURVEY.md section 3.1 step 8).  Two formats:
        # a TF-slim .ckpt path (converted on the fly) or an Orbax
        # CheckpointManager dir from a previous run (warm start).
        import os

        from attentionalpoolingaction_tpu import checkpoint as ckpt_lib
        if os.path.isdir(cfg.init_checkpoint):
            mgr = ckpt_lib.make_manager(cfg.init_checkpoint)
            restored = ckpt_lib.restore_for_eval(mgr)
            if restored is None:
                raise ValueError(
                    f"no checkpoint steps under {cfg.init_checkpoint}")
            converted = {"params": restored.params,
                         "batch_stats": restored.batch_stats}
        else:
            converted = ckpt_lib.convert_slim_checkpoint(
                cfg.init_checkpoint, model_scope=cfg.backbone)
        variables = ckpt_lib.merge_pretrained(
            dict(variables), converted, exclude=("head", "pose_head"))
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        # a REAL copy, not jnp.asarray: aliased param/EMA buffers would be
        # donated twice by the train step (donate_argnums) and crash
        ema_params=(jax.tree.map(lambda x: jnp.array(x, copy=True),
                                 variables["params"])
                    if cfg.ema_decay else None),
    ), spec, model, tx


def build_model(cfg: config_lib.TrainConfig):
    spec = get_dataset(cfg.dataset)
    return get_model(
        cfg.backbone, num_classes=spec.num_classes, pooling=cfg.pooling,
        rank=cfg.rank, num_joints=spec.num_joints,
        use_pallas=cfg.use_pallas,
        dtype=jnp.bfloat16 if cfg.bf16_backbone else jnp.float32,
        bn_momentum=cfg.bn_momentum, remat_units=cfg.remat_units)


def _train_state_shardings(cfg, mesh, state_example):
    """The ONE place the train state's mesh shardings are derived (TP head
    over "model", optional ZeRO-1 over "data") — used both by the train
    step's in/out_shardings and by checkpoint restore, which must land
    state in exactly the layout the step consumes (no silent first-step
    reshard)."""
    return mesh_lib.state_shardings(
        mesh, state_example, model_axis=mesh_lib.model_axis_of(mesh),
        zero1_axis="data" if cfg.zero1 else None)


def make_train_step(model, spec, cfg: config_lib.TrainConfig, tx, mesh=None):
    """Build the jit'd train step.  With a mesh, batch args are sharded over
    the ``data`` axis and state is replicated; XLA inserts the gradient
    all-reduce (SURVEY.md section 2.4)."""
    loss_fn = make_loss_fn(model, spec, cfg)
    accum = max(int(cfg.grad_accum_steps or 1), 1)

    def _grads_one(params, stats, batch):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(params, stats, batch,
                                                   True)
        return grads, new_stats, metrics

    def _grads_accum(params, stats, batch):
        # microbatch scan (config.grad_accum_steps): ONE compiled step,
        # activations live for one microbatch at a time, grads/metrics
        # average to the full-batch values; BN running stats chain
        # through the scan (each microbatch updates them in sequence)
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        if b % accum:
            raise ValueError(
                f"per-host batch {b} not divisible by "
                f"grad_accum_steps {accum}")
        if mesh is not None and (b // accum) % mesh.shape["data"]:
            raise ValueError(
                f"microbatch {b // accum} (batch {b} / accum {accum}) "
                f"not divisible by the data-axis size "
                f"{mesh.shape['data']} — SPMD would replicate each "
                "microbatch instead of sharding it")
        micro = jax.tree.map(
            lambda x: x.reshape((accum, b // accum) + x.shape[1:]), batch)
        if mesh is not None:
            # keep the microbatch dim sharded over "data" (the reshape
            # must not gather the batch onto one device)
            micro = jax.lax.with_sharding_constraint(
                micro, jax.tree.map(
                    lambda x: NamedSharding(
                        mesh, P(None, "data", *([None] * (x.ndim - 2)))),
                    micro))

        def body(carry, mb):
            stats_c, gacc = carry
            grads, new_stats, metrics = _grads_one(params, stats_c, mb)
            return (new_stats, jax.tree.map(jnp.add, gacc, grads)), metrics

        # zeros-seeded scan over ALL microbatches: the loss/backward body
        # compiles ONCE (seeding from microbatch 0 would compile it a
        # second time unrolled); per-micro metrics stack as scan outputs
        (new_stats, gsum), mstack = jax.lax.scan(
            body, (stats, jax.tree.map(jnp.zeros_like, params)), micro)
        return (jax.tree.map(lambda g: g / accum, gsum), new_stats,
                jax.tree.map(lambda m: jnp.mean(m, axis=0), mstack))

    def step_fn(state: TrainState, batch):
        grads, new_stats, metrics = (
            _grads_one(state.params, state.batch_stats, batch)
            if accum == 1
            else _grads_accum(state.params, state.batch_stats, batch))
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_ema = state.ema_params
        if cfg.ema_decay:
            # TF ExponentialMovingAverage(decay, num_updates=step)
            # semantics: effective decay min(decay, (1+t)/(10+t)) — early
            # EMA tracks params instead of the random init
            t = (state.step + 1).astype(jnp.float32)
            d = jnp.minimum(cfg.ema_decay, (1.0 + t) / (10.0 + t))
            new_ema = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state.ema_params, new_params)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt,
            ema_params=new_ema)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    def jit_with_state(state_example):
        st_sh = _train_state_shardings(cfg, mesh, state_example)
        data = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        return jax.jit(
            step_fn,
            in_shardings=(st_sh, data),
            out_shardings=(st_sh, repl),
            donate_argnums=(0,),
        )

    # in_shardings needs the state structure; build lazily on first call
    _cache = {}

    def wrapped(state, batch):
        if "fn" not in _cache:
            _cache["fn"] = jit_with_state(state)
        return _cache["fn"](state, batch)

    return wrapped


def train(cfg: config_lib.TrainConfig, *, train_iter=None, num_steps=None,
          checkpoint_manager=None, hooks=(), stop_event=None):
    """Run the training loop.  ``train_iter`` yields numpy batches (built
    from data.pipeline when not injected — tests inject synthetic ones).

    ``stop_event`` (threading.Event, optional): when set — by a caller or
    by the installed SIGTERM handler — the loop checkpoints after the
    current step and returns cleanly (preemption-safe shutdown)."""
    from attentionalpoolingaction_tpu.data import pipeline

    setup_compilation_cache(cfg)
    state, spec, model, tx = create_state(cfg)
    mesh = None
    if len(jax.devices()) > 1 and cfg.mesh_shape and (
            int(jnp.prod(jnp.asarray(cfg.mesh_shape))) > 1):
        mesh = mesh_lib.make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    if checkpoint_manager is not None and (
            checkpoint_manager.latest_step() is not None):
        # idempotent restart-resume (SURVEY.md section 5 "Failure
        # detection" row): restore step/params/opt state and continue.
        # With a mesh, restore directly into the shardings the train step
        # consumes (state replicated / head TP-sharded) — no intermediate
        # single-device copy, and the resharding is explicit.
        from attentionalpoolingaction_tpu import checkpoint as ckpt

        # ema_decay may have been toggled between the checkpointed run and
        # this resume; Orbax restore needs target/source tree structures to
        # MATCH, so reconcile before building the abstract target:
        #   off -> on: restore without EMA, then seed it from the restored
        #              params (EMA starts tracking from the resume point)
        #   on -> off: drop the saved EMA (warn — it is not deleted on
        #              disk, just unused by this run)
        ckpt_has_ema = "ema_params" in ckpt.saved_tree_keys(
            checkpoint_manager)
        seed_ema_from_params = False
        if cfg.ema_decay and not ckpt_has_ema:
            log.warning(
                "resume: checkpoint has no ema_params but ema_decay=%s — "
                "seeding EMA from the restored params at this step",
                cfg.ema_decay)
            state = state.replace(ema_params=None)
            seed_ema_from_params = True
        elif ckpt_has_ema and not cfg.ema_decay:
            log.warning(
                "resume: checkpoint carries ema_params but ema_decay is "
                "unset — the saved EMA will not be updated or re-saved")
            state = state.replace(
                ema_params=jax.tree.map(lambda x: x, state.params))
        if mesh is not None:
            shardings = _train_state_shardings(cfg, mesh, state)
            abstract = jax.tree.map(
                lambda x, s: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                                  sharding=s),
                state, shardings)
        else:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        state = ckpt.restore(checkpoint_manager, abstract)
        if seed_ema_from_params:
            # jitted copy, not eager jnp.array: restored params are global
            # jax.Arrays that on multi-host meshes are not fully
            # addressable — an eager copy would raise; under jit the copy
            # is a compiled program whose outputs inherit each leaf's
            # sharding.
            state = state.replace(ema_params=jax.jit(
                lambda p: jax.tree.map(jnp.copy, p))(state.params))
        elif ckpt_has_ema and not cfg.ema_decay:
            state = state.replace(ema_params=None)
        log.info("resumed from checkpoint at step %d", int(state.step))
    step_fn = make_train_step(model, spec, cfg, tx, mesh)

    # cfg.batch_size is the GLOBAL batch; each process's pipeline produces
    # its 1/process_count share (the standard JAX multi-host recipe —
    # SURVEY.md section 2.3 DP row)
    if cfg.batch_size % jax.process_count():
        raise ValueError(
            f"global batch_size {cfg.batch_size} not divisible by "
            f"process_count {jax.process_count()}")
    host_batch = cfg.batch_size // jax.process_count()

    stateful_iter = None  # a Grain iterator whose state we checkpoint
    if cfg.clip_frames > 1:
        # clip-level spatiotemporal pooling: video datasets only, Grain
        # only (needs the random-access video index), and the pose head
        # has no temporal dim — loud config errors, not silent drift
        if not spec.is_video:
            raise ValueError(
                f"clip_frames={cfg.clip_frames} requires a video dataset "
                f"(per-frame records with video ids); {cfg.dataset} is "
                "not one")
        if cfg.input_pipeline != "grain" or not cfg.video_frame_sampling:
            raise ValueError(
                f"clip_frames={cfg.clip_frames} requires "
                "input_pipeline='grain' with video_frame_sampling=True "
                "(TSN segment sampling runs on the random-access video "
                "index)")
    if train_iter is None:
        if cfg.input_pipeline == "grain":
            from attentionalpoolingaction_tpu.data import grain_pipeline
            video_sampling = spec.is_video and cfg.video_frame_sampling
            video_kw = ({"clip_frames": cfg.clip_frames}
                        if video_sampling and cfg.clip_frames > 1 else {})
            train_iter = grain_pipeline.make_train_iterator(
                cfg.train_pattern, spec, batch_size=host_batch,
                image_size=cfg.image_size,
                resize_min=cfg.resize_min_resolved,
                resize_max=cfg.resize_max_resolved, seed=cfg.seed,
                shard_index=jax.process_index(),
                shard_count=jax.process_count(),
                num_workers=cfg.grain_workers,
                transfer_uint8=cfg.transfer_uint8,
                video_sampling=video_sampling, **video_kw)
            stateful_iter = train_iter
        else:
            if spec.is_video and cfg.video_frame_sampling:
                # per-epoch random-frame-per-video (the HMDB training
                # protocol) on tf.data: group_by_window draws one fresh
                # frame per video per epoch.  NOT silently iterating
                # pre-extracted frames — that would be a protocol drift
                # behind a config flag (VERDICT r2 next #7).
                if cfg.tfdata_checkpoint:
                    raise ValueError(
                        "tfdata_checkpoint=True is not supported with "
                        "video_frame_sampling (group_by_window state "
                        "is not symbolically checkpointable); use "
                        "input_pipeline='grain' for exact mid-epoch "
                        "video-sampled resume")
                train_iter = pipeline.make_video_train_iterator(
                    cfg.train_pattern, spec, batch_size=host_batch,
                    image_size=cfg.image_size,
                    resize_min=cfg.resize_min_resolved,
                    resize_max=cfg.resize_max_resolved, seed=cfg.seed,
                    transfer_uint8=cfg.transfer_uint8,
                    frames_per_video=cfg.frames_per_video)
            else:
                train_iter = pipeline.make_train_iterator(
                    cfg.train_pattern, spec, batch_size=host_batch,
                    image_size=cfg.image_size,
                    resize_min=cfg.resize_min_resolved,
                    resize_max=cfg.resize_max_resolved, seed=cfg.seed,
                    transfer_uint8=cfg.transfer_uint8,
                    checkpointable=cfg.tfdata_checkpoint)
                if cfg.tfdata_checkpoint:
                    stateful_iter = train_iter
    elif hasattr(train_iter, "get_state"):
        stateful_iter = train_iter

    if stateful_iter is None:
        # stateless tf.data path: overlap H2D with compute
        if mesh is not None:
            train_iter = pipeline.prefetch_to_device(
                train_iter, sharding=mesh_lib.batch_sharding(mesh))
        else:
            train_iter = pipeline.prefetch_to_device(train_iter)
    else:
        # Stateful (checkpointable) iterators get the same H2D overlap via
        # StatefulPrefetchIterator, which snapshots get_state() per pulled
        # batch so the state saved at a checkpoint matches the last batch
        # the loop CONSUMED (not the prefetch position) — exact mid-epoch
        # resume is preserved.  On a mesh it also assembles each host's
        # batch into a global array; REQUIRED multi-process: a raw
        # per-host numpy batch fed to a jit whose in_shardings span the
        # global mesh would be treated as the (same) global value on
        # every process — silently halving the batch and discarding half
        # of each host's pipeline output.
        train_iter = pipeline.StatefulPrefetchIterator(
            stateful_iter,
            sharding=(mesh_lib.batch_sharding(mesh)
                      if mesh is not None else None))
        stateful_iter = train_iter  # checkpoint the consumed-state view

    if cfg.data_echo > 1:
        # batch-level data echoing: sits ABOVE the device-prefetch layer
        # so each echoed step reuses the same on-device batch (the train
        # step donates only its state, never the batch)
        train_iter = pipeline.EchoIterator(train_iter, cfg.data_echo)
        if stateful_iter is not None:
            stateful_iter = train_iter   # echo phase checkpoints too

    if stateful_iter is not None and checkpoint_manager is not None and (
            checkpoint_manager.latest_step() is not None):
        # resume the data stream exactly where it left off (Grain records
        # its own position — SURVEY.md section 5 checkpoint/resume row).
        # State is per-process: each host has its own iterator over its
        # input shard, so each saves/restores its own file.  Restores into
        # the OUTERMOST wrapper so prefetch/echo layers reset coherently.
        iter_path = _grain_state_path(
            checkpoint_manager, checkpoint_manager.latest_step(),
            jax.process_index())
        if not iter_path.exists() and jax.process_count() == 1:
            # legacy single-process layout (round-1 checkpoints)
            iter_path = _grain_state_path(
                checkpoint_manager, checkpoint_manager.latest_step(), None)
        if iter_path.exists():
            import json
            stateful_iter.set_state(_normalize_iter_state(
                json.loads(iter_path.read_text()), cfg.data_echo))
            log.info("resumed data iterator from %s", iter_path)

    def save_checkpoint(at_step: int):
        from attentionalpoolingaction_tpu import checkpoint as ckpt
        ckpt.save(checkpoint_manager, state)
        if stateful_iter is not None:
            import json
            _grain_state_path(
                checkpoint_manager, at_step, jax.process_index()
            ).write_text(json.dumps(stateful_iter.get_state()))
            _gc_grain_state(checkpoint_manager, keep_step=at_step)

    # Preemption-safe shutdown (SURVEY.md section 5 "Failure detection"
    # row): pod preemptions/maintenance arrive as SIGTERM.  The handler
    # only sets a flag; the loop finishes the in-flight step, saves a
    # checkpoint (+ iterator state) and returns cleanly, so the restart
    # resumes from the preemption point instead of the last periodic save.
    if stop_event is None:
        stop_event = threading.Event()
    prev_handler = None
    if checkpoint_manager is not None:
        try:
            prev_handler = signal.signal(
                signal.SIGTERM, lambda sig, frame: stop_event.set())
        except ValueError:
            pass  # not the main thread: rely on the caller's stop_event

    num_steps = num_steps or cfg.num_steps
    history = []
    t0 = time.time()
    start_step = int(state.step)
    step = start_step
    # Multi-host stop agreement (ADVICE r2 train.py:446): each host's
    # SIGTERM flag is host-local and async dispatch lets python loops
    # drift, so hosts must agree collectively on WHICH step to stop at —
    # a one-step-delayed all-reduce keeps the pipeline async while
    # guaranteeing every process checkpoints the same step.
    from attentionalpoolingaction_tpu.parallel import multihost
    flag_reduce = multihost.FlagAllReduce()
    pending_flag = flag_reduce.dispatch(False)
    try:
        for _ in range(max(num_steps - start_step, 0)):
            batch = next(train_iter)
            state, metrics = step_fn(state, batch)
            step += 1
            if step % cfg.log_every == 0 or step == num_steps:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                log.info("step %d %s (%.2f s)", step, metrics, dt)
                history.append({"step": step, **metrics})
            for hook in hooks:
                hook(step, state, metrics)
            # read the stop flag AFTER hooks so a stop raised during this
            # step (signal or hook) checkpoints THIS step, not the next.
            # Single-host: the local flag directly (no delay).  Multi-host:
            # the agreed value from LAST step's dispatch (host-consistent).
            local_flag = stop_event.is_set()
            if jax.process_count() == 1:
                stopping = local_flag
            else:
                stopping = flag_reduce.read(pending_flag)
                pending_flag = flag_reduce.dispatch(local_flag)
            if checkpoint_manager is not None and (
                    step % cfg.checkpoint_every == 0 or step == num_steps
                    or stopping):
                save_checkpoint(step)
            if stopping:
                log.warning(
                    "stop requested (SIGTERM/preemption): checkpointed at "
                    "step %d and exiting cleanly", step)
                break
    finally:
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
    return state, history


def _normalize_iter_state(state, data_echo: int):
    """Reconcile a checkpointed iterator state with the CURRENT data_echo
    setting (the toggle may change across a restart, like ema_decay).

    Echo-wrapped states are ``{"inner_before": ..., "phase": ...}``;
    plain states are the inner pipeline's own dict.  echo->echo and
    plain->plain pass through; plain->echo starts at phase 0;
    echo->plain resumes from the inner position, dropping any remaining
    repeats of a mid-echo in-flight batch (logged — that is the only
    information a data_echo toggle can lose)."""
    is_echo = (isinstance(state, dict)
               and set(state) == {"inner_before", "phase"})
    if data_echo > 1:
        return state if is_echo else {"inner_before": state, "phase": 0}
    if is_echo:
        if state["phase"]:
            log.warning(
                "resuming with data_echo=1 from a mid-echo checkpoint: "
                "the in-flight batch's remaining %d echoes are dropped",
                state["phase"])
        return state["inner_before"]
    return state


def _grain_state_path(manager, step: int, process_index: int | None):
    """Grain iterator state file beside the Orbax step dirs.  One file per
    process — each host checkpoints its OWN iterator over its input shard
    (a single shared file would be last-writer-wins across hosts).
    ``process_index=None`` is the legacy single-file layout, read-only."""
    import pathlib

    suffix = "" if process_index is None else f"_p{process_index}"
    return pathlib.Path(
        manager.directory) / f"grain_iter_{step}{suffix}.json"


def _gc_grain_state(manager, keep_step: int):
    """Drop iterator-state files for steps Orbax has pruned (max_to_keep),
    so stale JSONs can't pair with deleted checkpoints.  ``keep_step`` is
    the just-saved step (async save may not list it yet)."""
    import re

    keep = set(manager.all_steps()) | {keep_step}
    import pathlib

    for p in pathlib.Path(manager.directory).glob("grain_iter_*.json"):
        m = re.fullmatch(r"grain_iter_(\d+)(?:_p\d+)?\.json", p.name)
        if m and int(m.group(1)) not in keep:
            p.unlink(missing_ok=True)
