"""Attention-map visualization (the reference's L8 analysis/demo layer,
SURVEY.md sections 1 L8 and 3.4): render the per-class top-down map
(X a_c) and the bottom-up saliency (X b) as heatmap overlays on the input
image — the README figures of the reference.
"""

from __future__ import annotations

import numpy as np


def upsample_map(feat_map: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bilinear-upsample a (h', w') map to (height, width)."""
    import cv2

    m = np.asarray(feat_map, np.float32)
    return cv2.resize(m, (width, height), interpolation=cv2.INTER_LINEAR)


def normalize_map(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, np.float32)
    lo, hi = float(m.min()), float(m.max())
    if hi - lo < 1e-12:
        return np.zeros_like(m)
    return (m - lo) / (hi - lo)


def overlay_heatmap(image_rgb: np.ndarray, attn: np.ndarray,
                    alpha: float = 0.5, *,
                    prenormalized: bool = False) -> np.ndarray:
    """Blend a normalized attention map over an RGB uint8 image (JET
    colormap), returning uint8 RGB.  ``prenormalized`` skips the per-map
    min/max stretch — pass maps already normalized over a larger scope
    (e.g. a whole clip) so their relative intensity survives."""
    import cv2

    h, w = image_rgb.shape[:2]
    m = upsample_map(attn, h, w)
    m = np.clip(m, 0.0, 1.0) if prenormalized else normalize_map(m)
    heat = cv2.applyColorMap((m * 255).astype(np.uint8), cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
    out = (1 - alpha) * image_rgb.astype(np.float32) + alpha * heat
    return np.clip(out, 0, 255).astype(np.uint8)


def make_attention_summary_hook(cfg, writer, every: int,
                                num_images: int = 4):
    """Train-loop hook writing attention-map overlays to TensorBoard every
    ``every`` steps — the image-summary stream of the reference's
    tf.summary training graph (SURVEY.md section 5 "Metrics/logging";
    section 3.4 visualization flow), rebuilt as a host-side hook over
    ``attention_overlays``.

    A fixed probe batch (first ``num_images`` examples of the eval split,
    falling back to the train split) is loaded lazily once; every firing
    re-runs it through the CURRENT params, so TensorBoard's image slider
    shows attention sharpening as training progresses."""
    import dataclasses

    import jax.numpy as jnp

    from attentionalpoolingaction_tpu import evaluate as eval_lib
    from attentionalpoolingaction_tpu import train as train_lib
    from attentionalpoolingaction_tpu.data.datasets import get_dataset

    if cfg.pooling == "avg":
        raise ValueError("attention summaries need an attention head; "
                         f"pooling={cfg.pooling!r}")
    model = train_lib.build_model(cfg)
    probe: dict = {}

    def _host_variables(state):
        """Host-side {params, batch_stats} usable by an eager model.apply.

        On multi-host runs with tensor parallelism the live train state is
        sharded over the global mesh and NOT fully addressable from one
        process — an eager apply would crash the training run (ADVICE r2
        visualize.py:85).  All processes collectively gather the full
        values (process_allgather is a collective — every host must call
        it), then only process 0 renders/writes."""
        import jax

        leaves = jax.tree.leaves((state.params, state.batch_stats))
        if all(getattr(x, "is_fully_addressable", True) for x in leaves):
            return {"params": state.params,
                    "batch_stats": state.batch_stats}
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            {"params": state.params, "batch_stats": state.batch_stats},
            tiled=True)
        return gathered

    def hook(step, state, metrics):
        del metrics
        if every <= 0 or step % every:
            return
        import jax

        variables = _host_variables(state)
        if jax.process_index() != 0:
            return      # gather was collective; only host 0 writes
        if "images" not in probe:
            cfg_probe = cfg
            if not cfg.eval_pattern:
                cfg_probe = dataclasses.replace(
                    cfg, eval_pattern=cfg.train_pattern)
            it = eval_lib.make_eval_input(cfg_probe,
                                          get_dataset(cfg.dataset))
            batch = next(iter(it))
            imgs = batch["image"][:num_images]
            if imgs.ndim == 5:          # multicrop eval: take crop 0
                imgs = imgs[:, 0]
            probe["images"] = np.asarray(
                train_lib.normalize_images(jnp.asarray(imgs)), np.float32)
        out = attention_overlays(model, variables, probe["images"])
        writer.write_images(step, {
            "attention/top_down": np.stack(out["top_down"]),
            "attention/saliency": np.stack(out["saliency"]),
        })

    return hook


def clip_attention_overlays(model, variables, clip, *, class_idx=None,
                            alpha: float = 0.5):
    """Spatiotemporal attention overlays for ONE video clip.

    clip: (T, H, W, 3) float32 *mean-subtracted* frames (temporal order).
    Runs the 5-D clip forward with return_maps=True: the video-level
    prediction's top-down map and the saliency come back per frame
    ((1, T, h, w, C) / (1, T, h, w)), and all frames' overlays share ONE
    normalization so hot frames read hot relative to the whole clip.
    Returns 'top_down'/'saliency' lists of T uint8 RGB overlays, raw
    maps/logits, the video-level 'class_idx', and 'temporal_attention':
    each frame's share of the clip's total attention mass for the
    predicted class — WHICH frames drove the prediction."""
    from attentionalpoolingaction_tpu.data.preprocessing import (
        B_MEAN, G_MEAN, R_MEAN)

    out = model.apply(variables, clip[None], return_maps=True)
    logits = np.asarray(out["logits"])[0]          # (C,)
    maps = np.asarray(out["attn_maps"])[0]         # (T, h, w, C)
    sal = np.asarray(out["saliency"])[0]           # (T, h, w)

    c = int(logits.argmax()) if class_idx is None else int(class_idx)
    top_maps = maps[:, :, :, c]                    # (T, h, w)

    rgb = np.asarray(clip, np.float32) + np.array(
        [R_MEAN, G_MEAN, B_MEAN], np.float32)
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)

    # ONE normalization over the whole (T, h, w) stack, then per-frame
    # prenormalized overlays — normalizing each frame separately would
    # erase the temporal contrast the clip head learned
    top_n, sal_n = normalize_map(top_maps), normalize_map(sal)
    top, bottom = [], []
    for t in range(len(rgb)):
        top.append(overlay_heatmap(rgb[t], top_n[t], alpha,
                                   prenormalized=True))
        bottom.append(overlay_heatmap(rgb[t], sal_n[t], alpha,
                                      prenormalized=True))

    mass = np.maximum(top_maps, 0.0).sum(axis=(1, 2))
    temporal = mass / mass.sum() if mass.sum() > 0 else np.full(
        len(mass), 1.0 / len(mass))
    return {"top_down": top, "saliency": bottom, "logits": logits,
            "attn_maps": maps, "saliency_maps": sal, "class_idx": c,
            "temporal_attention": temporal}


def attention_overlays(model, variables, images, *, class_idx=None,
                       alpha: float = 0.5):
    """Run the model with return_maps=True and produce overlay images.

    images: (B, H, W, 3) float32 *mean-subtracted* network inputs.
    class_idx: int, (B,) array, or None (uses the arg-max predicted class).
    Returns dict with 'top_down' and 'saliency' lists of uint8 RGB images,
    plus raw 'logits', 'attn_maps' (B, h', w', C), 'saliency_maps'.
    """
    from attentionalpoolingaction_tpu.data.preprocessing import (
        B_MEAN, G_MEAN, R_MEAN)

    out = model.apply(variables, images, return_maps=True)
    logits = np.asarray(out["logits"])
    maps = np.asarray(out["attn_maps"])        # (B, h', w', C)
    sal = np.asarray(out["saliency"])          # (B, h', w')

    if class_idx is None:
        class_idx = logits.argmax(-1)
    class_idx = np.broadcast_to(np.asarray(class_idx), (len(maps),))

    rgb = np.asarray(images, np.float32) + np.array(
        [R_MEAN, G_MEAN, B_MEAN], np.float32)
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)

    top, bottom = [], []
    for i in range(len(maps)):
        top.append(overlay_heatmap(rgb[i], maps[i, :, :, class_idx[i]],
                                   alpha))
        bottom.append(overlay_heatmap(rgb[i], sal[i], alpha))
    return {"top_down": top, "saliency": bottom, "logits": logits,
            "attn_maps": maps, "saliency_maps": sal,
            "class_idx": class_idx}
