"""Pose keypoint -> Gaussian heatmap targets, and crop/flip-consistent
keypoint transforms.

The reference renders MPII 16-joint pose keypoints into per-joint heatmaps at
the backbone's output resolution and supervises an auxiliary 1x1-conv pose
head with an L2 loss (SURVEY.md sections 2.1 "Pose-regularization head" and
3.1 step 3; BASELINE.json config "MPII pose-regularized variant").

Everything here is pure jnp, shape-static, and vmappable, so it runs inside
the jit'd train step (the heatmap render is a few fused VPU ops — far cheaper
than doing it on host and shipping (H, W, K) float targets over PCIe).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# MPII joint pairs swapped under horizontal flip:
# (r_ankle,l_ankle)(r_knee,l_knee)(r_hip,l_hip)(r_wrist,l_wrist)
# (r_elbow,l_elbow)(r_shoulder,l_shoulder) under the standard MPII ordering
# 0 r-ankle 1 r-knee 2 r-hip 3 l-hip 4 l-knee 5 l-ankle 6 pelvis 7 thorax
# 8 upper-neck 9 head-top 10 r-wrist 11 r-elbow 12 r-shoulder 13 l-shoulder
# 14 l-elbow 15 l-wrist
MPII_NUM_JOINTS = 16
# numpy (not jnp): a module-level device array would initialize the JAX
# backend at import time, before CLIs can select a platform
MPII_FLIP_PERM = np.array(
    [5, 4, 3, 2, 1, 0, 6, 7, 8, 9, 15, 14, 13, 12, 11, 10], dtype=np.int32
)


def render_gaussian_heatmaps(keypoints, visibility, height, width, sigma=1.0):
    """Render (K,) keypoints to (height, width, K) Gaussian heatmaps.

    keypoints:  (..., K, 2) in (y, x) map-pixel coordinates (float).
    visibility: (..., K) bool/0-1; invisible joints render all-zero maps.
    Peak value is 1.0 at the keypoint (un-normalized Gaussian), matching the
    standard MPII target construction the reference trains against.
    """
    keypoints = jnp.asarray(keypoints, jnp.float32)
    vis = jnp.asarray(visibility, jnp.float32)
    yy = jnp.arange(height, dtype=jnp.float32)[:, None, None]   # (H,1,1)
    xx = jnp.arange(width, dtype=jnp.float32)[None, :, None]    # (1,W,1)
    ky = keypoints[..., 0][..., None, None, :]                  # (...,1,1,K)
    kx = keypoints[..., 1][..., None, None, :]
    d2 = (yy - ky) ** 2 + (xx - kx) ** 2                        # (...,H,W,K)
    heat = jnp.exp(-d2 / (2.0 * sigma ** 2))
    # zero out off-map keypoints as well as invisible ones
    on_map = (
        (keypoints[..., 0] >= 0) & (keypoints[..., 0] <= height - 1)
        & (keypoints[..., 1] >= 0) & (keypoints[..., 1] <= width - 1)
    ).astype(jnp.float32)
    mask = (vis * on_map)[..., None, None, :]
    return heat * mask


def transform_keypoints(keypoints, visibility, *, scale_y, scale_x,
                        offset_y, offset_x, flip, width,
                        flip_perm=MPII_FLIP_PERM):
    """Apply the same resize -> crop -> (maybe) horizontal-flip transform the
    image preprocessing applied, to (K, 2) (y, x) keypoints.

    scale_*: resize factors; offset_*: crop origin in *resized* pixels;
    flip: scalar bool; width: post-crop width (for mirroring x).
    Returns transformed (keypoints, visibility); joints pushed off the crop
    keep their coordinates (render masks them) and under flip, left/right
    joints are swapped with ``flip_perm``.
    """
    keypoints = jnp.asarray(keypoints, jnp.float32)
    y = keypoints[..., 0] * scale_y - offset_y
    x = keypoints[..., 1] * scale_x - offset_x
    x_flipped = (width - 1) - x
    x = jnp.where(flip, x_flipped, x)
    kps = jnp.stack([y, x], axis=-1)
    kps_f = jnp.take(kps, flip_perm, axis=-2)
    vis_f = jnp.take(visibility, flip_perm, axis=-1)
    kps = jnp.where(flip, kps_f, kps)
    vis = jnp.where(flip, vis_f, visibility)
    return kps, vis


def pose_l2_loss(pred, target, visibility=None):
    """Mean squared error between predicted and target heatmaps.

    pred/target: (B, H, W, K).  If ``visibility`` (B, K) is given, loss is
    averaged only over visible joints (the reference's aux loss skips joints
    with no annotation — SURVEY.md section 2.1)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    sq = (pred - target) ** 2
    if visibility is None:
        return jnp.mean(sq)
    vis = jnp.asarray(visibility, jnp.float32)[:, None, None, :]
    denom = jnp.maximum(jnp.sum(vis) * sq.shape[1] * sq.shape[2], 1.0)
    return jnp.sum(sq * vis) / denom
