"""Keypoint -> heatmap rendering and crop/flip-consistent transforms."""

import jax.numpy as jnp
import numpy as np

from attentionalpoolingaction_tpu.ops.heatmap import (
    MPII_FLIP_PERM,
    pose_l2_loss,
    render_gaussian_heatmaps,
    transform_keypoints,
)


def test_peak_at_keypoint():
    kps = jnp.array([[3.0, 5.0], [0.0, 0.0]])
    vis = jnp.array([1.0, 0.0])
    hm = render_gaussian_heatmaps(kps, vis, 7, 9, sigma=1.0)
    assert hm.shape == (7, 9, 2)
    assert float(hm[3, 5, 0]) == 1.0
    # invisible joint renders empty
    assert float(jnp.max(hm[..., 1])) == 0.0
    # gaussian decays
    assert float(hm[3, 6, 0]) < 1.0
    np.testing.assert_allclose(float(hm[3, 6, 0]), np.exp(-0.5), rtol=1e-5)


def test_offmap_keypoint_masked():
    kps = jnp.array([[-2.0, 3.0]])
    vis = jnp.array([1.0])
    hm = render_gaussian_heatmaps(kps, vis, 7, 7)
    assert float(jnp.max(hm)) == 0.0


def test_batched_render():
    kps = jnp.zeros((4, 16, 2)) + 3.0
    vis = jnp.ones((4, 16))
    hm = render_gaussian_heatmaps(kps, vis, 7, 7)
    assert hm.shape == (4, 7, 7, 16)


def test_transform_identity():
    kps = jnp.array([[2.0, 3.0]] * 16)
    vis = jnp.ones((16,))
    out, v = transform_keypoints(kps, vis, scale_y=1.0, scale_x=1.0,
                                 offset_y=0.0, offset_x=0.0,
                                 flip=jnp.array(False), width=10)
    np.testing.assert_allclose(np.asarray(out), np.asarray(kps))
    np.testing.assert_allclose(np.asarray(v), np.asarray(vis))


def test_transform_flip_swaps_lr():
    # r_ankle (joint 0) at x=2 must become l_ankle (joint 5) at x=W-1-2
    kps = np.zeros((16, 2), np.float32)
    kps[0] = (4.0, 2.0)
    vis = np.zeros(16, np.float32)
    vis[0] = 1.0
    out, v = transform_keypoints(jnp.asarray(kps), jnp.asarray(vis),
                                 scale_y=1.0, scale_x=1.0, offset_y=0.0,
                                 offset_x=0.0, flip=jnp.array(True), width=10)
    assert float(v[5]) == 1.0 and float(v[0]) == 0.0
    np.testing.assert_allclose(np.asarray(out[5]), [4.0, 7.0])


def test_flip_perm_is_involution():
    perm = np.asarray(MPII_FLIP_PERM)
    np.testing.assert_array_equal(perm[perm], np.arange(16))


def test_transform_scale_crop():
    kps = jnp.array([[10.0, 20.0]])
    vis = jnp.ones((1,))
    out, _ = transform_keypoints(
        kps, vis, scale_y=0.5, scale_x=0.5, offset_y=2.0, offset_x=3.0,
        flip=jnp.array(False), width=8,
        flip_perm=jnp.array([0]))
    np.testing.assert_allclose(np.asarray(out), [[3.0, 7.0]])


def test_pose_l2_loss_visibility():
    pred = jnp.ones((2, 4, 4, 3))
    target = jnp.zeros((2, 4, 4, 3))
    full = pose_l2_loss(pred, target)
    np.testing.assert_allclose(float(full), 1.0)
    vis = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    masked = pose_l2_loss(pred, target, vis)
    np.testing.assert_allclose(float(masked), 1.0)  # only visible joint counts
    assert float(pose_l2_loss(pred, pred, vis)) == 0.0
