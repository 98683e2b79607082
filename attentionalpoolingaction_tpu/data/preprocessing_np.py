"""NumPy/cv2 preprocessing — the same VGG-style semantics as
preprocessing.py's TF ops, for Grain worker processes (which run plain
Python, not a tf.data graph).  Geometry (resize scale, crop offset, flip)
is identical by construction; the bilinear resampler differs between cv2
and TF by <1 pixel intensity on natural images (pinned by the equivalence
test in tests/test_grain_pipeline.py).
"""

from __future__ import annotations

import numpy as np

from attentionalpoolingaction_tpu.data.preprocessing import (
    B_MEAN, G_MEAN, R_MEAN)


def decode_jpeg(data: bytes) -> np.ndarray:
    import cv2

    arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    if arr is None:
        raise ValueError("JPEG decode failed")
    return cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)


def preprocess_image_np(image_bytes: bytes, *, out_size: int,
                        is_training: bool, resize_min: int,
                        resize_max: int | None = None,
                        rng: np.random.Generator | None = None,
                        keep_uint8: bool = False):
    """Decode + VGG preprocess one example.  Returns (image f32 HWC,
    transform f32 [scale_y, scale_x, offset_y, offset_x, flip])."""
    return preprocess_decoded_np(
        decode_jpeg(image_bytes), out_size=out_size,
        is_training=is_training, resize_min=resize_min,
        resize_max=resize_max, rng=rng, keep_uint8=keep_uint8)


def preprocess_decoded_np(decoded: np.ndarray, *, out_size: int,
                          is_training: bool, resize_min: int,
                          resize_max: int | None = None,
                          rng: np.random.Generator | None = None,
                          keep_uint8: bool = False):
    """The geometry half of preprocess_image_np for an already-decoded
    RGB uint8 array — same VGG transforms, no container assumption
    (serving video frames come decoded from cv2.VideoCapture, not as
    per-frame JPEGs)."""
    import cv2

    img = decoded.astype(np.float32)
    h, w = img.shape[:2]

    if is_training and resize_max is not None and resize_max > resize_min:
        assert rng is not None, "training preprocessing needs an rng"
        side = int(rng.integers(resize_min, resize_max + 1))
    else:
        side = resize_min
    scale = side / min(h, w)
    new_h = int(round(h * scale))
    new_w = int(round(w * scale))
    img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    scale_y = new_h / h
    scale_x = new_w / w

    if is_training:
        oy = int(rng.integers(0, max(new_h - out_size, 0) + 1))
        ox = int(rng.integers(0, max(new_w - out_size, 0) + 1))
        flip = bool(rng.integers(0, 2))
    else:
        oy = max(new_h - out_size, 0) // 2
        ox = max(new_w - out_size, 0) // 2
        flip = False

    img = img[oy:oy + out_size, ox:ox + out_size]
    if flip:
        img = img[:, ::-1]
    if keep_uint8:
        img = np.clip(np.round(img), 0, 255).astype(np.uint8)
    else:
        img = img - np.array([R_MEAN, G_MEAN, B_MEAN], np.float32)

    transform = np.array(
        [scale_y, scale_x, float(oy), float(ox), float(flip)], np.float32)
    return np.ascontiguousarray(img), transform


def preprocess_clip_np(frames: list, *, out_size: int,
                       is_training: bool, resize_min: int,
                       resize_max: int | None = None,
                       rng: np.random.Generator | None = None,
                       keep_uint8: bool = False,
                       crop_frac: float | None = None):
    """Preprocess a temporal clip of encoded frames with ONE shared
    geometric transform — the resize side, crop offset and flip are
    sampled once (from the first frame's dimensions) and applied to every
    frame.  Per-frame augmentation would decorrelate the clip and turn
    temporal attention into noise; sharing the geometry is the standard
    video-training protocol.  Returns (clip (T, out, out, 3), transform)
    with the same transform layout as preprocess_image_np.

    ``crop_frac`` (eval only): place the shared crop at this fraction of
    the spare extent along BOTH axes — the same diagonal placement as
    eval_multicrop_np's crop ``i`` at ``i/(num_crops-1)`` — for spatial
    multi-crop clip eval.  None keeps the central crop."""
    import cv2

    imgs = [decode_jpeg(b).astype(np.float32) for b in frames]
    h, w = imgs[0].shape[:2]

    if is_training and resize_max is not None and resize_max > resize_min:
        assert rng is not None, "training preprocessing needs an rng"
        side = int(rng.integers(resize_min, resize_max + 1))
    else:
        side = resize_min
    scale = side / min(h, w)
    new_h = int(round(h * scale))
    new_w = int(round(w * scale))
    if is_training:
        oy = int(rng.integers(0, max(new_h - out_size, 0) + 1))
        ox = int(rng.integers(0, max(new_w - out_size, 0) + 1))
        flip = bool(rng.integers(0, 2))
    elif crop_frac is not None:
        oy = int(round(max(new_h - out_size, 0) * crop_frac))
        ox = int(round(max(new_w - out_size, 0) * crop_frac))
        flip = False
    else:
        oy = max(new_h - out_size, 0) // 2
        ox = max(new_w - out_size, 0) // 2
        flip = False

    out = []
    for img in imgs:
        if img.shape[:2] != (h, w):
            # ragged frame (shouldn't happen within one video; conform so
            # the shared crop stays valid rather than crashing mid-epoch)
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
        img = cv2.resize(img, (new_w, new_h),
                         interpolation=cv2.INTER_LINEAR)
        img = img[oy:oy + out_size, ox:ox + out_size]
        if flip:
            img = img[:, ::-1]
        if keep_uint8:
            img = np.clip(np.round(img), 0, 255).astype(np.uint8)
        else:
            img = img - np.array([R_MEAN, G_MEAN, B_MEAN], np.float32)
        out.append(np.ascontiguousarray(img))

    transform = np.array(
        [new_h / h, new_w / w, float(oy), float(ox), float(flip)],
        np.float32)
    return np.stack(out), transform


def eval_multicrop_np(image_bytes: bytes, *, out_size: int,
                      resize_min: int, num_crops: int = 3) -> np.ndarray:
    """NumPy mirror of preprocessing.eval_multicrop_tf (identical
    geometry: smaller side to ``resize_min``, ``num_crops`` crops spaced
    diagonally along the longer axes).  Returns (num_crops, out, out, 3)
    f32, mean-subtracted."""
    import cv2

    img = decode_jpeg(image_bytes).astype(np.float32)
    h, w = img.shape[:2]
    scale = resize_min / min(h, w)
    new_h = int(round(h * scale))
    new_w = int(round(w * scale))
    img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    img = img - np.array([R_MEAN, G_MEAN, B_MEAN], np.float32)

    max_oy = max(new_h - out_size, 0)
    max_ox = max(new_w - out_size, 0)
    crops = []
    for i in range(num_crops):
        frac = i / max(num_crops - 1, 1)
        oy = int(round(max_oy * frac))
        ox = int(round(max_ox * frac))
        crops.append(img[oy:oy + out_size, ox:ox + out_size])
    return np.ascontiguousarray(np.stack(crops))
