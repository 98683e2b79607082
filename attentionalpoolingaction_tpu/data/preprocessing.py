"""VGG-style image preprocessing (TF ops, host side).

Reproduces the semantics of the reference's slim VGG preprocessing
(SURVEY.md sections 1 L2 and 2.1 "Preprocessing"):

  train: aspect-preserving resize with the smaller side drawn uniformly from
         [resize_min, resize_max]; random HxW crop; random horizontal flip;
         RGB mean subtraction (123.68, 116.78, 103.94), no scaling.
  eval:  aspect-preserving resize (smaller side = resize_min); central crop;
         mean subtraction.

Runs inside tf.data on host CPU threads (the TPU-native replacement for the
reference's in-graph TF1 queue-runner preprocessing — the JPEG decode/resize
is libjpeg/Eigen native code under tf.data's C++ runtime, overlapped with
the device step by the pipeline's prefetch).

Geometry is exported explicitly: instead of transforming pose keypoints here,
each example carries ``transform = [scale_y, scale_x, offset_y, offset_x,
flip]`` describing exactly what was done to the image; the jit'd train step
applies the same transform to keypoints and renders heatmap targets on
device (ops/heatmap.py), keeping host->device transfer small.
"""

from __future__ import annotations

R_MEAN, G_MEAN, B_MEAN = 123.68, 116.78, 103.94


def preprocess_image_tf(image_bytes, *, out_size: int, is_training: bool,
                        resize_min: int, resize_max: int | None = None,
                        seed=None, keep_uint8: bool = False):
    """Decode + preprocess one example.  Returns (image HWC, transform
    float32 [5]).  TF ops only; call inside tf.data.map.

    ``keep_uint8``: skip the mean subtraction and emit uint8 — 4x less
    host->device transfer; the train/eval step normalizes on device
    (train.normalize_images).  Geometry is identical; the only numeric
    difference is rounding the bilinear resample to integers."""
    import tensorflow as tf

    img = tf.io.decode_jpeg(image_bytes, channels=3)
    img = tf.cast(img, tf.float32)
    shape = tf.shape(img)
    h = tf.cast(shape[0], tf.float32)
    w = tf.cast(shape[1], tf.float32)

    if is_training and resize_max is not None and resize_max > resize_min:
        side = tf.random.uniform(
            [], resize_min, resize_max + 1, dtype=tf.int32, seed=seed)
    else:
        side = tf.constant(resize_min, tf.int32)
    side_f = tf.cast(side, tf.float32)
    scale = side_f / tf.minimum(h, w)
    new_h = tf.cast(tf.math.round(h * scale), tf.int32)
    new_w = tf.cast(tf.math.round(w * scale), tf.int32)
    img = tf.image.resize(img, [new_h, new_w], method="bilinear")
    # actual per-axis scales after rounding
    scale_y = tf.cast(new_h, tf.float32) / h
    scale_x = tf.cast(new_w, tf.float32) / w

    if is_training:
        max_oy = tf.maximum(new_h - out_size, 0)
        max_ox = tf.maximum(new_w - out_size, 0)
        oy = tf.random.uniform([], 0, max_oy + 1, dtype=tf.int32, seed=seed)
        ox = tf.random.uniform([], 0, max_ox + 1, dtype=tf.int32, seed=seed)
        flip = tf.random.uniform([], 0, 2, dtype=tf.int32, seed=seed)
    else:
        oy = tf.maximum(new_h - out_size, 0) // 2
        ox = tf.maximum(new_w - out_size, 0) // 2
        flip = tf.constant(0, tf.int32)

    img = tf.image.crop_to_bounding_box(img, oy, ox, out_size, out_size)
    img = tf.cond(flip > 0,
                  lambda: tf.image.flip_left_right(img), lambda: img)
    if keep_uint8:
        img = tf.cast(tf.clip_by_value(tf.round(img), 0.0, 255.0), tf.uint8)
    else:
        img = img - tf.constant([R_MEAN, G_MEAN, B_MEAN], tf.float32)

    transform = tf.stack([
        scale_y, scale_x,
        tf.cast(oy, tf.float32), tf.cast(ox, tf.float32),
        tf.cast(flip, tf.float32),
    ])
    return img, transform


def eval_multicrop_tf(image_bytes, *, out_size: int, resize_min: int,
                      num_crops: int = 3):
    """High-res multi-crop eval (BASELINE.json config #5): resize the
    smaller side to ``resize_min`` and take ``num_crops`` crops spaced along
    the longer axis (slim's multi-crop eval protocol).  Returns
    (num_crops, out, out, 3) images."""
    import tensorflow as tf

    img = tf.io.decode_jpeg(image_bytes, channels=3)
    img = tf.cast(img, tf.float32)
    shape = tf.shape(img)
    h = tf.cast(shape[0], tf.float32)
    w = tf.cast(shape[1], tf.float32)
    scale = tf.cast(resize_min, tf.float32) / tf.minimum(h, w)
    new_h = tf.cast(tf.math.round(h * scale), tf.int32)
    new_w = tf.cast(tf.math.round(w * scale), tf.int32)
    img = tf.image.resize(img, [new_h, new_w], method="bilinear")
    img = img - tf.constant([R_MEAN, G_MEAN, B_MEAN], tf.float32)

    max_oy = tf.maximum(new_h - out_size, 0)
    max_ox = tf.maximum(new_w - out_size, 0)
    crops = []
    for i in range(num_crops):
        frac = i / max(num_crops - 1, 1)
        oy = tf.cast(tf.math.round(
            tf.cast(max_oy, tf.float32) * frac), tf.int32)
        ox = tf.cast(tf.math.round(
            tf.cast(max_ox, tf.float32) * frac), tf.int32)
        crops.append(
            tf.image.crop_to_bounding_box(img, oy, ox, out_size, out_size))
    return tf.stack(crops)
