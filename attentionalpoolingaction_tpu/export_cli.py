"""Export a checkpoint to an AOT serving artifact (jax.export/StableHLO).

Usage:
    python -m attentionalpoolingaction_tpu.export_cli \
        --config mpii_rank1_224 --workdir /tmp/run1 \
        --out_dir /tmp/run1/artifact [--int8] [--platforms cpu,tpu]

The artifact directory then serves WITHOUT model code or a checkpoint:

    python -m attentionalpoolingaction_tpu.serve_cli \
        --exported_dir /tmp/run1/artifact --port 8800

After writing, the artifact is loaded back and verified against the live
predictor on random inputs (max |Δprob| printed; non-zero aborts with a
non-zero exit) — the serving analog of convert_cli --parity_check.
"""

from __future__ import annotations

import os

import numpy as np
from absl import app, flags, logging

from attentionalpoolingaction_tpu import config as config_lib
from attentionalpoolingaction_tpu import export as export_lib
from attentionalpoolingaction_tpu import serving

FLAGS = flags.FLAGS
flags.DEFINE_string("config", "mpii_rank1_224", "preset name")
flags.DEFINE_string("workdir", None, "run dir containing checkpoints/")
flags.DEFINE_string("out_dir", None, "artifact output directory")
flags.DEFINE_bool("int8", False, "export the quantized BN-folded path")
flags.DEFINE_bool("ema", False,
                  "export the EMA weights (requires ema_decay training)")
flags.DEFINE_string("step", None, "checkpoint step: an int, or 'best' for the keep-best slot (default latest)")
flags.DEFINE_list("buckets", ["1", "8", "32"], "batch-size buckets")
flags.DEFINE_list("platforms", ["cpu", "tpu"], "lowering platforms")
flags.DEFINE_list("input_dtypes", ["uint8", "float32"],
                  "input dtypes to export (jit keys on dtype)")
flags.DEFINE_multi_string(
    "calibration_images", [],
    "representative images for static int8 activation scales")
flags.DEFINE_multi_string("set", [], "config overrides field=value")
flags.mark_flag_as_required("workdir")
flags.mark_flag_as_required("out_dir")


def main(argv):
    del argv
    overrides = config_lib.parse_overrides(FLAGS.set)
    overrides["workdir"] = FLAGS.workdir
    cfg = config_lib.get_config(FLAGS.config, **overrides)
    predictor = serving.load_predictor(
        cfg, step=FLAGS.step, int8=FLAGS.int8,
        buckets=[int(b) for b in FLAGS.buckets],
        calibration_files=FLAGS.calibration_images, use_ema=FLAGS.ema)
    manifest = export_lib.export_predictor(
        predictor, FLAGS.out_dir, platforms=FLAGS.platforms,
        input_dtypes=[np.dtype(n) for n in FLAGS.input_dtypes])
    total = sum(
        os.path.getsize(os.path.join(FLAGS.out_dir, f))
        for f in os.listdir(FLAGS.out_dir))
    logging.info("wrote %s (%d files, %.1f MB): dtypes=%s platforms=%s",
                 FLAGS.out_dir, len(os.listdir(FLAGS.out_dir)),
                 total / 1e6, manifest["input_dtypes"],
                 manifest["platforms"])

    # load-back parity gate: the artifact must reproduce the live
    # predictor bit-for-bit on this host's platform — checked for EVERY
    # exported dtype trace (a uint8-only probe would crash on a
    # float32-only export and let a corrupt fwd_float32.bin ship)
    loaded = export_lib.load_exported(FLAGS.out_dir)
    rng = np.random.default_rng(0)
    shape = (3, cfg.image_size, cfg.image_size, 3)
    worst = 0.0
    for name in manifest["input_dtypes"]:
        dt = export_lib._restore_dtype(name)
        raw = rng.integers(0, 255, shape)
        if dt == np.uint8:
            imgs = raw.astype(np.uint8)
        else:
            # float traces take mean-subtracted images (serving contract)
            imgs = (raw.astype(np.float32) - 115.0).astype(dt)
        diff = float(np.abs(loaded.predict_arrays(imgs)
                            - predictor.predict_arrays(imgs)).max())
        print(f"EXPORT PARITY[{name}] max|dprob| = {diff:.3g}")
        worst = max(worst, diff)
    if manifest.get("clip_frames"):
        # clip-configured exports carry the video forward too — gate it
        # on PROBABILITIES like the image checks (the 1e-6 threshold is
        # calibrated for probs; raw logits would make this check orders
        # of magnitude stricter than its neighbors)
        t = manifest["clip_frames"]
        clip = rng.integers(0, 255,
                            (1, t) + shape[1:]).astype(np.uint8)
        a = loaded._probs(np.asarray(
            loaded._clip_fwd(loaded._weights, clip), np.float32))
        b = predictor._probs(np.asarray(
            predictor._clip_fwd(predictor._weights, clip), np.float32))
        diff = float(np.abs(a - b).max())
        print(f"EXPORT PARITY[clip T={t}] max|dprob| = {diff:.3g}")
        worst = max(worst, diff)
    if worst > 1e-6:
        raise SystemExit(f"export parity failed: {worst}")


if __name__ == "__main__":
    app.run(main)
