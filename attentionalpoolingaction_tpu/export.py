"""AOT serving artifacts: serialize the serving forward via jax.export.

The reference deploys by loading the TF1 graph plus a Saver checkpoint
into a Python process with the full model code importable (SURVEY.md
section 1: no serving layer at all).  The TPU-native deployment story is
ahead-of-time export: lower the jitted serving forward ONCE to a
versioned StableHLO artifact and serve it anywhere — no Flax, no model
code, no checkpoint-restore path in the serving container, and
jax.export's calling-convention versioning keeps old artifacts loadable
by newer runtimes.

Artifact layout (a directory):

    manifest.json   config snapshot, bucket list, per-leaf dtype/shape,
                    exported input dtypes, lowering platforms
    weights.npz     flattened weight leaves (raw little-endian bytes so
                    non-NumPy dtypes like bfloat16 ship losslessly)
    fwd_<dtype>.bin serialized ``jax.export.Exported`` per input dtype

Design choices:

  * **Symbolic batch.** The forward is exported with a symbolic batch
    dim (``jax.export.symbolic_shape``), so ONE artifact serves every
    bucket; XLA still compiles per concrete shape at load time (the
    normal bucketed-warmup flow), but the trace/lowering work is done
    once at export.
  * **Weights as arguments, not constants.** Baking ~170 MB of params
    into each serialized function would duplicate them per input dtype
    and balloon the artifact; instead the export takes the flat leaf
    list as an argument and the leaves ship once in ``weights.npz``.
  * **Multi-platform lowering.** Artifacts lower for ``("cpu", "tpu")``
    by default: the same directory is servable in a CPU dev container
    and on the TPU host, and can be produced on either.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Sequence

import jax
import jax.export as jex
import numpy as np

from attentionalpoolingaction_tpu import config as config_lib
from attentionalpoolingaction_tpu import serving
from attentionalpoolingaction_tpu.data.datasets import get_dataset

MANIFEST = "manifest.json"
WEIGHTS = "weights.npz"
FORMAT_VERSION = 1


def reject_checkpoint_flags(FLAGS, names: Sequence[str]) -> None:
    """Usage-error if any checkpoint-only flag was passed with
    --exported_dir.

    The artifact fixed weights, precision, buckets AND config at export
    time, so these flags have no effect; silently dropping e.g. --ema
    would serve the wrong weights.  Checks whether the flag was *set*
    (absl's ``using_default_value`` goes false on both command-line
    parse and programmatic assignment), not value-vs-default — so an
    explicit ``--config mpii_rank1_224`` is rejected too, even though it
    equals the default: the manifest's config wins and accepting the
    flag would mask a model-selection misconfiguration.  Shared by
    serve_cli and predict_cli so their rejection lists cannot drift.
    """
    present = [f"--{n}" for n in names
               if n in FLAGS and not FLAGS[n].using_default_value]
    if present:
        from absl import app

        raise app.UsageError(
            f"{', '.join(present)} have no effect with --exported_dir "
            "(the artifact fixes weights, precision, buckets and config "
            "at export time — re-run export_cli with these flags "
            "instead)")


def _leaf_key(i: int) -> str:
    return f"leaf_{i:05d}"


def export_predictor(predictor: serving.Predictor, out_dir: str, *,
                     platforms: Sequence[str] = ("cpu", "tpu"),
                     input_dtypes: Sequence = (np.uint8, np.float32),
                     include_clip: bool | None = None) -> dict:
    """Serialize a live Predictor's forward + weights into ``out_dir``.

    Returns the written manifest.  One ``fwd_<dtype>.bin`` per entry of
    ``input_dtypes`` (jit keys on input dtype, so uint8 raw-RGB requests
    and pre-normalized float32 arrays are distinct traces).

    ``include_clip`` additionally exports the video forward
    (``clip_<dtype>.bin``: symbolic video batch x clip_frames frames) so
    a loaded artifact serves /predict_video too; defaults to True for
    clip-configured predictors (cfg.clip_frames > 1)."""
    if predictor.mesh is not None:
        raise ValueError(
            "data_parallel predictors export per-device shardings that "
            "would pin the artifact to this host's topology; export a "
            "single-device predictor and enable data_parallel at serve "
            "time instead")
    if include_clip is None:
        include_clip = (predictor.supports_clips
                        and predictor.cfg.clip_frames > 1)
    if include_clip and not predictor.supports_clips:
        raise ValueError("include_clip=True needs a live predictor with "
                         "a clip forward")
    os.makedirs(out_dir, exist_ok=True)

    leaves, treedef = jax.tree_util.tree_flatten(predictor._weights)
    fwd = predictor._fwd

    def fwd_flat(flat, images):
        return fwd(jax.tree_util.tree_unflatten(treedef, flat), images)

    size = predictor.cfg.image_size
    (batch,) = jex.symbolic_shape("batch")
    leaf_specs = [jax.ShapeDtypeStruct(np.shape(x), x.dtype)
                  for x in leaves]
    dtype_names = []
    for dt in input_dtypes:
        name = np.dtype(dt).name
        img_spec = jax.ShapeDtypeStruct((batch, size, size, 3),
                                        np.dtype(dt))
        exp = jex.export(jax.jit(fwd_flat), platforms=list(platforms))(
            leaf_specs, img_spec)
        with open(os.path.join(out_dir, f"fwd_{name}.bin"), "wb") as f:
            f.write(exp.serialize())
        dtype_names.append(name)

    clip_t = None
    if include_clip:
        clip_fwd = predictor._clip_fwd

        def clip_flat(flat, clip):
            return clip_fwd(
                jax.tree_util.tree_unflatten(treedef, flat), clip)

        # the predictor's clip_length property is the single source of
        # truth for T (warmup / predict_clip_bytes / this manifest)
        clip_t = predictor.clip_length
        for dt in input_dtypes:
            name = np.dtype(dt).name
            clip_spec = jax.ShapeDtypeStruct(
                (batch, clip_t, size, size, 3), np.dtype(dt))
            exp = jex.export(jax.jit(clip_flat),
                             platforms=list(platforms))(
                leaf_specs, clip_spec)
            with open(os.path.join(out_dir, f"clip_{name}.bin"),
                      "wb") as f:
                f.write(exp.serialize())

    # leaves ship as raw little-endian bytes: np.savez cannot represent
    # extension dtypes (bfloat16), and a float32 upcast would silently
    # change the traced dtypes the export was specialized on
    np_leaves = [np.asarray(x) for x in leaves]
    np.savez(os.path.join(out_dir, WEIGHTS),
             **{_leaf_key(i): x.reshape(-1).view(np.uint8)
                for i, x in enumerate(np_leaves)})

    manifest = {
        "format_version": FORMAT_VERSION,
        "config": dataclasses.asdict(predictor.cfg),
        "int8": predictor.int8,
        "buckets": list(predictor.buckets),
        "platforms": list(platforms),
        "input_dtypes": dtype_names,
        # non-null => clip_<dtype>.bin files exist and the loaded
        # artifact serves /predict_video at this clip length
        "clip_frames": clip_t,
        "leaves": [{"dtype": str(x.dtype), "shape": list(x.shape)}
                   for x in np_leaves],
        "jax_version": jax.__version__,
    }
    # JSON-normalize (tuples -> lists) so the returned dict equals what a
    # loader reads back from disk
    manifest = json.loads(json.dumps(manifest))
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def _restore_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # bfloat16 and friends (jax always ships it)

        return np.dtype(getattr(ml_dtypes, name))


def load_weights(artifact_dir: str, manifest: dict) -> list[np.ndarray]:
    """``weights.npz`` raw bytes -> typed leaf list (export order)."""
    with np.load(os.path.join(artifact_dir, WEIGHTS)) as z:
        out = []
        for i, meta in enumerate(manifest["leaves"]):
            buf = z[_leaf_key(i)]
            out.append(buf.view(_restore_dtype(meta["dtype"]))
                       .reshape(meta["shape"]))
    return out


class ExportedPredictor(serving.BucketedPredictor):
    """Serve an exported artifact — same interface as the live Predictor
    (predict_arrays / predict_bytes / warmup / DynamicBatcher / HTTP),
    but built from ``manifest.json`` + ``weights.npz`` + StableHLO alone:
    no model code, checkpoint manager, or TF import on the load path."""

    def __init__(self, artifact_dir: str, *,
                 stats: serving.ServingStats | None = None,
                 data_parallel: bool = False):
        with open(os.path.join(artifact_dir, MANIFEST)) as f:
            manifest = json.load(f)
        if manifest["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {manifest['format_version']} != "
                f"supported {FORMAT_VERSION}")
        self.manifest = manifest
        self.cfg = config_lib.TrainConfig(**manifest["config"])
        self.spec = get_dataset(self.cfg.dataset)
        self.int8 = bool(manifest["int8"])
        self.stats = stats or serving.ServingStats()
        self._weights = load_weights(artifact_dir, manifest)

        # data-parallel at SERVE time (artifacts are exported
        # single-device so they stay topology-portable); the recipe is
        # the shared BucketedPredictor._init_data_parallel — one source
        # of truth with the live Predictor
        self.buckets, img_sh, repl_sh = self._init_data_parallel(
            data_parallel, manifest["buckets"])
        jit_kw: dict = {}
        if self.mesh is not None:
            self._weights = [jax.device_put(w, repl_sh)
                             for w in self._weights]
            jit_kw = dict(
                in_shardings=([repl_sh] * len(self._weights), img_sh),
                out_shardings=img_sh)

        calls = {}
        for name in manifest["input_dtypes"]:
            with open(os.path.join(artifact_dir, f"fwd_{name}.bin"),
                      "rb") as f:
                calls[np.dtype(name)] = jax.jit(jex.deserialize(
                    f.read()).call, **jit_kw)
        self._calls = calls

        def dispatch(weights, images):
            key = np.dtype(images.dtype)
            if key not in calls:
                raise TypeError(
                    f"artifact exports input dtypes "
                    f"{manifest['input_dtypes']}; got {key.name} "
                    f"(re-export with export_predictor(input_dtypes=...))")
            return calls[key](weights, images)

        self._fwd = dispatch

        # clip (video) forward: present when exported with include_clip
        # (export_predictor writes clip_<dtype>.bin + manifest clip_frames)
        self.clip_t = manifest.get("clip_frames")
        if self.clip_t:
            clip_calls = {}
            for name in manifest["input_dtypes"]:
                with open(os.path.join(artifact_dir, f"clip_{name}.bin"),
                          "rb") as f:
                    clip_calls[np.dtype(name)] = jax.jit(
                        jex.deserialize(f.read()).call)
            self.supports_clips = True

            def clip_dispatch(weights, clip):
                key = np.dtype(clip.dtype)
                if key not in clip_calls:
                    raise TypeError(
                        f"artifact exports clip dtypes "
                        f"{manifest['input_dtypes']}; got {key.name}")
                return clip_calls[key](weights, clip)

            self._clip_fwd = clip_dispatch

    def warmup(self, dtypes=None):
        """Default to the manifest's exported dtypes: the base class's
        uint8-only default would crash the startup warmup of an artifact
        exported with ``input_dtypes=(float32,)`` — the artifact knows
        exactly which dtype traces exist, so warm those."""
        if dtypes is None:
            dtypes = [_restore_dtype(n)
                      for n in self.manifest["input_dtypes"]]
        super().warmup(dtypes)


def load_exported(artifact_dir: str, *,
                  stats: serving.ServingStats | None = None,
                  data_parallel: bool = False) -> ExportedPredictor:
    return ExportedPredictor(artifact_dir, stats=stats,
                             data_parallel=data_parallel)
