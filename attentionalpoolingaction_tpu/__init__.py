"""attentionalpoolingaction_tpu — a TPU-native (JAX/Flax/Pallas/pjit) framework
with the capabilities of rohitgirdhar/AttentionalPoolingAction (NeurIPS'17,
"Attentional Pooling for Action Recognition", arXiv 1711.01467).

Capabilities (see SURVEY.md for the reference layer map this covers):
  * ResNet-v1 (slim-variant) backbones exposing pre-pool feature maps.
  * Low-rank second-order attentional pooling heads (avg / attention /
    pose-regularized attention), computed in factorized form
    ``logits = A^T (X^T (X b))`` so the per-class n-by-C attention maps are
    never materialized on the hot path, plus a fused Pallas TPU kernel.
  * MPII / HICO / HMDB51 dataset descriptors, TFRecord IO, VGG-style
    preprocessing, pose-keypoint -> heatmap targets.
  * jit/pjit train + eval drivers over a ``jax.sharding.Mesh``, Optax
    optimizers, Orbax checkpointing, slim-checkpoint conversion.

NOTE ON CITATIONS: the reference mount at /root/reference was empty in every
session so far (see SURVEY.md section 0); reference behavior is cited to
SURVEY.md sections and BASELINE.json instead of file:line.
"""

__version__ = "0.1.0"
