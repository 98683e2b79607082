"""Low-rank second-order attentional pooling (Girdhar & Ramanan, NeurIPS'17).

The reference computes, for feature map ``X in R^{n x f}`` (n spatial
positions, f channels) and class c:

    logits_c = (X a_c + alpha_c 1)^T (X b + beta 1)

i.e. the inner product of a *top-down* class-specific attention map
(a 1x1 conv f->C with bias) and a *bottom-up* class-agnostic saliency map
(a 1x1 conv f->1 with bias).  The rank-P generalization uses P such pairs per
class with the bottom-up branch shared across classes:

    logits_c = sum_p (X a_{c,p} + alpha_{c,p} 1)^T (X b_p + beta_p 1)

Reference behavior: SURVEY.md section 2.1 "Attentional pooling head" and
BASELINE.json north_star (the reference mount was empty; no file:line
citations are possible — see SURVEY.md section 0).

TPU-first redesign
------------------
The reference materializes both maps (n x C and n x 1) and multiplies them.
We instead use the algebraic identity

    (X a_c)^T (X b)  =  a_c^T (X^T (X b))

so the hot path computes a bottom-up saliency vector ``s = X b + beta``
(n x P), a *feature-space* summary ``v = X^T s`` (f x P), and finally
``logits = einsum(v, A)`` (C) — never touching an n-by-C buffer.  For
n=196, f=2048, C=600 this removes the (B, n, C) intermediate from HBM
entirely and turns the head into three skinny matmuls that XLA fuses into
the backbone epilogue.  A fused Pallas kernel (ops/attn_pool_pallas.py)
additionally keeps X resident in VMEM across both contractions.

All functions take:
    x:      (B, N, F)   flattened spatial features
    attn_w: (F, C, P)   top-down per-class weights  (1x1 conv kernels)
    attn_b: (C, P)      top-down biases
    sal_w:  (F, P)      bottom-up (saliency) weights
    sal_b:  (P,)        bottom-up biases
and return logits (B, C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def attentional_pool_oracle(x, attn_w, attn_b, sal_w, sal_b):
    """Naive reference implementation: materialize both maps, then contract.

    This is the literal transcription of the reference's computation
    (SURVEY.md section 3.1 step 6) and exists only as a test oracle for
    :func:`attentional_pool` and the Pallas kernel.
    """
    x = x.astype(jnp.float32)
    # top-down per-class attention maps: (B, N, C, P)
    top = jnp.einsum("bnf,fcp->bncp", x, attn_w.astype(jnp.float32))
    top = top + attn_b.astype(jnp.float32)[None, None]
    # bottom-up saliency maps: (B, N, P)
    bot = jnp.einsum("bnf,fp->bnp", x, sal_w.astype(jnp.float32))
    bot = bot + sal_b.astype(jnp.float32)[None, None]
    # per-class inner products, summed over ranks: (B, C)
    return jnp.einsum("bncp,bnp->bc", top, bot)


def attentional_pool(x, attn_w, attn_b, sal_w, sal_b, *, precision=None):
    """Factorized attentional pooling: ``logits = A^T (X^T (X b))``.

    Numerically identical (up to float association) to the oracle, but with
    no (B, N, C) intermediate.  Accumulates in float32 regardless of input
    dtype (bf16 backbones feed this directly).
    """
    xf = x.astype(jnp.float32)
    sal_w = sal_w.astype(jnp.float32)
    sal_b = sal_b.astype(jnp.float32)
    attn_w = attn_w.astype(jnp.float32)
    attn_b = attn_b.astype(jnp.float32)

    # bottom-up saliency map s = X b + beta : (B, N, P)
    s = jnp.einsum("bnf,fp->bnp", xf, sal_w, precision=precision) + sal_b
    # feature-space summary v = X^T s : (B, F, P)
    v = jnp.einsum("bnf,bnp->bfp", xf, s, precision=precision)
    # logits_c = sum_p a_{c,p}^T v_p + alpha_{c,p} * sum_n s_{n,p}
    logits = jnp.einsum("bfp,fcp->bc", v, attn_w, precision=precision)
    logits = logits + jnp.einsum("bp,cp->bc", jnp.sum(s, axis=1), attn_b)
    return logits


def attention_maps(x, attn_w, attn_b, sal_w, sal_b, *, class_idx=None):
    """Materialize attention maps for visualization / analysis (L8).

    Returns ``(top_down, bottom_up)`` where ``top_down`` is (B, N, C) (rank
    dimension summed, matching the rank-1 heatmaps in the reference README
    figures — SURVEY.md section 3.4) and ``bottom_up`` is (B, N).  Pass
    ``class_idx`` (int or (B,) array) to restrict the top-down map to one
    class and avoid the full n-by-C buffer.
    """
    xf = x.astype(jnp.float32)
    bot = jnp.einsum("bnf,fp->bnp", xf, sal_w.astype(jnp.float32))
    bot = bot + sal_b.astype(jnp.float32)
    bottom_up = jnp.sum(bot, axis=-1)

    aw = attn_w.astype(jnp.float32)
    ab = attn_b.astype(jnp.float32)
    if class_idx is not None:
        class_idx = jnp.asarray(class_idx)
        aw_c = aw[:, class_idx, :]  # (F, P) or (F, B, P)
        ab_c = ab[class_idx, :]
        if aw_c.ndim == 3:  # per-example class selection
            top = jnp.einsum("bnf,fbp->bnp", xf, aw_c) + ab_c[:, None, :]
        else:
            top = jnp.einsum("bnf,fp->bnp", xf, aw_c) + ab_c[None, None, :]
        top_down = jnp.sum(top, axis=-1)
    else:
        top = jnp.einsum("bnf,fcp->bncp", xf, aw) + ab[None, None]
        top_down = jnp.sum(top, axis=-1)
    return top_down, bottom_up


def init_attn_pool_params(key, num_features, num_classes, rank=1,
                          dtype=jnp.float32, stddev=0.01):
    """Initializer for the head parameters (truncated-normal 1x1 convs, zero
    biases).  NOTE: models/heads.py uses a (n*f)^-1/2 stddev by default so
    random-init logits start O(1) — see the comment there."""
    k1, k2 = jax.random.split(key)
    return {
        "attn_w": (jax.random.truncated_normal(
            k1, -2.0, 2.0, (num_features, num_classes, rank)) * stddev
        ).astype(dtype),
        "attn_b": jnp.zeros((num_classes, rank), dtype),
        "sal_w": (jax.random.truncated_normal(
            k2, -2.0, 2.0, (num_features, rank)) * stddev).astype(dtype),
        "sal_b": jnp.zeros((rank,), dtype),
    }
