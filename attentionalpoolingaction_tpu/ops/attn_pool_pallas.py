"""Fused Pallas TPU kernel for attentional pooling.

The hot structure (see ops/attn_pool.py for the math) is

    s    = X @ b + beta          (N, P)   bottom-up saliency map
    v    = X^T @ s               (F, P)   feature-space summary
    logits = einsum(v, A) + colsum(s) @ alpha^T

The kernel tiles the batch (``BT`` images per grid program), keeps each
bf16 X tile resident in VMEM across both MXU contractions (X is read from
HBM exactly once), and emits the saliency map ``s`` as a by-product: it is
the bottom-up attention heatmap users visualize (reference README figures —
SURVEY.md section 3.4) and the residual that makes the backward pass
recompute-free.  The final class projection ``einsum(v, A)`` is a dense
(B, P*F) @ (P*F, C) MXU matmul left to XLA.

Layout notes (hard-won on v5e):
  * outputs are (B, P, F)/(B, P, N): with the rank P (often 1) minormost,
    Mosaic would lane-pad 1 -> 128 — a 128x VMEM/HBM blowup (observed OOM);
  * v is produced directly in (BT, P, F) by putting s on the matmul lhs;
  * no in-kernel reshape of (BT, N, F) to (BT*N, F): N % 8 != 0 forces a
    relayout copy.

PERF STATUS — RETIRED as a perf path (round 3; was PARKED round 2 —
VERDICT r1 item 5, r2 item 9).  Kept, tested, and flag-gated off
(use_pallas=False) as the explicitly-scheduled variant with a
deterministic VMEM budget, a free saliency-map output, and the
interpret-mode sanitizer the test suite uses.

Measured round 2 with a validated harness (loop-carried 1-element
perturbation so XLA cannot eliminate/hoist the op, device time read from
the profiler's XLA-module clock — scripts/tpu_checks.py::timeit documents
why everything simpler lies through the axon tunnel), on v5e:

    B64  N196 F2048 C600 P1: fused  84us  einsum 49us  (0.58x)
    B64  N196 F2048 C600 P5: fused  81us  einsum 36us  (0.45x)
    B256 N49  F2048 C393 P1: fused 156us  einsum 67us  (0.43x)

Retirement rationale (the round-3 "one last design or retire" decision,
made on arithmetic rather than another build):

1. The op is memory-floor-bound and XLA is AT the floor.  At rank P the
   head's arithmetic intensity is ~2P FLOP per X byte (P<=8), orders of
   magnitude under the MXU/HBM balance point, so the lower bound is one
   HBM read of X.  B64xN196xF2048 bf16 is 51 MB; at v5e's ~1 TB/s
   effective that is ~50 us — exactly the measured einsum time (49 us).
   There is NO headroom for any same-interface kernel to win; a perfect
   Pallas kernel can only tie.
2. The two designs that could beat the floor both move the fusion
   boundary INTO the backbone, not into this kernel:
   (a) input_output_aliasing / persistent-VMEM X requires X's PRODUCER
       (block4's last conv) in the same kernel — i.e. hand-writing a
       3x3x2048 conv in Pallas that must first match XLA's conv codegen
       before any fusion profit;
   (b) emitting s/v from the backbone epilogue saves X's HBM write+read
       (~0.25 ms at B512 224px) = ~0.4% of the forward pass and ~0.2% of
       a train step — bounded so low because the backbone dominates.
   Expected gain is percent-fractions; the risk (a bespoke conv) is the
   whole model's hot path.  SURVEY.md section 2.2's intent ("never
   materialize the n x C attention maps") is already delivered by the
   factorized einsum, which IS the production path.
3. Per the r1 acceptance gate (>=1.3x or park) and the r2 instruction
   (only revisit with a floor-beating design), the kernel is retired
   from perf work; it remains the correctness oracle's third
   implementation and the VMEM-deterministic fallback.

Shapes (MPII/HICO scale): N = 49..225 spatial positions, F = 2048 channels
(16 x 128 lanes — aligned), C <= 600 classes, P = rank <= 8.

Gradients: ``attentional_pool_fused`` carries a custom VJP.  The backward
pass is skinny linear algebra over the same tensors (FLOPs ~ 2x the
forward's), expressed in jnp with the saved ``s``.

Reference behavior being replaced: the reference materializes per-class
n-by-C attention maps and multiplies them (SURVEY.md sections 2.1
"Attentional pooling head" and 2.2 "our one in-repo kernel").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_batch_tile(b: int, n: int, f: int, itemsize: int) -> int:
    """Largest power-of-two batch tile whose X block stays under ~3.5 MB
    (leaves room for double buffering + f32 temps in VMEM)."""
    budget = 5_000_000
    bt = 1
    while bt * 2 <= b and b % (bt * 2) == 0 and (
            bt * 2 * n * f * itemsize) <= budget:
        bt *= 2
    return bt


def _fused_pool_kernel(x_ref, salw_ref, salb_ref, v_ref, s_ref, *,
                       batch_tile, n, f):
    """Batch-tile fused pass (MXU): s = X@w + beta ; v = X^T s.

    x_ref:    (BT, N, F)  input dtype
    salw_ref: (F, P)      f32
    salb_ref: (1, P)      f32
    v_ref:    (BT, P, F)  f32 out   (P in sublanes: P=1 would otherwise
    s_ref:    (BT, P, N)  f32 out    lane-pad 1 -> 128, a 128x blowup)

    Both contractions are MXU matmuls.  The rank P < 128 wastes MXU lanes,
    but the padded MAC count (B*2*N*F*128) is still ~30us of v5e MXU time
    for HICO-scale shapes — far cheaper than VPU cross-lane reductions, and
    X stays VMEM-resident across both ops.
    """
    x = x_ref[...]                                   # (BT, N, F)
    salw = salw_ref[...]                             # (F, P)
    # s = X @ w + beta: contract F (dim 2 of x, dim 0 of w) — no reshape
    # (a (BT*N, F) flatten would need a relayout copy when N % 8 != 0)
    s = jax.lax.dot_general(
        x, salw.astype(x.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BT, N, P)
    s = s + salb_ref[0][None, None, :]
    # v[b]^T = s[b]^T X[b]: batched dot_general contracting N (dim 1),
    # with s as lhs so the result lands directly in (BT, P, F) layout —
    # no F-wide transpose.  Keep x in its native dtype (no f32 VMEM copy);
    # the MXU accumulates in f32 via preferred_element_type.
    v = jax.lax.dot_general(
        s.astype(x.dtype), x,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (BT, P, F)
    v_ref[...] = v
    # s is (BT, N, P): only the small N x P transpose remains
    s_ref[...] = jnp.transpose(s, (0, 2, 1))


def _fused_pool_logits_kernel(x_ref, salw_ref, salb_ref, attnw_ref,
                              attnb_ref, v_ref, s_ref, out_ref, *,
                              batch_tile, rank):
    """Fully-fused pass: s = X@b + beta ; v = X^T s ; logits = v*A + ...

    Extends _fused_pool_kernel with the class projection in-kernel: the
    per-class weights A (F, C, P) stay VMEM-resident across the whole grid
    and the (BT, C) logit tile is produced without writing/re-reading the
    f32 summary v through HBM (VERDICT r1 item 5: "fuse the class
    projection").  v and s are still emitted for the custom VJP and the
    saliency visualization.
    """
    x = x_ref[...]                                   # (BT, N, F)
    salw = salw_ref[...]                             # (F, P)
    s = jax.lax.dot_general(
        x, salw.astype(x.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BT, N, P)
    s = s + salb_ref[0][None, None, :]
    v = jax.lax.dot_general(
        s.astype(x.dtype), x,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)          # (BT, P, F)
    v_ref[...] = v
    s_ref[...] = jnp.transpose(s, (0, 2, 1))
    # class projection: logits = sum_p v[:, p, :] @ A[p]
    # (A arrives as (P, F, C): P minormost would lane-pad 1 -> 128, a
    # 128x VMEM blowup — same rule as the v/s outputs above)
    aw = attnw_ref[...]                              # (P, F, C) f32
    acc = jax.lax.dot_general(
        v[:, 0, :], aw[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BT, C)
    for p in range(1, rank):
        acc = acc + jax.lax.dot_general(
            v[:, p, :], aw[p],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    # bias term: (sum_n s_np) alpha_cp — alpha arrives as (P, C)
    ssum = jnp.sum(s, axis=1)                        # (BT, P) f32
    acc = acc + jax.lax.dot_general(
        ssum, attnb_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (BT, C)
    # out block is (BT, 1, C): with BT < 8 a 2D (BT, C) block would break
    # Mosaic's (8, 128) tiling rule; the unit middle dim satisfies it
    out_ref[...] = acc[:, None, :]


# A (F, C, P) f32 must fit in VMEM next to the double-buffered X tiles;
# beyond this budget the projection falls back to XLA (rank-5 HICO etc.)
_PROJ_VMEM_BUDGET_BYTES = 10_000_000


def fused_pool_logits(x, attn_w, attn_b, sal_w, sal_b, *, interpret=False):
    """Fully-fused (logits, v, s) — one kernel, X read from HBM once,
    logits never round-trip the summary v through HBM."""
    b, n, f = x.shape
    c, p = attn_b.shape
    bt = _pick_batch_tile(b, n, f, x.dtype.itemsize)
    v, s, logits = pl.pallas_call(
        functools.partial(_fused_pool_logits_kernel, batch_tile=bt,
                          rank=p),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, n, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, f, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, p, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, p, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, p, f), jnp.float32),
            jax.ShapeDtypeStruct((b, p, n), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * f * p + 2 * b * f * c * p,
            bytes_accessed=b * n * f * x.dtype.itemsize
            + b * p * (f + n) * 4 + f * p * 4 + f * c * p * 4 + b * c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, sal_w.astype(jnp.float32),
      sal_b.astype(jnp.float32).reshape(1, p),
      jnp.transpose(attn_w.astype(jnp.float32), (2, 0, 1)),
      jnp.transpose(attn_b.astype(jnp.float32)))
    return logits[:, 0, :], v, s


def saliency_summary(x, sal_w, sal_b, *, interpret=False):
    """Fused (v, s) for a batch.

    x (B, N, F) -> v (B, P, F) f32, s (B, P, N) f32 (saliency maps).
    """
    b, n, f = x.shape
    p = sal_w.shape[-1]
    bt = _pick_batch_tile(b, n, f, x.dtype.itemsize)
    v, s = pl.pallas_call(
        functools.partial(_fused_pool_kernel, batch_tile=bt, n=n, f=f),
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, n, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bt, p, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, p, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, p, f), jnp.float32),
            jax.ShapeDtypeStruct((b, p, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n * f * p,
            bytes_accessed=b * n * f * x.dtype.itemsize
            + b * p * (f + n) * 4 + f * p * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, sal_w.astype(jnp.float32),
      sal_b.astype(jnp.float32).reshape(1, p))
    return v, s


def _project_logits(v, s, attn_w, attn_b):
    """Class projection: (B, P, F) x (F, C, P) -> (B, C), MXU-dense
    ((B, P*F) @ (P*F, C): the rank folds into the contraction dim)."""
    vw = jnp.einsum("bpf,fcp->bc", v, attn_w.astype(jnp.float32))
    ssum = jnp.sum(s, axis=2)                                  # (B, P)
    return vw + ssum @ jnp.transpose(attn_b.astype(jnp.float32))


def _fwd_impl(x, attn_w, attn_b, sal_w, sal_b, interpret):
    if attn_w.size * 4 <= _PROJ_VMEM_BUDGET_BYTES:
        logits, v, s = fused_pool_logits(x, attn_w, attn_b, sal_w, sal_b,
                                         interpret=interpret)
        return logits, v, s
    # A too large for VMEM residency: saliency kernel + XLA projection
    v, s = saliency_summary(x, sal_w, sal_b, interpret=interpret)
    return _project_logits(v, s, attn_w, attn_b), v, s


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def attentional_pool_fused(x, attn_w, attn_b, sal_w, sal_b,
                           interpret=False):
    """Fused attentional pooling: drop-in for ops.attn_pool.attentional_pool.

    x (B, N, F) any float dtype; weights f32.  Returns (B, C) f32.
    ``interpret=True`` runs the Pallas kernel in interpreter mode (CPU
    tests — SURVEY.md section 5 sanitizer row).
    """
    return _fwd_impl(x, attn_w, attn_b, sal_w, sal_b, interpret)[0]


def _fused_fwd(x, attn_w, attn_b, sal_w, sal_b, interpret):
    logits, v, s = _fwd_impl(x, attn_w, attn_b, sal_w, sal_b, interpret)
    return logits, (x, attn_w, attn_b, sal_w, v, s)


def _fused_bwd(interpret, res, g):
    """g: (B, C) cotangent.  Skinny matmuls with the saved saliency s."""
    x, attn_w, attn_b, sal_w, v, s = res
    xf = x.astype(jnp.float32)
    aw = attn_w.astype(jnp.float32)
    ab = attn_b.astype(jnp.float32)
    sw = sal_w.astype(jnp.float32)
    g = g.astype(jnp.float32)
    ssum = jnp.sum(s, axis=2)                           # (B, P)

    d_attn_w = jnp.einsum("bpf,bc->fcp", v, g)
    d_attn_b = jnp.einsum("bp,bc->cp", ssum, g)
    dv = jnp.einsum("bc,fcp->bpf", g, aw)               # (B, P, F)
    dssum = g @ ab                                      # (B, P)

    # v = sum_n x_n s_n  =>  dx += s dv ; ds = X dv
    ds = jnp.einsum("bnf,bpf->bpn", xf, dv) + dssum[:, :, None]
    dx = jnp.einsum("bpn,bpf->bnf", s, dv)
    # s = X sal_w + beta  =>  dx += ds sal_w^T ; dsal_w = X^T ds
    dx = dx + jnp.einsum("bpn,fp->bnf", ds, sw)
    d_sal_w = jnp.einsum("bnf,bpn->fp", xf, ds)
    d_sal_b = jnp.sum(ds, axis=(0, 2))
    return (dx.astype(x.dtype), d_attn_w.astype(attn_w.dtype),
            d_attn_b.astype(attn_b.dtype), d_sal_w.astype(sal_w.dtype),
            d_sal_b.astype(sal_w.dtype))


attentional_pool_fused.defvjp(_fused_fwd, _fused_bwd)
