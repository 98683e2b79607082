"""Pallas fused pooling kernel vs. the einsum oracle (interpret mode on CPU
— SURVEY.md section 4 item 1 and section 5 sanitizer row).  The compiled
Mosaic path is exercised on real TPU by bench.py and scripts/tpu_checks.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentionalpoolingaction_tpu.ops.attn_pool import (
    attentional_pool,
    init_attn_pool_params,
)
from attentionalpoolingaction_tpu.ops.attn_pool_pallas import (
    attentional_pool_fused,
    saliency_summary,
)


def make_inputs(rng, b=2, n=49, f=256, c=11, p=1):
    x = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
    params = init_attn_pool_params(jax.random.key(0), f, c, p)
    params["attn_b"] = jnp.asarray(rng.normal(size=(c, p)), jnp.float32)
    params["sal_b"] = jnp.asarray(rng.normal(size=(p,)), jnp.float32)
    return x, params


@pytest.mark.parametrize("rank", [1, 4])
def test_fused_matches_factorized(rng, rank):
    x, params = make_inputs(rng, p=rank)
    got = attentional_pool_fused(
        x, params["attn_w"], params["attn_b"], params["sal_w"],
        params["sal_b"], True)
    want = np.asarray(attentional_pool(x, **params))
    scale = np.abs(want).max()
    assert np.abs(np.asarray(got) - want).max() / scale < 1e-3


def test_saliency_summary_shapes(rng):
    x, params = make_inputs(rng, b=4, n=49, f=256, p=2)
    v, s = saliency_summary(x, params["sal_w"], params["sal_b"],
                            interpret=True)
    assert v.shape == (4, 2, 256)
    assert s.shape == (4, 2, 49)
    # oracle check: s is the bottom-up saliency map, v = X^T s
    s_ref = np.einsum("bnf,fp->bpn", np.asarray(x),
                      np.asarray(params["sal_w"]))
    s_ref = s_ref + np.asarray(params["sal_b"])[None, :, None]
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=1e-3, atol=1e-3)
    v_ref = np.einsum("bnf,bpn->bpf", np.asarray(x), s_ref)
    np.testing.assert_allclose(np.asarray(v), v_ref, rtol=1e-3, atol=1e-3)


def test_fused_bf16_input(rng):
    x, params = make_inputs(rng)
    out = attentional_pool_fused(
        x.astype(jnp.bfloat16), params["attn_w"], params["attn_b"],
        params["sal_w"], params["sal_b"], True)
    assert out.dtype == jnp.float32
    ref = np.asarray(attentional_pool(x, **params))
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(out) - ref).max() / scale < 2e-2


@pytest.mark.parametrize("rank", [1, 3])
def test_fused_grads_match_einsum_path(rng, rank):
    """Custom VJP vs. autodiff through the factorized einsum path."""
    x, params = make_inputs(rng, b=2, n=16, f=128, c=7, p=rank)

    def loss_fused(x, params):
        out = attentional_pool_fused(
            x, params["attn_w"], params["attn_b"], params["sal_w"],
            params["sal_b"], True)
        return jnp.sum(jnp.sin(out))

    def loss_ref(x, params):
        return jnp.sum(jnp.sin(attentional_pool(x, **params)))

    g1 = jax.grad(loss_fused, argnums=(0, 1))(x, params)
    g2 = jax.grad(loss_ref, argnums=(0, 1))(x, params)
    flat1 = jax.tree.leaves(g1)
    flat2 = jax.tree.leaves(g2)
    for a, b in zip(flat1, flat2):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 1e-3


def test_fused_under_jit_and_vmap_composition(rng):
    x, params = make_inputs(rng, b=4)

    @jax.jit
    def f(x):
        return attentional_pool_fused(
            x, params["attn_w"], params["attn_b"], params["sal_w"],
            params["sal_b"], True)

    out = f(x)
    assert out.shape == (4, 11)
    assert np.isfinite(np.asarray(out)).all()


def test_head_module_uses_pallas(rng):
    """AttentionalPoolingHead(use_pallas=True) runs off-TPU via interpret."""

    from attentionalpoolingaction_tpu.models.heads import (
        AttentionalPoolingHead)

    head = AttentionalPoolingHead(num_classes=5, rank=2, use_pallas=True)
    feats = jnp.asarray(rng.normal(size=(2, 4, 4, 128)), jnp.float32)
    var = head.init(jax.random.key(0), feats)
    logits = head.apply(var, feats)
    ref_head = AttentionalPoolingHead(num_classes=5, rank=2,
                                      use_pallas=False)
    ref = ref_head.apply(var, feats)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)
