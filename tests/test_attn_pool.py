"""Unit tests: factorized attentional pooling vs. the naive oracle
(SURVEY.md section 4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attentionalpoolingaction_tpu.ops.attn_pool import (
    attention_maps,
    attentional_pool,
    attentional_pool_oracle,
    init_attn_pool_params,
)


def make_inputs(rng, b=2, n=49, f=64, c=11, p=1):
    x = jnp.asarray(rng.normal(size=(b, n, f)), jnp.float32)
    params = init_attn_pool_params(jax.random.key(0), f, c, p)
    # non-zero biases to exercise all bias terms
    params["attn_b"] = jnp.asarray(rng.normal(size=(c, p)), jnp.float32)
    params["sal_b"] = jnp.asarray(rng.normal(size=(p,)), jnp.float32)
    return x, params


@pytest.mark.parametrize("rank", [1, 3])
def test_factorized_matches_oracle(rng, rank):
    x, params = make_inputs(rng, p=rank)
    got = attentional_pool(x, **params)
    want = np.asarray(attentional_pool_oracle(x, **params))
    # The factorized form re-associates the big cancelling double-sum, so
    # compare error relative to the overall logit scale (identity is exact in
    # f64 — verified; this bounds f32 association error only).
    scale = np.abs(want).max()
    assert np.abs(np.asarray(got) - want).max() / scale < 1e-3


def test_rank1_hand_oracle(rng):
    """Rank-1, no bias: logits_c == (X a_c)^T (X b), computed by hand."""
    b, n, f, c = 1, 5, 7, 3
    x = rng.normal(size=(b, n, f)).astype(np.float32)
    aw = rng.normal(size=(f, c, 1)).astype(np.float32)
    sw = rng.normal(size=(f, 1)).astype(np.float32)
    got = np.asarray(attentional_pool(
        jnp.asarray(x), jnp.asarray(aw), jnp.zeros((c, 1)), jnp.asarray(sw),
        jnp.zeros((1,))))
    want = np.zeros((b, c), np.float32)
    for bi in range(b):
        bottom = x[bi] @ sw[:, 0]                      # (n,)
        for ci in range(c):
            top = x[bi] @ aw[:, ci, 0]                 # (n,)
            want[bi, ci] = top @ bottom
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bf16_input_accumulates_f32(rng):
    x, params = make_inputs(rng)
    out = attentional_pool(x.astype(jnp.bfloat16), **params)
    assert out.dtype == jnp.float32
    ref = attentional_pool(x, **params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_attention_maps_consistent_with_logits(rng):
    """sum_n top_down * bottom_up must reproduce the rank-1 logits."""
    x, params = make_inputs(rng, p=1)
    top, bot = attention_maps(x, **params)
    logits = attentional_pool(x, **params)
    recon = jnp.einsum("bnc,bn->bc", top, bot)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(logits),
                               rtol=1e-4, atol=1e-4)


def test_attention_maps_class_idx(rng):
    x, params = make_inputs(rng, c=5)
    top_all, _ = attention_maps(x, **params)
    top_c, _ = attention_maps(x, **params, class_idx=3)
    np.testing.assert_allclose(np.asarray(top_c), np.asarray(top_all[:, :, 3]),
                               rtol=1e-5, atol=1e-5)


def test_grad_flows(rng):
    x, params = make_inputs(rng)

    def loss(params, x):
        return jnp.sum(attentional_pool(x, **params) ** 2)

    grads = jax.grad(loss)(params, x)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
        assert float(jnp.abs(g).max()) > 0, k
