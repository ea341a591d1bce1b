"""Pallas fused causal attention: correctness vs the plain-XLA reference
(interpret mode on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.ops.pallas_attention import (
    attention_reference,
    fused_causal_attention,
)


@pytest.mark.parametrize("T", [16, 150])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_reference(T, dtype):
    B, H, hd = 2, 4, 128
    key = jax.random.PRNGKey(0)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, H, T, hd), dtype)
        for i in range(3)
    )
    fused = fused_causal_attention(q, k, v, causal=True, interpret=True)
    ref = attention_reference(q, k, v, causal=True)
    atol = 2e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(ref, np.float32), atol=atol
    )


def test_fused_non_causal():
    B, H, T, hd = 1, 2, 24, 128
    key = jax.random.PRNGKey(1)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, H, T, hd))
        for i in range(3)
    )
    fused = fused_causal_attention(q, k, v, causal=False, interpret=True)
    ref = attention_reference(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=2e-5)


def test_causality_of_fused():
    """Perturbing a future frame must not change earlier outputs."""
    B, H, T, hd = 1, 2, 20, 128
    key = jax.random.PRNGKey(2)
    q, k, v = (
        jax.random.normal(jax.random.fold_in(key, i), (B, H, T, hd))
        for i in range(3)
    )
    out1 = fused_causal_attention(q, k, v, interpret=True)
    k2 = k.at[:, :, -1].add(10.0)
    v2 = v.at[:, :, -1].add(10.0)
    out2 = fused_causal_attention(q, k2, v2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out1[:, :, :-1]), np.asarray(out2[:, :, :-1]), atol=1e-5
    )


def test_model_output_unchanged_with_pallas_path(monkeypatch):
    """CMDM forward must be numerically identical whether the fused kernel
    (interpret mode here) or the XLA path computes attention."""
    import regennet_tpu.models.transformer as tfm
    from regennet_tpu.models.cmdm import CMDM

    model = CMDM(
        njoints=56, nfeats=6, num_actions=8, num_frames=12, latent_dim=256,
        ff_size=256, num_layers=2, num_heads=2, arch="online",
        cm_mode="add", cond_mode="action", dropout=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 6, 12))
    cond = {"cmotion": x * 0.5, "action": jnp.zeros((2, 1), jnp.int32)}
    t = jnp.zeros((2,), jnp.int32)
    params = model.init(jax.random.PRNGKey(1), x, t, cond)["params"]

    monkeypatch.setenv("REGENNET_PALLAS_ATTN", "0")
    out_xla = model.apply({"params": params}, x, t, cond)

    monkeypatch.setenv("REGENNET_PALLAS_ATTN", "1")
    import regennet_tpu.ops.pallas_attention as pa

    orig = pa.fused_causal_attention
    monkeypatch.setattr(
        pa, "fused_causal_attention",
        lambda q, k, v, causal=True: orig(q, k, v, causal=causal, interpret=True),
    )
    out_pallas = model.apply({"params": params}, x, t, cond)
    np.testing.assert_allclose(
        np.asarray(out_xla), np.asarray(out_pallas), atol=2e-5
    )
