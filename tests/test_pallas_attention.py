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


class TestBTDKernel:
    """fused_attention_btd: [B, T, D] layout, heads as column slices."""

    def _ref(self, q, k, v, H, causal):
        from regennet_tpu.ops.pallas_attention import attention_reference

        B, T, D = q.shape
        hd = D // H

        def to_bhtd(x):
            return x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        out = attention_reference(to_bhtd(q), to_bhtd(k), to_bhtd(v), causal)
        return out.transpose(0, 2, 1, 3).reshape(B, T, D)

    @pytest.mark.parametrize("causal", [True, False])
    @pytest.mark.parametrize("B,T,D,H", [(4, 30, 64, 4), (3, 17, 48, 2), (1, 9, 32, 1)])
    def test_matches_reference(self, causal, B, T, D, H):
        from regennet_tpu.ops.pallas_attention import fused_attention_btd

        keys = jax.random.split(jax.random.PRNGKey(42), 3)
        q, k, v = [jax.random.normal(kk, (B, T, D), jnp.float32) for kk in keys]
        out = fused_attention_btd(q, k, v, num_heads=H, causal=causal,
                                  interpret=True)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(self._ref(q, k, v, H, causal)),
            atol=1e-5,
        )

    def test_block_batch_divides(self):
        from regennet_tpu.ops.pallas_attention import _pick_block_batch

        for B in (1, 2, 3, 7, 32, 128, 256):
            for hc, si in [(4, 4), (4, 2), (1, 4)]:
                bb = _pick_block_batch(B, 150, 512, 2, 4, hc, si)
                assert B % bb == 0 and bb >= 1

    @pytest.mark.parametrize("head_chunk", [1, 2, 4])
    def test_head_chunk_equivalence(self, head_chunk):
        from regennet_tpu.ops.pallas_attention import fused_attention_btd

        keys = jax.random.split(jax.random.PRNGKey(7), 3)
        q, k, v = [jax.random.normal(kk, (4, 30, 64), jnp.float32)
                   for kk in keys]
        base = fused_attention_btd(q, k, v, num_heads=4, causal=True,
                                   interpret=True)
        out = fused_attention_btd(q, k, v, num_heads=4, causal=True,
                                  interpret=True, head_chunk=head_chunk,
                                  block_batch=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=1e-6)

    def test_bf16_softmax_mode(self):
        from regennet_tpu.ops.pallas_attention import fused_attention_btd

        keys = jax.random.split(jax.random.PRNGKey(8), 3)
        q, k, v = [
            jax.random.normal(kk, (2, 20, 64), jnp.float32).astype(
                jnp.bfloat16
            )
            for kk in keys
        ]
        lo = fused_attention_btd(q, k, v, num_heads=2, causal=True,
                                 interpret=True, softmax_f32=False)
        hi = fused_attention_btd(q, k, v, num_heads=2, causal=True,
                                 interpret=True, softmax_f32=True)
        # both bf16 outputs; the two softmax precisions agree to bf16 noise
        assert lo.dtype == jnp.bfloat16 and hi.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(lo, np.float32), np.asarray(hi, np.float32), atol=0.05
        )
