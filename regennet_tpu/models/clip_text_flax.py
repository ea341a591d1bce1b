"""TPU-native CLIP text tower (frozen, inference-only).

The reference embeds OpenAI CLIP ViT-B/32 inside the model and conditions
on `clip_model.encode_text(tokens)` — ln_final output at the EOT position
projected through `text_projection` (reference: model/cmdm.py:116-127,
153-166). This module re-implements exactly that text transformer in flax
so text encoding jits and runs on TPU (or CPU) instead of requiring a host
torch pass: token + learned positional embeddings, pre-LN residual blocks
with causal self-attention and quick-gelu MLPs, final LayerNorm, EOT
pooling (argmax of token ids — EOT has the largest id), and the
49408->proj text projection.

Weights come from `convert/torch_ckpt.convert_clip_text`, which accepts
both the HF `CLIPTextModelWithProjection` layout and the original OpenAI
`ViT-B-32.pt` state-dict layout (what `clip.load` caches), so parity with
the reference text path is one file-drop away.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class _ResidualBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, causal_mask):
        B, T, D = x.shape
        hd = self.dim // self.heads
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        q = nn.Dense(self.dim, name="q_proj")(h)
        k = nn.Dense(self.dim, name="k_proj")(h)
        v = nn.Dense(self.dim, name="v_proj")(h)

        def split(t):
            return t.reshape(B, T, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.float32(hd)
        )
        scores = jnp.where(causal_mask, scores, -1e9)
        attn = nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, T, D)
        x = x + nn.Dense(self.dim, name="out_proj")(o)

        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * self.dim, name="fc1")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.dim, name="fc2")(h)
        return x


class ClipTextTransformer(nn.Module):
    """tokens [B, context] int32 -> projected text features [B, proj_dim]
    (reference CLIP.encode_text semantics, float32)."""

    vocab_size: int = 49408
    context_length: int = 77
    dim: int = 512
    heads: int = 8
    num_layers: int = 12
    proj_dim: int = 512

    @nn.compact
    def __call__(self, tokens):
        B, T = tokens.shape
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (self.vocab_size, self.dim),
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.dim),
        )
        x = jnp.asarray(tok_emb)[tokens] + jnp.asarray(pos_emb)[None, :T]
        mask = jnp.tril(jnp.ones((T, T), bool))[None, None]
        for i in range(self.num_layers):
            x = _ResidualBlock(self.dim, self.heads, name=f"block_{i}")(
                x, mask
            )
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        # EOT pooling: EOT has the largest token id in the CLIP vocab
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(B), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(0.02),
            (self.dim, self.proj_dim),
        )
        return pooled @ jnp.asarray(proj)
