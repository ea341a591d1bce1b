"""Transformer building blocks for the CMDM denoiser.

Post-LayerNorm encoder/decoder layers with torch-compatible semantics
(reference trunk: model/cmdm.py:63-89 uses nn.TransformerEncoder/Decoder with
norm_first=False), written batch-first for TPU layouts with a packed QKV
projection so MXU matmuls stay large and checkpoint conversion from torch's
in_proj layout is mechanical.

Sequences here are short (60-150 frames), so plain dot-product attention is
MXU-optimal — no flash/blockwise machinery needed (see SURVEY.md §5:
reference has no sequence parallelism either).
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp


def causal_mask(T: int, dtype=jnp.float32) -> jnp.ndarray:
    """Additive [T, T] mask: 0 on/below the diagonal, -inf above."""
    i = jnp.arange(T)[:, None]
    j = jnp.arange(T)[None, :]
    return jnp.where(j <= i, 0.0, -jnp.inf).astype(dtype)


def _pallas_attention_enabled(latent_dim: int, num_heads: int) -> bool:
    """Fused-attention policy: default ON for eligible shapes; set
    REGENNET_PALLAS_ATTN=0 to force the plain-XLA path (=1 forces on).

    Routes to the [B,T,D]-layout kernels (ops/pallas_attention.py):
    inference uses fused_attention_btd, training (deterministic=False)
    uses fused_attention_btd_train — in-kernel attention-weight dropout
    plus a recompute custom_vjp backward, so neither the [B,H,T,T]
    scores, weights, dropout mask, nor their gradients materialise in
    HBM. REGENNET_PALLAS_ATTN_TRAIN=0 disables only the training route.
    Heads are column slices (no layout copies around the kernel) with
    phase-structured score/softmax/AV chunks. Measured end-to-end on the
    DDPM-1000 flagship bench: 24.97 vs 22.40 seqs/s/chip (+11.4%,
    docs/PERF.md). Numerics equal the non-fused path's validated
    bf16-softmax computation to bf16 rounding (f32 score accumulation, the
    same softmax dtype switch). On TPU it needs lane-aligned dims (latent
    and head dims multiples of 128), same as the fused layer kernel; CPU
    interpret mode takes any shape but stays opt-in (it is a debug path).
    """
    import os

    import jax

    flag = os.environ.get("REGENNET_PALLAS_ATTN", "")
    if flag == "0":
        return False
    if jax.default_backend() == "cpu":
        return flag == "1"
    aligned = latent_dim % 128 == 0 and (latent_dim // num_heads) % 128 == 0
    if flag == "1" and not aligned:
        # forcing the kernel on unaligned dims would fail at Mosaic compile
        # time (rank-collapse needs lane-aligned last dims); fall back loudly
        import warnings

        warnings.warn(
            f"REGENNET_PALLAS_ATTN=1 ignored: latent_dim={latent_dim}, "
            f"heads={num_heads} are not lane-aligned (need latent and head "
            "dims % 128 == 0 on TPU); using the XLA attention path.",
            stacklevel=2,
        )
        return False
    if flag == "1":
        return True
    return aligned


def _bf16_softmax_enabled() -> bool:
    """Attention softmax in the compute dtype (default ON; set
    REGENNET_BF16_SOFTMAX=0 for the f32-upcast softmax).

    Worth +14% sampling throughput on bf16 models (skips one f32
    materialisation of the [B,H,T,T] scores per layer). Fidelity validated
    end-to-end by scripts/validate_bf16_softmax.py: on the full multi-seed
    eval protocol (1000-step DDPM, trained CMDM + ST-GCN evaluator) every
    FID/diversity/multimodality delta vs the f32 softmax was <= 0.06 sigma
    of the across-seed noise. No effect on f32 models (softmax is f32
    either way)."""
    import os

    return os.environ.get("REGENNET_BF16_SOFTMAX", "1") != "0"


class MultiHeadAttention(nn.Module):
    """Packed-QKV multi-head attention (self or cross).

    With REGENNET_PALLAS_ATTN=1, causal self-attention routes through the
    fused [B,T,D]-layout Pallas kernel: scores stay in VMEM and no layout
    copies materialise around the kernel.
    """

    num_heads: int
    latent_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q_in, kv_in, attn_mask=None, deterministic=True,
                 causal=False, kv_valid=None):
        """kv_valid (static int): number of REAL key positions when the
        sequence is sublane-tile padded (models/cmdm pads T to the 16-row
        bf16 tile and slices the output). Only needed for NON-causal
        attention — a causal mask already hides tail-padded keys from every
        real query row; callers pass it for the encoder trunk only."""
        D, H = self.latent_dim, self.num_heads
        head_dim = D // H
        if kv_valid is not None and kv_valid >= kv_in.shape[1]:
            kv_valid = None  # nothing padded

        if kv_in.shape[1] == 1 and attn_mask is None and deterministic:
            # single-key cross-attention (the timestep/action token):
            # softmax over one logit is exactly 1, so attention reduces to
            # out_proj(v_proj(memory)) broadcast over queries — skips the
            # q/k projections, the score matmul, and the softmax entirely.
            # q_proj/k_proj params must still exist for checkpoint
            # compatibility; the dead applications below are eliminated by XLA
            _ = nn.Dense(D, dtype=self.dtype, name="q_proj")(kv_in)
            _ = nn.Dense(D, dtype=self.dtype, name="k_proj")(kv_in)
            v1 = nn.Dense(D, dtype=self.dtype, name="v_proj")(kv_in)
            out1 = nn.Dense(D, dtype=self.dtype, name="out_proj")(v1)
            return jnp.broadcast_to(out1, q_in.shape[:2] + (D,))

        q = nn.Dense(D, dtype=self.dtype, name="q_proj")(q_in)
        k = nn.Dense(D, dtype=self.dtype, name="k_proj")(kv_in)
        v = nn.Dense(D, dtype=self.dtype, name="v_proj")(kv_in)

        B, Tq = q.shape[0], q.shape[1]
        Tk = k.shape[1]

        # fused-kernel eligibility: causal self-attention (mask generated
        # in-kernel), or plain non-causal self-attention (the
        # offline/trans_enc trunk) — cross-attention and explicit masks
        # stay on the XLA path. attn_mask must be None even when causal:
        # the kernel only knows the causal mask, so an explicit mask would
        # be silently dropped.
        fused_ok = attn_mask is None and (causal or q_in is kv_in) \
            and _pallas_attention_enabled(D, H)
        if fused_ok:
            # [B, T, D]-layout kernel: heads are column slices, so no
            # transpose/pad copies materialise around the kernel — the
            # measured bottleneck of the [B,H,T,hd] variant (docs/PERF.md)
            import os

            import jax

            hc = int(os.environ.get("REGENNET_PALLAS_ATTN_HC") or 0)
            bb = int(os.environ.get("REGENNET_PALLAS_ATTN_BB") or 0)
            # causal masking already hides tail-padded keys; only the
            # non-causal (encoder) route needs the in-kernel key mask
            kv_len = None if causal else kv_valid
            if deterministic:
                from regennet_tpu.ops.pallas_attention import (
                    fused_attention_btd,
                )

                out = fused_attention_btd(
                    q, k, v, num_heads=H, causal=causal,
                    interpret=jax.default_backend() == "cpu",
                    softmax_f32=not _bf16_softmax_enabled(),
                    # tuning knobs for the bench sweep (0 = auto)
                    head_chunk=hc, block_batch=bb, kv_len=kv_len,
                )
                return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)
            if (self.dropout > 0.0
                    and os.environ.get("REGENNET_PALLAS_ATTN_TRAIN", "1")
                    != "0"):
                # training variant: in-kernel attention-weight dropout +
                # recompute backward (custom_vjp) — neither the scores,
                # the weights, the mask, nor their gradients ever
                # materialise in HBM. Measured on the full train step
                # (batch 64 bf16, interleaved in-process A/B): 27.3 ->
                # 24.9 ms, kernel ahead in every block
                # (docs/train_ab_inproc_r3.json); the in-kernel dropout
                # itself is free (full vs no-dropout within noise,
                # docs/train_profile_r3.json). With dropout == 0 the XLA
                # path is ~1.7 ms FASTER than the rate-0 kernel at this
                # batch, so dropout-free training falls through.
                from regennet_tpu.ops.pallas_attention import (
                    fused_attention_btd_train,
                )

                # per-ROW seeds [B, 2]: under data-parallel GSPMD each
                # shard's kernel programs see only local program_ids, so a
                # replicated scalar seed would draw identical masks on
                # every shard; per-row seeds ride the batch sharding
                bits = jax.random.bits(
                    self.make_rng("dropout"), (q.shape[0], 2), jnp.uint32
                )
                seed = jax.lax.bitcast_convert_type(bits, jnp.int32)
                out = fused_attention_btd_train(
                    q, k, v, num_heads=H, dropout_rate=self.dropout,
                    seed=seed, causal=causal,
                    interpret=jax.default_backend() == "cpu",
                    softmax_f32=not _bf16_softmax_enabled(),
                    head_chunk=hc, block_batch=bb, kv_len=kv_len,
                )
                return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)

        q = q.reshape(B, Tq, H, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, Tk, H, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, Tk, H, head_dim).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, dtype=q.dtype)
        )
        if causal and attn_mask is None:
            attn_mask = causal_mask(Tq, dtype=jnp.float32)
        if kv_valid is not None and not causal:
            kmask = jnp.where(
                jnp.arange(Tk) < kv_valid, 0.0, -jnp.inf
            ).astype(jnp.float32)
            attn_mask = kmask if attn_mask is None else attn_mask + kmask
        if attn_mask is not None:
            scores = scores + attn_mask
        if _bf16_softmax_enabled():
            # softmax in the compute dtype (saves one f32 materialisation
            # of the [B,H,T,T] scores per layer; fidelity-validated default)
            weights = nn.softmax(scores, axis=-1)
        else:
            weights = nn.softmax(
                scores.astype(jnp.float32), axis=-1
            ).astype(q.dtype)
        weights = nn.Dropout(self.dropout)(weights, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, D)
        return nn.Dense(D, dtype=self.dtype, name="out_proj")(out)


class FeedForward(nn.Module):
    latent_dim: int
    ff_size: int
    dropout: float
    activation: Callable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.ff_size, dtype=self.dtype, name="linear1")(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.latent_dim, dtype=self.dtype, name="linear2")(h)
        return h


class EncoderLayer(nn.Module):
    """Post-LN: x = LN(x + SelfAttn(x)); x = LN(x + FF(x))."""

    num_heads: int
    latent_dim: int
    ff_size: int
    dropout: float
    activation: Callable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic=True, kv_valid=None):
        attn = MultiHeadAttention(
            self.num_heads, self.latent_dim, self.dropout, self.dtype,
            name="self_attn",
        )(x, x, attn_mask, deterministic, kv_valid=kv_valid)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + attn)
        ff = FeedForward(
            self.latent_dim, self.ff_size, self.dropout, self.activation,
            self.dtype, name="ff",
        )(x, deterministic)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + ff)


class DecoderLayer(nn.Module):
    """Post-LN decoder: self-attn (masked) -> cross-attn(memory) -> FF."""

    num_heads: int
    latent_dim: int
    ff_size: int
    dropout: float
    activation: Callable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, tgt_mask=None, deterministic=True,
                 causal=False):
        attn = MultiHeadAttention(
            self.num_heads, self.latent_dim, self.dropout, self.dtype,
            name="self_attn",
        )(x, x, tgt_mask, deterministic, causal=causal)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x + attn)
        cross = MultiHeadAttention(
            self.num_heads, self.latent_dim, self.dropout, self.dtype,
            name="cross_attn",
        )(x, memory, None, deterministic)
        cross = nn.Dropout(self.dropout)(cross, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + cross)
        ff = FeedForward(
            self.latent_dim, self.ff_size, self.dropout, self.activation,
            self.dtype, name="ff",
        )(x, deterministic)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x + ff)


class Encoder(nn.Module):
    num_layers: int
    num_heads: int
    latent_dim: int
    ff_size: int
    dropout: float
    activation: Callable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic=True, kv_valid=None):
        for i in range(self.num_layers):
            x = EncoderLayer(
                self.num_heads, self.latent_dim, self.ff_size, self.dropout,
                self.activation, self.dtype, name=f"layer_{i}",
            )(x, attn_mask, deterministic, kv_valid=kv_valid)
        return x


class Decoder(nn.Module):
    num_layers: int
    num_heads: int
    latent_dim: int
    ff_size: int
    dropout: float
    activation: Callable
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, tgt_mask=None, deterministic=True,
                 causal=False):
        for i in range(self.num_layers):
            x = DecoderLayer(
                self.num_heads, self.latent_dim, self.ff_size, self.dropout,
                self.activation, self.dtype, name=f"layer_{i}",
            )(x, memory, tgt_mask, deterministic, causal=causal)
        return x


import functools


def gelu_exact(x):
    """torch-parity GELU: the exact erf form (torch F.gelu default), NOT
    flax nn.gelu's default tanh approximation — the approximation drifts
    up to ~1e-3 from released-checkpoint activations."""
    import flax.linen as _nn

    return _nn.gelu(x, approximate=False)



@functools.lru_cache(maxsize=8)
def sinusoidal_table(max_len: int, d_model: int) -> jnp.ndarray:
    """Classic sin/cos positional table [max_len, d_model]. Cached: the
    comp_v6 snippet loop calls this per unrolled step at trace time, and
    returning the same array object lets XLA keep one constant.

    The device conversion runs under ensure_compile_time_eval so the cached
    value is a CONCRETE array even when the first call happens inside a jit
    trace — otherwise the cache would hold that trace's tracer and poison
    every later retrace (seen as an UnexpectedTracerError when a partial
    final eval batch forced a second trace of the CVAE decode)."""
    import numpy as np

    position = np.arange(max_len)[:, None].astype(np.float64)
    div_term = np.exp(
        np.arange(0, d_model, 2).astype(np.float64) * (-np.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    import jax

    with jax.ensure_compile_time_eval():
        return jnp.asarray(pe, dtype=jnp.float32)
