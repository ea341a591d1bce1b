"""Fused causal attention as a Pallas TPU kernel.

For the CMDM's short sequences (60-150 frames) the whole attention for one
(batch, head) fits comfortably in VMEM, so one kernel program computes
QK^T -> causal mask -> softmax -> AV without ever materialising the
[B, H, T, T] score tensor in HBM — the main memory-traffic cost of the XLA
path at the flagship batch size.

Layout: q, k, v as [BH, Tp, hd] with Tp padded to the sublane tile (and the
padding masked inside the kernel); grid is one program per (batch*head).
Numerics: scores and softmax in float32 regardless of input dtype (matches
the non-fused path, which also lifts softmax to f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, seq_len: int, scale: float,
                 causal: bool, group: int):
    """One program handles `group` (batch*head) slices — amortises per-program
    launch overhead, which dominated the one-head-per-program variant.

    Phase-structured for the scheduler: all QK^T matmuls first, then ONE
    stacked softmax over [group*Tp, Tp] on the VPU, then all AV matmuls —
    keeping MXU work contiguous instead of alternating MXU/VPU per head.
    """
    Tp = q_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    valid = col < seq_len
    if causal:
        valid = valid & (col <= row)

    # phase 1: scores for every head in the group (MXU)
    scores = []
    for g in range(group):
        q = q_ref[g].astype(jnp.float32)
        k = k_ref[g].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        scores.append(jnp.where(valid, s, _NEG_INF))
    stacked = jnp.concatenate(scores, axis=0)  # [group*Tp, Tp]

    # phase 2: one big softmax (VPU)
    m = jnp.max(stacked, axis=1, keepdims=True)
    p = jnp.exp(stacked - m)
    weights = p / jnp.sum(p, axis=1, keepdims=True)

    # phase 3: AV for every head (MXU)
    for g in range(group):
        w = weights[g * Tp : (g + 1) * Tp]
        out = jax.lax.dot_general(
            w, v_ref[g].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[g] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "interpret", "group"))
def fused_causal_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    causal: bool = True, interpret: bool = False, group: int = 8,
) -> jnp.ndarray:
    """q, k, v: [B, H, T, hd] -> [B, H, T, hd]."""
    B, H, T, hd = q.shape
    scale = 1.0 / (hd ** 0.5)
    # sublane tile: 8 for f32, 16 for bf16; pad T to the stricter 16
    Tp = _round_up(T, 16)
    hp = _round_up(hd, 128)
    BH = B * H
    group = min(group, BH)
    while BH % group:
        group -= 1

    def prep(x):
        x = x.reshape(BH, T, hd)
        return jnp.pad(x, ((0, 0), (0, Tp - T), (0, hp - hd)))

    qp, kp, vp = prep(q), prep(k), prep(v)

    kernel = functools.partial(
        _attn_kernel, seq_len=T, scale=scale, causal=causal, group=group
    )
    spec = pl.BlockSpec((group, Tp, hp), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(BH // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BH, Tp, hp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :T, :hd].reshape(B, H, T, hd)


def attention_reference(q, k, v, causal=True):
    """Plain-XLA attention with identical semantics, for tests/fallback."""
    hd = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    scores = scores / (hd ** 0.5)
    if causal:
        T = q.shape[2]
        row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        scores = jnp.where(col <= row, scores, -jnp.inf)
    weights = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)
