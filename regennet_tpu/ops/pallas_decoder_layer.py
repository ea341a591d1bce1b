"""Whole transformer-decoder-layer fusion as one Pallas TPU kernel.

Motivation (measured on v5e, see docs/PERF.md): at the flagship shape the
XLA layer costs ~0.855 ms, of which only ~0.4 ms is MXU-floor matmul time —
the rest is HBM round-trips of intermediates (q/k/v, f32 scores, residuals,
FFN hidden) plus layout copies. One kernel per batch-chunk keeps every
intermediate in VMEM: HBM sees x once in, the layer output once out, and the
layer weights once total (Mosaic keeps constant-index blocks resident across
grid steps).

Semantics mirror models/transformer.DecoderLayer on its inference fast path
(deterministic, causal self-attention, single-token memory — the online CMDM
configuration; reference trunk: model/cmdm.py:63-89,220-227):

    x = LN1(x + SelfAttn(x, causal))          # f32 softmax, f32 LN stats
    x = LN2(x + CrossOut)                      # CrossOut precomputed outside:
                                               # out_proj(v_proj(memory)) —
                                               # softmax over one key == 1
    x = LN3(x + W2 gelu(W1 x + b1) + b2)

MXU matmuls run in the input dtype (bf16 weights/activations, f32
accumulation); softmax and LayerNorm statistics are computed in f32, like
the unfused flax path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from regennet_tpu.ops.pallas_attention import attention_btd_chunks

_NEG_INF = -1e30
_LN_EPS = 1e-6  # flax LayerNorm default, used by models/transformer.py


def _dense(x, w_ref, b_ref):
    y = jax.lax.dot_general(
        x, w_ref[:], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    # b_ref is [1, N]; broadcasting aligns trailing dims for 2-D or 3-D x
    return y + b_ref[:].astype(x.dtype)


def _layer_norm(x, g_ref, b_ref):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS)
    y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    return y.astype(x.dtype)


def _decoder_layer_kernel(
    x_ref, co_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    g1_ref, be1_ref, g2_ref, be2_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    g3_ref, be3_ref,
    o_ref,
    *, num_heads: int, causal: bool, softmax_f32: bool,
):
    bb, T, D = x_ref.shape
    scale = 1.0 / ((D // num_heads) ** 0.5)

    # everything stays 3-D [bb, T, D]: Mosaic rejects [bb,T,D]->[bb*T,D]
    # shape casts for unaligned T/D, and dot_general handles rank-3 inputs
    x3 = x_ref[:]
    q = _dense(x3, wq_ref, bq_ref)
    k = _dense(x3, wk_ref, bk_ref)
    v = _dense(x3, wv_ref, bv_ref)
    attn = _attention(q, k, v, num_heads=num_heads, scale=scale,
                      causal=causal, dtype=x3.dtype,
                      softmax_f32=softmax_f32)

    a = _dense(attn, wo_ref, bo_ref)
    h1 = _layer_norm(x3 + a, g1_ref, be1_ref)

    h2 = _layer_norm(h1 + co_ref[:].astype(h1.dtype), g2_ref, be2_ref)

    f = _dense(h2, w1_ref, b1_ref)
    f = jax.nn.gelu(f, approximate=True)  # flax nn.gelu default
    f = _dense(f, w2_ref, b2_ref)
    out = _layer_norm(h2 + f, g3_ref, be3_ref)
    o_ref[:] = out


def _attention(q, k, v, *, num_heads, scale, causal, dtype,
               softmax_f32=True, head_chunk=2):
    """In-VMEM multi-head attention on [bb, T, D] activations — the shared
    phase-structured core (ops/pallas_attention.attention_btd_chunks)."""
    head_outs = [None] * num_heads

    def emit(h, out):
        head_outs[h] = out.astype(dtype)

    attention_btd_chunks(
        q, k, v, num_heads=num_heads, scale=scale, causal=causal,
        softmax_f32=softmax_f32, head_chunk=min(head_chunk, num_heads),
        emit=emit,
    )
    return jnp.concatenate(head_outs, axis=2)


def _encoder_layer_kernel(
    x_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    g1_ref, be1_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    g2_ref, be2_ref,
    o_ref,
    *, num_heads: int, causal: bool, softmax_f32: bool,
):
    """Post-LN encoder layer: x = LN1(x + SelfAttn(x)); x = LN2(x + FF(x))."""
    bb, T, D = x_ref.shape
    scale = 1.0 / ((D // num_heads) ** 0.5)
    x3 = x_ref[:]
    q = _dense(x3, wq_ref, bq_ref)
    k = _dense(x3, wk_ref, bk_ref)
    v = _dense(x3, wv_ref, bv_ref)
    attn = _attention(q, k, v, num_heads=num_heads, scale=scale,
                      causal=causal, dtype=x3.dtype,
                      softmax_f32=softmax_f32)
    a = _dense(attn, wo_ref, bo_ref)
    h1 = _layer_norm(x3 + a, g1_ref, be1_ref)
    f = _dense(h1, w1_ref, b1_ref)
    f = jax.nn.gelu(f, approximate=True)
    f = _dense(f, w2_ref, b2_ref)
    out = _layer_norm(h1 + f, g2_ref, be2_ref)
    o_ref[:] = out


def _pick_block_batch(B: int, T: int, D: int, F: int, itemsize: int) -> int:
    """Largest divisor of B whose live activations fit a VMEM budget
    (weights cost ~ (4*D*D + 2*D*F) * itemsize once, on top)."""
    weight_bytes = (4 * D * D + 2 * D * F) * itemsize
    budget = 13 * 1024 * 1024 - weight_bytes
    bb = min(B, 8)
    while bb > 1:
        if B % bb == 0:
            # x, q, k, v, attn, h1, h2, out [bb*T, D]; ffn hidden [bb*T, F];
            # per-head f32 scores [bb, T, T]
            need = (8 * D + F) * bb * T * itemsize + 4 * bb * T * T
            if need <= budget:
                return bb
        bb -= 1
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "causal", "interpret", "softmax_f32"),
)
def fused_decoder_layer(
    x: jnp.ndarray,
    cross_out: jnp.ndarray,
    attn_params,
    ln_params,
    ff_params,
    num_heads: int,
    causal: bool = True,
    interpret: bool = False,
    softmax_f32: bool = True,
) -> jnp.ndarray:
    """One post-LN decoder layer, fused.

    x: [B, T, D]; cross_out: [B, 1, D] (precomputed single-token
    cross-attention output). attn_params: dict with q/k/v/out kernels [D,D]
    and biases [D]. ln_params: dict norm1/2/3 -> (scale, bias). ff_params:
    (w1 [D,F], b1 [F], w2 [F,D], b2 [D]). Params are cast to x.dtype for
    matmuls (LN params used in f32), matching flax Dense/LayerNorm dtype
    semantics.
    """
    B, T, D = x.shape
    F = ff_params[0].shape[1]
    dt = x.dtype
    bb = _pick_block_batch(B, T, D, F, x.dtype.itemsize)

    def w2d(a):  # weights in matmul dtype
        return jnp.asarray(a, dt)

    def row(a):  # 1-D params as [1, N] rows (TPU wants >=2D), keep f32 for LN
        return jnp.asarray(a).reshape(1, -1)

    ap = attn_params
    inputs = [
        x, cross_out,
        w2d(ap["q_kernel"]), row(ap["q_bias"]).astype(dt),
        w2d(ap["k_kernel"]), row(ap["k_bias"]).astype(dt),
        w2d(ap["v_kernel"]), row(ap["v_bias"]).astype(dt),
        w2d(ap["out_kernel"]), row(ap["out_bias"]).astype(dt),
        row(ln_params["norm1"][0]), row(ln_params["norm1"][1]),
        row(ln_params["norm2"][0]), row(ln_params["norm2"][1]),
        w2d(ff_params[0]), row(ff_params[1]).astype(dt),
        w2d(ff_params[2]), row(ff_params[3]).astype(dt),
        row(ln_params["norm3"][0]), row(ln_params["norm3"][1]),
    ]

    xspec = pl.BlockSpec((bb, T, D), lambda i: (i, 0, 0))
    cspec = pl.BlockSpec((bb, 1, D), lambda i: (i, 0, 0))

    def wspec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)

    kernel = functools.partial(
        _decoder_layer_kernel, num_heads=num_heads, causal=causal,
        softmax_f32=softmax_f32,
    )
    flops = 2 * B * T * D * (4 * D + 2 * F) + 4 * B * T * T * D
    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[xspec, cspec] + [wspec(a) for a in inputs[2:]],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), dt),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * T * D * x.dtype.itemsize,
            transcendentals=B * num_heads * T * T + B * T * F,
        ),
    )(*inputs)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "causal", "interpret", "softmax_f32"),
)
def fused_encoder_layer(
    x: jnp.ndarray,
    attn_params,
    ln_params,
    ff_params,
    num_heads: int,
    causal: bool = False,
    interpret: bool = False,
    softmax_f32: bool = True,
) -> jnp.ndarray:
    """One post-LN encoder layer, fused (the offline CMDM trunk;
    reference: model/cmdm.py:228-238). Same contracts as
    fused_decoder_layer minus the cross-attention stage; ln_params carries
    norm1/norm2."""
    B, T, D = x.shape
    F = ff_params[0].shape[1]
    dt = x.dtype
    bb = _pick_block_batch(B, T, D, F, x.dtype.itemsize)

    def w2d(a):
        return jnp.asarray(a, dt)

    def row(a):
        return jnp.asarray(a).reshape(1, -1)

    ap = attn_params
    inputs = [
        x,
        w2d(ap["q_kernel"]), row(ap["q_bias"]).astype(dt),
        w2d(ap["k_kernel"]), row(ap["k_bias"]).astype(dt),
        w2d(ap["v_kernel"]), row(ap["v_bias"]).astype(dt),
        w2d(ap["out_kernel"]), row(ap["out_bias"]).astype(dt),
        row(ln_params["norm1"][0]), row(ln_params["norm1"][1]),
        w2d(ff_params[0]), row(ff_params[1]).astype(dt),
        w2d(ff_params[2]), row(ff_params[3]).astype(dt),
        row(ln_params["norm2"][0]), row(ln_params["norm2"][1]),
    ]
    xspec = pl.BlockSpec((bb, T, D), lambda i: (i, 0, 0))

    def wspec(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)

    kernel = functools.partial(
        _encoder_layer_kernel, num_heads=num_heads, causal=causal,
        softmax_f32=softmax_f32,
    )
    flops = 2 * B * T * D * (4 * D + 2 * F) + 4 * B * T * T * D
    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[xspec] + [wspec(a) for a in inputs[1:]],
        out_specs=xspec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), dt),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * T * D * x.dtype.itemsize,
            transcendentals=B * num_heads * T * T + B * T * F,
        ),
    )(*inputs)
