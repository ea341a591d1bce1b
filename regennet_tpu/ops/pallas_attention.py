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
from jax.experimental.pallas import tpu as pltpu

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

    Numerics match the non-fused path exactly: the MXU runs in the input
    dtype (bf16 inputs -> bf16 matmul with f32 accumulation — casting to
    f32 first would quarter MXU throughput on v5e), the softmax is f32, and
    the attention weights drop back to the input dtype for the AV matmul
    (the XLA path also casts weights to q.dtype before the second einsum).
    """
    Tp = q_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    valid = col < seq_len
    if causal:
        valid = valid & (col <= row)

    # phase 1: scores for the whole group as one batched matmul (MXU)
    s = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [group, Tp, Tp] f32
    s = jnp.where(valid[None], s, _NEG_INF)

    # phase 2: f32 softmax (VPU)
    m = jnp.max(s, axis=2, keepdims=True)
    p = jnp.exp(s - m)
    weights = (p / jnp.sum(p, axis=2, keepdims=True)).astype(v_ref.dtype)

    # phase 3: AV as one batched matmul (MXU)
    out = jax.lax.dot_general(
        weights, v_ref[:], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.astype(o_ref.dtype)


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
    flops_per_prog = 4 * group * Tp * Tp * hp  # QK^T + AV
    out = pl.pallas_call(
        kernel,
        grid=(BH // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((BH, Tp, hp), q.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # grid iterations touch disjoint blocks -> free to pipeline
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_prog * (BH // group),
            bytes_accessed=4 * BH * Tp * hp * qp.dtype.itemsize,
            transcendentals=BH * Tp * Tp,
        ),
    )(qp, kp, vp)
    return out[:, :T, :hd].reshape(B, H, T, hd)


def attention_btd_chunks(q, k, v, *, num_heads: int, scale: float,
                         causal: bool, softmax_f32: bool, head_chunk: int,
                         emit, kv_len=None):
    """Phase-structured multi-head attention on in-VMEM [bb, T, D] values.

    Shared core of the attention and whole-layer kernels. Heads are column
    slices of D, processed in chunks of `head_chunk`: all score matmuls of
    the chunk run back-to-back on the MXU, then ONE stacked softmax on the
    VPU, then all AV matmuls — keeping MXU work contiguous instead of
    alternating MXU/VPU per head (the measured win; docs/PERF.md).

    `softmax_f32` matches the non-fused path's switchable numerics: False
    keeps the softmax in the compute dtype (the validated
    REGENNET_BF16_SOFTMAX default), True upcasts to f32. Mosaic requires a
    32-bit matmul accumulator, so scores always accumulate f32 and are
    downcast for the bf16 softmax (same numerics as XLA's bf16 einsum).

    `emit(head_index, out_bb_T_hd)` receives each head's f32 output —
    callers write to an output ref slice or collect for concatenation.
    """
    hd = q.shape[2] // num_heads
    for h0 in range(0, num_heads, head_chunk):
        heads = range(h0, min(h0 + head_chunk, num_heads))
        # phases 1+2: score matmuls (MXU) + one stacked softmax (VPU) —
        # the SAME _softmax_chunk the train kernels recompute from, so the
        # numerics-critical math lives exactly once in this module
        p = _softmax_chunk(q, k, heads, hd=hd, scale=scale, causal=causal,
                           softmax_f32=softmax_f32, kv_len=kv_len)
        w = p.astype(v.dtype)
        # phase 3: all AV matmuls of the chunk (MXU)
        for i, h in enumerate(heads):
            sl = slice(h * hd, (h + 1) * hd)
            out = jax.lax.dot_general(
                w[:, i], v[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            emit(h, out)


def _attn_btd_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int,
                     scale: float, causal: bool, softmax_f32: bool,
                     head_chunk: int, kv_len=None):
    """Attention on [bb, T, H*hd] blocks — heads are column slices.

    Taking the raw Dense-output layout means NO transpose / pad / reshape
    materialisation around the kernel: the diagnostic sweep showed those
    XLA-side layout copies (not kernel compute) were the bottleneck of the
    [B,H,T,hd] variant — each one is a full HBM round-trip of q/k/v.
    """
    hd = q_ref.shape[2] // num_heads

    def emit(h, out):
        o_ref[:, :, h * hd:(h + 1) * hd] = out.astype(o_ref.dtype)

    attention_btd_chunks(
        q_ref[:], k_ref[:], v_ref[:], num_heads=num_heads, scale=scale,
        causal=causal, softmax_f32=softmax_f32, head_chunk=head_chunk,
        emit=emit, kv_len=kv_len,
    )


def _check_block_batch(B: int, block_batch: int) -> int:
    """Validate a user-supplied block_batch (REGENNET_PALLAS_ATTN_BB / the
    block_batch kwarg). The grid is (B // bb,): a non-divisor would silently
    leave the batch tail unwritten — garbage outputs, and in the train
    kernel silently wrong gradients. Falls back to the auto divisor (0)
    with a loud warning instead of computing wrong numbers."""
    if block_batch and B % block_batch:
        import warnings

        warnings.warn(
            f"block_batch={block_batch} does not divide batch {B}; the "
            "override is ignored and the auto divisor is used instead "
            "(a non-divisor grid would leave the batch tail unwritten).",
            stacklevel=3,
        )
        return 0
    return block_batch


def _pick_block_batch(B: int, T: int, D: int, itemsize: int,
                      num_heads: int, head_chunk: int,
                      score_itemsize: int) -> int:
    """Largest divisor of B whose q/k/v/o blocks + live chunk scores fit a
    VMEM budget (half of ~16 MB, leaving room for double buffering)."""
    budget = 8 * 1024 * 1024
    hc = min(head_chunk, num_heads)
    bb = min(B, 8)
    while bb > 1:
        if B % bb == 0:
            # q/k/v/o blocks + two live [bb, hc, T, T] score tensors (s, p)
            need = (4 * bb * T * D * itemsize
                    + 2 * bb * hc * T * T * score_itemsize)
            if need <= budget:
                return bb
        bb -= 1
    return 1


@functools.partial(jax.jit, static_argnames=(
    "num_heads", "causal", "interpret", "softmax_f32", "head_chunk",
    "block_batch", "kv_len"))
def fused_attention_btd(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int,
    causal: bool = True, interpret: bool = False, softmax_f32: bool = False,
    head_chunk: int = 0, block_batch: int = 0, kv_len: int | None = None,
) -> jnp.ndarray:
    """Multi-head attention on [B, T, D] inputs (D = heads * head_dim),
    returning [B, T, D] — the layout produced/consumed by the q/kv and
    output projections, so no layout ops materialise around the kernel.
    head_chunk/block_batch override the tuning knobs (0 = auto).
    kv_len (static) masks key columns >= kv_len — the sublane-padded
    sequence path's in-kernel key mask (only needed when causal=False)."""
    B, T, D = q.shape
    hd = D // num_heads
    scale = 1.0 / (hd ** 0.5)
    # hc=2 measured best end-to-end at the flagship shape (24.97 vs 24.86
    # at hc=4 and 24.83 at hc=1/bb=8 seqs/s; docs/PERF.md sweep)
    hc = head_chunk or min(2, num_heads)
    score_itemsize = 4 if softmax_f32 else q.dtype.itemsize
    bb = _check_block_batch(B, block_batch) or _pick_block_batch(
        B, T, D, q.dtype.itemsize, num_heads, hc, score_itemsize
    )
    kernel = functools.partial(
        _attn_btd_kernel, num_heads=num_heads, scale=scale, causal=causal,
        softmax_f32=softmax_f32, head_chunk=hc, kv_len=kv_len,
    )
    spec = pl.BlockSpec((bb, T, D), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, T, D), q.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T * T * D,
            bytes_accessed=4 * B * T * D * q.dtype.itemsize,
            transcendentals=B * num_heads * T * T,
        ),
    )(q, k, v)


# ---------------------------------------------------------------------------
# Training-path fused attention: forward with in-kernel attention-weight
# dropout + a recompute (flash-style) backward, as one custom_vjp.
#
# The XLA training path materialises per layer in HBM: the [B,H,T,T]
# scores, the softmax weights, the dropout mask, and their backward
# counterparts. Here the forward draws the dropout mask from the TPU
# per-core PRNG inside the kernel and the backward re-derives scores,
# softmax, and the SAME mask from (q, k, v, seed) — nothing [T, T]-sized
# ever touches HBM in either direction.
#
# reference: the torch trunk's nn.MultiheadAttention applies dropout on
# the attention weights (model/cmdm.py:63-89 via nn.TransformerDecoder);
# semantics here are identical (Bernoulli(1-p) keep, 1/(1-p) scaling)
# with a different (in-kernel) bit stream, which is as interchangeable as
# any other dropout RNG.
# ---------------------------------------------------------------------------

from typing import NamedTuple


class _TrainAttnConfig(NamedTuple):
    """Hashable static config for the custom_vjp pair."""

    num_heads: int
    rate: float
    causal: bool
    softmax_f32: bool
    head_chunk: int
    block_batch: int
    interpret: bool
    kv_len: int | None = None


def _dropout_threshold(rate: float) -> int:
    # drop iff bits < rate * 2^32 (uint32 compare)
    return min(int(rate * 2**32), 2**32 - 1)


def _seed_prng(seed_ref, block_batch: int):
    """Per-program PRNG seed. Two seed layouts:

    * [B, 2] per-row seeds (the model path): the program seeds from its
      block's FIRST row — rows are globally distinct, so under data-parallel
      GSPMD partitioning every shard's programs draw from different streams
      (a replicated scalar seed + the LOCAL program_id would give all data
      shards identical dropout masks).
    * [2] replicated seed (legacy/micro-bench path): the grid program_id is
      mixed into the first word (golden-ratio odd constant; int32
      wrap-around is fine for stream separation).
    """
    pid = pl.program_id(0)
    if seed_ref.shape == (2,):
        pltpu.prng_seed(
            seed_ref[0] + pid * jnp.int32(-1640531527), seed_ref[1]
        )
    else:
        row0 = pid * block_batch
        pltpu.prng_seed(seed_ref[row0, 0], seed_ref[row0, 1])


def _chunk_bits_tpu(bb, hc, T):
    bits = pltpu.prng_random_bits((bb, hc, T, T))
    return pltpu.bitcast(bits, jnp.uint32)


def _apply_dropout(w, bits, rate: float):
    """Mask softmax weights with uint32 bits; keep-scale by 1/(1-rate)."""
    keep = bits >= jnp.uint32(_dropout_threshold(rate))
    scale = jnp.asarray(1.0 / (1.0 - rate), w.dtype)
    return jnp.where(keep, w * scale, jnp.zeros_like(w))


def _softmax_chunk(q, k, heads_sl, *, hd, scale, causal, softmax_f32,
                   kv_len=None):
    """Recomputable score+softmax for one head chunk: returns p
    ([bb, hc, T, T] in score dtype) with causal masking applied — the ONE
    copy of the numerics-critical math, shared bit-for-bit by the
    inference kernel (via attention_btd_chunks) and the train
    forward/backward kernels.

    kv_len (static int or None) masks key columns >= kv_len to -inf: the
    sublane-padded sequence path (models/cmdm pads T to the 16-row bf16
    tile) needs it only for NON-causal attention — under a causal mask
    every real query row already excludes the tail-padded keys."""
    score_dtype = jnp.float32 if softmax_f32 else q.dtype
    T = q.shape[1]
    qs = q * jnp.asarray(scale, q.dtype)
    s = jnp.stack(
        [
            jax.lax.dot_general(
                qs[:, :, h * hd:(h + 1) * hd],
                k[:, :, h * hd:(h + 1) * hd],
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(score_dtype)
            for h in heads_sl
        ],
        axis=1,
    )  # [bb, hc, T, T]
    valid = None
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        valid = col <= row
    if kv_len is not None and kv_len < T:
        col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        kmask = col < kv_len
        valid = kmask if valid is None else valid & kmask
    if valid is not None:
        s = jnp.where(valid[None, None], s, jnp.asarray(_NEG_INF, score_dtype))
    m = jnp.max(s, axis=3, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=3, keepdims=True)


def _train_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, cfg,
                      bits_ref=None):
    """Forward with attention-weight dropout. bits_ref supplies the mask
    bits in interpret mode (no TPU PRNG on CPU); on TPU they are drawn
    in-kernel from (seed, program_id) in chunk order."""
    H, hd = cfg.num_heads, q_ref.shape[2] // cfg.num_heads
    bb, T = q_ref.shape[0], q_ref.shape[1]
    hc = cfg.head_chunk
    if cfg.rate > 0.0 and bits_ref is None:
        _seed_prng(seed_ref, cfg.block_batch)
    for h0 in range(0, H, hc):
        heads = range(h0, min(h0 + hc, H))
        p = _softmax_chunk(
            q_ref[:], k_ref[:], heads, hd=hd, scale=1.0 / (hd ** 0.5),
            causal=cfg.causal, softmax_f32=cfg.softmax_f32, kv_len=cfg.kv_len,
        )
        w = p.astype(v_ref.dtype)
        if cfg.rate > 0.0:
            bits = (
                bits_ref[:, h0:h0 + len(heads)]
                if bits_ref is not None
                else _chunk_bits_tpu(bb, len(heads), T)
            )
            w = _apply_dropout(w, bits, cfg.rate)
        for i, h in enumerate(heads):
            sl = slice(h * hd, (h + 1) * hd)
            out = jax.lax.dot_general(
                w[:, i], v_ref[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            o_ref[:, :, sl] = out.astype(o_ref.dtype)


def _train_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *, cfg, bits_ref=None):
    """Recompute backward: re-derives scores, softmax, and the dropout
    mask (same PRNG seed and draw order as the forward), then

        dV = (P.M)^T dO          dP = (dO V^T).M
        dS = P.(dP - rowsum(dP.P))
        dQ = scale dS K          dK = scale dS^T Q

    with . the keep-scaled dropout mask application."""
    H, hd = cfg.num_heads, q_ref.shape[2] // cfg.num_heads
    bb, T = q_ref.shape[0], q_ref.shape[1]
    hc = cfg.head_chunk
    scale = 1.0 / (hd ** 0.5)
    if cfg.rate > 0.0 and bits_ref is None:
        _seed_prng(seed_ref, cfg.block_batch)
    for h0 in range(0, H, hc):
        heads = range(h0, min(h0 + hc, H))
        p = _softmax_chunk(
            q_ref[:], k_ref[:], heads, hd=hd, scale=scale,
            causal=cfg.causal, softmax_f32=cfg.softmax_f32, kv_len=cfg.kv_len,
        )
        w = p.astype(v_ref.dtype)
        if cfg.rate > 0.0:
            bits = (
                bits_ref[:, h0:h0 + len(heads)]
                if bits_ref is not None
                else _chunk_bits_tpu(bb, len(heads), T)
            )
            wd = _apply_dropout(w, bits, cfg.rate)
        else:
            bits = None
            wd = w
        for i, h in enumerate(heads):
            sl = slice(h * hd, (h + 1) * hd)
            do_h = do_ref[:, :, sl]
            # dV = Pd^T dO : contract over T_q
            dv = jax.lax.dot_general(
                wd[:, i], do_h, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)
            # dPd = dO V^T : [bb, Tq, Tk]
            dpd = jax.lax.dot_general(
                do_h, v_ref[:, :, sl], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if cfg.rate > 0.0:
                dp = _apply_dropout(dpd, bits[:, i], cfg.rate)
            else:
                dp = dpd
            # softmax vjp in f32
            pf = p[:, i].astype(jnp.float32)
            dpf = dp.astype(jnp.float32)
            ds = pf * (dpf - jnp.sum(dpf * pf, axis=2, keepdims=True))
            ds = ds.astype(q_ref.dtype)
            # dQ = scale * dS K ; dK = scale * dS^T Q
            dq = jax.lax.dot_general(
                ds, k_ref[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
            dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
            dk = jax.lax.dot_general(
                ds, q_ref[:, :, sl], (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * scale
            dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)


def _train_block_batch(B, T, D, itemsize, hc, score_itemsize,
                       n_btd: int) -> int:
    """Largest divisor of B fitting n_btd [bb,T,D] tensors + four live
    [bb,hc,T,T] chunk tensors in half of VMEM."""
    budget = 8 * 1024 * 1024
    bb = min(B, 8)
    while bb > 1:
        if B % bb == 0:
            need = (n_btd * bb * T * D * itemsize
                    + 4 * bb * hc * T * T * score_itemsize)
            if need <= budget:
                return bb
        bb -= 1
    return 1


def _interpret_bits(seed, B, H, T):
    """Interpret-mode stand-in for the in-kernel PRNG: threefry bits from
    the same seed (different stream than TPU — dropout only needs a
    reproducible Bernoulli source, not a particular one). Handles both
    seed layouts: [2] replicated and [B, 2] per-row."""

    def row_key(s):
        key = jax.random.fold_in(jax.random.PRNGKey(0), s[0])
        return jax.random.fold_in(key, s[1])

    if seed.shape == (2,):
        return jax.random.bits(row_key(seed), (B, H, T, T), jnp.uint32)
    return jax.vmap(
        lambda s: jax.random.bits(row_key(s), (H, T, T), jnp.uint32)
    )(seed)


def _train_call(cfg: _TrainAttnConfig, q, k, v, seed, *, backward, do=None):
    B, T, D = q.shape
    hc = cfg.head_chunk
    # cfg.block_batch is always concrete here (resolved once in
    # fused_attention_btd_train with the BACKWARD's VMEM budget): the
    # dropout mask is regenerated per program from (seed, program_id), so
    # forward and backward MUST run the same grid — independently resolved
    # block batches would give the backward a different program_id per
    # batch row and hence a different mask than the forward applied.
    bb = cfg.block_batch
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    spec = pl.BlockSpec((bb, T, D), lambda i: (i, 0, 0))
    kernel_fn = _train_bwd_kernel if backward else _train_fwd_kernel
    kernel = functools.partial(kernel_fn, cfg=cfg)
    in_specs = [smem_spec, spec, spec, spec]
    inputs = [seed, q, k, v]
    if backward:
        in_specs.append(spec)
        inputs.append(do)
    if cfg.interpret and cfg.rate > 0.0:
        # no TPU PRNG on CPU: supply the bits as a tensor input
        bits = _interpret_bits(seed, B, cfg.num_heads, T)
        bits_spec = pl.BlockSpec(
            (bb, cfg.num_heads, T, T), lambda i: (i, 0, 0, 0)
        )

        n_in = len(inputs)  # refs order: inputs..., bits, outputs...

        def kernel(*refs):  # noqa: F811 — bits-fed variant
            kernel_fn(
                *refs[:n_in], *refs[n_in + 1:], cfg=cfg,
                bits_ref=refs[n_in],
            )

        in_specs.append(bits_spec)
        inputs.append(bits)
    if backward:
        out_specs = [spec, spec, spec]
        out_shape = [jax.ShapeDtypeStruct((B, T, D), q.dtype)] * 3
    else:
        out_specs = spec
        out_shape = jax.ShapeDtypeStruct((B, T, D), q.dtype)
    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=cfg.interpret,
        compiler_params=None if cfg.interpret else pltpu.CompilerParams(
            # blocks are disjoint and each program re-seeds the PRNG from
            # its own program_id, so grid reordering is safe
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(10 if backward else 4) * B * T * T * D,
            bytes_accessed=(8 if backward else 4) * B * T * D
            * q.dtype.itemsize,
            transcendentals=B * cfg.num_heads * T * T,
        ),
    )(*inputs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _attn_train(cfg: _TrainAttnConfig, q, k, v, seed):
    return _train_call(cfg, q, k, v, seed, backward=False)


def _attn_train_fwd(cfg, q, k, v, seed):
    return _train_call(cfg, q, k, v, seed, backward=False), (q, k, v, seed)


def _attn_train_bwd(cfg, res, do):
    q, k, v, seed = res
    dq, dk, dv = _train_call(
        cfg, q, k, v, seed, backward=True, do=do.astype(q.dtype)
    )
    import numpy as np

    # integer primal -> float0 cotangent (custom_vjp contract)
    dseed = np.zeros(seed.shape, jax.dtypes.float0)
    return dq, dk, dv, dseed


_attn_train.defvjp(_attn_train_fwd, _attn_train_bwd)


def fused_attention_btd_train(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int,
    dropout_rate: float, seed: jnp.ndarray, causal: bool = True,
    interpret: bool = False, softmax_f32: bool = False,
    head_chunk: int = 0, block_batch: int = 0, kv_len: int | None = None,
) -> jnp.ndarray:
    """Differentiable fused multi-head attention on [B, T, D] inputs with
    in-kernel attention-weight dropout.

    seed: int32 [B, 2] (per-row seeds, derived from the layer's flax
    dropout key — keeps dropout streams distinct across data-parallel
    shards, which see only their local program_ids) or [2] (one replicated
    seed, program_id-mixed; fine single-shard). The backward regenerates
    the identical mask from the same seed. The gradient (custom_vjp)
    recomputes scores and softmax from q/k in VMEM instead of saving
    [B, H, T, T] tensors to HBM.
    """
    hc = head_chunk or min(2, num_heads)
    # resolve the block batch ONCE, with the backward's (larger, n_btd=7)
    # VMEM footprint, so forward and backward share one grid: the in-kernel
    # dropout mask depends on program_id, and a backward gridded differently
    # from its forward would regenerate a different mask (wrong gradients)
    B, T, D = q.shape
    score_itemsize = 4 if softmax_f32 else q.dtype.itemsize
    bb = _check_block_batch(B, block_batch) or _train_block_batch(
        B, T, D, q.dtype.itemsize, hc, score_itemsize, 7
    )
    cfg = _TrainAttnConfig(
        num_heads=num_heads, rate=float(dropout_rate), causal=causal,
        softmax_f32=softmax_f32, head_chunk=hc,
        block_batch=bb, interpret=interpret, kv_len=kv_len,
    )
    return _attn_train(cfg, q, k, v, seed)


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
