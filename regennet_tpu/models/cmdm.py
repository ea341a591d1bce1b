"""CMDM — the conditional motion diffusion denoiser, as a Flax module.

Capability parity with the reference network (reference: model/cmdm.py:12-366)
in a TPU-first shape discipline: tensors are batch-first [B, T, D] internally
(the reference is seq-first), the API boundary keeps the reference layout
[B, njoints, nfeats, T], and classifier-free-guidance condition masking takes
an explicit per-example `uncond` array so guided sampling can fold the
cond/uncond pair into ONE 2B-batched forward pass (see `make_cfg_model_fn`)
instead of the reference wrapper's two sequential calls
(reference: model/cfg_sampler.py:24-31).

Trunk architectures, as in the reference:
  * 'online' / 'trans_dec': causal transformer decoder; timestep(+action)
    embedding enters via cross-attention memory.
  * 'offline' / 'trans_enc': transformer encoder with the embedding
    prepended as a token.
  * 'gru': GRU over the fused sequence (time-recurrent — the intended
    semantics; the reference declares batch_first=True but feeds seq-major
    data, so ITS recurrence runs across the batch axis, a defect we do not
    reproduce; reference: model/cmdm.py:84,247-251).
  * 'mlp': DiffMLP — residual blocks mixing over time (conv1x1 on the frame
    axis) and channels, embedding injected per block.

Text conditioning consumes precomputed embeddings (cond['text_emb']); CLIP
text encoding runs host-side (see models/clip_text.py) as the reference's
frozen-CLIP tower is inference-only anyway.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from regennet_tpu.models import transformer as tfm

ARCHS = ("online", "offline", "trans_enc", "trans_dec", "gru", "mlp")


def _seq_pad_amount(n_tokens: int, dtype) -> int:
    """Sublane-tile padding for the trunk sequence axis (0 = disabled/aligned).

    TPU vector tiles are (sublanes, 128 lanes) with 16 sublanes for bf16 and
    8 for f32; the trunk runs [B, T, D] with T on the sublane axis, so every
    matmul/elementwise op at T=60 pays for 64 rows of tile while only 60
    count as useful work (docs/cfg60_profile_r4.json: ~7 of config 2's 10.3
    MFU-gap points, and the T=64 program is 6% FASTER in absolute ms while
    doing 6.8% more work). Padding the trunk sequence to the tile and
    slicing the output is EXACT for the real positions: the only
    cross-position op in the transformer trunks is self-attention, where a
    causal mask already hides the tail keys and the non-causal encoder gets
    an explicit kv_valid key mask (models/transformer.MultiHeadAttention).
    The reference protocol fixes T (e.g. NTU T=60; reference:
    model/cmdm.py:168-227) but nothing fixes the COMPUTE shape.

    Policy: pad SHORT sequences only (n_tokens <= REGENNET_PAD_T_MAX,
    default 128). Measured same-era on the r5 bench sweep: padding T=60->64
    is +6.9% end-to-end sampling (config 2, BENCH_CONFIGS.json) — the
    short-T shapes are where XLA's sublane handling loses the most — while
    T=150->160 read ~-7% (the 6.7% extra rows cost more than the alignment
    buys at larger T, where more tiles amortise the ragged edge).
    Set REGENNET_PAD_T=0 to disable entirely."""
    import os

    if os.environ.get("REGENNET_PAD_T", "1") == "0":
        return 0
    if n_tokens > int(os.environ.get("REGENNET_PAD_T_MAX", "128")):
        return 0
    tile = 16 if dtype == jnp.bfloat16 else 8
    return (-n_tokens) % tile


class TimestepEmbedder(nn.Module):
    """Sinusoidal PE row -> 2-layer SiLU MLP (reference: model/cmdm.py:284-298)."""

    latent_dim: int
    max_len: int = 5000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, timesteps):
        table = tfm.sinusoidal_table(self.max_len, self.latent_dim)
        h = table[timesteps].astype(self.dtype)
        h = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc1")(h)
        h = nn.silu(h)
        return nn.Dense(self.latent_dim, dtype=self.dtype, name="fc2")(h)


class MLPBlock(nn.Module):
    """DiffMLP residual block: time-mix (dense over frames) + channel-mix."""

    latent_dim: int
    seq_len: int
    first: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, embed):
        # x: [B, T, D], embed: [B, D]
        if self.first:
            x = nn.Dense(self.latent_dim, dtype=self.dtype, name="concat_proj")(x)
        x = x + nn.Dense(self.latent_dim, dtype=self.dtype, name="emb_fc")(
            nn.silu(embed)
        )[:, None, :]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm0")(x)
        # conv1d(seq, seq, 1) == dense over the time axis
        h = jnp.swapaxes(
            nn.Dense(self.seq_len, dtype=self.dtype, name="time_mix")(
                jnp.swapaxes(h, 1, 2)
            ),
            1,
            2,
        )
        x = x + nn.silu(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc1")(h)
        return x + nn.silu(h)


class CMDM(nn.Module):
    """Conditional (actor -> reactor) motion denoiser.

    __call__(x [B, J, F, T], t [B], cond dict) -> x0_hat [B, J, F, T]
    cond keys: 'cmotion' [B, J, F, T] (required), 'action' [B, 1] int,
    'text_emb' [B, clip_dim], 'uncond' scalar/[B] bool, 'mask' (unused by the
    net itself, kept for API parity).
    """

    njoints: int
    nfeats: int
    num_actions: int
    num_frames: int = 60
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    arch: str = "online"
    cm_mode: str = "add"
    cond_mode: str = "action"
    cond_mask_prob: float = 0.0
    clip_dim: int = 512
    wo_pos_emb: bool = False
    emb_trans_dec: bool = False
    data_rep: str = "rot6d"
    dtype: Any = jnp.float32

    @property
    def input_feats(self):
        return self.njoints * self.nfeats

    def _mask_cond(self, cond_emb, uncond, train):
        """Zero the condition embedding for unconditioned examples.

        `uncond` (bool scalar or [B]) forces masking (CFG sampling); during
        training, each example is additionally dropped with prob
        cond_mask_prob (reference: model/cmdm.py:129-137).
        """
        B = cond_emb.shape[0]
        keep = jnp.ones((B,), dtype=cond_emb.dtype)
        if train and self.cond_mask_prob > 0.0:
            rng = self.make_rng("cond_mask")
            drop = jax.random.bernoulli(rng, self.cond_mask_prob, (B,))
            keep = keep * (1.0 - drop.astype(cond_emb.dtype))
        if uncond is not None:
            uncond = jnp.asarray(uncond)
            forced = jnp.broadcast_to(uncond, (B,)).astype(cond_emb.dtype)
            keep = keep * (1.0 - forced)
        return cond_emb * keep[:, None]

    def prepare_cond(self, cond: Dict) -> Dict:
        """Precompute the loop-invariant actor-conditioning embedding.

        During diffusion sampling `cmotion` is constant across every
        timestep, yet its embedding (cmo_process Dense, and for
        cm_mode='concat' the cmotion half of the fuse matmul) re-runs per
        step — XLA hoists the transpose out of the sampling while-loop but
        not the matmuls (verified in the compiled HLO). Samplers call this
        once per loop via ModelFn.prepare (see make_model_fn); __call__
        consumes cond['cond_emb_seq'] when present. Supported for the
        transformer trunks; gru/mlp return cond unchanged.
        """
        if self.arch not in ("online", "trans_dec", "offline", "trans_enc"):
            return cond
        if self.cm_mode not in ("add", "concat"):
            return cond
        if cond is None or "cmotion" not in cond or "cond_emb_seq" in cond:
            return cond
        p = self.variables["params"]
        cm = cond["cmotion"]
        B, J, F, T = cm.shape
        feats = jnp.transpose(cm, (0, 3, 1, 2)).reshape(B, T, J * F).astype(
            self.dtype
        )
        ck = p["cmo_process"]["kernel"].astype(self.dtype)
        cb = p["cmo_process"]["bias"].astype(self.dtype)
        cmx = (feats @ ck + cb)
        new_cond = dict(cond)
        if self.cm_mode == "add":
            emb = cmx
        else:  # concat: the bottom half of the fuse kernel + its bias,
            # kept f32 so the split-K sum matches the single concat matmul
            D = self.latent_dim
            fk = p["fuse_process"]["kernel"].astype(self.dtype)
            fb = p["fuse_process"]["bias"]
            emb = jax.lax.dot_general(
                cmx, fk[D:], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jnp.asarray(fb, jnp.float32)
            # fold input_process into the fuse top half: per sampling step
            #   (x @ W_in + b_in) @ F_top == x @ (W_in F_top) + b_in F_top
            # so one [J*F, D] matmul replaces the [J*F,D] + [D,D] pair
            # (~10 GFLOP/step at the flagship shape). The bias term is
            # constant across steps and joins cond_emb_seq here.
            ik = p["input_process"]["kernel"].astype(self.dtype)
            ib = jnp.asarray(p["input_process"]["bias"], jnp.float32)
            new_cond["fold_in_kernel"] = jax.lax.dot_general(
                ik, fk[:D], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            emb = emb + (ib @ jnp.asarray(fk[:D], jnp.float32))
        new_cond["cond_emb_seq"] = emb
        return new_cond

    @nn.compact
    def __call__(self, x, timesteps, cond: Optional[Dict] = None, train: bool = False):
        cond = cond or {}
        B, J, F, T = x.shape
        # 'gelu' = tanh approximation (fast TPU default for natively
        # trained weights); 'gelu_exact' = torch-parity erf form, required
        # for converted reference checkpoints (utils/model_util
        # _pick_activation routes torch files here automatically)
        act = {
            "gelu": nn.gelu,
            "gelu_exact": tfm.gelu_exact,
            "relu": nn.relu,
        }[self.activation]
        deterministic = not train

        emb = TimestepEmbedder(self.latent_dim, dtype=self.dtype, name="embed_timestep")(
            timesteps
        )  # [B, D]

        uncond = cond.get("uncond", None)
        if "text" in self.cond_mode:
            text_emb = nn.Dense(self.latent_dim, dtype=self.dtype, name="embed_text")(
                cond["text_emb"].astype(self.dtype)
            )
            emb = emb + self._mask_cond(text_emb, uncond, train)
        if "action" in self.cond_mode:
            table = self.param(
                "action_embedding",
                nn.initializers.normal(1.0),
                (self.num_actions, self.latent_dim),
            )
            idx = cond["action"][:, 0].astype(jnp.int32)
            action_emb = jnp.asarray(table)[idx].astype(self.dtype)
            emb = emb + self._mask_cond(action_emb, uncond, train)

        # [B, J, F, T] -> [B, T, J*F]
        def to_seq(v):
            return jnp.transpose(v, (0, 3, 1, 2)).reshape(B, T, J * F)

        pre_emb = None
        if self.arch in ("online", "trans_dec", "offline", "trans_enc"):
            pre_emb = cond.get("cond_emb_seq")

        # sublane-tile padding of the trunk sequence (see _seq_pad_amount):
        # pad so the TOKEN count after any prepended embedding token lands
        # on the tile, run the whole trunk at the padded length, slice the
        # real frames back out after output_process. Exact for the real
        # positions (causal masking / kv_valid hide the tail keys); the
        # gru/mlp trunks mix across time with T-shaped params, so they stay
        # unpadded.
        tf_arch = self.arch in ("online", "trans_dec", "offline", "trans_enc")
        pad_t = 0
        if tf_arch:
            extra_tok = int(
                self.arch in ("offline", "trans_enc") or self.emb_trans_dec
            )
            pad_t = _seq_pad_amount(T + extra_tok, self.dtype)

        def pad_seq(v):
            return jnp.pad(v, ((0, 0), (0, pad_t), (0, 0))) if pad_t else v

        x_feats = pad_seq(to_seq(x).astype(self.dtype))
        if pre_emb is None:
            cmx_feats = pad_seq(to_seq(cond["cmotion"]).astype(self.dtype))
        else:
            pre_emb = pad_seq(pre_emb)
        if self.arch == "gru":
            # gru conditions by concatenating the embedding per frame before
            # the input projection (reference: model/cmdm.py:191-199)
            emb_rep = jnp.broadcast_to(emb[:, None, :], (B, T, self.latent_dim))
            x_feats = jnp.concatenate([x_feats, emb_rep], axis=-1)
            cmx_feats = jnp.concatenate([cmx_feats, emb_rep], axis=-1)
        fold_k = (
            cond.get("fold_in_kernel")
            if pre_emb is not None and self.cm_mode == "concat" else None
        )
        x_seq = (
            None if fold_k is not None
            else nn.Dense(self.latent_dim, dtype=self.dtype,
                          name="input_process")(x_feats)
        )
        cmx_seq = (
            None if pre_emb is not None
            else nn.Dense(self.latent_dim, dtype=self.dtype, name="cmo_process")(
                cmx_feats
            )
        )

        def fuse_streams(x_seq):
            # actor/reactor fusion (reference: model/cmdm.py:60-61,207-211),
            # with the cmotion half precomputed when cond_emb_seq is present
            if self.cm_mode == "add":
                return x_seq + (pre_emb.astype(x_seq.dtype)
                                if pre_emb is not None else cmx_seq)
            if self.cm_mode == "concat":
                if fold_k is not None:
                    # input_process folded into the fuse top half at
                    # prepare time (see prepare_cond)
                    top = jax.lax.dot_general(
                        x_feats, fold_k.astype(self.dtype),
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return (top + pre_emb).astype(self.dtype)
                if pre_emb is not None:
                    fk = self.variables["params"]["fuse_process"]["kernel"]
                    top = jax.lax.dot_general(
                        x_seq, fk[: self.latent_dim].astype(self.dtype),
                        (((2,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    return (top + pre_emb).astype(self.dtype)
                return nn.Dense(
                    self.latent_dim, dtype=self.dtype, name="fuse_process"
                )(jnp.concatenate([x_seq, cmx_seq], axis=-1))
            raise NotImplementedError(self.cm_mode)

        pos_table = tfm.sinusoidal_table(5000, self.latent_dim)

        def add_pos(v):
            out = v + pos_table[None, : v.shape[1]].astype(v.dtype)
            return nn.Dropout(self.dropout)(out, deterministic=deterministic)

        if self.arch in ("online", "trans_dec"):
            xseq = fuse_streams(x_seq)
            memory = emb[:, None, :]  # single conditioning token
            if self.emb_trans_dec:
                xseq = jnp.concatenate([memory, xseq], axis=1)
            if not self.wo_pos_emb:
                xseq = add_pos(xseq)
            out = tfm.Decoder(
                self.num_layers, self.num_heads, self.latent_dim, self.ff_size,
                self.dropout, act, self.dtype, name="decoder",
            )(xseq, memory, None, deterministic, causal=True)
            if self.emb_trans_dec:
                out = out[:, 1:]
        elif self.arch in ("offline", "trans_enc"):
            xseq = fuse_streams(x_seq)
            xseq = jnp.concatenate([emb[:, None, :], xseq], axis=1)
            xseq = add_pos(xseq)
            out = tfm.Encoder(
                self.num_layers, self.num_heads, self.latent_dim, self.ff_size,
                self.dropout, act, self.dtype, name="encoder",
            )(xseq, None, deterministic,
              # non-causal: tail-padded keys must be masked for exactness
              kv_valid=(T + 1) if pad_t else None)[:, 1:]
        elif self.arch == "gru":
            if self.cm_mode != "add":
                raise NotImplementedError(self.cm_mode)
            xseq = add_pos(x_seq + cmx_seq)
            out = xseq
            for i in range(self.num_layers):
                out = nn.RNN(
                    nn.GRUCell(features=self.latent_dim, dtype=self.dtype),
                    name=f"gru_{i}",
                )(out)
        elif self.arch == "mlp":
            xseq = jnp.concatenate([cmx_seq, x_seq], axis=-1)
            out = xseq
            for i in range(self.num_layers):
                out = MLPBlock(
                    self.latent_dim, T, first=(i == 0), dtype=self.dtype,
                    name=f"mlp_{i}",
                )(out, emb)
        else:
            raise ValueError(
                "Please choose correct architecture [trans_enc, trans_dec, gru, mlp, online, offline]"
            )

        out = nn.Dense(self.input_feats, dtype=self.dtype, name="output_process")(out)
        out = out.astype(jnp.float32)
        if pad_t:
            out = out[:, :T]  # drop the sublane-tile padding rows
        return jnp.transpose(out.reshape(B, T, J, F), (0, 2, 3, 1))


def _attach_prepare(model_fn, model: CMDM, params):
    """Expose the optional loop-invariant conditioning precompute on the
    ModelFn (the samplers call ModelFn.prepare(cond) once, outside their
    scan; see CMDM.prepare_cond)."""

    def prepare(cond):
        if not cond:
            return cond
        return model.apply(
            {"params": params}, cond, method=CMDM.prepare_cond
        )

    model_fn.prepare = prepare
    return model_fn


def make_model_fn(model: CMDM, params, train: bool = False):
    """Bind (model, params) into the diffusion ModelFn contract."""

    def model_fn(x, t, cond):
        return model.apply({"params": params}, x, t, cond, train=train)

    if not train:
        _attach_prepare(model_fn, model, params)
    return model_fn


def make_cfg_model_fn(model: CMDM, params, guidance_scale):
    """Classifier-free guidance as ONE folded 2B-batched forward pass.

    Returns uncond + s * (cond - uncond), numerically identical to the
    reference two-pass wrapper (model/cfg_sampler.py:24-31) since condition
    masking is exact zeroing of the condition embedding.

    Mirrors the reference assert (model/cfg_sampler.py:14): a model trained
    WITHOUT condition dropout (cond_mask_prob == 0) has never seen the
    unconditional branch, so guided sampling from it produces garbage. The
    parser forces guidance to 1 in that case (utils/parser_util.py:36-37);
    reaching here with cond_mask_prob == 0 is a caller bug.
    """
    if not model.cond_mask_prob > 0:
        raise ValueError(
            "Classifier-free guidance requires a model trained with "
            "condition dropout (cond_mask_prob > 0); this model has "
            f"cond_mask_prob={model.cond_mask_prob}. Use guidance_scale=1 "
            "with make_model_fn instead."
        )

    def model_fn(x, t, cond):
        B = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        cond2 = {}
        for k, v in cond.items():
            if k == "uncond":
                continue
            if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == B:
                cond2[k] = jnp.concatenate([v, v], axis=0)
            else:
                cond2[k] = v
        cond2["uncond"] = jnp.concatenate(
            [jnp.zeros((B,), bool), jnp.ones((B,), bool)]
        )
        out = model.apply({"params": params}, x2, t2, cond2, train=False)
        out_cond, out_uncond = out[:B], out[B:]
        scale = jnp.asarray(guidance_scale, dtype=out.dtype)
        scale = scale.reshape(-1, *([1] * (out_cond.ndim - 1)))
        return out_uncond + scale * (out_cond - out_uncond)

    _attach_prepare(model_fn, model, params)
    return model_fn
