"""CLIP text encoding for the text-conditioned mode.

The reference embeds a frozen CLIP ViT-B/32 tower inside the model and
conditions on `clip_model.encode_text(tokens)` — ln_final output at the
EOT position *through text_projection* (reference: model/cmdm.py:94-99,
116-127, 153-166). Text encoding here stays outside the jitted denoiser
(the tower is frozen/inference-only; keeping it out avoids recompiling
the sampler for the text path) and enters as cond['text_emb'].

Two weight routes, both offline-only (this environment has zero egress):

* an OpenAI checkpoint file (the `ViT-B-32.pt` that `clip.load` caches —
  what reference users already have on disk): converted once via
  `convert/torch_ckpt.convert_clip_text_checkpoint` and run through the
  jittable flax tower (`models/clip_text_flax.ClipTextTransformer`) on
  TPU/CPU, tokenized by the re-derived BPE tokenizer (`data/clip_bpe`,
  needs the public merge table via REGENNET_CLIP_BPE);
* an HF snapshot directory (`openai/clip-vit-base-patch32`): run through
  transformers' `CLIPTextModelWithProjection` host-side (`text_embeds`
  includes text_projection, matching the reference's encode_text — the
  bare CLIPTextModel pooler_output does NOT).

Set REGENNET_CLIP_PATH to either. When neither is present a clear error
is raised; pipelines fall back to hashed embeddings (see
encode_text_or_fallback).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

_ENCODER = None


class ClipTextEncoder:
    def __init__(self, model_path: Optional[str] = None,
                 max_text_len: Optional[int] = 20):
        path = model_path or os.environ.get(
            "REGENNET_CLIP_PATH", "openai/clip-vit-base-patch32"
        )
        self.max_text_len = max_text_len
        if os.path.isfile(path):
            self._init_flax(path)
        else:
            self._init_hf(path)

    # ---- OpenAI .pt -> jittable flax tower ------------------------------
    def _init_flax(self, path: str):
        import jax

        from regennet_tpu.convert.torch_ckpt import (
            convert_clip_text_checkpoint,
        )
        from regennet_tpu.data.clip_bpe import ClipTokenizer
        from regennet_tpu.models.clip_text_flax import ClipTextTransformer

        self.tokenizer = ClipTokenizer()  # raises clearly if no merge table
        state = convert_clip_text_checkpoint(path)
        p = state["params"]
        num_layers = len([k for k in p if k.startswith("block_")])
        dim = int(np.shape(p["token_embedding"])[1])
        self.model = ClipTextTransformer(
            vocab_size=int(np.shape(p["token_embedding"])[0]),
            context_length=int(np.shape(p["positional_embedding"])[0]),
            dim=dim,
            heads=max(1, dim // 64),  # CLIP convention: 64-dim heads
            num_layers=num_layers,
            proj_dim=int(np.shape(p["text_projection"])[1]),
        )
        self._params = state
        self._apply = jax.jit(self.model.apply)
        self._backend = "flax"

    # ---- HF snapshot dir -> transformers host pass ----------------------
    def _init_hf(self, path: str):
        try:
            from transformers import (
                CLIPTextModelWithProjection,
                CLIPTokenizer,
            )

            # local_files_only: no egress — resolve from the HF cache / a
            # local path without network retries
            self.tokenizer = CLIPTokenizer.from_pretrained(
                path, local_files_only=True
            )
            self.model = CLIPTextModelWithProjection.from_pretrained(
                path, local_files_only=True
            )
            self.model.eval()
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                "CLIP text weights are not available locally "
                f"(tried {path!r}). Set REGENNET_CLIP_PATH to the cached "
                "OpenAI ViT-B-32.pt (plus REGENNET_CLIP_BPE for the merge "
                "table) or to a local HF checkout of "
                "openai/clip-vit-base-patch32, or use action/no_cond "
                "conditioning (all ReGenNet paper results use those)."
            ) from e
        self._backend = "hf"

    def __call__(self, texts: List[str]) -> np.ndarray:
        if self._backend == "flax":
            # reference encode_text: context max_text_len + 2 with
            # truncation, zero-padded to the full 77 (model/cmdm.py:158-164)
            ctx = self.model.context_length
            short = (
                min(self.max_text_len + 2, ctx)
                if self.max_text_len is not None else ctx
            )
            tokens = self.tokenizer.tokenize(
                texts, context_length=short, truncate=True
            )
            if short < ctx:
                tokens = np.pad(tokens, ((0, 0), (0, ctx - short)))
            return np.asarray(
                self._apply(self._params, tokens), np.float32
            )

        import torch

        kwargs = dict(
            padding="max_length", truncation=True, return_tensors="pt"
        )
        if self.max_text_len is not None:
            kwargs["max_length"] = self.max_text_len + 2
        tokens = self.tokenizer(texts, **kwargs)
        with torch.no_grad():
            out = self.model(**tokens)
        return out.text_embeds.float().numpy()


def encode_text(texts: List[str]) -> np.ndarray:
    global _ENCODER
    if _ENCODER is None:
        _ENCODER = ClipTextEncoder()
    return _ENCODER(texts)


def hashed_text_embeddings(texts: List[str], dim: int = 512) -> np.ndarray:
    """Deterministic per-caption stand-in for CLIP embeddings (zero-egress
    environments); distinct texts map to distinct directions, so pipelines
    stay exercisable, but numbers are NOT comparable to published ones.
    Seeded from sha256 (not the per-process-salted builtin hash) so
    training and a later eval process see identical embeddings."""
    import hashlib

    out = np.zeros((len(texts), dim), dtype=np.float32)
    for i, t in enumerate(texts):
        seed = int.from_bytes(
            hashlib.sha256(t.encode("utf-8")).digest()[:4], "little"
        )
        rng = np.random.default_rng(seed)
        out[i] = rng.normal(scale=0.3, size=dim)
    return out


_FALLBACK = None  # None = untried, False = CLIP unavailable (cached)


def encode_text_or_fallback(texts: List[str]) -> np.ndarray:
    """CLIP embeddings when weights are locally available, else the hashed
    fallback. The failed CLIP probe is cached so the per-batch hot path
    doesn't rescan the HF cache."""
    global _FALLBACK
    if _FALLBACK is False:
        return hashed_text_embeddings(texts)
    try:
        return encode_text(texts)
    except RuntimeError:
        print(
            "clip_text: CLIP weights unavailable; using deterministic "
            "hashed text embeddings (NOT comparable to published "
            "numbers). Set REGENNET_CLIP_PATH for real CLIP.",
            flush=True,
        )
        _FALLBACK = False
        return hashed_text_embeddings(texts)
