"""Host-side CLIP text encoding for the text-conditioned mode.

The reference embeds a frozen CLIP ViT-B/32 tower inside the model
(reference: model/cmdm.py:94-99,116-127,153-166). Here text encoding runs
host-side through HuggingFace transformers and the embeddings enter the
model as cond['text_emb'] — the tower is frozen/inference-only either way,
and keeping it out of the jitted denoiser avoids recompiling the sampler for
the text path.

Weights must be available locally (REGENNET_CLIP_PATH or the default HF
cache); this environment has no network egress, so a clear error is raised
when absent.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

_ENCODER = None


class ClipTextEncoder:
    def __init__(self, model_path: Optional[str] = None, max_text_len: Optional[int] = 20):
        path = model_path or os.environ.get(
            "REGENNET_CLIP_PATH", "openai/clip-vit-base-patch32"
        )
        try:
            from transformers import CLIPTextModel, CLIPTokenizer

            # local_files_only: this environment has no egress — resolve from
            # the HF cache / a local path without network retries
            self.tokenizer = CLIPTokenizer.from_pretrained(
                path, local_files_only=True
            )
            self.model = CLIPTextModel.from_pretrained(
                path, local_files_only=True
            )
            self.model.eval()
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                "CLIP text weights are not available locally "
                f"(tried {path!r}). Set REGENNET_CLIP_PATH to a local "
                "checkout of openai/clip-vit-base-patch32, or use "
                "action/no_cond conditioning (all ReGenNet paper results "
                "use those)."
            ) from e
        self.max_text_len = max_text_len

    def __call__(self, texts: List[str]) -> np.ndarray:
        import torch

        kwargs = dict(padding="max_length", truncation=True, return_tensors="pt")
        if self.max_text_len is not None:
            kwargs["max_length"] = self.max_text_len + 2
        tokens = self.tokenizer(texts, **kwargs)
        with torch.no_grad():
            out = self.model(**tokens)
        return out.pooler_output.float().numpy()


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
