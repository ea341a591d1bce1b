"""GloVe-fallback seam hardening (round-4 verdict #7): the hashed stand-in
must be loud (warning + flag) and impossible to hit silently on
published-numbers paths (strict mode raises; eval_humanml turns strict on
for non-debug modes unless REGENNET_ALLOW_HASHED_GLOVE=1).

reference: data_loaders/humanml/utils/word_vectorizer.py (always real
GloVe there — the fallback is this framework's zero-egress affordance).
"""

import os

import numpy as np
import pytest

from regennet_tpu.data.humanml.word_vectorizer import WordVectorizer


def test_fallback_warns_and_flags(tmp_path):
    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        wv = WordVectorizer(str(tmp_path / "no_glove"))
    assert wv.using_fallback
    assert any("NOT comparable" in str(w.message) for w in caught)
    vec, pos = wv["walk/VERB"]
    assert vec.shape == (300,) and pos.shape == (15,)


def test_strict_raises_without_glove(tmp_path):
    with pytest.raises(FileNotFoundError, match="strict GloVe"):
        WordVectorizer(str(tmp_path / "no_glove"), strict=True)


def test_strict_accepts_real_archive(tmp_path):
    import pickle

    root = tmp_path / "glove"
    root.mkdir()
    words = ["walk", "unk"]
    vectors = np.random.default_rng(0).normal(size=(2, 300)).astype(
        np.float32
    )
    np.save(root / "our_vab_data.npy", vectors)
    with open(root / "our_vab_words.pkl", "wb") as f:
        pickle.dump(words, f)
    with open(root / "our_vab_idx.pkl", "wb") as f:
        pickle.dump({w: i for i, w in enumerate(words)}, f)
    wv = WordVectorizer(str(root), strict=True)
    assert not wv.using_fallback
    vec, _ = wv["walk/VERB"]
    np.testing.assert_allclose(vec, vectors[0])


def test_eval_humanml_full_mode_refuses_fallback(tmp_path, monkeypatch):
    """A published-numbers eval mode without GloVe must fail fast (before
    any sampling), unless explicitly opted out."""
    from argparse import Namespace

    from regennet_tpu.data.humanml.dataset import write_synthetic_humanml
    from regennet_tpu.eval import eval_humanml

    root = str(tmp_path / "hml")
    write_synthetic_humanml(root, num_clips=4)
    monkeypatch.chdir(tmp_path)  # ./glove does not exist here
    monkeypatch.delenv("REGENNET_ALLOW_HASHED_GLOVE", raising=False)
    args = Namespace(
        seed=0, batch_size=4, eval_mode="wo_mm", dataset="humanml",
        data_path=root, model_path="random", rec_model_path="",
        guidance_param=1.0,
    )
    with pytest.raises(FileNotFoundError, match="strict GloVe"):
        eval_humanml.main(args)
    # the explicit opt-out reaches past the dataset build (and then fails
    # later only if at all — we only need to see the seam open, so patch
    # the dataset to raise a sentinel right after construction)
    monkeypatch.setenv("REGENNET_ALLOW_HASHED_GLOVE", "1")

    class _Sentinel(Exception):
        pass

    from regennet_tpu.data.humanml import dataset as ds_mod

    made = {}
    real_init = ds_mod.Text2MotionDataset.__init__

    def spy_init(self, *a, **kw):
        real_init(self, *a, **kw)
        made["fallback"] = self.w_vectorizer.using_fallback
        raise _Sentinel

    monkeypatch.setattr(ds_mod.Text2MotionDataset, "__init__", spy_init)
    with pytest.raises(_Sentinel):
        eval_humanml.main(args)
    assert made["fallback"] is True
