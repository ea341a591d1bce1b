"""Regression tests for the first-contact asset runbook
(scripts/first_contact.py): fabricate one asset of each kind the script
recognises, run the real `main()`, and assert every row PASSes — including
the executing-reference CMDM forward agreement.

reference assets covered: model######.pt + args.json (model/cmdm.py),
ST-GCN evaluator .pth.tar (eval/a2m/recognition/models/stgcn.py),
gmm_08.pkl (visualize/joints2smpl prior), GloVe table dir
(data_loaders/humanml/utils/word_vectorizer.py).
"""

from __future__ import annotations

import json
import os
import pickle

import numpy as np
import pytest

from tests.reference_harness import reference_available

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def asset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("first_contact_assets")
    rng = np.random.default_rng(0)

    # gmm_08.pkl (dict layout of the released file)
    M, D = 4, 69
    covs = np.stack([np.eye(D) * (0.5 + 0.1 * i) for i in range(M)])
    with open(root / "gmm_08.pkl", "wb") as f:
        pickle.dump(
            {"means": rng.normal(size=(M, D)), "covars": covs,
             "weights": np.full(M, 1 / M)}, f)

    # GloVe directory
    glove = root / "glove"
    glove.mkdir()
    words = ["unk", "person", "wave"]
    np.save(glove / "our_vab_data.npy",
            rng.normal(size=(3, 300)).astype(np.float32))
    with open(glove / "our_vab_words.pkl", "wb") as f:
        pickle.dump(words, f)
    with open(glove / "our_vab_idx.pkl", "wb") as f:
        pickle.dump({w: i for i, w in enumerate(words)}, f)

    # released-style CMDM checkpoint + args.json beside it
    from tests.reference_harness import import_reference_cmdm

    ref_cmdm = import_reference_cmdm()
    torch.manual_seed(0)
    model = ref_cmdm.CMDM(
        modeltype="", njoints=14, nfeats=6, num_actions=8, translation=True,
        pose_rep="rot6d", glob=True, glob_rot=True, latent_dim=64,
        ff_size=128, num_layers=2, num_heads=4, dropout=0.1, num_frames=12,
        arch="online", cm_mode="concat", body_model="smpl",
        cond_mode="action", cond_mask_prob=0.1, dataset="ntu",
    )
    run_dir = root / "cmdm_run"
    run_dir.mkdir()
    # real released checkpoints carry rot2xyz.smpl_model.* buffers (only
    # clip_model.* is stripped at save time — reference
    # train/training_loop.py:326-328); the runbook must tolerate them
    sd_with_buffers = dict(model.state_dict())
    sd_with_buffers["rot2xyz.smpl_model.v_template"] = torch.zeros(6890, 3)
    torch.save(sd_with_buffers, run_dir / "model000001000.pt")
    with open(run_dir / "args.json", "w") as f:
        json.dump({"arch": "online", "cm_mode": "concat", "layers": 2,
                   "latent_dim": 64, "cond_mask_prob": 0.1,
                   "num_frames": 12, "pose_rep": "rot6d",
                   "body_model": "smpl", "dataset": "ntu",
                   "num_person": 2}, f)

    # text-mode CMDM checkpoint (embed_text instead of embed_action):
    # derived from the action-mode state dict so no CLIP weights are needed
    sd = {k: v.clone() for k, v in model.state_dict().items()
          if k != "embed_action.action_embedding"}
    torch.manual_seed(2)
    sd["embed_text.weight"] = torch.randn(64, 512) * 0.02
    sd["embed_text.bias"] = torch.zeros(64)
    text_dir = root / "cmdm_text_run"
    text_dir.mkdir()
    torch.save(sd, text_dir / "model000002000.pt")
    with open(text_dir / "args.json", "w") as f:
        json.dump({"arch": "online", "cm_mode": "concat", "layers": 2,
                   "latent_dim": 64, "cond_mask_prob": 0.1,
                   "num_frames": 12, "pose_rep": "rot6d",
                   "body_model": "smpl", "dataset": "humanml"}, f)

    # ST-GCN evaluator checkpoint (reference module needs kintree files)
    from tests.test_reference_golden import _write_fake_kintrees

    kt = tmp_path_factory.mktemp("first_contact_kintrees")
    _write_fake_kintrees(kt)
    cwd = os.getcwd()
    os.chdir(kt)
    try:
        from tests.reference_harness import load_reference

        ref = load_reference()
        torch.manual_seed(1)
        stgcn = ref.STGCN(
            in_channels=12, num_class=5, num_person=2,
            graph_args={"layout": "smplx", "strategy": "spatial"},
            edge_importance_weighting=True, device="cpu",
        )
    finally:
        os.chdir(cwd)
    torch.save(stgcn.state_dict(), root / "stgcn_ckpt.pth.tar")
    return root


def test_first_contact_all_assets_pass(asset_root, capsys):
    import scripts.first_contact as fc

    rc = fc.main([str(asset_root)])
    out = capsys.readouterr().out
    assert rc == 0, out
    # the reference CMDM prints init noise to stdout; keep only table rows
    lines = [ln for ln in out.splitlines()
             if " PASS " in ln or " FAIL " in ln or " SKIP " in ln]
    assert len(lines) == 5, out
    assert all(" PASS " in ln for ln in lines), out
    # the headline asset must have real parity evidence, not just a smoke
    cmdm_row = next(ln for ln in lines if "model000001000.pt" in ln)
    assert "AGREES with executing reference" in cmdm_row, cmdm_row
    text_row = next(ln for ln in lines if "model000002000.pt" in ln)
    assert "forward finite" in text_row, text_row


def test_first_contact_flags_broken_checkpoint(asset_root, tmp_path, capsys):
    """A checkpoint with a mangled key must FAIL loudly (the coverage
    assert), not pass as 'converted'."""
    import scripts.first_contact as fc

    sd = torch.load(asset_root / "cmdm_run" / "model000001000.pt",
                    weights_only=False)
    sd["input_process.poseEmbedding.weigth"] = sd.pop(
        "input_process.poseEmbedding.weight")
    torch.save(sd, tmp_path / "model000000002.pt")
    rc = fc.main([str(tmp_path / "model000000002.pt")])
    out = capsys.readouterr().out
    assert rc == 1, out
    assert "FAIL" in out
