"""T2M evaluator networks: torch numerical equivalence of the converter,
and the humanml evaluation harness end-to-end on synthetic data."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from regennet_tpu.convert.torch_ckpt import convert_t2m_evaluator  # noqa: E402
from regennet_tpu.models.t2m_eval import T2MEvaluatorWrapper  # noqa: E402


def _torch_t2m_networks(seed=0):
    """Reference-layout torch networks with random weights."""
    torch.manual_seed(seed)

    class MovementConvEncoder(torch.nn.Module):
        def __init__(self, input_size, hidden_size, output_size):
            super().__init__()
            self.main = torch.nn.Sequential(
                torch.nn.Conv1d(input_size, hidden_size, 4, 2, 1),
                torch.nn.Dropout(0.2, inplace=True),
                torch.nn.LeakyReLU(0.2, inplace=True),
                torch.nn.Conv1d(hidden_size, output_size, 4, 2, 1),
                torch.nn.Dropout(0.2, inplace=True),
                torch.nn.LeakyReLU(0.2, inplace=True),
            )
            self.out_net = torch.nn.Linear(output_size, output_size)

        def forward(self, inputs):
            outputs = self.main(inputs.permute(0, 2, 1)).permute(0, 2, 1)
            return self.out_net(outputs)

    class BiGRUCo(torch.nn.Module):
        def __init__(self, input_size, hidden_size, output_size):
            super().__init__()
            self.input_emb = torch.nn.Linear(input_size, hidden_size)
            self.gru = torch.nn.GRU(
                hidden_size, hidden_size, batch_first=True, bidirectional=True
            )
            self.output_net = torch.nn.Sequential(
                torch.nn.Linear(hidden_size * 2, hidden_size),
                torch.nn.LayerNorm(hidden_size),
                torch.nn.LeakyReLU(0.2, inplace=True),
                torch.nn.Linear(hidden_size, output_size),
            )
            self.hidden = torch.nn.Parameter(torch.randn(2, 1, hidden_size))
            self.hidden_size = hidden_size

        def forward(self, inputs, m_lens):
            num_samples = inputs.shape[0]
            input_embs = self.input_emb(inputs)
            hidden = self.hidden.repeat(1, num_samples, 1)
            emb = torch.nn.utils.rnn.pack_padded_sequence(
                input_embs, m_lens.tolist(), batch_first=True,
                enforce_sorted=False,
            )
            gru_seq, gru_last = self.gru(emb, hidden)
            gru_last = torch.cat([gru_last[0], gru_last[1]], dim=-1)
            return self.output_net(gru_last)

    class TextEncoder(torch.nn.Module):
        def __init__(self, word_size, pos_size, hidden_size, output_size):
            super().__init__()
            self.pos_emb = torch.nn.Linear(pos_size, word_size)
            self.trunk = BiGRUCo(word_size, hidden_size, output_size)

        def forward(self, word_embs, pos_onehot, cap_lens):
            return self.trunk(word_embs + self.pos_emb(pos_onehot), cap_lens)

    movement = MovementConvEncoder(263 - 4, 512, 512).eval()
    text = TextEncoder(300, 15, 512, 512).eval()
    motion = BiGRUCo(512, 1024, 512).eval()
    return movement, text, motion


def _state_dicts(movement, text, motion):
    def fix_text_keys(sd):
        out = {}
        for k, v in sd.items():
            k = k.replace("trunk.", "")
            out[k] = v
        return out

    return {
        "movement_encoder": movement.state_dict(),
        "text_encoder": fix_text_keys(text.state_dict()),
        "motion_encoder": motion.state_dict(),
    }


@pytest.fixture(scope="module")
def converted():
    movement, text, motion = _torch_t2m_networks()
    variables = convert_t2m_evaluator(_state_dicts(movement, text, motion))
    wrapper = T2MEvaluatorWrapper("humanml", variables=variables)
    return movement, text, motion, wrapper


def test_movement_encoder_matches_torch(converted):
    movement, _, _, wrapper = converted
    x = np.random.default_rng(0).normal(size=(2, 32, 259)).astype(np.float32)
    with torch.no_grad():
        ref = movement(torch.tensor(x)).numpy()
    ours = np.asarray(
        wrapper.movement_enc.apply(
            {"params": wrapper.variables["movement"]}, jnp.asarray(x)
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_motion_encoder_matches_torch(converted):
    _, _, motion, wrapper = converted
    x = np.random.default_rng(1).normal(size=(3, 16, 512)).astype(np.float32)
    lens = np.asarray([16, 9, 4])
    with torch.no_grad():
        ref = motion(torch.tensor(x), torch.tensor(lens)).numpy()
    ours = np.asarray(
        wrapper.motion_enc.apply(
            {"params": wrapper.variables["motion"]}, jnp.asarray(x),
            jnp.asarray(lens),
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_text_encoder_matches_torch(converted):
    _, text, _, wrapper = converted
    we = np.random.default_rng(2).normal(size=(3, 8, 300)).astype(np.float32)
    po = np.zeros((3, 8, 15), np.float32)
    po[..., 3] = 1.0
    lens = np.asarray([8, 6, 3])
    with torch.no_grad():
        ref = text(torch.tensor(we), torch.tensor(po), torch.tensor(lens)).numpy()
    ours = np.asarray(
        wrapper.text_enc.apply(
            {"params": wrapper.variables["text"]}, jnp.asarray(we),
            jnp.asarray(po), jnp.asarray(lens),
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_humanml_dataset_and_eval_harness(tmp_path):
    from regennet_tpu.data.humanml.dataset import (
        Text2MotionDataset,
        t2m_collate,
        write_synthetic_humanml,
    )
    from regennet_tpu.eval.eval_humanml import evaluation

    root = write_synthetic_humanml(str(tmp_path / "hml"), num_clips=10)
    ds = Text2MotionDataset(root, split="test", glove_root=str(tmp_path / "none"))
    assert len(ds) >= 4
    item = ds[0]
    word_embs, pos_ohot, caption, sent_len, motion, m_len, tokens = item
    assert word_embs.shape == (22, 300)
    assert pos_ohot.shape == (22, 15)
    assert motion.shape == (196, 263)
    motion_b, cond = t2m_collate([ds[i] for i in range(4)])
    assert motion_b.shape == (4, 263, 1, 196)
    assert len(cond["y"]["text"]) == 4

    wrapper = T2MEvaluatorWrapper("humanml")

    def gt_loader():
        return [tuple(np.stack(x) if isinstance(x[0], np.ndarray) else
                      (np.asarray(x) if isinstance(x[0], (int, np.integer))
                       else list(x))
                      for x in zip(*[ds[i] for i in range(4)]))]

    def gen_loader():
        batches = gt_loader()
        noisy = []
        for b in batches:
            b = list(b)
            b[4] = b[4] + np.random.default_rng(0).normal(
                scale=0.5, size=b[4].shape
            ).astype(np.float32)
            noisy.append(tuple(b))
        return noisy

    log = str(tmp_path / "eval.log")
    result = evaluation(
        wrapper, gt_loader, {"test_model": gen_loader}, log,
        replication_times=2, diversity_times=4,
    )
    assert "FID_test_model" in result
    assert "Matching Score_ground truth" in result
    assert np.isfinite(result["FID_test_model"])
    # noisy motions must score worse FID than GT against itself
    assert result["FID_test_model"] > result["FID_ground truth"] - 1e-6


class TestGRUClassifierConverter:
    """Torch-equivalence of convert_gru_classifier (reference:
    eval/a2m/action2motion/models.py MotionDiscriminator)."""

    def test_matches_torch(self):
        import jax
        import jax.numpy as jnp

        from regennet_tpu.convert.torch_ckpt import convert_gru_classifier
        from regennet_tpu.models.gru_classifier import MotionDiscriminator

        torch.manual_seed(0)

        class TorchDisc(torch.nn.Module):
            def __init__(self, input_size=72, hidden=128, layers=2, out=12):
                super().__init__()
                self.recurrent = torch.nn.GRU(input_size, hidden, layers)
                self.linear1 = torch.nn.Linear(hidden, 30)
                self.linear2 = torch.nn.Linear(30, out)

            def forward(self, motion):  # [T, B, JF], zero hidden
                gru_o, _ = self.recurrent(motion)
                lin1 = torch.tanh(self.linear1(gru_o[-1]))
                # reference FID features are lin1, not the hidden state
                # (eval/a2m/action2motion/models.py:44-61)
                return gru_o[-1], lin1, self.linear2(lin1)

        tmodel = TorchDisc().eval()
        B, J, F, T = 3, 24, 3, 9
        rng = np.random.default_rng(0)
        motion = rng.normal(size=(B, J, F, T)).astype(np.float32)
        seq = np.transpose(motion.reshape(B, J * F, T), (2, 0, 1))  # [T,B,JF]
        with torch.no_grad():
            hidden_t, feat_t, logit_t = tmodel(torch.from_numpy(seq))

        variables = convert_gru_classifier(
            {"model": {k: v.numpy() for k, v in tmodel.state_dict().items()}}
        )
        jmodel = MotionDiscriminator(input_size=72, output_size=12)
        out = jmodel.apply(variables, jnp.asarray(motion),
                           jnp.asarray([T] * B))
        np.testing.assert_allclose(
            np.asarray(out["features"]), feat_t.numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["hidden"]), hidden_t.numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(out["yhat"]), logit_t.numpy(), atol=2e-5
        )


def test_multimodality_eval_path(tmp_path):
    """mm loaders: per-prompt repeat stacks flow through evaluation()
    (reference: eval_humanml.py mm_short protocol + comp_v6 mm_motions)."""
    import jax

    from regennet_tpu.data.humanml.dataset import (
        Text2MotionDataset,
        write_synthetic_humanml,
    )
    from regennet_tpu.diffusion import DiffusionConfig, make_schedule
    from regennet_tpu.eval.eval_humanml import (
        evaluation,
        make_gen_loader_factory,
        make_gt_loader_factory,
    )
    from regennet_tpu.models.cmdm import CMDM

    root = write_synthetic_humanml(str(tmp_path / "hml"), num_clips=6)
    ds = Text2MotionDataset(root, split="test")
    model = CMDM(njoints=263, nfeats=1, num_actions=1, num_frames=196,
                 latent_dim=16, ff_size=32, num_layers=1, num_heads=2,
                 arch="online", cm_mode="concat", cond_mode="text",
                 cond_mask_prob=0.1, data_rep="hml_vec")
    x = jnp.zeros((1, 263, 1, 196))
    cond = {"cmotion": x, "text_emb": jnp.zeros((1, 512))}
    params = model.init(jax.random.PRNGKey(0), x,
                        jnp.zeros((1,), jnp.int32), cond)["params"]
    sched = make_schedule("cosine", 1000, timestep_respacing="2")
    cfg = DiffusionConfig(model_mean_type="start_x")

    factory = make_gen_loader_factory(
        ds, model, params, sched, cfg, batch_size=4, num_samples=4,
        mm_num_samples=2, mm_num_repeats=3,
    )
    batches, mm = factory()
    assert len(mm) == 2
    motions, m_lens = mm[0]
    assert motions.shape == (3, 196, 263) and len(m_lens) == 3

    wrapper = T2MEvaluatorWrapper("humanml")
    gt_factory = make_gt_loader_factory(ds, 4, 4)
    result = evaluation(
        wrapper, gt_factory, {"mdm": factory},
        str(tmp_path / "mm.log"), replication_times=1, diversity_times=4,
        mm_num_times=2, run_mm=True,
    )
    assert "MultiModality_mdm" in result
    assert np.isfinite(result["MultiModality_mdm"])
