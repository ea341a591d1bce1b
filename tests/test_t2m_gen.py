"""comp_v6 text-to-motion generator (reference: humanml networks
CompTrainerV6 stack)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from regennet_tpu.models import t2m_gen


def _tiny_gen(dim_pose=12):
    return t2m_gen.CompV6Generator(
        dim_pose=dim_pose, dim_word=16, dim_pos_ohot=5, text_hidden=8,
        att_vec=8, dim_z=4, pri_hidden=16, dec_hidden=16, n_layers=2,
        mov_latent=6,
    )


def _inputs(B=3, L=7, mov_len=5, dim_pose=12):
    rng = np.random.default_rng(0)
    word = jnp.asarray(rng.normal(size=(B, L, 16)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(B, L, 5)).astype(np.float32))
    cap_lens = jnp.asarray([L, L - 2, L - 3])
    movements = jnp.asarray(
        rng.normal(size=(B, mov_len, 6)).astype(np.float32)
    )
    m_lens = jnp.asarray([mov_len * 4, mov_len * 4, (mov_len - 1) * 4])
    mov_in0 = jnp.zeros((B, 6))
    return word, pos, cap_lens, movements, m_lens, mov_in0


class TestModules:
    def test_training_forward_shapes(self):
        gen = _tiny_gen()
        word, pos, cap_lens, movements, m_lens, mov_in0 = _inputs()
        rng = jax.random.PRNGKey(0)
        variables = gen.init(rng, word, pos, cap_lens, movements, m_lens,
                             mov_in0, rng, jnp.ones(()))
        out = gen.apply(variables, word, pos, cap_lens, movements, m_lens,
                        mov_in0, rng, jnp.ones(()))
        B, M = movements.shape[:2]
        assert out["fake_movements"].shape == (B, M, 6)
        assert out["fake_motions"].shape == (B, M * 4, 12)
        assert out["mus_post"].shape == (B * M, 4)
        assert np.isfinite(np.asarray(out["fake_motions"])).all()

    def test_generate_uses_prior_only(self):
        gen = _tiny_gen()
        word, pos, cap_lens, movements, m_lens, mov_in0 = _inputs()
        rng = jax.random.PRNGKey(0)
        variables = gen.init(rng, word, pos, cap_lens, movements, m_lens,
                             mov_in0, rng, jnp.ones(()))
        out = gen.apply(variables, word, pos, cap_lens, m_lens, mov_in0,
                        jax.random.PRNGKey(1), 5, method=gen.generate)
        assert "mus_post" not in out
        assert out["fake_motions"].shape == (3, 20, 12)
        # different prior draws give different motions
        out2 = gen.apply(variables, word, pos, cap_lens, m_lens, mov_in0,
                         jax.random.PRNGKey(2), 5, method=gen.generate)
        assert np.abs(np.asarray(out["fake_motions"]
                                 - out2["fake_motions"])).max() > 1e-5

    def test_losses_golden(self):
        # SmoothL1(0, 2) = |2| - 0.5 = 1.5; KL of identical dists = 0
        np.testing.assert_allclose(
            float(t2m_gen.smooth_l1(jnp.zeros(4), jnp.full(4, 2.0))), 1.5
        )
        np.testing.assert_allclose(
            float(t2m_gen.smooth_l1(jnp.zeros(4), jnp.full(4, 0.5))),
            0.125, rtol=1e-6,
        )
        mu = jnp.asarray([[0.3, -0.2]])
        lv = jnp.asarray([[0.1, -0.4]])
        np.testing.assert_allclose(
            float(t2m_gen.kl_criterion(mu, lv, mu, lv)), 0.0, atol=1e-6
        )
        # KL vs N(0, I) reduces to the unit formula (trainers.py:270-274)
        got = float(t2m_gen.kl_criterion(
            mu, lv, jnp.zeros_like(mu), jnp.zeros_like(lv)
        ))
        want = float(np.sum(
            (np.exp(np.asarray(lv)) + np.asarray(mu) ** 2
             - np.asarray(lv) - 1) / 2
        ))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_teacher_forcing_switch(self):
        """tf=1 feeds GT snippets; tf=0 feeds predictions — outputs after
        the first snippet must differ between the two modes."""
        gen = _tiny_gen()
        word, pos, cap_lens, movements, m_lens, mov_in0 = _inputs()
        rng = jax.random.PRNGKey(0)
        variables = gen.init(rng, word, pos, cap_lens, movements, m_lens,
                             mov_in0, rng, jnp.ones(()))
        o_tf = gen.apply(variables, word, pos, cap_lens, movements, m_lens,
                         mov_in0, None, jnp.ones(()))
        o_ar = gen.apply(variables, word, pos, cap_lens, movements, m_lens,
                         mov_in0, None, jnp.zeros(()))
        first = np.asarray(o_tf["fake_movements"][:, 0])
        np.testing.assert_allclose(
            first, np.asarray(o_ar["fake_movements"][:, 0]), atol=1e-6
        )
        assert np.abs(np.asarray(o_tf["fake_movements"][:, 1:]
                                 - o_ar["fake_movements"][:, 1:])).max() > 1e-6


class TestTrainer:
    def test_end_to_end(self, tmp_path):
        from regennet_tpu.data.humanml.dataset import (
            Text2MotionDataset,
            write_synthetic_humanml,
        )
        from regennet_tpu.eval.eval_humanml import (
            make_comp_gen_loader_factory,
        )
        from regennet_tpu.models import t2m_eval
        from regennet_tpu.train import train_t2m_eval, train_t2m_gen

        root = write_synthetic_humanml(str(tmp_path / "hml"), num_clips=4,
                                       min_len=45, max_len=56)
        base = str(tmp_path / "t2m")
        dargs = train_t2m_eval.parse_args([
            "--data_path", root, "--save_dir", base,
            "--stage", "decomp", "--batch_size", "4", "--num_epochs", "1",
        ])
        train_t2m_eval.main(dargs)

        gargs = train_t2m_gen.parse_args([
            "--data_path", root, "--save_dir", os.path.join(base, "comp_v6"),
            "--batch_size", "4", "--num_epochs", "1",
            "--dim_z", "8", "--pri_hidden", "32", "--dec_hidden", "32",
            "--text_hidden", "16", "--att_vec", "16",
            "--max_motion_length", "64",
        ])
        gen, params = train_t2m_gen.main(gargs)
        assert os.path.isdir(os.path.join(base, "comp_v6", "model000000001"))

        # generated-motion loader feeds the evaluator 7-tuple protocol
        from regennet_tpu.train import checkpoint

        state = checkpoint.load_checkpoint(
            os.path.join(base, "comp_v6", "model000000001")
        )
        mov_enc = t2m_eval.MovementConvEncoder(
            t2m_eval.T2M_OPT["dim_movement_enc_hidden"],
            t2m_eval.T2M_OPT["dim_movement_latent"],
        )
        ds = Text2MotionDataset(root, split="test")
        factory = make_comp_gen_loader_factory(
            ds, gen, state["params"], mov_enc, state["movement_enc"],
            batch_size=4,
        )
        batches = factory()
        word, pos, cap, sl, motions, m_lens, toks = batches[0]
        assert motions.shape == (4, 196, 263)
        assert np.isfinite(motions).all()

        # the eval_humanml CLI autodetects the comp_v6 checkpoint and
        # routes it through the generated-motion loader (reference:
        # model_motion_loaders.get_motion_loader comp_v6 branch)
        from argparse import Namespace

        from regennet_tpu.eval import eval_humanml

        eval_args = Namespace(
            seed=0, batch_size=4, eval_mode="debug", dataset="humanml",
            data_path=root,
            model_path=os.path.join(base, "comp_v6", "model000000001"),
            rec_model_path="", guidance_param=1.0,
        )
        result = eval_humanml.main(eval_args)
        fid_keys = [k for k in result if k.startswith("FID_")]
        assert fid_keys and all(np.isfinite(result[k]) for k in fid_keys)


class TestTorchEquivalence:
    """convert_comp_v6: numerical equivalence against reference-layout torch
    modules (reference: networks/modules.py + trainers.py CompTrainerV6)."""

    @pytest.fixture(scope="class")
    def pair(self):
        torch = pytest.importorskip("torch")
        from regennet_tpu.convert.torch_ckpt import convert_comp_v6

        torch.manual_seed(0)
        D_WORD, D_POS, H_TEXT, D_ATT = 16, 5, 8, 8
        D_Z, H_PRI, H_DEC, D_MOV, D_POSE = 4, 16, 16, 6, 12
        TH2 = H_TEXT * 2

        class PositionalEncoding(torch.nn.Module):
            def __init__(self, d_model, max_len=300):
                super().__init__()
                import math

                pe = torch.zeros(max_len, d_model)
                pos = torch.arange(0, max_len, dtype=torch.float)[:, None]
                div = torch.exp(torch.arange(0, d_model, 2).float()
                                * (-math.log(10000.0) / d_model))
                pe[:, 0::2] = torch.sin(pos * div)
                pe[:, 1::2] = torch.cos(pos * div)
                self.register_buffer("pe", pe)

            def forward(self, p):
                return self.pe[p]

        class TextEncoderBiGRU(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.pos_emb = torch.nn.Linear(D_POS, D_WORD)
                self.input_emb = torch.nn.Linear(D_WORD, H_TEXT)
                self.gru = torch.nn.GRU(H_TEXT, H_TEXT, batch_first=True,
                                        bidirectional=True)
                self.hidden = torch.nn.Parameter(torch.randn(2, 1, H_TEXT))

            def forward(self, word_embs, pos_onehot, cap_lens):
                from torch.nn.utils.rnn import (
                    pack_padded_sequence,
                    pad_packed_sequence,
                )

                n = word_embs.shape[0]
                embs = self.input_emb(word_embs + self.pos_emb(pos_onehot))
                hidden = self.hidden.repeat(1, n, 1)
                lens = cap_lens.data.tolist()
                emb = pack_padded_sequence(embs, lens, batch_first=True)
                gru_seq, gru_last = self.gru(emb, hidden)
                gru_last = torch.cat([gru_last[0], gru_last[1]], dim=-1)
                gru_seq = pad_packed_sequence(gru_seq, batch_first=True,
                                              total_length=embs.shape[1])[0]
                fwd = gru_seq[..., :H_TEXT]
                bwd = gru_seq[..., H_TEXT:].clone()
                for i, ln in enumerate(lens):
                    bwd[i:i+1, :ln] = torch.flip(bwd[i:i+1, :ln].clone(),
                                                 dims=[1])
                return torch.cat([fwd, bwd], dim=-1), gru_last

        class AttLayer(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.W_q = torch.nn.Linear(TH2, D_ATT)
                self.W_k = torch.nn.Linear(TH2, D_ATT, bias=False)
                self.W_v = torch.nn.Linear(TH2, D_ATT)

            def forward(self, query, key_mat):
                q = self.W_q(query).unsqueeze(-1)
                v = self.W_v(key_mat)
                k = self.W_k(key_mat)
                w = torch.matmul(k, q) / np.sqrt(D_ATT)
                co = torch.softmax(w, dim=1)
                return (v * co).sum(dim=1)

        def seq_modules(input_size, vae=True, out_size=D_Z, n_layers=2,
                        hidden=H_PRI):
            class Cell(torch.nn.Module):
                def __init__(self):
                    super().__init__()
                    self.emb = torch.nn.Sequential(
                        torch.nn.Linear(input_size, hidden),
                        torch.nn.LayerNorm(hidden),
                        torch.nn.LeakyReLU(0.2, inplace=True))
                    self.z2init = torch.nn.Linear(TH2, hidden * n_layers)
                    self.gru = torch.nn.ModuleList(
                        [torch.nn.GRUCell(hidden, hidden)
                         for _ in range(n_layers)])
                    self.positional_encoder = PositionalEncoding(hidden)
                    if vae:
                        self.mu_net = torch.nn.Linear(hidden, out_size)
                        self.logvar_net = torch.nn.Linear(hidden, out_size)
                    else:
                        self.output = torch.nn.Sequential(
                            torch.nn.Linear(hidden, hidden),
                            torch.nn.LayerNorm(hidden),
                            torch.nn.LeakyReLU(0.2, inplace=True),
                            torch.nn.Linear(hidden, out_size))

                def get_init_hidden(self, latent):
                    return list(torch.split(self.z2init(latent), hidden,
                                            dim=-1))

                def forward(self, inputs, hid, p):
                    x_in = self.emb(inputs) + self.positional_encoder(p).detach()
                    if vae:
                        # reference TextDecoder quirk: every layer gets x_in
                        for i in range(n_layers):
                            hid[i] = self.gru[i](x_in, hid[i])
                            h_in = hid[i]
                        return (self.mu_net(h_in), self.logvar_net(h_in),
                                hid)
                    h_in = x_in
                    for i in range(n_layers):
                        hid[i] = self.gru[i](h_in, hid[i])
                        h_in = hid[i]
                    return self.output(h_in), hid

            return Cell()

        class MovementConvDecoder(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.main = torch.nn.Sequential(
                    torch.nn.ConvTranspose1d(D_MOV, D_MOV, 4, 2, 1),
                    torch.nn.LeakyReLU(0.2, inplace=True),
                    torch.nn.ConvTranspose1d(D_MOV, D_POSE, 4, 2, 1),
                    torch.nn.LeakyReLU(0.2, inplace=True))
                self.out_net = torch.nn.Linear(D_POSE, D_POSE)

            def forward(self, inputs):
                out = self.main(inputs.permute(0, 2, 1)).permute(0, 2, 1)
                return self.out_net(out)

        class MovementConvEncoder(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.main = torch.nn.Sequential(
                    torch.nn.Conv1d(D_POSE - 4, D_MOV, 4, 2, 1),
                    torch.nn.Dropout(0.2, inplace=True),
                    torch.nn.LeakyReLU(0.2, inplace=True),
                    torch.nn.Conv1d(D_MOV, D_MOV, 4, 2, 1),
                    torch.nn.Dropout(0.2, inplace=True),
                    torch.nn.LeakyReLU(0.2, inplace=True))
                self.out_net = torch.nn.Linear(D_MOV, D_MOV)

            def forward(self, inputs):
                out = self.main(inputs.permute(0, 2, 1)).permute(0, 2, 1)
                return self.out_net(out)

        mods = dict(
            text_enc=TextEncoderBiGRU().eval(),
            att_layer=AttLayer().eval(),
            seq_pri=seq_modules(D_MOV + D_ATT).eval(),
            seq_post=seq_modules(D_MOV * 2 + D_ATT).eval(),
            seq_dec=seq_modules(D_MOV + D_ATT + D_Z, vae=False,
                                out_size=D_MOV, hidden=H_DEC).eval(),
            mov_dec=MovementConvDecoder().eval(),
            mov_enc=MovementConvEncoder().eval(),
        )
        ckpt = {k: m.state_dict() for k, m in mods.items()}
        from regennet_tpu.convert.torch_ckpt import convert_comp_v6

        converted = convert_comp_v6(ckpt)
        gen = t2m_gen.CompV6Generator(
            dim_pose=D_POSE, dim_word=D_WORD, dim_pos_ohot=D_POS,
            text_hidden=H_TEXT, att_vec=D_ATT, dim_z=D_Z, pri_hidden=H_PRI,
            dec_hidden=H_DEC, n_layers=2, mov_latent=D_MOV,
        )
        return mods, converted, gen

    def test_text_encoder(self, pair):
        torch = pytest.importorskip("torch")
        mods, converted, gen = pair
        rng = np.random.default_rng(0)
        B, L = 3, 7
        word = rng.normal(size=(B, L, 16)).astype(np.float32)
        pos = rng.normal(size=(B, L, 5)).astype(np.float32)
        lens = np.asarray([7, 5, 3])
        with torch.no_grad():
            ref_hids, ref_last = mods["text_enc"](
                torch.tensor(word), torch.tensor(pos), torch.tensor(lens))
        enc = t2m_gen.TextEncoderBiGRU(16, 5, 8)
        hids, last = enc.apply(
            {"params": converted["params"]["text_enc"]},
            jnp.asarray(word), jnp.asarray(pos), jnp.asarray(lens))
        np.testing.assert_allclose(np.asarray(last), ref_last.numpy(),
                                   atol=2e-5)
        # compare valid positions only (padding content differs)
        for i, ln in enumerate(lens):
            np.testing.assert_allclose(
                np.asarray(hids)[i, :ln], ref_hids.numpy()[i, :ln],
                atol=2e-5)

    def test_full_generate_matches(self, pair):
        """Deterministic (z = mu) snippet loop: torch reference loop vs our
        generate with rng=None."""
        torch = pytest.importorskip("torch")
        mods, converted, gen = pair
        rng = np.random.default_rng(1)
        B, L, M = 3, 7, 4
        word = rng.normal(size=(B, L, 16)).astype(np.float32)
        pos = rng.normal(size=(B, L, 5)).astype(np.float32)
        lens = np.asarray([7, 5, 3])
        m_lens = np.asarray([16, 16, 12])
        mov_in0 = rng.normal(size=(B, 6)).astype(np.float32)

        with torch.no_grad():
            hids, hidden = mods["text_enc"](
                torch.tensor(word), torch.tensor(pos), torch.tensor(lens))
            h_pri = mods["seq_pri"].get_init_hidden(hidden)
            h_dec = mods["seq_dec"].get_init_hidden(hidden)
            mov_in = torch.tensor(mov_in0)
            fakes = []
            for i in range(M):
                att = mods["att_layer"](h_dec[-1], hids)
                tta = torch.tensor(m_lens) // 4 - i
                mu, _, h_pri = mods["seq_pri"](
                    torch.cat([mov_in, att], dim=-1), h_pri, tta)
                dec_in = torch.cat([mov_in, att, mu], dim=-1)
                fake, h_dec = mods["seq_dec"](dec_in, h_dec, tta)
                fakes.append(fake)
                mov_in = fake.detach()
            ref_movs = torch.stack(fakes, dim=1)
            ref_motions = mods["mov_dec"](ref_movs)

        out = gen.apply(
            {"params": converted["params"]}, jnp.asarray(word),
            jnp.asarray(pos), jnp.asarray(lens), jnp.asarray(m_lens),
            jnp.asarray(mov_in0), None, M, method=gen.generate)
        # 5e-4: f32 accumulation over the AR loop; layout errors show as
        # O(1e-2)+ (seen during development)
        np.testing.assert_allclose(
            np.asarray(out["fake_movements"]), ref_movs.numpy(), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(out["fake_motions"]), ref_motions.numpy(), atol=5e-4)

    def test_movement_encoder_roundtrip(self, pair):
        torch = pytest.importorskip("torch")
        from regennet_tpu.models import t2m_eval

        mods, converted, gen = pair
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 8, 8)).astype(np.float32)  # D_POSE-4 = 8
        with torch.no_grad():
            ref = mods["mov_enc"](torch.tensor(x)).numpy()
        enc = t2m_eval.MovementConvEncoder(6, 6)
        got = np.asarray(enc.apply(
            {"params": converted["movement_enc"]}, jnp.asarray(x)))
        np.testing.assert_allclose(got, ref, atol=2e-5)


def test_convert_comp_v6_tar_published_dims(tmp_path):
    """A published-dims CompTrainerV6 .tar (fabricated state dict) converts
    and drives a prior generate at the real network sizes (the
    eval_humanml --model_path latest.tar route)."""
    torch = pytest.importorskip("torch")
    from regennet_tpu.convert.torch_ckpt import convert_comp_v6_checkpoint
    from regennet_tpu.models import t2m_eval

    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    H, TH2, Z, HP, HD, DM, DP = 512, 1024, 128, 1024, 1024, 512, 263

    def gru_cell(insz, h):
        return {"weight_ih": t(3 * h, insz), "weight_hh": t(3 * h, h),
                "bias_ih": t(3 * h), "bias_hh": t(3 * h)}

    def linear(i, o, bias=True):
        d = {"weight": t(o, i)}
        if bias:
            d["bias"] = t(o)
        return d

    def seq_cell(insz, out, h, vae):
        sd = {}
        for k, v in linear(insz, h).items():
            sd[f"emb.0.{k}"] = v
        sd["emb.1.weight"] = t(h); sd["emb.1.bias"] = t(h)
        for k, v in linear(TH2, h).items():
            sd[f"z2init.{k}"] = v
        for k, v in gru_cell(h, h).items():
            sd[f"gru.0.{k}"] = v
        if vae:
            for name in ("mu_net", "logvar_net"):
                for k, v in linear(h, out).items():
                    sd[f"{name}.{k}"] = v
        else:
            for k, v in linear(h, h).items():
                sd[f"output.0.{k}"] = v
            sd["output.1.weight"] = t(h); sd["output.1.bias"] = t(h)
            for k, v in linear(h, out).items():
                sd[f"output.3.{k}"] = v
        return sd

    text_enc = {"hidden": t(2, 1, H)}
    for k, v in linear(15, 300).items():
        text_enc[f"pos_emb.{k}"] = v
    for k, v in linear(300, H).items():
        text_enc[f"input_emb.{k}"] = v
    for suf in ("", "_reverse"):
        text_enc[f"gru.weight_ih_l0{suf}"] = t(3 * H, H)
        text_enc[f"gru.weight_hh_l0{suf}"] = t(3 * H, H)
        text_enc[f"gru.bias_ih_l0{suf}"] = t(3 * H)
        text_enc[f"gru.bias_hh_l0{suf}"] = t(3 * H)
    att = {}
    for k, v in linear(TH2, 512).items():
        att[f"W_q.{k}"] = v
    att["W_k.weight"] = t(512, TH2)
    for k, v in linear(TH2, 512).items():
        att[f"W_v.{k}"] = v
    mov_dec = {"main.0.weight": t(DM, DM, 4), "main.0.bias": t(DM),
               "main.2.weight": t(DM, DP, 4), "main.2.bias": t(DP)}
    for k, v in linear(DP, DP).items():
        mov_dec[f"out_net.{k}"] = v
    mov_enc = {"main.0.weight": t(DM, DP - 4, 4), "main.0.bias": t(DM),
               "main.3.weight": t(DM, DM, 4), "main.3.bias": t(DM)}
    for k, v in linear(DM, DM).items():
        mov_enc[f"out_net.{k}"] = v

    ckpt = {
        "text_enc": text_enc, "att_layer": att,
        "seq_pri": seq_cell(DM + 512, Z, HP, True),
        "seq_post": seq_cell(DM * 2 + 512, Z, HP, True),
        "seq_dec": seq_cell(DM + 512 + Z, DM, HD, False),
        "mov_enc": mov_enc, "mov_dec": mov_dec,
        "ep": 0, "total_it": 0,
    }
    tar = tmp_path / "latest.tar"
    torch.save(ckpt, str(tar))
    state = convert_comp_v6_checkpoint(str(tar))
    assert "movement_enc" in state

    gen = t2m_gen.CompV6Generator(dim_pose=DP)
    mov_enc_mod = t2m_eval.MovementConvEncoder(
        t2m_eval.T2M_OPT["dim_movement_enc_hidden"],
        t2m_eval.T2M_OPT["dim_movement_latent"],
    )
    rng = np.random.default_rng(0)
    B, L = 2, 6
    word = jnp.asarray(rng.normal(size=(B, L, 300)).astype(np.float32))
    pos = jnp.asarray(rng.normal(size=(B, L, 15)).astype(np.float32))
    mov_in0 = mov_enc_mod.apply(
        {"params": state["movement_enc"]}, jnp.zeros((B, 4, DP - 4))
    )[:, 0]
    out = gen.apply(
        {"params": state["params"]}, word, pos, jnp.asarray([6, 4]),
        jnp.asarray([8, 8]), mov_in0, jax.random.PRNGKey(0), 2,
        method=gen.generate,
    )
    assert out["fake_motions"].shape == (B, 8, DP)
    assert np.isfinite(np.asarray(out["fake_motions"])).all()


class TestGenerateCLI:
    """sample.generate: free-text t2m generation for both checkpoint
    kinds."""

    def test_comp_v6_route(self, tmp_path):
        from regennet_tpu.data.humanml.dataset import write_synthetic_humanml
        from regennet_tpu.models import t2m_eval
        from regennet_tpu.sample import generate
        from regennet_tpu.train import checkpoint

        root = write_synthetic_humanml(str(tmp_path / "hml"), num_clips=4)
        # fabricate a tiny comp_v6 checkpoint dir (random init) + args.json;
        # word-input dims are the real 300/15 (the vectorizer's output)
        gen = t2m_gen.CompV6Generator(
            dim_pose=263, dim_word=300, dim_pos_ohot=15, text_hidden=8,
            att_vec=8, dim_z=4, pri_hidden=16, dec_hidden=16, n_layers=2,
            mov_latent=6,
        )
        rng = jax.random.PRNGKey(0)
        B0, L0, M0 = 1, 4, 2
        params = gen.init(
            rng, jnp.zeros((B0, L0, 300)), jnp.zeros((B0, L0, 15)),
            jnp.asarray([L0]), jnp.zeros((B0, M0, 6)), jnp.asarray([8]),
            jnp.zeros((B0, 6)), rng, jnp.ones(()),
        )["params"]
        mov_enc = t2m_eval.MovementConvEncoder(6, 6)
        mov_enc_params = mov_enc.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 4, 259))
        )["params"]
        save_dir = str(tmp_path / "comp")
        os.makedirs(save_dir, exist_ok=True)
        checkpoint.save_checkpoint(
            save_dir, 1, {"params": params, "movement_enc": mov_enc_params}
        )
        import json

        with open(os.path.join(save_dir, "args.json"), "w") as f:
            json.dump({"dim_z": 4, "pri_hidden": 16, "dec_hidden": 16,
                       "text_hidden": 8, "att_vec": 8, "n_layers": 2,
                       "mov_latent": 6}, f)

        args = generate.parse_args([
            "--model_path", os.path.join(save_dir, "model000000001"),
            "--data_path", root, "--text_prompt", "a person walks forward",
            "--num_samples", "2", "--motion_length", "1.6",
            "--output_dir", str(tmp_path / "out"), "--no-render",
        ])
        # monkeypatch the movement encoder dims to the tiny fabrication
        orig = t2m_eval.T2M_OPT.copy()
        t2m_eval.T2M_OPT["dim_movement_enc_hidden"] = 6
        t2m_eval.T2M_OPT["dim_movement_latent"] = 6
        try:
            result = generate.main(args)
        finally:
            t2m_eval.T2M_OPT.update(orig)
        assert result["motion"].shape == (2, 32, 22, 3)
        assert np.isfinite(result["motion"]).all()
        assert os.path.exists(tmp_path / "out" / "results.npy")

    def test_diffusion_route_with_render(self, tmp_path):
        import json

        from regennet_tpu.data.humanml.dataset import write_synthetic_humanml
        from regennet_tpu.sample import generate
        from regennet_tpu.train import checkpoint
        from regennet_tpu.utils.model_util import create_model_and_diffusion
        from argparse import Namespace

        root = write_synthetic_humanml(str(tmp_path / "hml"), num_clips=4)
        margs = dict(
            dataset="humanml", setting="mdm", arch="online",
            emb_trans_dec=False, wo_pos_emb=False, cm_mode="concat",
            layers=1, latent_dim=16, cond_mask_prob=0.1, pose_rep="rot6d",
            body_model="smplx", sigma_small=True, noise_schedule="cosine",
            diffusion_steps=5, timestep_respacing="", lambda_rcxyz=0.0,
            lambda_vel=0.0, lambda_fc=0.0, lambda_orient=1.0,
            lambda_body=1.0, lambda_transl=1.0, unconstrained=False,
            num_person=1, vel_threshold=0.01, compute_dtype="float32",
        )

        class _D:
            num_actions = 1
            num_person = 1

        model, _, _ = create_model_and_diffusion(Namespace(**margs), _D())
        x = jnp.zeros((1, 263, 1, 196))
        cond = {"cmotion": x, "text_emb": jnp.zeros((1, 512))}
        params = model.init(jax.random.PRNGKey(0), x,
                            jnp.zeros((1,), jnp.int32), cond)["params"]
        save_dir = str(tmp_path / "mdm")
        os.makedirs(save_dir, exist_ok=True)
        checkpoint.save_checkpoint(save_dir, 1, {"params": params})
        with open(os.path.join(save_dir, "args.json"), "w") as f:
            json.dump(margs, f)

        # fabricate a length-estimator checkpoint (random init) to drive
        # per-prompt length sampling through the CLI
        from regennet_tpu.models.t2m_eval import MotionLenEstimatorBiGRU

        est = MotionLenEstimatorBiGRU(output_size=50)
        est_params = est.init(
            jax.random.PRNGKey(3), jnp.zeros((1, 4, 300)),
            jnp.zeros((1, 4, 15)), jnp.asarray([4]),
        )["params"]
        checkpoint.save_checkpoint(str(tmp_path / "len"), 1,
                                   {"params": est_params})

        prompts = tmp_path / "prompts.txt"
        prompts.write_text("a person waves\na person jumps high\n")
        args = generate.parse_args([
            "--model_path", os.path.join(save_dir, "model000000001"),
            "--data_path", root, "--input_text", str(prompts),
            "--motion_length", "2.0",
            "--length_estimator",
            str(tmp_path / "len" / "model000000001"),
            "--output_dir", str(tmp_path / "out2"),
        ])
        result = generate.main(args)
        assert result["motion"].shape[0] == 2
        assert np.isfinite(result["motion"]).all()
        assert (result["lengths"] >= 4).all()
        assert (result["lengths"] <= result["motion"].shape[1]).all()
        # write_video falls back to .gif when no mp4 encoder is present
        vids = sorted((tmp_path / "out2").glob("sample*.mp4")) or sorted(
            (tmp_path / "out2").glob("sample*.gif"))
        assert len(vids) == 2


def test_trainer_resume(tmp_path):
    """--resume restores params+optimizer from the latest checkpoint and
    continues at the next epoch (reference: CompTrainerV6 load/is_continue)."""
    from regennet_tpu.data.humanml.dataset import write_synthetic_humanml
    from regennet_tpu.models import t2m_eval
    from regennet_tpu.train import checkpoint, train_t2m_gen

    root = write_synthetic_humanml(str(tmp_path / "hml"), num_clips=4,
                                   min_len=45, max_len=56)
    # fabricate the decomp stage (movement encoder/decoder) at real dims
    enc = t2m_eval.MovementConvEncoder(
        t2m_eval.T2M_OPT["dim_movement_enc_hidden"],
        t2m_eval.T2M_OPT["dim_movement_latent"],
    )
    dec = t2m_eval.MovementConvDecoder(
        t2m_eval.T2M_OPT["dim_movement_enc_hidden"], 263
    )
    enc_p = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 259)))["params"]
    dec_p = dec.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 512)))["params"]
    checkpoint.save_checkpoint(
        str(tmp_path / "decomp"), 1,
        {"params": {"movement_enc": enc_p, "movement_dec": dec_p}},
    )

    common = [
        "--data_path", root, "--save_dir", str(tmp_path / "comp_v6"),
        "--decomp_checkpoint",
        str(tmp_path / "decomp" / "model000000001"),
        "--batch_size", "4", "--dim_z", "8", "--pri_hidden", "32",
        "--dec_hidden", "32", "--text_hidden", "16", "--att_vec", "16",
        "--max_motion_length", "64",
    ]
    train_t2m_gen.main(train_t2m_gen.parse_args(
        common + ["--num_epochs", "1"]))
    assert os.path.isdir(tmp_path / "comp_v6" / "model000000001")

    train_t2m_gen.main(train_t2m_gen.parse_args(
        common + ["--num_epochs", "2", "--resume"]))
    assert os.path.isdir(tmp_path / "comp_v6" / "model000000002")
    state = checkpoint.load_checkpoint(
        str(tmp_path / "comp_v6" / "model000000002")
    )
    assert "opt_state" in state and "movement_enc" in state


class TestLengthEstimatorConverter:
    """convert_length_estimator vs the EXECUTING reference module
    (data_loaders/humanml/networks/modules.py:389-437)."""

    def test_matches_executing_reference(self):
        torch = pytest.importorskip("torch")
        import sys

        from tests.reference_harness import (
            REFERENCE_ROOT,
            reference_available,
        )

        if not reference_available():
            pytest.skip("reference tree unavailable")
        if REFERENCE_ROOT not in sys.path:
            sys.path.append(REFERENCE_ROOT)
        from data_loaders.humanml.networks.modules import (
            MotionLenEstimatorBiGRU as RefEst,
        )

        from regennet_tpu.convert.torch_ckpt import convert_length_estimator
        from regennet_tpu.models.t2m_eval import MotionLenEstimatorBiGRU

        torch.manual_seed(0)
        W, P, H, C = 16, 5, 8, 8
        ref = RefEst(W, P, H, C).eval()

        B, L = 3, 7
        rng = np.random.default_rng(1)
        word = rng.normal(size=(B, L, W)).astype(np.float32)
        pos = rng.normal(size=(B, L, P)).astype(np.float32)
        cap_lens = np.asarray([7, 6, 5])  # pack_padded needs descending

        with torch.no_grad():
            want = ref(
                torch.from_numpy(word), torch.from_numpy(pos),
                torch.from_numpy(cap_lens),
            ).numpy()

        state = convert_length_estimator({"estimator": ref.state_dict()})
        ours = MotionLenEstimatorBiGRU(
            word_size=W, pos_size=P, hidden_size=H, output_size=C
        )
        got = np.asarray(ours.apply(
            {"params": state["params"]}, jnp.asarray(word),
            jnp.asarray(pos), jnp.asarray(cap_lens),
        ))
        np.testing.assert_allclose(got, want, atol=5e-5)

    def test_check_cli_detects_length_est(self, tmp_path):
        torch = pytest.importorskip("torch")
        import sys

        from tests.reference_harness import (
            REFERENCE_ROOT,
            reference_available,
        )

        if not reference_available():
            pytest.skip("reference tree unavailable")
        if REFERENCE_ROOT not in sys.path:
            sys.path.append(REFERENCE_ROOT)
        from data_loaders.humanml.networks.modules import (
            MotionLenEstimatorBiGRU as RefEst,
        )

        from regennet_tpu.convert.torch_ckpt import check_checkpoint

        ref = RefEst(16, 5, 8, 8)
        path = str(tmp_path / "latest.tar")
        torch.save({"estimator": ref.state_dict()}, path)
        summary = check_checkpoint(path)
        assert summary["kind"] == "length_est"


class TestLengthSampledEval:
    """comp_v6 eval loader with a trained length estimator: per-prompt
    lengths sampled from the estimator softmax with min-length retry
    (reference: comp_v6_model_dataset.py:80-96), zero-padded past the
    sampled length (:138-141)."""

    def _build(self, B=8, T=32, dim_pose=12, L=7):
        from regennet_tpu.models import t2m_eval

        rng_np = np.random.default_rng(0)
        ds = []
        for i in range(B):
            ds.append((
                rng_np.normal(size=(L, 16)).astype(np.float32),
                rng_np.normal(size=(L, 5)).astype(np.float32),
                f"caption {i}", 5,
                rng_np.normal(size=(T, dim_pose)).astype(np.float32),
                T, f"tok_{i}",
            ))

        gen = _tiny_gen(dim_pose=dim_pose)
        word, pos, cap_lens, movements, m_lens, mov_in0 = _inputs(
            dim_pose=dim_pose
        )
        rng = jax.random.PRNGKey(0)
        gen_params = gen.init(rng, word, pos, cap_lens, movements, m_lens,
                              mov_in0, rng, jnp.ones(()))["params"]
        mov_enc = t2m_eval.MovementConvEncoder(8, 6)
        mov_enc_params = mov_enc.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 4, dim_pose - 4))
        )["params"]
        est = t2m_eval.MotionLenEstimatorBiGRU(
            word_size=16, pos_size=5, hidden_size=8, output_size=8
        )
        est_params = est.init(
            jax.random.PRNGKey(2), jnp.zeros((1, L, 16)),
            jnp.zeros((1, L, 5)), jnp.asarray([L]),
        )["params"]
        return ds, gen, gen_params, mov_enc, mov_enc_params, est, est_params

    def test_sampled_lengths_and_zero_padding(self):
        from regennet_tpu.eval.eval_humanml import (
            make_comp_gen_loader_factory,
        )

        (ds, gen, gen_params, mov_enc, mov_enc_params, est,
         est_params) = self._build()
        T = ds[0][4].shape[0]
        factory = make_comp_gen_loader_factory(
            ds, gen, gen_params, mov_enc, mov_enc_params, batch_size=8,
            seed=0, unit_length=4, len_estimator=est,
            len_est_params=est_params, min_mov_length=2,
        )
        (_, _, _, _, motions, m_lens, _) = factory()[0]
        # lengths are sampled (8 estimator classes -> max 28 < T=32), in
        # whole snippets, within bounds
        assert (m_lens % 4 == 0).all()
        assert (m_lens >= 4).all() and (m_lens < T).all()
        # generated frames past each sampled length are zeroed
        for i, ml in enumerate(m_lens):
            assert np.all(motions[i, int(ml):] == 0.0)
            assert np.abs(motions[i, : int(ml)]).max() > 0

    def test_gt_lengths_without_estimator(self):
        from regennet_tpu.eval.eval_humanml import (
            make_comp_gen_loader_factory,
        )

        (ds, gen, gen_params, mov_enc, mov_enc_params, _,
         _) = self._build()
        T = ds[0][4].shape[0]
        factory = make_comp_gen_loader_factory(
            ds, gen, gen_params, mov_enc, mov_enc_params, batch_size=8,
            seed=0, unit_length=4,
        )
        (_, _, _, _, _, m_lens, _) = factory()[0]
        assert (m_lens == T).all()

    def test_mm_repeats_sample_lengths(self):
        from regennet_tpu.eval.eval_humanml import (
            make_comp_gen_loader_factory,
        )

        (ds, gen, gen_params, mov_enc, mov_enc_params, est,
         est_params) = self._build()
        T = ds[0][4].shape[0]
        factory = make_comp_gen_loader_factory(
            ds, gen, gen_params, mov_enc, mov_enc_params, batch_size=8,
            seed=0, unit_length=4, mm_num_samples=2, mm_num_repeats=3,
            len_estimator=est, len_est_params=est_params, min_mov_length=2,
        )
        _, mm_list = factory()
        assert len(mm_list) == 2
        for mm_motions, mm_lens in mm_list:
            assert mm_motions.shape[0] == 3
            assert (mm_lens % 4 == 0).all() and (mm_lens < T).all()
            for i, ml in enumerate(mm_lens):
                assert np.all(mm_motions[i, int(ml):] == 0.0)


OPT_TXT = """------------ Options -------------
att_vec_dim: 512
batch_size: 32
checkpoints_dir: ./checkpoints
dataset_name: t2m
decomp_name: Decomp_SP001_SM001_H512
dim_att_vec: 512
dim_dec_hidden: 1024
dim_movement_dec_hidden: 512
dim_movement_enc_hidden: 512
dim_movement_latent: 512
dim_pos_hidden: 1024
dim_pri_hidden: 1024
dim_text_hidden: 512
dim_z: 128
early_stop_count: 3
estimator_mod: bigru
eval_every_e: 5
feat_bias: 5.0
fixed_steps: 5
gpu_id: 1
is_continue: False
lambda_kld: 0.005
lr: 0.0002
max_sub_epoch: 50
max_text_len: 20
n_layers_dec: 1
n_layers_pos: 1
n_layers_pri: 1
name: Comp_v6_KLD005
save_every_e: 100
save_latest: 500
text_enc_mod: bigru
tf_ratio: 0.4
unit_length: 4
-------------- End ----------------
"""


def test_get_opt_matches_reference(tmp_path):
    """Parse a release-format opt.txt and compare every key against the
    EXECUTING reference parser (reference:
    data_loaders/humanml/utils/get_opt.py:29-87). The reference's
    truthy-bool quirk (bool('False') is True) is a documented deviation:
    we assert our False against its overwritten post-parse value."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.append("/root/reference")
    pytest.importorskip("torch")
    try:
        from data_loaders.humanml.utils.get_opt import get_opt as ref_get_opt
    except Exception:
        pytest.skip("reference get_opt not importable")

    from regennet_tpu.data.humanml.get_opt import parse_opt_file

    p = tmp_path / "opt.txt"
    p.write_text(OPT_TXT)
    ref = vars(ref_get_opt(str(p), device="cpu"))
    ours = vars(parse_opt_file(str(p)))
    for key, want in ref.items():
        if key == "device":
            continue
        assert key in ours, f"missing opt key {key}"
        got = ours[key]
        if key in ("is_train", "is_continue"):
            # both end up False (the reference overwrites its truthy parse)
            assert got == want == False  # noqa: E712
            continue
        assert got == want, (key, got, want)
        assert type(got) is type(want), (key, type(got), type(want))


def test_comp_v6_sizes_from_opt(tmp_path):
    from regennet_tpu.data.humanml.get_opt import (
        comp_v6_sizes_from_opt,
        find_opt_file,
        parse_opt_file,
    )

    root = tmp_path / "Comp_v6_KLD005"
    (root / "model").mkdir(parents=True)
    (root / "opt.txt").write_text(OPT_TXT)
    model_path = root / "model" / "latest.tar"
    model_path.write_bytes(b"")
    assert find_opt_file(str(model_path)) == str(root / "opt.txt")

    sizes = comp_v6_sizes_from_opt(parse_opt_file(str(root / "opt.txt")))
    assert sizes == {
        "dim_z": 128, "pri_hidden": 1024, "dec_hidden": 1024,
        "text_hidden": 512, "att_vec": 512, "n_layers": 1,
        "mov_latent": 512, "unit_length": 4,
    }


def test_rebuild_comp_v6_generator_reads_opt_txt(tmp_path):
    """Without an args.json, the comp_v6 rebuild takes its dims from the
    release's opt.txt layout (<name>/opt.txt + <name>/model/<ckpt>)."""
    from regennet_tpu.eval.eval_humanml import rebuild_comp_v6_generator

    root = tmp_path / "Comp_v6_small"
    (root / "model").mkdir(parents=True)
    small = OPT_TXT.replace("dim_z: 128", "dim_z: 16").replace(
        "dim_pri_hidden: 1024", "dim_pri_hidden: 32"
    )
    (root / "opt.txt").write_text(small)
    model_dir = root / "model" / "ckpt"
    model_dir.mkdir()
    gen, mov_enc, unit_length = rebuild_comp_v6_generator(
        str(model_dir), dim_pose=263
    )
    assert gen.dim_z == 16
    assert gen.pri_hidden == 32
    assert unit_length == 4
