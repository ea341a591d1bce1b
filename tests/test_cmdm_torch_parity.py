"""CMDM vs torch numerical parity through the checkpoint converter.

Builds the reference denoiser layout in torch (nn.TransformerDecoder trunk,
same input/output processes and embedders — reference: model/cmdm.py),
converts its random weights with convert_cmdm, and checks the Flax CMDM
produces the same outputs. This is the proof that released reference
checkpoints will reproduce through regennet_tpu.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from regennet_tpu.convert.torch_ckpt import convert_cmdm  # noqa: E402
from regennet_tpu.models.cmdm import CMDM  # noqa: E402

B, J, F, T = 2, 56, 6, 12
D, FF, H, L = 64, 128, 4, 2
NUM_ACTIONS = 8


class TorchCMDM(torch.nn.Module):
    """Reference-layout online CMDM (concat fusion, action conditioning)."""

    def __init__(self):
        super().__init__()
        input_feats = J * F
        self.input_process = torch.nn.ModuleDict(
            {"poseEmbedding": torch.nn.Linear(input_feats, D)}
        )
        self.cmo_process = torch.nn.ModuleDict(
            {"poseEmbedding": torch.nn.Linear(input_feats, D)}
        )
        self.fuse_process = torch.nn.Linear(2 * D, D)
        self.embed_timestep = torch.nn.ModuleDict(
            {"time_embed": torch.nn.Sequential(
                torch.nn.Linear(D, D), torch.nn.SiLU(), torch.nn.Linear(D, D)
            )}
        )
        self.embed_action = torch.nn.ParameterDict(
            {"action_embedding": torch.nn.Parameter(
                torch.randn(NUM_ACTIONS, D)
            )}
        )
        layer = torch.nn.TransformerDecoderLayer(
            d_model=D, nhead=H, dim_feedforward=FF, dropout=0.0,
            activation="gelu",
        )
        self.seqTransDecoder = torch.nn.TransformerDecoder(layer, num_layers=L)
        self.output_process = torch.nn.ModuleDict(
            {"poseFinal": torch.nn.Linear(D, input_feats)}
        )
        # sinusoidal table identical to the flax side
        import math

        pe = torch.zeros(5000, D)
        position = torch.arange(0, 5000, dtype=torch.float).unsqueeze(1)
        div_term = torch.exp(
            torch.arange(0, D, 2).float() * (-math.log(10000.0) / D)
        )
        pe[:, 0::2] = torch.sin(position * div_term)
        pe[:, 1::2] = torch.cos(position * div_term)
        self.register_buffer("pe", pe)

    def forward(self, x, timesteps, cmotion, action):
        bs = x.shape[0]
        emb = self.embed_timestep["time_embed"](self.pe[timesteps])  # [B, D]
        emb = emb + self.embed_action["action_embedding"][action]

        def to_seq(v):
            return v.permute(3, 0, 1, 2).reshape(T, bs, J * F)

        xs = self.input_process["poseEmbedding"](to_seq(x))
        cs = self.cmo_process["poseEmbedding"](to_seq(cmotion))
        xseq = self.fuse_process(torch.cat([xs, cs], dim=-1))
        xseq = xseq + self.pe[:T].unsqueeze(1)
        mask = torch.triu(
            torch.full((T, T), float("-inf")), diagonal=1
        )
        out = self.seqTransDecoder(
            tgt=xseq, memory=emb.unsqueeze(0), tgt_mask=mask
        )
        out = self.output_process["poseFinal"](out)
        return out.reshape(T, bs, J, F).permute(1, 2, 3, 0)


def _torch_state_dict_reference_names(model):
    """Rename the ModuleDict keys to the reference checkpoint naming."""
    sd = {}
    for k, v in model.state_dict().items():
        k = k.replace("input_process.poseEmbedding", "input_process.poseEmbedding")
        k = k.replace("embed_timestep.time_embed", "embed_timestep.time_embed")
        k = k.replace("embed_action.action_embedding", "embed_action.action_embedding")
        sd[k] = v.numpy() if hasattr(v, "numpy") else v
    return sd


def test_cmdm_matches_torch_reference_layout():
    torch.manual_seed(0)
    tmodel = TorchCMDM().eval()

    x = torch.randn(B, J, F, T) * 0.3
    cmotion = torch.randn(B, J, F, T) * 0.3
    timesteps = torch.tensor([3, 500])
    action = torch.tensor([1, 5])
    with torch.no_grad():
        ref = tmodel(x, timesteps, cmotion, action).numpy()

    params = convert_cmdm(
        _torch_state_dict_reference_names(tmodel), arch="online"
    )
    model = CMDM(
        njoints=J, nfeats=F, num_actions=NUM_ACTIONS, num_frames=T,
        latent_dim=D, ff_size=FF, num_layers=L, num_heads=H, arch="online",
        cm_mode="concat", cond_mode="action", dropout=0.0,
        activation="gelu_exact",
    )
    cond = {
        "cmotion": jnp.asarray(cmotion.numpy()),
        "action": jnp.asarray(action.numpy()[:, None]),
    }
    ours = np.asarray(
        model.apply(
            {"params": params}, jnp.asarray(x.numpy()),
            jnp.asarray(timesteps.numpy()), cond,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=2e-4)
