"""Model + diffusion factory (reference: utils/model_util.py:11-117).

Builds the CMDM Flax module, the (possibly respaced) Schedule, and the static
DiffusionConfig from the parsed CLI args and the dataset.
"""

from __future__ import annotations

from typing import Tuple

from regennet_tpu.diffusion import DiffusionConfig, Schedule, make_schedule
from regennet_tpu.models.cmdm import CMDM


def _pick_activation(args) -> str:
    """'gelu' (tanh approximation — the fast default for models trained in
    this framework) unless overridden, or unless args.model_path is a
    released torch file: converted reference weights only reproduce
    reference activations under the exact-erf form ('gelu_exact',
    models/cmdm + train/checkpoint._load_torch_checkpoint). The exact form
    costs ~20% end-to-end sampling throughput on TPU (docs/PERF.md), so it
    is opt-in rather than the default."""
    explicit = getattr(args, "activation", None)
    if explicit:
        return explicit
    import os

    mp = getattr(args, "model_path", "") or ""
    if os.path.isfile(mp) and mp.endswith((".pt", ".tar")):
        return "gelu_exact"
    return "gelu"


def get_model_args(args, data) -> dict:
    if getattr(args, "unconstrained", False):
        cond_mode = "no_cond"
    elif args.dataset in ("kit", "humanml"):
        cond_mode = "text"
    else:
        cond_mode = "action"
    dataset = getattr(data, "dataset", data)
    num_actions = getattr(dataset, "num_actions", 1)

    body_model = args.body_model
    njoints = {"smpl": 25, "smplx": 56}[body_model]
    nfeats = {"rot6d": 6, "xyz": 3}.get(args.pose_rep, 6)
    data_rep = args.pose_rep
    if args.dataset == "humanml":
        data_rep, njoints, nfeats = "hml_vec", 263, 1
    elif args.dataset == "kit":
        data_rep, njoints, nfeats = "hml_vec", 251, 1

    if args.dataset == "ntu":
        num_frames = 60
    elif args.dataset == "chi3d":
        num_frames = 150
    elif args.dataset in ("humanml", "kit"):
        num_frames = 196
    else:
        num_frames = getattr(args, "num_frames", 60)

    import jax.numpy as jnp

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        getattr(args, "compute_dtype", "float32")
    ]

    return dict(
        dtype=dtype,
        njoints=njoints,
        nfeats=nfeats,
        num_actions=num_actions,
        num_frames=num_frames,
        latent_dim=args.latent_dim,
        ff_size=1024,
        num_layers=args.layers,
        num_heads=4,
        dropout=0.1,
        activation=_pick_activation(args),
        data_rep=data_rep,
        cond_mode=cond_mode,
        cond_mask_prob=args.cond_mask_prob,
        arch=args.arch,
        cm_mode=args.cm_mode,
        wo_pos_emb=args.wo_pos_emb,
        emb_trans_dec=args.emb_trans_dec,
    )


def create_gaussian_diffusion(
    args, num_person: int = None
) -> Tuple[Schedule, DiffusionConfig]:
    if num_person is None:
        num_person = getattr(args, "num_person", 1)
    sched = make_schedule(
        noise_schedule=args.noise_schedule,
        steps=getattr(args, "diffusion_steps", 1000),
        timestep_respacing=getattr(args, "timestep_respacing", ""),
    )
    # humanml/kit train on 263/251-dim RIC features — no pose decode exists
    # there, so the geometric/interaction loss terms (which call rot2xyz) are
    # structurally inapplicable and forced off (plain masked MSE, like the
    # MDM t2m training the reference inherits). lambda_vel is also forced
    # off: its implementation drops the last channel-axis row as "the root
    # translation row", which for the RIC layout would silently drop a
    # foot-contact channel instead.
    hml = getattr(args, "dataset", "") in ("humanml", "kit")
    data_rep = "hml_vec" if hml else args.pose_rep
    cfg = DiffusionConfig(
        model_mean_type="start_x",  # we always predict x_start, that's our deal
        model_var_type="fixed_small" if args.sigma_small else "fixed_large",
        loss_type="mse",
        rescale_timesteps=False,
        lambda_vel=0.0 if hml else args.lambda_vel,
        lambda_rcxyz=0.0 if hml else args.lambda_rcxyz,
        lambda_fc=0.0 if hml else args.lambda_fc,
        lambda_orient=0.0 if hml else args.lambda_orient,
        lambda_body=0.0 if hml else args.lambda_body,
        lambda_transl=0.0 if hml else args.lambda_transl,
        data_rep=data_rep,
        num_person=num_person,
        body_model=args.body_model,
        vel_threshold=args.vel_threshold,
    )
    return sched, cfg


def create_model_and_diffusion(args, data):
    model = CMDM(**get_model_args(args, data))
    # in the cmdm setting the diffusion operates on the single reactor
    # stream, regardless of the dataset's person count (the reference mutates
    # args.num_person here — utils/model_util.py:15 — we keep args pristine)
    num_person = 1 if args.setting == "cmdm" else getattr(args, "num_person", 1)
    sched, cfg = create_gaussian_diffusion(args, num_person=num_person)
    return model, sched, cfg
