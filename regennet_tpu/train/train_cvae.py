"""ACTOR CVAE/CAE baseline trainer — `python -m regennet_tpu.train.train_cvae`.

Capability parity with the vendored ACTOR trainers (reference:
actor-x/src/train/train_cvae.py:17-61 epoch loop + trainer.py:5-47 and
train/duration_finetunning.py:14-55): epoch loop over the action-labelled
dataset, a single jitted step computing the weighted ACTOR loss mix
(rc/rcxyz/vel/velxyz/kl/mmd/hp — regennet_tpu.models.actor_losses), AdamW,
per-epoch loss means printed and reported to the train platform, and
snapshot checkpoints.

`--duration_finetune` reproduces duration_finetunning.py: restore an
existing checkpoint and add epochs, saving under
``retraincheckpoint_orig_{orig:04d}_added_{epoch:04d}`` names.

`--modeltype cae` trains the deterministic CAE (reference: modeltype/cae.py)
— z is the encoder mean; pair it with --lambda_mmd / --lambda_hp.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regennet_tpu.data.collate import collate
from regennet_tpu.data.get_data import BatchLoader, get_dataset
from regennet_tpu.models import actor_losses
from regennet_tpu.models.actor_cvae import ActorCVAE
from regennet_tpu.ops import body_model as bm
from regennet_tpu.ops.pose_decode import make_rot2xyz
from regennet_tpu.train import checkpoint
from regennet_tpu.train.train_platforms import get_platform
from regennet_tpu.utils.fixseed import fixseed
from regennet_tpu.utils.parser_util import save_args


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="chi3d", type=str)
    p.add_argument("--data_path", required=True, type=str)
    p.add_argument("--save_dir", required=True, type=str)
    p.add_argument("--num_frames", default=60, type=int)
    p.add_argument("--pose_rep", default="rot6d", type=str)
    p.add_argument("--body_model", default="smplx", type=str)
    p.add_argument("--num_person", default=2, type=int)
    p.add_argument("--arch", default="transformer", type=str,
                   choices=["transformer", "fc", "gru", "grutrans",
                            "transgru", "autotrans"])
    p.add_argument("--modeltype", default="cvae", type=str,
                   choices=["cvae", "cae"])
    p.add_argument("--latent_dim", default=256, type=int)
    p.add_argument("--num_layers", default=4, type=int)
    p.add_argument("--batch_size", default=20, type=int)
    p.add_argument("--num_epochs", default=100, type=int)
    p.add_argument("--snapshot", default=50, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    # ACTOR's default loss mix (reference: actor-x/src/parser/base.py lambdas)
    p.add_argument("--lambda_rc", default=1.0, type=float)
    p.add_argument("--lambda_rcxyz", default=1.0, type=float)
    p.add_argument("--lambda_vel", default=1.0, type=float)
    p.add_argument("--lambda_velxyz", default=0.0, type=float)
    p.add_argument("--lambda_kl", default=1e-5, type=float)
    p.add_argument("--lambda_mmd", default=0.0, type=float)
    p.add_argument("--lambda_hp", default=0.0, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--train_platform_type", default="NoPlatform", type=str)
    p.add_argument("--duration_finetune", default="", type=str,
                   help="checkpoint path to restore before adding epochs "
                   "(reference: train/duration_finetunning.py)")
    return p.parse_args(argv)


def _save_to(path: str, state) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def active_lambdas(args):
    pairs = {
        "rc": args.lambda_rc, "rcxyz": args.lambda_rcxyz,
        "vel": args.lambda_vel, "velxyz": args.lambda_velxyz,
        "kl": args.lambda_kl, "mmd": args.lambda_mmd, "hp": args.lambda_hp,
    }
    if args.modeltype == "cae":
        pairs["kl"] = 0.0  # no KL on the deterministic autoencoder
    return {k: v for k, v in pairs.items() if v > 0.0}


def make_train_step(model: ActorCVAE, optimizer, lambdas, rot2xyz_fn):
    needs_xyz = "rcxyz" in lambdas or "velxyz" in lambdas
    needs_hp = "hp" in lambdas

    @jax.jit
    def step(params, opt_state, x, action, mask, rng):
        reparam_rng, loss_rng = jax.random.split(rng)

        def loss_fn(p):
            out = model.apply(
                {"params": p}, x, action,
                rng=reparam_rng if model.vae else None, train=False,
            )
            batch = {"x": x, "mask": mask, **out}
            if needs_xyz:
                batch["x_xyz"] = rot2xyz_fn(x)
                batch["output_xyz"] = rot2xyz_fn(out["output"])
            latent_fn = None
            if needs_hp:
                def latent_fn(xin):
                    return model.apply(
                        {"params": p}, xin, action, train=False,
                        method=model.encode,
                    )[0]
            mixed, losses = actor_losses.compute_losses(
                batch, lambdas, rng=loss_rng, latent_fn=latent_fn
            )
            return mixed, losses

        (mixed, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses

    return step


def main(args=None):
    if args is None:
        args = parse_args()
    fixseed(args.seed)
    os.makedirs(args.save_dir, exist_ok=True)
    platform = get_platform(args.train_platform_type)(args.save_dir)
    lambdas = active_lambdas(args)

    data = get_dataset(
        name=args.dataset, num_frames=args.num_frames,
        num_person=args.num_person, data_path=args.data_path, split="train",
        setting="mdm", pose_rep=args.pose_rep, body_model=args.body_model,
    )
    loader = BatchLoader(data, args.batch_size, collate, seed=args.seed)
    motion0, cond0 = next(iter(loader))
    _, V, C, _ = np.asarray(motion0).shape
    # record the DATA-derived layout like the reference's
    # dataset.update_parameters writes njoints/nfeats back into the saved
    # opt.yaml (reference: actor-x/src/datasets/dataset.py:324-328) — the
    # legacy single-person datasets ignore the smplx/2p CLI defaults, and
    # downstream CLIs must rebuild the model that was actually trained
    args.njoints, args.nfeats = int(V), int(C)
    if args.dataset in ("humanact12", "uestc"):
        args.body_model, args.num_person = "smpl", 1
    args.num_actions = data.num_actions  # recorded for generate/eval CLIs
    save_args(args, args.save_dir)

    model = ActorCVAE(
        njoints=V, nfeats=C, num_actions=data.num_actions,
        latent_dim=args.latent_dim, num_layers=args.num_layers,
        arch=args.arch, num_frames=args.num_frames,
        vae=args.modeltype == "cvae",
    )
    rng = jax.random.PRNGKey(args.seed)
    params = model.init(
        rng, jnp.asarray(motion0),
        jnp.asarray(cond0["y"]["action"][:, 0]), rng=rng,
    )["params"]
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
    )
    print(f"Total params: {n_params / 1e6:.2f}M", flush=True)

    orig_epoch = 0
    if args.duration_finetune:
        state = checkpoint.load_checkpoint(args.duration_finetune)
        params = jax.tree_util.tree_map(
            jnp.asarray, state["params"]
        ) if "params" in state else params
        orig_epoch = checkpoint.parse_step_from_path(args.duration_finetune)
        print(f"Restored weights from {args.duration_finetune}", flush=True)

    rot2xyz_fn = None
    if "rcxyz" in lambdas or "velxyz" in lambdas:
        body = bm.get_body_model(args.body_model)
        rot2xyz_fn = make_rot2xyz(
            body, pose_rep=args.pose_rep, translation=True, glob=True,
            jointstype=args.body_model, vertstrans=False,
            num_person=args.num_person,
        )
    optimizer = optax.adamw(args.lr)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, lambdas, rot2xyz_fn)

    for epoch in range(1, args.num_epochs + 1):
        sums: dict = {}
        count = 0
        for motion, cond in loader:
            if motion.shape[0] != args.batch_size:
                continue
            y = cond["y"]
            mask = np.asarray(y["mask"])[:, 0, 0, :]  # [B, T]
            rng, srng = jax.random.split(rng)
            params, opt_state, losses = step(
                params, opt_state, jnp.asarray(motion),
                jnp.asarray(y["action"][:, 0]), jnp.asarray(mask), srng,
            )
            count += 1
            for k, v in losses.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        means = {k: v / max(count, 1) for k, v in sums.items()}
        print(f"Epoch {epoch}, train losses: "
              + " ".join(f"{k}={v:.6f}" for k, v in sorted(means.items())),
              flush=True)
        for k, v in means.items():
            platform.report_scalar(name=k, value=v, iteration=epoch,
                                   group_name="Loss")
        if epoch % args.snapshot == 0 or epoch == args.num_epochs:
            if args.duration_finetune:
                # reference naming: retraincheckpoint_orig_X_added_Y
                # (train/duration_finetunning.py:28-31)
                path = _save_to(
                    os.path.join(
                        args.save_dir,
                        f"retraincheckpoint_orig_{orig_epoch:04d}"
                        f"_added_{epoch:04d}",
                    ),
                    {"params": params},
                )
            else:
                path = checkpoint.save_checkpoint(
                    args.save_dir, epoch, {"params": params}
                )
            print(f"Saving checkpoint {path}", flush=True)
    platform.close()
    return model, params


if __name__ == "__main__":
    main()
