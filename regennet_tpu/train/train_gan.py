"""Conditional motion GAN trainer — `python -m regennet_tpu.train.train_gan`.

Capability parity with the reference's GAN baseline trainer (reference:
actor-x/src/train/train_gan.py:13-54 + trainer_gan.py + modeltype/gan.py
forward): epoch loop over the action-labelled dataset, alternating
hinge-loss D/G updates with a repeat_D schedule, per-epoch loss scalars to
the train platform, step-stamped checkpoints, and an optional per-class
sample dump at the end.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from regennet_tpu.data.collate import collate
from regennet_tpu.data.get_data import BatchLoader, get_dataset
from regennet_tpu.models.actor_gan import (
    Discriminator,
    Generator,
    gen_noise,
    gen_samples_per_class,
    make_gan_steps,
    make_optimizers,
)
from regennet_tpu.train import checkpoint
from regennet_tpu.train.train_platforms import get_platform
from regennet_tpu.utils.fixseed import fixseed


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="chi3d", type=str)
    p.add_argument("--data_path", required=True, type=str)
    p.add_argument("--save_dir", required=True, type=str)
    p.add_argument("--num_frames", default=60, type=int)
    p.add_argument("--pose_rep", default="rot6d", type=str)
    p.add_argument("--body_model", default="smplx", type=str)
    p.add_argument("--num_person", default=2, type=int)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--num_epochs", default=100, type=int)
    p.add_argument("--snapshot", default=50, type=int)
    p.add_argument("--base_lr", default=2e-4, type=float)
    p.add_argument("--D_lr_mult", default=4.0, type=float)
    p.add_argument("--beta1", default=0.5, type=float)
    p.add_argument("--weight_decay", default=0.0, type=float)
    p.add_argument("--repeat_D", default=1, type=int,
                   help="G updates once per this many D updates "
                   "(KGAN's n_critic)")
    p.add_argument("--loss_mode", default="hinge", type=str,
                   choices=["hinge", "wgan-gp"],
                   help="hinge = GAN model type; wgan-gp = KGAN")
    p.add_argument("--lambda_gp", default=10.0, type=float)
    p.add_argument("--latent_dim", default=256, type=int)
    p.add_argument("--nnoise", default=16, type=int,
                   help="number of noise tokens (NN)")
    p.add_argument("--noise_channel", default=32, type=int, help="Z")
    p.add_argument("--noise_mode", default="gp", type=str)
    p.add_argument("--lambda_noise", default=1.0, type=float)
    p.add_argument("--length_scale", default=10.0, type=float)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--train_platform_type", default="NoPlatform", type=str)
    p.add_argument("--gen_per_class", default=0, type=int,
                   help="if >0, dump this many samples per class at the end")
    return p.parse_args(argv)


def main(args=None):
    if args is None:
        args = parse_args()
    fixseed(args.seed)
    os.makedirs(args.save_dir, exist_ok=True)
    platform = get_platform(args.train_platform_type)(args.save_dir)

    data = get_dataset(
        name=args.dataset, num_frames=args.num_frames,
        num_person=args.num_person, data_path=args.data_path, split="train",
        setting="mdm", pose_rep=args.pose_rep, body_model=args.body_model,
    )
    loader = BatchLoader(data, args.batch_size, collate, seed=args.seed)

    motion0, _ = next(iter(loader))
    _, V, C, _ = np.asarray(motion0).shape
    G = Generator(njoints=V, nfeats=C, num_actions=data.num_actions,
                  num_frames=args.num_frames, latent_dim=args.latent_dim)
    D = Discriminator(njoints=V, nfeats=C, num_actions=data.num_actions,
                      latent_dim=args.latent_dim)

    rng = jax.random.PRNGKey(args.seed)
    nrng = np.random.default_rng(args.seed)
    noise_cfg = dict(NN=args.nnoise, Z=args.noise_channel,
                     lambda_noise=args.lambda_noise, mode=args.noise_mode,
                     length_scale=args.length_scale)
    noise0 = jnp.asarray(gen_noise(nrng, args.batch_size, **noise_cfg))
    label0 = jnp.zeros((args.batch_size,), jnp.int32)
    params_g = G.init(rng, noise0, label0)["params"]
    params_d = D.init(
        jax.random.fold_in(rng, 1), jnp.asarray(motion0), label0
    )["params"]
    n_params = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves((params_g, params_d))
    )
    print(f"Total params: {n_params / 1e6:.2f}M")

    opt_d, opt_g = make_optimizers(args.base_lr, args.D_lr_mult, args.beta1,
                                   args.weight_decay)
    opt_state_d = opt_d.init(params_d)
    opt_state_g = opt_g.init(params_g)
    d_step, g_step = make_gan_steps(G, D, opt_d, opt_g,
                                    loss_mode=args.loss_mode,
                                    lambda_gp=args.lambda_gp)

    idx = 0
    for epoch in range(1, args.num_epochs + 1):
        sums: dict = {}
        count = 0
        for motion, cond in loader:
            if motion.shape[0] != args.batch_size:
                continue
            y = jnp.asarray(cond["y"]["action"][:, 0])
            noise = jnp.asarray(gen_noise(nrng, args.batch_size, **noise_cfg))
            if args.loss_mode == "wgan-gp":
                y_fake = y  # KGAN conditions fakes on the batch labels
            else:
                y_fake = jnp.asarray(
                    nrng.integers(0, data.num_actions, args.batch_size),
                    jnp.int32,
                )
            rng, drng = jax.random.split(rng)
            params_d, opt_state_d, md = d_step(
                params_d, opt_state_d, params_g, jnp.asarray(motion), y,
                noise, y_fake, drng,
            )
            metrics = dict(md)
            if idx % args.repeat_D == 0:
                noise = jnp.asarray(
                    gen_noise(nrng, args.batch_size, **noise_cfg)
                )
                y_fake = jnp.asarray(
                    nrng.integers(0, data.num_actions, args.batch_size),
                    jnp.int32,
                )
                params_g, opt_state_g, mg = g_step(
                    params_g, opt_state_g, params_d, noise, y_fake
                )
                metrics.update(mg)
            idx += 1
            count += 1
            for k, v in metrics.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        means = {k: v / max(count, 1) for k, v in sums.items()}
        print(f"Epoch {epoch}, train losses: "
              + " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items())),
              flush=True)
        for k, v in means.items():
            platform.report_scalar(name=k, value=v, iteration=epoch,
                                   group_name="Loss")
        if epoch % args.snapshot == 0 or epoch == args.num_epochs:
            path = checkpoint.save_checkpoint(
                args.save_dir, epoch,
                {"params_g": params_g, "params_d": params_d},
            )
            print(f"Saving checkpoint {path}", flush=True)

    if args.gen_per_class > 0:
        out = os.path.join(args.save_dir, "gen_per_class.h5")
        gen_samples_per_class(G, params_g, data.num_actions, out, noise_cfg,
                              per_class=args.gen_per_class, seed=args.seed)
        print(f"wrote {out}", flush=True)
    platform.close()
    return params_g, params_d


if __name__ == "__main__":
    main()
