"""Train the comp_v6 text-to-motion generator —
`python -m regennet_tpu.train.train_t2m_gen`.

Capability parity with the legacy generator trainer (reference:
data_loaders/humanml/networks/trainers.py CompTrainerV6:211-540): teacher-
forced snippet-autoregressive training of the text2motion VAE over a frozen
movement encoder (from the decomp stage), with SmoothL1 motion/movement
reconstruction + prior/posterior KL, grad-clip 0.5, Adam.

Run `train_t2m_eval --stage decomp` first (or point --decomp_checkpoint at
one): its movement encoder is frozen here and its movement decoder warm-
starts the generator's, exactly like the reference pipeline.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regennet_tpu.data.humanml.dataset import Text2MotionDataset
from regennet_tpu.eval.eval_humanml import _stack_items
from regennet_tpu.models import t2m_eval, t2m_gen
from regennet_tpu.train import checkpoint
from regennet_tpu.train.train_t2m_eval import FOOT_FEATS, _batches
from regennet_tpu.utils.fixseed import fixseed


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True, type=str)
    p.add_argument("--save_dir", required=True, type=str)
    p.add_argument("--decomp_checkpoint", default="", type=str,
                   help="decomp-stage checkpoint (default: "
                   "{save_dir}/../decomp latest)")
    p.add_argument("--dataset", default="humanml", type=str)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--num_epochs", default=10, type=int)
    p.add_argument("--lr", default=2e-4, type=float)
    p.add_argument("--tf_ratio", default=0.4, type=float,
                   help="teacher forcing probability per step batch")
    p.add_argument("--lambda_rec_mov", default=1.0, type=float)
    p.add_argument("--lambda_rec_mot", default=1.0, type=float)
    p.add_argument("--lambda_kld", default=0.005, type=float)
    p.add_argument("--unit_length", default=4, type=int)
    p.add_argument("--save_every", default=0, type=int,
                   help="checkpoint every N epochs (default: only at end)")
    p.add_argument("--resume", action="store_true",
                   help="resume params+optimizer from the latest checkpoint "
                   "in save_dir (reference: CompTrainerV6 is_continue/load)")
    # network sizes (reference comp_v6 defaults; shrink for smoke tests)
    p.add_argument("--dim_z", default=128, type=int)
    p.add_argument("--pri_hidden", default=1024, type=int)
    p.add_argument("--dec_hidden", default=1024, type=int)
    p.add_argument("--text_hidden", default=512, type=int)
    p.add_argument("--att_vec", default=512, type=int)
    p.add_argument("--n_layers", default=1, type=int)
    p.add_argument("--max_motion_length", default=196, type=int)
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args(argv)


def _load_decomp(args):
    path = args.decomp_checkpoint
    if not path:
        path = checkpoint.latest_checkpoint(
            os.path.join(os.path.dirname(args.save_dir.rstrip("/")), "decomp")
        ) or checkpoint.latest_checkpoint(
            os.path.join(args.save_dir, "..", "decomp")
        )
    if not path:
        raise ValueError(
            "no decomp checkpoint found — run train_t2m_eval --stage decomp "
            "or pass --decomp_checkpoint"
        )
    state = checkpoint.load_checkpoint(path)
    return state["params"]["movement_enc"], state["params"]["movement_dec"]


def main(args=None):
    if args is None:
        args = parse_args()
    fixseed(args.seed)
    os.makedirs(args.save_dir, exist_ok=True)
    import json

    with open(os.path.join(args.save_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2, sort_keys=True)
    dataset = Text2MotionDataset(args.data_path, split="train",
                                 dataset_name=args.dataset,
                                 max_motion_length=args.max_motion_length)
    sample = dataset[0]
    nfeats = sample[4].shape[-1]
    T = sample[4].shape[0]
    mov_len = T // args.unit_length

    mov_enc_params, mov_dec_params = _load_decomp(args)
    mov_enc = t2m_eval.MovementConvEncoder(
        t2m_eval.T2M_OPT["dim_movement_enc_hidden"],
        t2m_eval.T2M_OPT["dim_movement_latent"],
    )
    gen = t2m_gen.CompV6Generator(
        dim_pose=nfeats, dim_z=args.dim_z, pri_hidden=args.pri_hidden,
        dec_hidden=args.dec_hidden, text_hidden=args.text_hidden,
        att_vec=args.att_vec, n_layers=args.n_layers,
    )

    rng = jax.random.PRNGKey(args.seed)
    B0 = 2
    word0 = jnp.zeros((B0, 8, t2m_gen.T2M_GEN_OPT["dim_word"]))
    pos0 = jnp.zeros((B0, 8, t2m_gen.T2M_GEN_OPT["dim_pos_ohot"]))
    movs0 = jnp.zeros((B0, mov_len, gen.mov_latent))
    params = gen.init(
        rng, word0, pos0, jnp.asarray([8, 8]), movs0,
        jnp.asarray([T, T]), jnp.zeros((B0, gen.mov_latent)), rng,
        jnp.ones(()), unit_length=args.unit_length,
    )["params"]
    # warm-start mov_dec from the decomp stage (reference loads both halves
    # of the decomp checkpoint into CompTrainerV6)
    params = dict(params)
    params["mov_dec"] = jax.tree_util.tree_map(jnp.asarray, mov_dec_params)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(f"Total params: {n / 1e6:.2f}M", flush=True)

    optimizer = optax.chain(optax.clip_by_global_norm(0.5),
                            optax.adam(args.lr))
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, word, pos, cap_lens, motions, m_lens, rng,
             tf_flag):
        movements = jax.lax.stop_gradient(
            mov_enc.apply({"params": mov_enc_params},
                          motions[..., :-FOOT_FEATS])
        )
        mov_in0 = jax.lax.stop_gradient(
            mov_enc.apply(
                {"params": mov_enc_params},
                jnp.zeros((motions.shape[0], args.unit_length,
                           motions.shape[-1] - FOOT_FEATS)),
            )
        )[:, 0]

        def loss_fn(p):
            out = gen.apply(
                {"params": p}, word, pos, cap_lens, movements, m_lens,
                mov_in0, rng, tf_flag, unit_length=args.unit_length,
            )
            losses = t2m_gen.comp_v6_losses(
                out, motions, movements, args.lambda_rec_mov,
                args.lambda_rec_mot, args.lambda_kld,
            )
            return losses["loss_gen"], losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, losses

    start_epoch = 0
    if args.resume:
        latest = checkpoint.latest_checkpoint(args.save_dir)
        if latest:
            try:
                state = checkpoint.load_checkpoint(
                    latest, {"params": params, "opt_state": opt_state,
                             "movement_enc": mov_enc_params}
                )
                params, opt_state = state["params"], state["opt_state"]
            except Exception:
                # pre-resume checkpoint without optimizer state: params only
                state = checkpoint.load_checkpoint(
                    latest, {"params": params,
                             "movement_enc": mov_enc_params}
                )
                params = state["params"]
            start_epoch = checkpoint.parse_step_from_path(latest)
            print(f"Resumed from {latest} (epoch {start_epoch})", flush=True)

    nrng = np.random.default_rng(args.seed + start_epoch)
    for epoch in range(start_epoch + 1, args.num_epochs + 1):
        sums, count = {}, 0
        for batch in _batches(dataset, args.batch_size, nrng):
            word_embs, pos_ohot, _, cap_lens, motions, m_lens, _ = batch
            rng, srng = jax.random.split(rng)
            tf_flag = jnp.asarray(
                float(nrng.random() < args.tf_ratio)
            )  # one draw per forward, like the reference (trainers.py:298)
            params, opt_state, losses = step(
                params, opt_state, jnp.asarray(word_embs, jnp.float32),
                jnp.asarray(pos_ohot, jnp.float32),
                jnp.asarray(cap_lens, jnp.int32),
                jnp.asarray(motions, jnp.float32),
                jnp.asarray(m_lens, jnp.int32), srng, tf_flag,
            )
            count += 1
            for k, v in losses.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        print(f"[comp_v6] epoch {epoch}: " + " ".join(
            f"{k}={v / max(count, 1):.6f}" for k, v in sorted(sums.items())
        ), flush=True)
        if (args.save_every and epoch % args.save_every == 0) \
                or epoch == args.num_epochs:
            path = checkpoint.save_checkpoint(
                args.save_dir, epoch,
                {"params": params, "opt_state": opt_state,
                 "movement_enc": mov_enc_params},
            )
            print(f"Saving checkpoint {path}", flush=True)
    return gen, params


if __name__ == "__main__":
    main()
