"""Train the text-to-motion evaluator networks —
`python -m regennet_tpu.train.train_t2m_eval`.

Capability parity with the legacy T2M evaluator trainers (reference:
data_loaders/humanml/networks/trainers.py — DecompTrainerV3:25-210,
TextMotionMatchTrainer:879-1089, LengthEstTrainer:748-877): this is the
machinery that produces the `finest.tar` evaluators consumed by
eval.eval_humanml, so the full humanml protocol can be reproduced without
the released torch checkpoints.

Stages (select with --stage, or `all` to run them in order):
- `decomp`   — movement autoencoder: L1 reconstruction + sparsity +
               latent smoothness (DecompTrainerV3.backward).
- `matching` — contrastive text<->motion co-embedding over the frozen
               movement encoder: positive pairs pulled, batch-shifted
               negatives pushed past the margin
               (TextMotionMatchTrainer.backward, ContrastiveLoss margin 10).
- `length`   — BiGRU motion-length-bin classifier, cross-entropy on
               m_lens // unit_length (LengthEstTrainer.train).

Each stage is one jitted update; checkpoints are Orbax dirs whose pytrees
match what eval_humanml's T2MEvaluatorWrapper consumes
({movement, text, motion} for the matching stage).
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
from regennet_tpu.models import t2m_eval as t2m
from regennet_tpu.train import checkpoint
from regennet_tpu.utils.fixseed import fixseed

FOOT_FEATS = 4  # trailing foot-contact features excluded from movement enc


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True, type=str,
                   help="HumanML3D-layout dataset root")
    p.add_argument("--save_dir", required=True, type=str)
    p.add_argument("--stage", default="all", type=str,
                   choices=["decomp", "matching", "length", "all"])
    p.add_argument("--dataset", default="humanml", type=str)
    p.add_argument("--batch_size", default=32, type=int)
    p.add_argument("--num_epochs", default=10, type=int)
    p.add_argument("--lr", default=1e-4, type=float)
    p.add_argument("--lambda_sparsity", default=0.001, type=float)
    p.add_argument("--lambda_smooth", default=0.001, type=float)
    p.add_argument("--negative_margin", default=10.0, type=float)
    p.add_argument("--unit_length", default=4, type=int)
    p.add_argument("--max_motion_length", default=196, type=int)
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args(argv)


def _batches(dataset, batch_size: int, rng: np.random.Generator):
    order = rng.permutation(len(dataset))
    bs = min(batch_size, len(dataset))
    for start in range(0, len(order) - bs + 1, bs):
        yield _stack_items([dataset[i] for i in order[start:start + bs]])


def train_decomp(args, dataset, nfeats: int):
    enc = t2m.MovementConvEncoder(
        t2m.T2M_OPT["dim_movement_enc_hidden"],
        t2m.T2M_OPT["dim_movement_latent"],
    )
    dec = t2m.MovementConvDecoder(
        t2m.T2M_OPT["dim_movement_enc_hidden"], nfeats
    )
    rng = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((2, args.max_motion_length, nfeats - FOOT_FEATS))
    p_enc = enc.init(rng, x0)["params"]
    p_dec = dec.init(
        rng, jnp.zeros((2, args.max_motion_length // args.unit_length,
                        t2m.T2M_OPT["dim_movement_latent"]))
    )["params"]
    params = {"movement_enc": p_enc, "movement_dec": p_dec}
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, motions):
        def loss_fn(p):
            latents = enc.apply({"params": p["movement_enc"]},
                                motions[..., :-FOOT_FEATS])
            recon = dec.apply({"params": p["movement_dec"]}, latents)
            loss_rec = jnp.mean(jnp.abs(recon - motions))
            loss_sparsity = jnp.mean(jnp.abs(latents))
            loss_smooth = jnp.mean(jnp.abs(latents[:, 1:] - latents[:, :-1]))
            loss = (loss_rec + args.lambda_sparsity * loss_sparsity
                    + args.lambda_smooth * loss_smooth)
            return loss, {"loss_rec": loss_rec, "loss_sparsity": loss_sparsity,
                          "loss_smooth": loss_smooth}

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, logs

    nrng = np.random.default_rng(args.seed)
    for epoch in range(1, args.num_epochs + 1):
        logs_sum, count = {}, 0
        for batch in _batches(dataset, args.batch_size, nrng):
            motions = jnp.asarray(batch[4], jnp.float32)
            params, opt_state, logs = step(params, opt_state, motions)
            count += 1
            for k, v in logs.items():
                logs_sum[k] = logs_sum.get(k, 0.0) + float(v)
        print(f"[decomp] epoch {epoch}: " + " ".join(
            f"{k}={v / max(count, 1):.6f}" for k, v in sorted(logs_sum.items())
        ), flush=True)
    path = checkpoint.save_checkpoint(
        os.path.join(args.save_dir, "decomp"), args.num_epochs,
        {"params": params},
    )
    print(f"Saving checkpoint {path}", flush=True)
    return params


def train_matching(args, dataset, nfeats: int, movement_params):
    enc = t2m.MovementConvEncoder(
        t2m.T2M_OPT["dim_movement_enc_hidden"],
        t2m.T2M_OPT["dim_movement_latent"],
    )
    text_enc = t2m.TextEncoderBiGRUCo(
        hidden_size=t2m.T2M_OPT["dim_text_hidden"],
        output_size=t2m.T2M_OPT["dim_coemb_hidden"],
    )
    motion_enc = t2m.MotionEncoderBiGRUCo(
        input_size=t2m.T2M_OPT["dim_movement_latent"],
        hidden_size=t2m.T2M_OPT["dim_motion_hidden"],
        output_size=t2m.T2M_OPT["dim_coemb_hidden"],
    )
    rng = jax.random.PRNGKey(args.seed + 1)
    Tm = args.max_motion_length // args.unit_length
    p_text = text_enc.init(
        rng, jnp.zeros((2, 8, t2m.T2M_OPT["dim_word"])),
        jnp.zeros((2, 8, t2m.T2M_OPT["dim_pos_ohot"])),
        jnp.asarray([8, 8]),
    )["params"]
    p_motion = motion_enc.init(
        rng, jnp.zeros((2, Tm, t2m.T2M_OPT["dim_movement_latent"])),
        jnp.asarray([Tm, Tm]),
    )["params"]
    params = {"text": p_text, "motion": p_motion}
    # grad-clip 0.5 like the reference (trainers.py clip_norm)
    optimizer = optax.chain(
        optax.clip_by_global_norm(0.5), optax.adam(args.lr)
    )
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, word_embs, pos_ohot, cap_lens, motions,
             m_lens, shift):
        movements = enc.apply({"params": movement_params},
                              motions[..., :-FOOT_FEATS])
        movements = jax.lax.stop_gradient(movements)

        def loss_fn(p):
            motion_emb = motion_enc.apply(
                {"params": p["motion"]}, movements,
                m_lens // args.unit_length,
            )
            text_emb = text_enc.apply(
                {"params": p["text"]}, word_embs, pos_ohot, cap_lens
            )
            B = text_emb.shape[0]
            loss_pos = t2m.contrastive_loss(
                text_emb, motion_emb, jnp.zeros(B), args.negative_margin
            )
            mis = jnp.roll(motion_emb, shift, axis=0)
            loss_neg = t2m.contrastive_loss(
                text_emb, mis, jnp.ones(B), args.negative_margin
            )
            loss = loss_pos + loss_neg
            return loss, {"loss_pos": loss_pos, "loss_neg": loss_neg,
                          "loss": loss}

        (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, logs

    nrng = np.random.default_rng(args.seed + 1)
    for epoch in range(1, args.num_epochs + 1):
        logs_sum, count = {}, 0
        for batch in _batches(dataset, args.batch_size, nrng):
            word_embs, pos_ohot, _, cap_lens, motions, m_lens, _ = batch
            B = motions.shape[0]
            shift = int(nrng.integers(1, max(B, 2)))
            params, opt_state, logs = step(
                params, opt_state, jnp.asarray(word_embs, jnp.float32),
                jnp.asarray(pos_ohot, jnp.float32),
                jnp.asarray(cap_lens, jnp.int32),
                jnp.asarray(motions, jnp.float32),
                jnp.asarray(m_lens, jnp.int32), shift,
            )
            count += 1
            for k, v in logs.items():
                logs_sum[k] = logs_sum.get(k, 0.0) + float(v)
        print(f"[matching] epoch {epoch}: " + " ".join(
            f"{k}={v / max(count, 1):.6f}" for k, v in sorted(logs_sum.items())
        ), flush=True)
    # finest.tar-equivalent pytree consumed by T2MEvaluatorWrapper
    state = {"params": {"movement": movement_params, "text": params["text"],
                        "motion": params["motion"]}}
    path = checkpoint.save_checkpoint(
        os.path.join(args.save_dir, "matching"), args.num_epochs, state
    )
    print(f"Saving checkpoint {path}", flush=True)
    return state["params"]


def train_length(args, dataset):
    num_classes = args.max_motion_length // args.unit_length + 1
    est = t2m.MotionLenEstimatorBiGRU(output_size=num_classes)
    rng = jax.random.PRNGKey(args.seed + 2)
    params = est.init(
        rng, jnp.zeros((2, 8, t2m.T2M_OPT["dim_word"])),
        jnp.zeros((2, 8, t2m.T2M_OPT["dim_pos_ohot"])),
        jnp.asarray([8, 8]),
    )["params"]
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, word_embs, pos_ohot, cap_lens, labels):
        def loss_fn(p):
            logits = est.apply({"params": p}, word_embs, pos_ohot, cap_lens)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    nrng = np.random.default_rng(args.seed + 2)
    for epoch in range(1, args.num_epochs + 1):
        total, count = 0.0, 0
        for batch in _batches(dataset, args.batch_size, nrng):
            word_embs, pos_ohot, _, cap_lens, _, m_lens, _ = batch
            labels = np.clip(m_lens // args.unit_length, 0, num_classes - 1)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(word_embs, jnp.float32),
                jnp.asarray(pos_ohot, jnp.float32),
                jnp.asarray(cap_lens, jnp.int32),
                jnp.asarray(labels, jnp.int32),
            )
            total += float(loss)
            count += 1
        print(f"[length] epoch {epoch}: loss={total / max(count, 1):.6f}",
              flush=True)
    path = checkpoint.save_checkpoint(
        os.path.join(args.save_dir, "length"), args.num_epochs,
        {"params": params},
    )
    print(f"Saving checkpoint {path}", flush=True)
    return params


def main(args=None):
    if args is None:
        args = parse_args()
    fixseed(args.seed)
    os.makedirs(args.save_dir, exist_ok=True)
    dataset = Text2MotionDataset(args.data_path, split="train",
                                 dataset_name=args.dataset)
    sample = dataset[0]
    nfeats = sample[4].shape[-1]
    args.max_motion_length = sample[4].shape[0]

    movement_params = None
    if args.stage in ("decomp", "all"):
        movement_params = train_decomp(args, dataset, nfeats)["movement_enc"]
    if args.stage in ("matching", "all"):
        if movement_params is None:
            latest = checkpoint.latest_checkpoint(
                os.path.join(args.save_dir, "decomp")
            )
            if latest is None:
                raise ValueError(
                    "matching stage needs a decomp checkpoint — run "
                    "--stage decomp (or all) first"
                )
            movement_params = checkpoint.load_checkpoint(latest)["params"][
                "movement_enc"
            ]
        train_matching(args, dataset, nfeats, movement_params)
    if args.stage in ("length", "all"):
        train_length(args, dataset)


if __name__ == "__main__":
    main()
