"""ACTOR baseline sample-grid generation —
`python -m regennet_tpu.sample.generate_sequences`.

Capability parity with the vendored ACTOR generation CLI (reference:
actor-x/src/generate/generate_sequences.py:17-120): load a trained
CVAE/CAE checkpoint, draw ``nspa`` latent samples for every action class at
the requested duration(s), decode poses (optionally to xyz joints through
the body model), and save the grid to ``generation.npy``.

`--duration_exp` reproduces the duration experiment (reference :36-39):
four rows at durations [40, 60, 80, 100] instead of nspa random rows.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from regennet_tpu.models.actor_cvae import ActorCVAE
from regennet_tpu.ops import body_model as bm
from regennet_tpu.ops.pose_decode import make_rot2xyz
from regennet_tpu.train import checkpoint
from regennet_tpu.utils.fixseed import fixseed

DURATION_EXP = [40, 60, 80, 100]  # reference :37


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_path", required=True, type=str,
                   help="checkpoint dir saved by train_cvae")
    p.add_argument("--output_path", default="", type=str)
    p.add_argument("--num_classes", default=0, type=int,
                   help="override; default read from args.json/num_actions")
    p.add_argument("--num_frames", default=60, type=int)
    p.add_argument("--nspa", default=10, type=int,
                   help="samples per action class")
    p.add_argument("--duration_exp", action="store_true")
    p.add_argument("--fact_latent", default=1.0, type=float,
                   help="latent scale factor (reference fact_latent)")
    p.add_argument("--jointstype", default="", type=str,
                   help="if set (e.g. smplx), also decode xyz joints")
    p.add_argument("--vertstrans", action="store_true")
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args(argv)


def _load_train_args(model_path: str) -> dict:
    args_path = os.path.join(os.path.dirname(model_path.rstrip("/")),
                             "args.json")
    if os.path.exists(args_path):
        with open(args_path) as f:
            return json.load(f)
    return {}


def generate_grid(model: ActorCVAE, params, rng, classes, durations,
                  fact: float = 1.0):
    """[len(durations)/nspa rows x num_classes] grid of generated motions.

    Matches the reference semantics: one latent draw per (row, class),
    decoded at that row's duration. Returns [R, C, J, F, Tmax].
    """
    rows = []
    for r, dur in enumerate(durations):
        z = fact * jax.random.normal(
            jax.random.fold_in(rng, r),
            (classes.shape[0], model.latent_dim), jnp.float32,
        )
        if model.dec_arch == "autotrans":
            out = model.generate_autoregressive(
                {"params": params}, z, jnp.asarray(classes), int(dur)
            )
        else:
            out = model.apply(
                {"params": params}, z, jnp.asarray(classes), int(dur),
                method=model.decode,
            )  # [C, J, F, dur]
        T_max = max(int(d) for d in durations)
        pad = T_max - out.shape[-1]
        if pad:
            out = jnp.pad(out, ((0, 0), (0, 0), (0, 0), (0, pad)))
        rows.append(out)
    return jnp.stack(rows, 0)


def main(args=None):
    if args is None:
        args = parse_args()
    fixseed(args.seed)
    train_args = _load_train_args(args.model_path)
    state = checkpoint.load_checkpoint(args.model_path)
    params = state["params"] if "params" in state else state

    # infer static shapes from the checkpoint's args.json (training side);
    # prefer the data-derived njoints/nfeats the trainer records (mirrors
    # the reference opt.yaml's update_parameters)
    num_person = int(train_args.get("num_person", 2))
    njoints = int(train_args.get(
        "njoints",
        {"smpl": 25, "smplx": 56}.get(train_args.get("body_model", "smplx"), 56),
    ))
    nfeats = int(train_args.get("nfeats", 6 * num_person))
    num_actions = args.num_classes or int(train_args.get("num_actions", 0))
    if not num_actions and "action_biases" in params:
        num_actions = np.asarray(params["action_biases"]).shape[0]
    if not num_actions:
        raise ValueError(
            "num_actions unknown: pass --num_classes or train with "
            "regennet_tpu.train.train_cvae (which records it in args.json)"
        )
    model = ActorCVAE(
        njoints=njoints, nfeats=nfeats, num_actions=num_actions,
        latent_dim=int(train_args.get("latent_dim", 256)),
        num_layers=int(train_args.get("num_layers", 4)),
        arch=train_args.get("arch", "transformer"),
        num_frames=int(train_args.get("num_frames", args.num_frames)),
        vae=train_args.get("modeltype", "cvae") == "cvae",
    )

    classes = np.arange(num_actions, dtype=np.int32)
    if args.duration_exp:
        durations = DURATION_EXP
    else:
        durations = [args.num_frames] * args.nspa
    rng = jax.random.PRNGKey(args.seed)
    grid = generate_grid(model, params, rng, classes, durations,
                         fact=args.fact_latent)

    result = {
        "generation": np.asarray(grid),
        "durations": np.asarray(durations, np.int32),
        "classes": classes,
    }
    if args.jointstype:
        body = bm.get_body_model(train_args.get("body_model", "smplx"))
        rot2xyz_fn = make_rot2xyz(
            body, pose_rep=train_args.get("pose_rep", "rot6d"),
            translation=True, glob=True, jointstype=args.jointstype,
            vertstrans=args.vertstrans, num_person=num_person,
        )
        R, C = grid.shape[:2]
        flat = grid.reshape((R * C,) + grid.shape[2:])
        xyz = np.asarray(rot2xyz_fn(flat))
        result["generation_xyz"] = xyz.reshape((R, C) + xyz.shape[1:])

    out_path = args.output_path or os.path.join(
        os.path.dirname(args.model_path.rstrip("/")), "generation.npy"
    )
    np.save(out_path, result, allow_pickle=True)
    print(f"wrote {out_path}", flush=True)
    return result


if __name__ == "__main__":
    main()
