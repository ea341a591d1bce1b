"""Batch SMPLify fitting of joint-trajectory files —
`python -m regennet_tpu.visualize.fit_seq`.

Capability parity with the reference fitting CLI (reference:
visualize/joints2smpl/fit_seq.py:19-120): for each ``.npy`` joints file
([T, K, 3]) in ``--data_folder`` (or a ``--files`` subset), fit body-model
parameters to the trajectory and write per-frame meshes plus the fitted
parameters into ``--save_folder``.

Re-designed around the whole-sequence jitted optax fit
(`visualize.joints2smpl.fit_sequence`) instead of the reference's per-frame
SMPLify3D/LBFGS loop — temporal smoothness is part of the fit objective, so
the reference's fix_foot/per-frame-seeding knobs are unnecessary.
"""

from __future__ import annotations

import argparse
import os
from os.path import join as pjoin

import numpy as np

from regennet_tpu.ops import body_model as bm
from regennet_tpu.ops import lbs, rotations as geo
from regennet_tpu.visualize.joints2smpl import export_obj, fit_sequence


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_folder", default="", type=str,
                   help="folder of [T, K, 3] .npy joint files")
    p.add_argument("--files", default="", type=str,
                   help="comma-separated subset of files (default: all .npy)")
    p.add_argument("--save_folder", required=True, type=str)
    p.add_argument("--body_model", default="smpl",
                   choices=["smpl", "smplx"])
    p.add_argument("--num_smplify_iters", default=300, type=int)
    p.add_argument("--lr", default=0.05, type=float)
    p.add_argument("--save_objs", default=True,
                   action=argparse.BooleanOptionalAction,
                   help="write one OBJ per frame (meshes when the body "
                   "model carries faces)")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--pose_prior", default="gmm",
                   choices=["gmm", "l2", "none"],
                   help="GMM max-mixture + angle priors (reference "
                   "SMPLify), plain L2, or none")
    p.add_argument("--gmm_path", default="", type=str,
                   help="path to the licensed gmm_08.pkl; synthetic "
                   "rest-centred mixture when empty")
    return p.parse_args(argv)


def fit_file(path: str, save_dir: str, model, args) -> dict:
    joints = np.load(path)
    if joints.ndim != 3 or joints.shape[-1] != 3:
        raise ValueError(f"{path}: expected [T, K, 3] joints, "
                         f"got {joints.shape}")
    fit = fit_sequence(
        model, joints[:, : model.num_joints],
        num_steps=args.num_smplify_iters, lr=args.lr, seed=args.seed,
        pose_prior=args.pose_prior, gmm_path=args.gmm_path or None,
    )
    os.makedirs(save_dir, exist_ok=True)
    np.savez(
        pjoin(save_dir, "fit_params.npz"),
        pose6d=fit["pose6d"], transl=fit["transl"], losses=fit["losses"],
    )
    if args.save_objs:
        import jax.numpy as jnp

        rotmats = geo.rotation_6d_to_matrix(jnp.asarray(fit["pose6d"]))
        verts = np.asarray(lbs.vertices(model, rotmats))  # [T, V, 3]
        verts = verts + fit["transl"][:, None, :]
        for t in range(verts.shape[0]):
            export_obj(verts[t], model.faces,
                       pjoin(save_dir, f"frame{t:04d}.obj"))
    return fit


def main(args=None):
    if args is None:
        args = parse_args()
    model = bm.get_body_model(args.body_model)
    if args.files:
        files = [f.strip() for f in args.files.split(",") if f.strip()]
    else:
        files = sorted(
            f for f in os.listdir(args.data_folder) if f.endswith(".npy")
        )
    if not files:
        raise ValueError("no .npy joint files to fit")
    results = {}
    for name in files:
        path = pjoin(args.data_folder, name) if args.data_folder else name
        stem = os.path.splitext(os.path.basename(name))[0]
        save_dir = pjoin(args.save_folder, stem)
        fit = fit_file(path, save_dir, model, args)
        print(f"fit {name}: final loss {fit['losses'][-1]:.6f} -> "
              f"{save_dir}", flush=True)
        results[name] = fit
    return results


if __name__ == "__main__":
    main()
