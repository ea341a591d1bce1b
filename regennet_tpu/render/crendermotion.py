"""Render generated reactions — `python -m regennet_tpu.render.crendermotion`.

Capability parity with the reference CLI (reference:
render/crendermotion.py:20-128): reads results.npy, concatenates the actor
condition with the generated reactor, applies temporal gaussian smoothing
(sigma=3), decodes with the body model, and writes one video per sample.
`--jointstype vertices` renders the full mesh point cloud when desired;
default renders skeletons (fast, no GL stack needed).
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter1d

from regennet_tpu.ops import body_model as bm
from regennet_tpu.ops.pose_decode import rot2xyz
from regennet_tpu.render.renderer import render_video


def get_sample(results: dict, idx: int, body, jointstype: str, sigma: float = 3.0):
    """actor‖reactor -> smoothed 2-person xyz [2, K, 3, T]."""
    cmotion = results["cmotion"][idx]  # [56, 6, T]
    output = results["output"][idx]
    packed = np.concatenate([cmotion, output], axis=1)[None]  # [1, 56, 12, T]
    packed = gaussian_filter1d(packed, sigma=sigma, axis=-1)
    xyz = np.asarray(
        rot2xyz(
            jnp.asarray(packed), None, body, pose_rep="rot6d",
            translation=True, glob=True, jointstype=jointstype,
            vertstrans=True, num_person=2,
        )
    )[0]  # [K, 6, T]
    K, _, T = xyz.shape
    return np.stack([xyz[:, :3, :], xyz[:, 3:, :]], axis=0)  # [2, K, 3, T]


def main(args=None):
    if args is None:
        parser = argparse.ArgumentParser()
        parser.add_argument("--data_path", required=True,
                            help="path to results.npy from sample.cgenerate")
        parser.add_argument("--output_dir", default="")
        parser.add_argument("--body_model", default="smplx",
                            choices=["smpl", "smplx"])
        parser.add_argument("--jointstype", default=None,
                            help="defaults to the body model's joint set; "
                                 "'vertices' renders the mesh point cloud")
        parser.add_argument("--fps", default=20, type=int)
        parser.add_argument("--num_videos", default=-1, type=int)
        args = parser.parse_args()

    results = np.load(args.data_path, allow_pickle=True).item()
    out_dir = args.output_dir or os.path.join(
        os.path.dirname(args.data_path), "videos"
    )
    body = bm.get_body_model(args.body_model)
    jointstype = args.jointstype or args.body_model

    n = results["output"].shape[0]
    if args.num_videos > 0:
        n = min(n, args.num_videos)
    # mesh rendering when decoding vertices and the body model has faces
    faces = body.faces if jointstype == "vertices" else None
    paths = []
    for i in range(n):
        joints = get_sample(results, i, body, jointstype)
        text = results["text"][i] if i < len(results.get("text", [])) else ""
        path = render_video(
            joints, os.path.join(out_dir, f"sample{i:03d}.mp4"),
            fps=args.fps, title=str(text), faces=faces,
        )
        print(f"rendered {path}")
        paths.append(path)
    return paths


if __name__ == "__main__":
    main()
