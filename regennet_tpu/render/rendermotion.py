"""Render ACTOR baseline sample grids —
`python -m regennet_tpu.render.rendermotion`.

Capability parity with the vendored ACTOR render CLI (reference:
actor-x/src/render/rendermotion.py:17-100): read the ``generation.npy``
grid written by `sample.generate_sequences`, decode each (row, class) clip
with the body model (clipped to that row's duration, like the reference's
duration-mode slicing :73-83), and write one video per clip into a folder
named after the input file.
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


def _split_persons(xyz: np.ndarray) -> np.ndarray:
    """[K, 3*P, T] -> [P, K, 3, T]."""
    P = xyz.shape[1] // 3
    return np.stack([xyz[:, 3 * p:3 * p + 3, :] for p in range(P)], axis=0)


def main(args=None):
    if args is None:
        parser = argparse.ArgumentParser()
        parser.add_argument("--data_path", required=True,
                            help="generation.npy from sample.generate_sequences")
        parser.add_argument("--output_dir", default="",
                            help="default: <data_path stem>/")
        parser.add_argument("--body_model", default="smplx",
                            choices=["smpl", "smplx"])
        parser.add_argument("--pose_rep", default="rot6d")
        parser.add_argument("--num_person", default=2, type=int)
        parser.add_argument("--jointstype", default=None,
                            help="defaults to the body model's joint set")
        parser.add_argument("--sigma", default=0.0, type=float,
                            help="temporal gaussian smoothing")
        parser.add_argument("--fps", default=20, type=int)
        parser.add_argument("--num_videos", default=-1, type=int)
        args = parser.parse_args()

    result = np.load(args.data_path, allow_pickle=True).item()
    out_dir = args.output_dir or os.path.splitext(args.data_path)[0]
    durations = np.asarray(result.get("durations", []), np.int64)
    R, C = np.asarray(result["generation"]).shape[:2]
    n_clips = R * C
    if args.num_videos > 0:
        n_clips = min(n_clips, args.num_videos)

    if "generation_xyz" in result:
        xyz_grid = np.asarray(result["generation_xyz"])  # [R, C, K, 3P, T]
        flat_xyz = xyz_grid.reshape((R * C,) + xyz_grid.shape[2:])[:n_clips]
    else:
        body = bm.get_body_model(args.body_model)
        jointstype = args.jointstype or args.body_model
        grid = np.asarray(result["generation"], np.float32)
        # only decode the clips that will actually render — the body-model
        # decode is the expensive step
        flat = grid.reshape((R * C,) + grid.shape[2:])[:n_clips]
        flat_xyz = np.asarray(
            rot2xyz(
                jnp.asarray(flat), None, body, pose_rep=args.pose_rep,
                translation=True, glob=True, jointstype=jointstype,
                vertstrans=True, num_person=args.num_person,
            )
        )

    count = 0
    paths = []
    for r in range(R):
        dur = int(durations[r]) if r < len(durations) else flat_xyz.shape[-1]
        for c in range(C):
            if count >= n_clips:
                return paths
            clip = flat_xyz[r * C + c][..., :dur]  # [K, 3P, T]
            if args.sigma > 0:
                clip = gaussian_filter1d(clip, sigma=args.sigma, axis=-1)
            joints = _split_persons(clip)
            path = render_video(
                joints,
                os.path.join(out_dir, f"generation_{r}_class{c:03d}.mp4"),
                fps=args.fps, title=f"row {r} action {c}",
            )
            print(f"rendered {path}", flush=True)
            paths.append(path)
            count += 1
    return paths


if __name__ == "__main__":
    main()
