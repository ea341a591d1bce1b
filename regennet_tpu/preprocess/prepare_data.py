"""Build SMPL-X h5 motion archives from PyMAF-X tracking output.

Capability parity with the reference builder (reference:
preprocess/prepare_data.py): per clip, gather the per-frame SMPL-X rotation
matrices (body 22 incl. global, jaw, eyes, 15+15 hand joints), convert to
axis-angle, rotate the global orientation and the camera-space translation
into the canonical frame, and pack as [T, 56, 3*num_person] with the
translation in the last row — the exact contract the Feeder reads.

Geometry runs through the in-repo jnp rotation library; the only external
dependency is joblib for PyMAF-X pickles.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_rotation(view: int) -> np.ndarray:
    """Canonicalising rotation: -view * 45deg about the x axis."""
    import jax.numpy as jnp

    from regennet_tpu.ops import rotations as geo

    theta = -view * np.pi / 4
    return np.asarray(
        geo.axis_angle_to_matrix(jnp.asarray([theta, 0.0, 0.0], jnp.float32))
    )


def parse_motion_file(motion_file: str, rotation: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp
    import joblib

    from regennet_tpu.ops import rotations as geo

    data = joblib.load(motion_file)

    def cat(key, sub=None):
        parts = [
            np.asarray(batch[key] if sub is None else batch[key][:, sub])
            for batch in data["smplx_params"]
        ]
        return np.concatenate(parts, axis=0)

    body_pose = cat("body_pose", np.s_[0:22])       # [N, 22, 3, 3]
    left_hand = cat("left_hand_pose")
    right_hand = cat("right_hand_pose")
    jaw = cat("jaw_pose")
    leye = cat("leye_pose")
    reye = cat("reye_pose")

    def to_aa(rm):
        # np.array (not asarray): jax buffers are read-only views and
        # body_aa[:, 0] is assigned below
        return np.array(geo.matrix_to_axis_angle(jnp.asarray(rm)))

    body_aa = to_aa(body_pose)
    # rotate global orientation into the canonical frame
    global_rm = np.asarray(
        geo.axis_angle_to_matrix(jnp.asarray(body_aa[:, 0]))
    )
    body_aa[:, 0] = to_aa(rotation @ global_rm)

    root_transl = np.asarray(data["orig_cam_t"], dtype=np.float64).copy()
    root_transl[:, -1] = root_transl[:, -1] / 20
    root_transl = root_transl @ rotation.T

    max_frame = int(data["frame_ids"][-1]) + 1
    final_pose = np.zeros((2, max_frame, 56, 3), dtype=np.float32)
    assert len(data["person_ids"]) == body_aa.shape[0]
    for idx, person_id in enumerate(data["person_ids"]):
        splits = person_id.split("_")
        frame_idx = int(splits[-2][1:])
        person_idx = int(splits[-1][1:])
        if person_idx > 1:
            continue
        packed = np.concatenate(
            (
                body_aa[idx], to_aa(jaw[idx]), to_aa(leye[idx]),
                to_aa(reye[idx]), to_aa(left_hand[idx]),
                to_aa(right_hand[idx]), root_transl[idx, None],
            ),
            axis=0,
        )
        final_pose[person_idx, frame_idx] = packed

    # [2, T, 56, 3] -> [T, 56, 6] (persons interleaved on the channel axis)
    return final_pose.transpose(1, 2, 0, 3).reshape(-1, 56, 6)


def main(args=None):
    import h5py

    if args is None:
        parser = argparse.ArgumentParser()
        parser.add_argument("--src", required=True,
                            help="PyMAF-X output root (class/seq/output.pkl)")
        parser.add_argument("--dest", required=True, help="output h5 path")
        parser.add_argument("--view", default=0, type=int)
        args = parser.parse_args()

    os.makedirs(os.path.dirname(args.dest) or ".", exist_ok=True)
    rotation = get_rotation(args.view)
    with h5py.File(args.dest, "w") as fw:
        for action_class in sorted(os.listdir(args.src)):
            print(action_class)
            seq_dir = os.path.join(args.src, action_class)
            for seq_name in sorted(os.listdir(seq_dir)):
                motion_file = os.path.join(seq_dir, seq_name, "output.pkl")
                if not os.path.exists(motion_file):
                    continue
                camera_id = int(seq_name[5:8])
                if camera_id != 1:
                    continue
                poses = parse_motion_file(motion_file, rotation)
                fw.create_dataset(seq_name.split("_")[0], data=poses, dtype="f4")
    print(f"wrote {args.dest}")


if __name__ == "__main__":
    main()
