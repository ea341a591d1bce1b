"""NTU120 cross-subject train/test split for the two-person subset.

Capability parity with the reference splitter (reference:
preprocess/split_2p.py): keeps the 26 mutual-action classes (50-60 and
106-120), splits by subject id against the published xsub training-subject
list, and remaps class ids to a contiguous 1..26 range in the key names.
"""

from __future__ import annotations

import argparse
import itertools
import os

TRAINING_SUBJECTS = [
    1, 2, 4, 5, 8, 9, 13, 14, 15, 16, 17, 18, 19, 25, 27, 28, 31, 34, 35, 38,
    45, 46, 47, 49, 50, 52, 53, 54, 55, 56, 57, 58, 59, 70, 74, 78, 80, 81,
    82, 83, 84, 85, 86, 89, 91, 92, 93, 94, 95, 97, 98, 100, 103,
]

SELECTED_CLASSES = list(range(50, 61)) + list(range(106, 121))  # 2-person


def remap_class(action_class: int) -> int:
    return action_class - 49 if action_class < 61 else action_class - 94


def write_split(data_path: str, out_path: str, benchmark: str, split: str):
    import h5py

    if benchmark != "xsub":
        raise ValueError("only the cross-subject benchmark is published")
    with h5py.File(data_path, "r") as f, h5py.File(out_path, "w") as fout:
        for filename in list(f.keys()):
            a = filename.find("A")
            action_class = int(filename[a + 1 : a + 4])
            if action_class not in SELECTED_CLASSES:
                continue
            p = filename.find("P")
            subject_id = int(filename[p + 1 : p + 4])
            istraining = subject_id in TRAINING_SUBJECTS
            if (split == "train") != istraining:
                continue
            new_class = remap_class(action_class)
            new_name = filename[:17] + "%03d" % new_class + filename[20:]
            fout.create_dataset(new_name, data=f[filename], dtype="f")


def main(args=None):
    if args is None:
        parser = argparse.ArgumentParser()
        parser.add_argument("-d", "--data_path", required=True)
        parser.add_argument("-o", "--out_path", required=True)
        args = parser.parse_args()
    os.makedirs(args.out_path, exist_ok=True)
    for b, s in itertools.product(["xsub"], ["train", "test"]):
        out = os.path.join(args.out_path, f"{b}.{s}.h5")
        write_split(args.data_path, out, b, s)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
