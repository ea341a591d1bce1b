"""Export OBJ meshes for a rendered sample —
`python -m regennet_tpu.visualize.render_mesh`.

Capability parity with the reference CLI (reference:
visualize/render_mesh.py:1-33): given a `sampleXX_repYY.mp4` path produced
by the generation pipeline, locate the sibling `results.npy`, export one
OBJ per valid frame into `<input>_obj/` and the SMPL parameter dict to
`<input>_smpl_params.npy`.
"""

from __future__ import annotations

import argparse
import os
import shutil


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input_path", type=str, required=True,
                   help="stick-figure mp4 file to be mesh-exported")
    p.add_argument("--body_model", type=str, default="",
                   help="smpl/smplx override (default: inferred)")
    p.add_argument("--fit_steps", type=int, default=300,
                   help="SMPLify iterations when the input is xyz")
    return p.parse_args(argv)


def main(args=None):
    from regennet_tpu.visualize.vis_utils import Npy2Obj

    if args is None:
        args = parse_args()
    assert args.input_path.endswith(".mp4")
    parsed_name = (
        os.path.basename(args.input_path)
        .replace(".mp4", "").replace("sample", "").replace("rep", "")
    )
    sample_i, rep_i = [int(e) for e in parsed_name.split("_")]
    npy_path = os.path.join(os.path.dirname(args.input_path), "results.npy")
    out_npy_path = args.input_path.replace(".mp4", "_smpl_params.npy")
    assert os.path.exists(npy_path)
    results_dir = args.input_path.replace(".mp4", "_obj")
    if os.path.exists(results_dir):
        shutil.rmtree(results_dir)
    os.makedirs(results_dir)

    converter = Npy2Obj(npy_path, sample_i, rep_i,
                        body_model=args.body_model or None,
                        fit_steps=args.fit_steps)

    print(f"Saving obj files to [{os.path.abspath(results_dir)}]")
    for frame_i in range(converter.real_num_frames):
        converter.save_obj(
            os.path.join(results_dir, f"frame{frame_i:03d}.obj"), frame_i
        )
    print(f"Saving SMPL params to [{os.path.abspath(out_npy_path)}]")
    converter.save_npy(out_npy_path)


if __name__ == "__main__":
    main()
