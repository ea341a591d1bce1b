"""One leak-bounded chunk of the capability study's eval protocol.

The axon TPU relay retains host memory roughly proportional to the bytes
it transfers (~10-15 MB per sampled sequence end-to-end through the eval
protocol; the round-5 full study OOM'd a 125 GB host at 1000x20 scale in
one process — see CLAUDE.md). Per-seed metrics in the protocol are
independent and `fixseed` uses absolute seed ids, so the identical
numbers can be computed by running seed RANGES in separate processes and
concatenating the per-seed metric lists (`stgcn_eval.evaluate` takes
`args.seed_start`). This runner executes one (row x seed-range) chunk of
a finished capability workdir and dumps the raw eval_dict;
`scripts/cap_combine.py` assembles the final artifact.

  python scripts/cap_eval_chunk.py --workdir /tmp/cap_r5_full \
      --ckpt 12000 --guidance 2.5 --samples 1000 --seeds 2 \
      --seed_start 4 --out /tmp/chunks/trained_s4.json
  # --row random  -> random-init params; --row oracle -> GT reactor
  # through the generated-side pipeline (no sampling)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--row", default="trained",
                    choices=["trained", "random", "oracle"])
    ap.add_argument("--ckpt", type=int, default=0,
                    help="checkpoint step (trained row)")
    ap.add_argument("--guidance", type=float, default=2.5)
    ap.add_argument("--samples", type=int, default=1000)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--seed_start", type=int, default=0)
    ap.add_argument("--respacing", default="100")
    ap.add_argument("--curve_stream", default="ema",
                    choices=["ema", "raw"],
                    help="which checkpoint parameter stream to evaluate")
    ap.add_argument("--out", required=True)
    cli = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_regennet"),
    )
    import jax.numpy as jnp

    from capability_study import eval_model, train_args
    from regennet_tpu.data.get_data import get_dataset
    from regennet_tpu.eval import eval_cmdm
    from regennet_tpu.train import checkpoint as ckpt_lib
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    t0 = time.time()
    ds_path = os.path.join(cli.workdir, "ds", "chi3d_train.h5")
    args_t = train_args(ds_path, os.path.join(cli.workdir, "cmdm_save"),
                        "full")
    args_t.dataset = "chi3d"

    eval_ds = get_dataset(
        name="chi3d", num_frames=args_t.num_frames, num_person=2,
        data_path=ds_path, split="test", setting="cmdm",
        pose_rep="rot6d", body_model="smplx",
    )
    ea = argparse.Namespace(**vars(args_t))
    ea.num_actions = 8
    evaluator = eval_cmdm.load_stgcn_evaluator(
        ea, os.path.join(cli.workdir, "stgcn_save", "model000009999")
    )

    params = None
    if cli.row == "trained":
        mdl, _, _ = create_model_and_diffusion(ea, eval_ds)
        x0 = jnp.zeros((1, mdl.njoints, mdl.nfeats, args_t.num_frames))
        cond0 = {"cmotion": x0, "action": jnp.zeros((1, 1), jnp.int32)}
        tmpl = mdl.init(jax.random.PRNGKey(0), x0,
                        jnp.zeros((1,), jnp.int32), cond0)["params"]
        restored = ckpt_lib.load_checkpoint(
            os.path.join(args_t.save_dir, f"model{cli.ckpt:09d}"),
            {"ema_params": tmpl, "params": tmpl},
        )
        params = restored[
            "ema_params" if cli.curve_stream == "ema" else "params"
        ]

    ev = eval_model(
        args_t, eval_ds, evaluator, params,
        num_samples=cli.samples, num_seeds=cli.seeds,
        guidance=cli.guidance if cli.row != "oracle" else 1.0,
        respacing=cli.respacing, oracle=cli.row == "oracle",
        seed_start=cli.seed_start,
    )
    payload = {
        "row": cli.row, "ckpt": cli.ckpt, "guidance": cli.guidance,
        "samples": cli.samples, "seeds": cli.seeds,
        "seed_start": cli.seed_start, "respacing": cli.respacing,
        "curve_stream": cli.curve_stream,
        "seconds": round(time.time() - t0, 1),
        "eval": ev,
    }
    os.makedirs(os.path.dirname(os.path.abspath(cli.out)), exist_ok=True)
    with open(cli.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {cli.out} in {payload['seconds']}s", flush=True)


if __name__ == "__main__":
    main()
