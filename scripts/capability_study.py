"""End-to-end capability study: prove the composite system LEARNS.

Round-4 verdict item #1. Every prior in-env artifact ran on label-independent
synthetic motion, so the eval stack's one defining capability — that the
ST-GCN harness DISCRIMINATES trained models from bad ones (reference:
eval/a2m/stgcn_eval.py:120-205, eval/a2m/stgcn/{accuracy,fid}.py) — had
never been exercised in-framework. This study runs it for real, on the
learnable action-conditioned task (data/synthetic.py:make_action_clip):

 1. dataset: learnable chi3d-layout h5 pair (8 actions, actor mild /
    reactor strong signatures);
 2. evaluator: train the ST-GCN recognition classifier
    (eval/train_stgcn.py) — must reach >= 0.90 held-out GT accuracy;
 3. CMDM: train the action-conditioned online denoiser via
    train_mdm.main; checkpoints kept for the FID-vs-step curve;
 4. FID/accuracy-vs-step curve over the training checkpoints (verdict
    stretch #8: the reference's in-train eval as living evidence) — also
    the model-selection pass, mirroring the reference's practice of
    evaluating a chosen model######.pt snapshot;
 5. headline eval: the eval_cmdm multi-seed protocol (identical protocol
    code; scale num_samples x num_seeds recorded in the artifact — pass
    --headline_samples/--headline_seeds to run at the reference's full
    1000 x 20) on the selected checkpoint, a random-init CMDM, AND an
    oracle row (GT reactor through the generated-side pipeline — the
    protocol's achievable ceiling, so the trained row is calibrated);
 6. verdicts + numbers -> docs/capability_r5.json.

Run:   python -u scripts/capability_study.py [--scale full|smoke|smokefit] \
           [--backend cpu|default]
CPU smoke (~4 min, 8-dev virtual mesh) validates the plumbing; smokefit
(~6 min CPU) is the smallest scale that measurably LEARNS and backs the
suite's composite regression test; the committed artifact comes from a
full run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from argparse import Namespace

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(f"[capability] {msg}", file=sys.stderr, flush=True)


def train_args(ds_path, save_dir, scale):
    """scale: 'full' (the TPU study), 'smoke' (plumbing-only, ~4 min CPU),
    'smokefit' (smallest config that measurably LEARNS on CPU — the
    suite's composite train->sample->eval regression guard)."""
    full = scale == "full"
    fit = scale == "smokefit"
    return Namespace(
        cuda=True, device=0, seed=10,
        batch_size=64 if full else (32 if fit else 8),
        use_ddim=False, timestep_respacing="", noise_schedule="cosine",
        diffusion_steps=1000 if full else 50, sigma_small=True,
        setting="cmdm", arch="online", emb_trans_dec=False,
        wo_pos_emb=False, cm_mode="concat",
        layers=4 if full else 2,
        latent_dim=128 if full else (64 if fit else 32),
        cond_mask_prob=0.1,
        lambda_rcxyz=0.0, lambda_vel=0.0, lambda_fc=0.0, lambda_orient=0.0,
        lambda_body=0.0, lambda_transl=0.0, unconstrained=False,
        dataset="chi3d", data_dir="", num_person=2, data_path=ds_path,
        pose_rep="rot6d", body_model="smplx", vel_threshold=0.01,
        shuffle=True, save_dir=save_dir, overwrite=True,
        train_platform_type="NoPlatform", lr=1e-4 if full else 1e-3,
        # Hyperparameters pinned by the r4 pilot matrix (gen-acc on the
        # held-out split through the full protocol):
        #   256 clips / 8k steps / const lr:   peaked 0.635 @4k, degraded
        #                                      (overfit onset ~1000 epochs)
        #   1024 clips / 8k steps / const lr:  0.427 @r100 and still
        #                                      improving (ckpt 6008 read
        #                                      0.544 at r250)
        #   512 clips / 12k steps / 10k ANNEAL: peaked only 0.302 @8008 —
        #                                      the anneal starves late
        #                                      learning on this task, so
        #                                      it is NOT used (the
        #                                      reference default is also
        #                                      lr_anneal_steps=0)
        # => 1024 clips, 12k steps, constant lr 1e-4. The EMA stream
        # (0.999, ~1000-step horizon) is what gets evaluated — it read
        # +0.02 over raw final params in the anneal run — matching the
        # reference, which maintains the same EMA stream (hardcoded
        # 0.9999 for 600k-step runs — reference: train/training_loop.py:42).
        weight_decay=0.0, lr_anneal_steps=0,
        ema_rate=0.999 if full else 0.99,
        eval_batch_size=32,
        eval_split="test", eval_during_training=False, eval_rep_times=3,
        eval_num_samples=1000, log_interval=500 if full else (100 if fit else 10),
        save_interval=2000 if full else (400 if fit else 10),
        num_steps=12000 if full else (800 if fit else 20),
        # the learnable task's frequency signatures are band-separated to
        # resolve inside >=24-frame windows (data/synthetic.make_action_clip)
        # — smokefit must sit at 24, not the plumbing-smoke 16
        num_frames=60 if full else (24 if fit else 16), resume_checkpoint="",
        data_parallel=-1, tensor_parallel=1, compute_dtype="float32",
        steps_per_call=8 if full else 2,
    )


def eval_model(args_t, data, evaluator, params_or_none, num_samples,
               num_seeds, guidance, respacing=None, oracle=False,
               seed_start=0):
    """One eval_cmdm protocol run for a given parameter set (None =
    random-init). respacing=None keeps the default ("100" when the model
    was trained with >=1000 diffusion steps); pass "" for the reference's
    full-schedule eval protocol (its --timestep_respacing default is "" —
    reference: utils/parser_util.py:98) or any respacing string.
    oracle=True skips sampling and routes the GT reactor motion through
    the generated-side pipeline (stgcn_eval oracle mode) — the protocol's
    achievable ceiling."""
    import jax
    import jax.numpy as jnp

    from regennet_tpu.eval import eval_cmdm
    from regennet_tpu.models.cmdm import make_cfg_model_fn, make_model_fn
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    ea = Namespace(**vars(args_t))
    # protocol batch 32 (reference: eval/eval_cmdm.py:50), clamped so the
    # drop_last loaders keep at least one batch at smoke scale
    ea.batch_size = min(32, num_samples)
    ea.num_samples = num_samples
    ea.num_seeds = num_seeds
    ea.seed_start = seed_start
    ea.eval_mode = "full"
    ea.num_actions = data.num_actions
    ea.guidance_param = guidance
    # eval-time respacing for sampling cost (the reference supports the
    # same acceleration: respaced SpacedDiffusion — SURVEY.md §3.3)
    if respacing is None:
        respacing = "100" if args_t.diffusion_steps >= 1000 else ""
    ea.timestep_respacing = respacing
    model, sched, cfg = create_model_and_diffusion(ea, data)
    x = jnp.zeros((1, model.njoints, model.nfeats, ea.num_frames))
    cond = {"cmotion": x, "action": jnp.zeros((1, 1), jnp.int32)}
    init_params = model.init(jax.random.PRNGKey(0), x,
                             jnp.zeros((1,), jnp.int32), cond)["params"]
    params = params_or_none if params_or_none is not None else init_params

    def model_fn_builder():
        if guidance != 1.0:
            return make_cfg_model_fn(model, params, guidance)
        return make_model_fn(model, params)

    return eval_cmdm.evaluate(ea, model_fn_builder, sched, cfg, data,
                              evaluator, oracle=oracle)


def summarize(eval_dict):
    """mean/min/max across seeds for each metric key."""
    import numpy as np

    out = {}
    for k, vals in eval_dict["feats"].items():
        arr = np.asarray([float(v) for v in vals])
        out[k] = {"mean": float(arr.mean()), "min": float(arr.min()),
                  "max": float(arr.max()), "n_seeds": len(arr)}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="full",
                    choices=["full", "smoke", "smokefit"])
    ap.add_argument("--backend", default="default",
                    choices=["default", "cpu"])
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "capability_r5.json"))
    ap.add_argument("--workdir", default="")
    ap.add_argument("--eval_only", default="",
                    help="finished study workdir: reuse its dataset, "
                         "trained evaluator and CMDM checkpoints; re-run "
                         "only the curve + selection + headline phases")
    ap.add_argument("--headline_samples", type=int, default=0,
                    help="headline-eval num_samples (0 = scale default; "
                         "the reference full protocol is 1000 — "
                         "reference: eval/eval_cmdm.py:58-61)")
    ap.add_argument("--headline_seeds", type=int, default=0,
                    help="headline-eval num_seeds (0 = scale default; "
                         "the reference full protocol is 20)")
    ap.add_argument("--clips", type=int, default=0,
                    help="train-split clip count (0 = scale default); the "
                         "test split is clips/2, which caps num_samples "
                         "for the test-split metrics")
    cli = ap.parse_args()
    full = cli.scale == "full"

    if cli.backend == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if cli.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.expanduser("~/.cache/jax_regennet"),
    )
    log(f"backend: {jax.default_backend()} devices={jax.device_count()}")

    import numpy as np

    import tempfile

    workdir = cli.eval_only or cli.workdir or tempfile.mkdtemp(prefix="cap_r4_")
    os.makedirs(workdir, exist_ok=True)
    eval_only = bool(cli.eval_only)
    t00 = time.time()
    results = {
        "study": "capability_r5",
        "backend": jax.default_backend(),
        "scale": cli.scale,
        "protocol": {
            "task": "learnable synthetic chi3d (make_action_clip): "
                    "per-action frequency/interaction/direction signatures, "
                    "actor mild / reactor strong",
            "eval": "eval_cmdm/stgcn_eval multi-seed protocol, identical "
                    "code path; scale reduced vs the reference's "
                    "1000 samples x 20 seeds (values below)",
        },
    }

    # ---- 1. dataset -----------------------------------------------------
    if eval_only:
        ds_path = os.path.join(workdir, "ds", "chi3d_train.h5")
        assert os.path.exists(ds_path), f"--eval_only: {ds_path} missing"
        import h5py

        with h5py.File(ds_path, "r") as f:
            n_clips = len(f)
        results["dataset"] = {"num_clips_train": n_clips,
                              "num_clips_test": "reused",
                              "num_actions": 8,
                              "path_layout": "chi3d h5 pair (reused)"}
    else:
        from regennet_tpu.data import synthetic

        fit = cli.scale == "smokefit"
        n_clips = cli.clips or (1024 if full else (256 if fit else 32))
        ds_path = synthetic.make_dataset_pair(
            os.path.join(workdir, "ds"), "chi3d", num_clips=n_clips,
            learnable=True, min_len=70 if full else (32 if fit else 24),
            max_len=110 if full else (48 if fit else 40),
        )
        results["dataset"] = {"num_clips_train": n_clips,
                              "num_clips_test": max(n_clips // 2, 4),
                              "num_actions": 8,
                              "path_layout": "chi3d h5 pair"}
    log(f"dataset at {ds_path}")

    # ---- 2. evaluator ---------------------------------------------------
    from regennet_tpu.eval.train_stgcn import run_training

    stgcn_dir = os.path.join(workdir, "stgcn_save")
    fit = cli.scale == "smokefit"
    nf = 60 if full else (24 if fit else 16)
    # smokefit: a reduced 4-block classifier — the 10-block default
    # memorizes a 256-clip CPU-scale dataset without generalizing (probe:
    # train acc 1.0 / test acc 0.125 at 64 clips) and costs ~6x the time;
    # the protocol/parity paths keep the reference-size default
    fit_size = dict(stgcn_channels=(32, 32, 64, 64),
                    stgcn_strides=(1, 1, 2, 1)) if fit else {}
    stgcn_args = Namespace(
        dataset="chi3d", data_path=ds_path, pose_rep="rot6d",
        body_model="smplx", glob=True, translation=True, num_frames=nf,
        batch_size=32, lr=1e-3,
        num_epochs=20 if full else (10 if fit else 3),
        save_every=1000, save_dir=stgcn_dir, seed=0, **fit_size,
        # snapshot selection: Adam at lr 1e-3 can spike on a late epoch
        # (run-3 pilot: 15 epochs at test acc 1.000, then 0.125 after one
        # outlier update on the final epoch) — take the best epoch, as the
        # reference does by choosing among per-epoch snapshots
        keep_best=True,
    )
    import jax.numpy as jnp

    from regennet_tpu.data.collate import collate
    from regennet_tpu.data.get_data import BatchLoader, get_dataset
    from regennet_tpu.models.stgcn import STGCN
    from regennet_tpu.train import checkpoint as ckpt_lib

    sg_size = (dict(channels=fit_size["stgcn_channels"],
                    strides=fit_size["stgcn_strides"]) if fit else {})
    model_sg = STGCN(in_channels=12, num_class=8, num_person=2,
                     layout="smplx", strategy="spatial",
                     edge_importance_weighting=True, **sg_size)
    t0 = time.time()
    if eval_only:
        rec_path = os.path.join(stgcn_dir, "model000009999")
        test_ds_probe = get_dataset(
            name="chi3d", num_frames=nf, num_person=2, data_path=ds_path,
            split="test", setting="mdm", pose_rep="rot6d",
            body_model="smplx",
        )
        motion0, _ = next(iter(BatchLoader(test_ds_probe, 2, collate,
                                           shuffle=False, drop_last=False)))
        import jax as _jax

        tmpl = model_sg.init(_jax.random.PRNGKey(0),
                             {"output": jnp.asarray(motion0)})
        variables = ckpt_lib.load_checkpoint(rec_path, dict(tmpl))
    else:
        variables = run_training(stgcn_args)
        rec_path = ckpt_lib.save_checkpoint(stgcn_dir, 9999,
                                            dict(variables))

    # held-out GT accuracy of the (re)loaded evaluator
    test_ds = get_dataset(
        name="chi3d", num_frames=nf, num_person=2, data_path=ds_path,
        split="test", setting="mdm", pose_rep="rot6d", body_model="smplx",
    )
    loader = BatchLoader(test_ds, 32, collate, shuffle=False,
                         drop_last=False)
    accs = []
    for motion, cond in loader:
        out = model_sg.apply(variables, {"output": jnp.asarray(motion)})
        labels = jnp.asarray(cond["y"]["action"][:, 0])
        accs.append(np.asarray(jnp.argmax(out["yhat"], 1) == labels))
    gt_acc = float(np.concatenate(accs).mean())
    results["evaluator"] = {
        "gt_test_accuracy": gt_acc, "chance": 1 / 8,
        "epochs": stgcn_args.num_epochs,
        "threshold": 0.90,
        "pass": gt_acc >= (0.90 if full else (0.6 if fit else 0.2)),
        "seconds": round(time.time() - t0, 1),
    }
    log(f"evaluator GT test accuracy: {gt_acc:.3f} "
        f"({results['evaluator']['seconds']}s)")

    # ---- 3. CMDM training ------------------------------------------------
    args_t = train_args(ds_path, os.path.join(workdir, "cmdm_save"), cli.scale)
    common = {
        "batch_size": args_t.batch_size,
        "latent_dim": args_t.latent_dim, "layers": args_t.layers,
        "diffusion_steps": args_t.diffusion_steps,
        "steps_per_call": args_t.steps_per_call,
        "lr_anneal_steps": args_t.lr_anneal_steps,
        "ema_rate": args_t.ema_rate,
    }
    train_cfg_path = os.path.join(workdir, "cap_train_config.json")
    if eval_only:
        # checkpoint-restore template built exactly like eval_model's
        from regennet_tpu.utils.model_util import create_model_and_diffusion

        ea0 = Namespace(**vars(args_t))
        ea0.dataset = "chi3d"
        ea0.num_actions = 8
        mdl, _, _ = create_model_and_diffusion(ea0, test_ds)
        x0 = jnp.zeros((1, mdl.njoints, mdl.nfeats, args_t.num_frames))
        cond0 = {"cmotion": x0, "action": jnp.zeros((1, 1), jnp.int32)}
        import jax as _jax

        ema_params = mdl.init(_jax.random.PRNGKey(0), x0,
                              jnp.zeros((1,), jnp.int32), cond0)["params"]
        names = sorted(d for d in os.listdir(args_t.save_dir)
                       if d.startswith("model"))
        # provenance: the checkpoints may predate this script's current
        # hyperparameter block — report what the workdir RECORDS, not what
        # the current script would use
        if os.path.exists(train_cfg_path):
            with open(train_cfg_path) as f:
                recorded = json.load(f)
            results["cmdm_training"] = dict(
                recorded, steps=int(names[-1][5:]), reused=workdir)
        else:
            results["cmdm_training"] = {
                k: "reused/unknown (pre-provenance workdir)" for k in common
            }
            results["cmdm_training"].update(
                steps=int(names[-1][5:]), reused=workdir)
        log(f"CMDM checkpoints reused from {args_t.save_dir}")
    else:
        from regennet_tpu.train import train_mdm

        with open(train_cfg_path, "w") as f:
            json.dump(common, f, indent=1)  # provenance for --eval_only
        t0 = time.time()
        loop = train_mdm.main(args_t)
        train_secs = time.time() - t0
        # evaluate the EMA parameter stream. NOTE this is a documented
        # deviation from the reference: it maintains the same ema stream
        # (reference: train/training_loop.py:42) but save() writes only
        # mp_trainer.master_params to model######.pt (reference:
        # train/training_loop.py:321-336), so its released/evaluated
        # checkpoints are RAW params. EMA read +0.02 gen-acc over raw in
        # the anneal pilot; the curve below now records both streams.
        ema_params = jax.device_get(loop.state["ema_params"])
        results["cmdm_training"] = dict(
            common, steps=int(jax.device_get(loop.state["step"])),
            seconds=round(train_secs, 1))
        log(f"CMDM trained {results['cmdm_training']['steps']} steps "
            f"in {train_secs:.0f}s")

    # ---- eval setup --------------------------------------------------------
    from regennet_tpu.eval import eval_cmdm

    eval_ds = get_dataset(
        name="chi3d", num_frames=args_t.num_frames, num_person=2,
        data_path=ds_path, split="test", setting="cmdm",
        pose_rep="rot6d", body_model="smplx",
    )
    ea = Namespace(**vars(args_t))
    ea.dataset = "chi3d"
    if fit:
        # reduced-size evaluator: restore the trained snapshot through the
        # checkpoint round-trip, then wrap it directly (load_stgcn_evaluator
        # hardcodes the reference 10-block size)
        from regennet_tpu.eval.stgcn_eval import STGCNEvaluator

        tmpl_fit = model_sg.init(
            jax.random.PRNGKey(0),
            {"output": jnp.zeros((1, 56, 12, nf))}, train=False)
        vars_fit = ckpt_lib.load_checkpoint(rec_path, dict(tmpl_fit))
        evaluator = STGCNEvaluator(
            "chi3d", "smplx", 8, 12, 2, dict(vars_fit),
            channels=sg_size["channels"], strides=sg_size["strides"])
    else:
        evaluator = eval_cmdm.load_stgcn_evaluator(ea, rec_path)

    num_samples = cli.headline_samples or (128 if full else (32 if fit else 16))
    num_seeds = cli.headline_seeds or (3 if full else 1)
    guidance = 2.5 if full else 1.0
    # Headline evals sample at respacing 100 — the same protocol the
    # in-train curve uses, so checkpoint selection and the published
    # number share one protocol. The reference's eval default is the FULL
    # schedule (utils/parser_util.py:98); respacing is a documented
    # acceleration both frameworks support. Measured sensitivity on r4
    # checkpoints is ~±0.05 accuracy and direction varies by checkpoint
    # (ckpt6008/8k-run: 0.427@r100 vs 0.544@r250 vs 0.519@r1000;
    # ckpt8008/12k-run: 0.50@r100 vs 0.475@r250, and the bf16 fidelity
    # study read 0.58@r100 on the same checkpoint with 64 samples) — i.e.
    # within seed noise, not a systematic under-read.
    respacing = "100" if full else ""
    results["eval_protocol"] = {
        "num_samples": num_samples, "num_seeds": num_seeds,
        "guidance_param": guidance,
        "timestep_respacing": respacing,
        "batch_size": min(32, num_samples),
    }

    # ---- 4. FID-vs-step curve over training checkpoints -------------------
    # The curve runs FIRST: besides being the in-train-eval evidence
    # (verdict stretch #8), it is the model-selection pass — the reference
    # evaluates a CHOSEN model######.pt snapshot (eval_cmdm's --model_path
    # points at one checkpoint; the released models are selected
    # checkpoints), not blindly the last step, and on this task training
    # past the peak demonstrably degrades gen-accuracy (the 512-clip pilot
    # peaked 0.302 @8008 then fell to 0.229 @12000).
    curve = []
    ckpt_params = {}
    ckpts = sorted(
        d for d in os.listdir(args_t.save_dir) if d.startswith("model")
    )
    curve_n = min(64, num_samples)
    for name in ckpts:
        step = int(name.replace("model", ""))
        restored = ckpt_lib.load_checkpoint(
            os.path.join(args_t.save_dir, name),
            {"ema_params": ema_params, "params": ema_params},
        )
        ckpt_params[step] = restored["ema_params"]
        # the curve only needs to be internally consistent (selection +
        # improvement check), so it samples at the cheaper default
        # respacing ("100") with one seed
        ev = eval_model(args_t, eval_ds, evaluator, restored["ema_params"],
                        num_samples=curve_n, num_seeds=1,
                        guidance=guidance)
        s = summarize(ev)
        point = {"step": step}
        for k in ("fid_gen_test", "fid_gen_train", "accuracy_gen_test",
                  "accuracy_gen_train"):
            if k in s:
                point[k] = s[k]["mean"]
        # RAW-params row alongside EMA (full scale only): the r4 curve's
        # FID regression after its peak step was unexplained — if raw
        # degrades earlier/deeper than EMA, that's late-training overfit
        # that the ~1000-step-horizon EMA lags; if both degrade together
        # it's a sampler/selection artifact. (The reference evaluates raw
        # params — see the cmdm_training note above.)
        if full:
            ev_raw = eval_model(args_t, eval_ds, evaluator,
                                restored["params"], num_samples=curve_n,
                                num_seeds=1, guidance=guidance)
            s_raw = summarize(ev_raw)
            for k in ("fid_gen_test", "accuracy_gen_test"):
                if k in s_raw:
                    point[f"raw_{k}"] = s_raw[k]["mean"]
        curve.append(point)
        log(f"curve point {point}")
    results["fid_vs_step"] = curve

    # ---- 5. headline eval on the selected checkpoints ---------------------
    # Selection runs on the TRAIN-split generated-accuracy; the published
    # headline is the TEST-split numbers — so the model/knob choice never
    # reads the metric it publishes. Two knobs are selected over, both of
    # which the reference itself selects per-release: the checkpoint
    # (top-2 by curve train-split accuracy; eval_cmdm --model_path points
    # at one chosen model######.pt) and the CFG guidance strength
    # (--guidance_param; higher guidance sharpens class-conditioning at
    # some FID cost). Every candidate's numbers stay in the artifact.
    sel_key = "accuracy_gen_train"
    # tie-break on the TRAIN-split FID so selection never reads a
    # test-split metric (with 64 samples / 1 seed exact accuracy ties are
    # plausible, so the tie-break can actually fire)
    ranked = sorted(
        (p for p in curve if sel_key in p),
        key=lambda p: (-p[sel_key], p.get("fid_gen_train", 1e18)),
    )
    top2 = [p["step"] for p in ranked[:2]] or [int(ckpts[-1][5:])]
    guidances = (2.5, 3.5, 5.0) if full else (guidance,)
    results["selection"] = {
        "rule": "top-2 checkpoints by curve accuracy_gen_TRAIN (r100, "
                "1 seed), fid_gen_TRAIN tie-break; full protocol on each x "
                "guidance sweep; best by accuracy_gen_TRAIN published as "
                "'trained' (test-split numbers are never used for "
                "selection)",
        "candidates": top2,
        "guidance_sweep": list(guidances),
    }
    candidates = {}
    for step in top2:
        for g in guidances:
            t0 = time.time()
            ev = eval_model(args_t, eval_ds, evaluator, ckpt_params[step],
                            num_samples, num_seeds, g, respacing)
            candidates[(step, g)] = summarize(ev)
            log(f"headline eval ckpt {step} g={g} done in "
                f"{time.time() - t0:.0f}s (acc_gen_train "
                f"{candidates[(step, g)]['accuracy_gen_train']['mean']:.3f}"
                f" / acc_gen_test "
                f"{candidates[(step, g)]['accuracy_gen_test']['mean']:.3f})")
    best_step, best_g = max(
        candidates,
        key=lambda k: candidates[k]["accuracy_gen_train"]["mean"],
    )
    results["selection"]["chosen_step"] = best_step
    results["selection"]["chosen_guidance"] = best_g
    results["selection"]["candidate_headline"] = {
        f"ckpt{s}_g{g}": {k: candidates[(s, g)][k]["mean"]
                          for k in ("accuracy_gen_train",
                                    "accuracy_gen_test", "fid_gen_test")}
        for (s, g) in candidates
    }
    results["eval_protocol"]["guidance_param"] = best_g
    results["trained"] = candidates[(best_step, best_g)]

    t0 = time.time()
    ev_random = eval_model(args_t, eval_ds, evaluator, None,
                           num_samples, num_seeds, best_g, respacing)
    log(f"random-init eval done in {time.time() - t0:.0f}s")
    results["random_init"] = summarize(ev_random)

    # ---- 5b. oracle row: the protocol's achievable ceiling ----------------
    # GT reactor motion routed through the SAME generated-side pipeline
    # (ccollate windows, actor‖reactor concat, batch trim, evaluator) —
    # bounds what a perfect model could score, so the trained row reads as
    # "model gap" only above this, not protocol ceiling. Guidance is
    # irrelevant (no sampling); the multi-seed spread comes from the
    # per-seed reshuffle/window draws alone.
    t0 = time.time()
    ev_oracle = eval_model(args_t, eval_ds, evaluator, None,
                           num_samples, num_seeds, 1.0, respacing,
                           oracle=True)
    log(f"oracle eval done in {time.time() - t0:.0f}s")
    results["oracle"] = summarize(ev_oracle)

    # ---- 6. verdicts -------------------------------------------------------
    def metric(block, key):
        return results[block][key]["mean"] if key in results[block] else None

    acc_tr = metric("trained", "accuracy_gen_test")
    acc_rd = metric("random_init", "accuracy_gen_test")
    fid_tr = metric("trained", "fid_gen_test")
    fid_rd = metric("random_init", "fid_gen_test")
    acc_or = metric("oracle", "accuracy_gen_test")
    fid_or = metric("oracle", "fid_gen_test")
    if acc_or:
        results["calibration"] = {
            "note": "oracle = GT reactor through the generated-side "
                    "pipeline; the trained-vs-oracle gap is MODEL quality, "
                    "the oracle-vs-1.0 gap is protocol ceiling "
                    "(windowing/concat/evaluator)",
            "trained_over_oracle_accuracy": (acc_tr or 0.0) / acc_or,
            "oracle_accuracy_gen_test": acc_or,
            "oracle_fid_gen_test": fid_or,
            "trained_fid_gen_test": fid_tr,
        }
    checks = {
        "evaluator_gt_acc>=0.90": results["evaluator"]["pass"],
        "accuracy_gen_trained>4x_chance": (acc_tr or 0) > 0.5,
        "accuracy_gen_trained>>random": (acc_tr or 0) > (acc_rd or 0) + 0.2,
        "fid_gen_trained<<random": (
            fid_tr is not None and fid_rd is not None
            and fid_tr < 0.25 * fid_rd
        ),
        "fid_curve_improves": (
            len(curve) >= 2
            and curve[-1].get("fid_gen_test", 1e9)
            < curve[0].get("fid_gen_test", 0) * 0.8
        ),
        # the oracle bounds the protocol: trained must sit at/below it
        # (within seed noise), and the gen-side pipeline must preserve the
        # label signal (GT motion through it stays far above chance)
        "oracle_is_ceiling": (
            acc_or is not None and (acc_tr or 0.0) <= acc_or + 0.05
        ),
        "oracle_preserves_signal": (acc_or or 0.0) >= 0.75,
    }
    if cli.scale == "smokefit":
        # the suite's composite regression guard: direction, not quality —
        # a trained model must beat random through the FULL
        # train->sample->eval pipeline even at CPU-smoke scale
        checks = {
            "evaluator_pass": results["evaluator"]["pass"],
            "trained_acc_above_chance": (acc_tr or 0.0) > 1 / 8 + 0.10,
            "trained_acc_above_random": (acc_tr or 0.0) > (acc_rd or 0.0),
            "trained_fid_much_below_random": (
                fid_tr is not None and fid_rd is not None
                and fid_tr < 0.25 * fid_rd
            ),
            "oracle_preserves_signal": (acc_or or 0.0) >= 0.5,
        }
    elif not full:  # smoke validates plumbing, not learning quality
        checks = {"smoke_plumbing_only": True}
    results["checks"] = checks
    results["ok"] = all(checks.values())
    results["total_seconds"] = round(time.time() - t00, 1)
    results["workdir"] = workdir

    with open(cli.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: results[k] for k in
                      ("ok", "checks", "total_seconds")}, indent=1))
    log(f"wrote {cli.out}")
    return 0 if results["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
