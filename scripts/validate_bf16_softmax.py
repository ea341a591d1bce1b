"""End-to-end fidelity check for REGENNET_BF16_SOFTMAX.

The default-on bf16 attention softmax is worth +14% sampling throughput
(docs/PERF.md) but was gated on fidelity validation. This script produces
the best evidence available without licensed assets: train a CMDM and an
ST-GCN evaluator on the LEARNABLE synthetic Chi3D task
(synthetic.make_action_clip — round-4 rerun; the round-3 run used
label-independent motion, so its evaluator sat at exact chance and a
bf16 effect on class-relevant structure would have been invisible), then
run the full multi-seed eval protocol twice — f32 vs bf16 softmax on the
SAME trained checkpoint — and compare FID/accuracy/diversity deltas
against the across-seed noise floor. Pass/fail context: accuracy rows
must sit far off chance (learnable task engaged) with deltas << seed
noise.

Run detached on the TPU:  nohup python -u scripts/validate_bf16_softmax.py \
    > /tmp/bf16sm.log 2>&1 &

Preferred (round 4+): point it at a finished capability-study workdir so the
comparison runs on THE committed capability checkpoint (EMA params, CFG
guidance 2.5 — the protocol whose numbers docs/capability_r4.json publishes)
instead of retraining a throwaway model:

    nohup python -u scripts/validate_bf16_softmax.py \
        --from_capability /tmp/cap_r4_XXXX > /tmp/bf16sm.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
from argparse import Namespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/jax_regennet"),
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from regennet_tpu.data import synthetic  # noqa: E402
from regennet_tpu.data.collate import ccollate  # noqa: E402
from regennet_tpu.data.get_data import BatchLoader, get_dataset  # noqa: E402
from regennet_tpu.diffusion import DiffusionConfig, make_schedule  # noqa: E402
from regennet_tpu.eval import stgcn_eval, train_stgcn  # noqa: E402
from regennet_tpu.eval.stgcn_eval import STGCNEvaluator  # noqa: E402
from regennet_tpu.models.cmdm import CMDM, make_model_fn  # noqa: E402
from regennet_tpu.train.training_loop import make_optimizer, make_train_step  # noqa: E402

FRAMES = 60
LATENT, LAYERS, HEADS, FF = 256, 8, 4, 512
TRAIN_STEPS = 1500
BATCH = 32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def train_cmdm(data_path):
    data = get_dataset(
        name="chi3d", num_frames=FRAMES, num_person=2, data_path=data_path,
        split="train", setting="cmdm", pose_rep="rot6d", body_model="smplx",
    )
    model = CMDM(
        njoints=56, nfeats=6, num_actions=data.num_actions, num_frames=FRAMES,
        latent_dim=LATENT, ff_size=FF, num_layers=LAYERS, num_heads=HEADS,
        arch="online", cm_mode="concat", cond_mode="action",
        cond_mask_prob=0.1,
    )
    sched = make_schedule("cosine", 1000)
    cfg = DiffusionConfig(model_mean_type="start_x", lambda_vel=1.0)
    optimizer = make_optimizer(1e-4, 0.0, 0)
    rng = jax.random.PRNGKey(0)
    shape = (BATCH, 56, 6, FRAMES)
    x0 = jnp.zeros(shape)
    cond0 = {"cmotion": x0, "action": jnp.zeros((BATCH, 1), jnp.int32)}
    params = model.init(rng, x0, jnp.zeros((BATCH,), jnp.int32), cond0)["params"]
    state = dict(
        params=params, opt_state=optimizer.init(params),
        ema_params=jax.tree_util.tree_map(jnp.array, params),
        step=jnp.zeros((), jnp.int32),
    )
    step = jax.jit(
        make_train_step(model, sched, cfg, optimizer, None, num_timesteps=1000),
        donate_argnums=(0,),
    )
    loader = BatchLoader(data, BATCH, ccollate, seed=0)
    it = iter(loader)
    nsteps = 0
    while nsteps < TRAIN_STEPS:
        try:
            motion, mk = next(it)
        except StopIteration:
            it = iter(loader)
            continue
        if motion.shape[0] != BATCH:
            continue
        y = mk["y"]
        t = np.random.randint(0, 1000, (BATCH,))
        batch = {
            "motion": jnp.asarray(motion),
            "t": jnp.asarray(t, jnp.int32),
            "weights": jnp.ones((BATCH,)),
            "cond": {
                "mask": jnp.asarray(y["mask"]),
                "cmotion": jnp.asarray(y["cmotion"]),
                "action": jnp.asarray(y["action"]),
            },
        }
        state, metrics = step(state, batch, jax.random.fold_in(rng, nsteps))
        if nsteps % 250 == 0:
            log(f"cmdm step {nsteps}: loss {float(metrics['loss']):.4f}")
        nsteps += 1
    log(f"cmdm final loss {float(metrics['loss']):.4f}")
    return model, jax.device_get(state["params"]), sched


def train_classifier(data_path, save_dir):
    args = Namespace(
        seed=0, dataset="chi3d", num_frames=FRAMES, data_path=data_path,
        pose_rep="rot6d", body_model="smplx", batch_size=16, lr=1e-3,
        num_epochs=20, save_every=100, save_dir=save_dir,
    )
    variables = train_stgcn.run_training(args)
    return variables


def run_eval(model, params, sched, data, evaluator, tag):
    eval_model = CMDM(
        njoints=56, nfeats=6, num_actions=data.num_actions, num_frames=FRAMES,
        latent_dim=LATENT, ff_size=FF, num_layers=LAYERS, num_heads=HEADS,
        arch="online", cm_mode="concat", cond_mode="action",
        cond_mask_prob=0.1, dtype=jnp.bfloat16,
    )
    cfg = DiffusionConfig(model_mean_type="start_x")
    args = Namespace(batch_size=32, num_samples=64, num_seeds=4,
                     eval_seed_batch=4)
    res = stgcn_eval.evaluate(
        args, lambda: make_model_fn(eval_model, params), sched, cfg, data,
        evaluator, setting="cmdm", acc_only=False,
    )
    log(f"=== {tag} ===")
    for k, vals in res["feats"].items():
        arr = np.asarray([float(v) for v in vals])
        log(f"{tag} {k}: mean {arr.mean():.4f} std {arr.std():.4f} {vals}")
    return res


def eval_capability(workdir, guidance=2.5, num_samples=64, num_seeds=4):
    """Paired f32/bf16-softmax eval on a finished capability-study workdir:
    same EMA checkpoint, same ST-GCN evaluator, bf16 eval model (the dtype
    the flag affects — it is a no-op on f32 models), CFG guidance. Each
    variant is traced fresh AFTER flipping the env flag (jit caches by
    function identity — CLAUDE.md)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from capability_study import eval_model, train_args

    from regennet_tpu.data.get_data import get_dataset
    from regennet_tpu.eval import eval_cmdm
    from regennet_tpu.train import checkpoint as ckpt_lib
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    ds = os.path.join(workdir, "ds", "chi3d_train.h5")
    args_t = train_args(ds, os.path.join(workdir, "cmdm_save"), "full")
    # the flag under test only engages on bf16 models: evaluate the trained
    # params under the shipped bf16 compute dtype
    args_t.compute_dtype = "bfloat16"
    eval_ds = get_dataset(
        name="chi3d", num_frames=args_t.num_frames, num_person=2,
        data_path=ds, split="test", setting="cmdm", pose_rep="rot6d",
        body_model="smplx",
    )
    ea = Namespace(**vars(args_t))
    ea.dataset = "chi3d"
    evaluator = eval_cmdm.load_stgcn_evaluator(
        ea, os.path.join(workdir, "stgcn_save", "model000009999"))

    # EMA params from the last training checkpoint (what capability_r4
    # evaluates)
    ea2 = Namespace(**vars(args_t))
    ea2.num_actions = eval_ds.num_actions
    model, _, _ = create_model_and_diffusion(ea2, eval_ds)
    x = jnp.zeros((1, model.njoints, model.nfeats, args_t.num_frames))
    cond0 = {"cmotion": x, "action": jnp.zeros((1, 1), jnp.int32)}
    tmpl = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32),
                      cond0)["params"]
    # the checkpoint the capability artifact published (curve-selected
    # step), falling back to the last checkpoint if the artifact is absent
    cap_art = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "capability_r4.json")
    chosen = None
    if os.path.exists(cap_art):
        with open(cap_art) as f:
            chosen = json.load(f).get("selection", {}).get("chosen_step")
    if chosen is not None:
        last = f"model{int(chosen):09d}"
    else:
        last = sorted(d for d in os.listdir(args_t.save_dir)
                      if d.startswith("model"))[-1]
    ema = ckpt_lib.load_checkpoint(
        os.path.join(args_t.save_dir, last), {"ema_params": tmpl}
    )["ema_params"]
    log(f"capability checkpoint: {last} (EMA params), guidance {guidance}")

    results = {}
    for flag, tag in (("0", "f32_softmax"), ("1", "bf16_softmax")):
        os.environ["REGENNET_BF16_SOFTMAX"] = flag
        res = eval_model(args_t, eval_ds, evaluator, ema, num_samples,
                         num_seeds, guidance)
        log(f"=== {tag} ===")
        for k, vals in res["feats"].items():
            arr = np.asarray([float(v) for v in vals])
            log(f"{tag} {k}: mean {arr.mean():.4f} std {arr.std():.4f}")
        results[tag] = res
    protocol = (
        f"LEARNABLE synthetic chi3d {args_t.num_frames}f capability-study "
        f"checkpoint ({last}, EMA params, CMDM {args_t.layers}L/"
        f"D{args_t.latent_dim}), bf16 eval model, CFG guidance {guidance}, "
        f"ST-GCN evaluator, {num_seeds} seeds x 2 splits, eval_cmdm "
        "protocol, same checkpoint both softmax modes"
    )
    return results["f32_softmax"], results["bf16_softmax"], protocol


def main():
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "bf16_softmax_study.json",
    )
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--from_capability", default="",
                    help="finished capability-study workdir; skips training "
                         "and compares on its committed checkpoint")
    cli = ap.parse_args()
    if cli.from_capability:
        res_f32, res_bf16, protocol = eval_capability(cli.from_capability)
        write_table(out_path, res_f32, res_bf16, protocol)
        return
    root = tempfile.mkdtemp(prefix="bf16sm_")
    data_path = synthetic.make_dataset_pair(root, "chi3d", num_clips=128,
                                            learnable=True,
                                            min_len=FRAMES + 10,
                                            max_len=FRAMES + 40)
    log(f"dataset at {data_path}")
    data = get_dataset(
        name="chi3d", num_frames=FRAMES, num_person=2, data_path=data_path,
        split="test", setting="cmdm", pose_rep="rot6d", body_model="smplx",
    )

    model, params, sched = train_cmdm(data_path)
    cls_vars = train_classifier(data_path, os.path.join(root, "stgcn"))
    evaluator = STGCNEvaluator("chi3d", "smplx", data.num_actions, 12, 2,
                               dict(cls_vars))

    os.environ["REGENNET_BF16_SOFTMAX"] = "0"
    res_f32 = run_eval(model, params, sched, data, evaluator, "f32_softmax")
    os.environ["REGENNET_BF16_SOFTMAX"] = "1"
    res_bf16 = run_eval(model, params, sched, data, evaluator, "bf16_softmax")
    write_table(
        out_path, res_f32, res_bf16,
        f"LEARNABLE synthetic chi3d {FRAMES}f (make_action_clip, round-4 "
        f"rerun), CMDM {LAYERS}L/D{LATENT} trained {TRAIN_STEPS} steps, "
        "ST-GCN evaluator, 4 seeds x 2 splits, 1000-step DDPM, same "
        "checkpoint both softmax modes",
    )


def write_table(out_path, res_f32, res_bf16, protocol):
    log("=== deltas (bf16 - f32, vs f32 seed std) ===")
    table = {}
    for k in res_f32["feats"]:
        a = np.asarray([float(v) for v in res_f32["feats"][k]])
        b = np.asarray([float(v) for v in res_bf16["feats"][k]])
        std = max(a.std(), 1e-9)
        log(f"{k}: f32 {a.mean():.4f} bf16 {b.mean():.4f} "
            f"delta {b.mean() - a.mean():+.4f} ({(b.mean() - a.mean()) / std:+.2f} sigma)")
        table[k] = {
            "f32_per_seed": [float(v) for v in res_f32["feats"][k]],
            "bf16_per_seed": [float(v) for v in res_bf16["feats"][k]],
            "f32_mean": float(a.mean()), "bf16_mean": float(b.mean()),
            "delta": float(b.mean() - a.mean()),
            "delta_sigma": float((b.mean() - a.mean()) / std),
        }
    import json

    with open(out_path, "w") as f:
        json.dump({
            "protocol": protocol,
            "learnable_task": True,
            "metrics": table,
        }, f, indent=1)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
