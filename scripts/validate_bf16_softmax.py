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
"""

from __future__ import annotations

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


def main():
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "bf16_softmax_study.json",
    )
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
            "protocol": f"LEARNABLE synthetic chi3d {FRAMES}f "
                        "(make_action_clip, round-4 rerun), CMDM "
                        f"{LAYERS}L/D{LATENT} trained {TRAIN_STEPS} steps, "
                        "ST-GCN evaluator, 4 seeds x 2 splits, 1000-step "
                        "DDPM, same checkpoint both softmax modes",
            "learnable_task": True,
            "metrics": table,
        }, f, indent=1)
    log(f"wrote {out_path}")


if __name__ == "__main__":
    main()
