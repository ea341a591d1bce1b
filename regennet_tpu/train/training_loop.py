"""Training runtime (L5): one jitted train step over a device mesh.

Re-design of the reference TrainLoop (reference: train/training_loop.py:30-390)
for the TPU execution model:

* forward + all losses (including the on-device LBS joint decode) + backward
  + AdamW update + EMA fuse into ONE jitted program; the reference's
  per-step Python orchestration (zero_grad/backward/DDP bucket allreduce/
  optimizer step) disappears into XLA.
* data parallelism = batch sharding over the mesh 'data' axis; gradient
  psum is inserted by GSPMD — no DDP wrapper, no NCCL, no param broadcast.
* optional tensor parallelism over the 'model' axis (see parallel.mesh).
* timestep importance sampling stays host-side (protocol parity with the
  reference schedule samplers), shipped with the batch.
* EMA params are actually maintained (the reference allocates but never
  updates them — SURVEY.md §2.6); rate 0.9999, saved with the checkpoint.
* checkpoint/resume via Orbax: step-stamped dirs + args.json contract.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regennet_tpu.diffusion import losses as diffusion_losses
from regennet_tpu.diffusion.resample import (
    LossAwareSampler,
    create_named_schedule_sampler,
)
from regennet_tpu.models.cmdm import CMDM
from regennet_tpu.ops import body_model as bm
from regennet_tpu.ops.pose_decode import make_rot2xyz
from regennet_tpu.parallel import mesh as mesh_lib
from regennet_tpu.train import checkpoint
from regennet_tpu.utils import kvlogger as logger


def make_optimizer(lr: float, weight_decay: float, lr_anneal_steps: int):
    """AdamW with the reference's linear anneal (lr * (1 - step/anneal))."""
    if lr_anneal_steps:
        schedule = optax.linear_schedule(lr, 0.0, lr_anneal_steps)
    else:
        schedule = lr
    return optax.adamw(schedule, weight_decay=weight_decay)


def make_train_step(
    model: CMDM,
    sched,
    cfg,
    optimizer,
    rot2xyz_fn,
    ema_rate: float = 0.9999,
    num_timesteps: int = 1000,
):
    """Build the jitted (state, batch, rng) -> (state, metrics) step."""

    def loss_fn(params, batch, rng):
        drng, crng, nrng = jax.random.split(rng, 3)

        def model_fn(x, t, cond):
            return model.apply(
                {"params": params}, x, t, cond, train=True,
                rngs={"dropout": drng, "cond_mask": crng},
            )

        terms = diffusion_losses.training_losses(
            sched, cfg, model_fn, batch["motion"], batch["t"], batch["cond"],
            nrng, rot2xyz_fn=rot2xyz_fn,
        )
        loss = jnp.mean(terms["loss"] * batch["weights"])
        return loss, terms

    def train_step(state, batch, rng):
        params, opt_state, ema_params, step = (
            state["params"], state["opt_state"], state["ema_params"], state["step"]
        )
        rng = jax.random.fold_in(rng, step)
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = jax.tree_util.tree_map(
            lambda e, p: e * ema_rate + p * (1.0 - ema_rate), ema_params, params
        )
        new_state = dict(
            params=params, opt_state=opt_state, ema_params=ema_params,
            step=step + 1,
        )

        # scalar diagnostics (reference: fp16_util.py:215-232 + logger quartiles)
        metrics = {k: jnp.mean(v * batch["weights"]) for k, v in terms.items()}
        metrics["loss"] = loss
        # raw per-element loss for the loss-aware schedule sampler update
        # (reference: training_loop.py:293-296 passes losses['loss'].detach());
        # popped from metrics before scalar logging
        metrics["loss_per_elem"] = terms["loss"]
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["param_norm"] = optax.global_norm(params)
        # per-quartile loss-vs-t tracking, computed on device
        quartile = (4 * batch["t"]) // num_timesteps
        weighted = terms["loss"] * batch["weights"]
        for q in range(4):
            sel = (quartile == q).astype(weighted.dtype)
            metrics[f"loss_q{q}"] = jnp.sum(weighted * sel) / jnp.maximum(
                jnp.sum(sel), 1.0
            )
        return new_state, metrics

    return train_step


def make_multi_train_step(step_fn):
    """Fuse K optimizer steps into ONE jitted device call.

    `lax.scan` of the single train step over batches stacked on a leading
    steps axis [K, B, ...]: K forward/backward/AdamW/EMA updates execute
    back-to-back on device with zero host round-trips between them, so the
    per-step dispatch latency (dominant on relay-attached or
    high-launch-latency deployments; see docs/PERF.md) is paid once per K
    steps. Per-step RNG stays correct without threading keys through the
    scan: the inner step folds the shared key with its own `state['step']`.

    Returns (state, stacked_batches, rng) -> (state, metrics) where every
    metrics leaf gains a leading [K] axis (per-step scalars preserved — the
    loop logs them individually). Absent in the reference, which runs one
    optimizer step per Python iteration (reference:
    train/training_loop.py:175-211)."""

    def multi_step(state, batches, rng):
        def body(carry, batch):
            return step_fn(carry, batch, rng)

        return jax.lax.scan(body, state, batches)

    return multi_step


class TrainLoop:
    def __init__(self, args, train_platform, model: CMDM, sched, cfg, data):
        self.args = args
        self.train_platform = train_platform
        self.model = model
        self.sched = sched
        self.cfg = cfg
        self.data = data
        self.batch_size = args.batch_size
        self.lr = args.lr
        self.log_interval = args.log_interval
        self.save_interval = args.save_interval
        self.resume_checkpoint = args.resume_checkpoint
        self.weight_decay = args.weight_decay
        self.lr_anneal_steps = args.lr_anneal_steps
        self.num_steps = args.num_steps
        self.save_dir = args.save_dir
        self.step = 0
        self.resume_step = 0

        self.mesh = mesh_lib.make_mesh(
            data=getattr(args, "data_parallel", -1),
            model=getattr(args, "tensor_parallel", 1),
        )
        self.global_batch = self.batch_size * jax.process_count()
        self.num_epochs = self.num_steps // (
            len(self.data) * jax.process_count() + 1
        )

        # the reference hardcodes 'uniform' (reference:
        # train/training_loop.py:94-95); the env knob exposes the
        # loss-second-moment resampler (and its cross-process loss allgather)
        # without changing the parity default
        self.schedule_sampler = create_named_schedule_sampler(
            os.environ.get("REGENNET_SCHEDULE_SAMPLER", "uniform"),
            sched.num_timesteps,
        )
        self._host_rng = np.random.default_rng(args.seed)

        body = bm.get_body_model(args.body_model)
        self.rot2xyz_fn = make_rot2xyz(
            body,
            pose_rep=args.pose_rep,
            jointstype=args.body_model,
            translation=True,
            glob=True,
            vertstrans=False,
            num_person=cfg.num_person,
        )

        self.optimizer = make_optimizer(
            self.lr, self.weight_decay, self.lr_anneal_steps
        )
        from regennet_tpu.utils.rng import training_key

        # one key for ALL processes: the jitted step takes the key as a
        # replicated argument, and SPMD requires replicated inputs to be
        # process-identical (noise/dropout diversity comes from the global
        # batch axis of the generated bits, not from per-process keys)
        self.rng = training_key(args.seed)
        self.state = self._init_or_resume_state()
        step_fn = make_train_step(
            model, sched, cfg, self.optimizer, self.rot2xyz_fn,
            ema_rate=float(getattr(args, "ema_rate", 0.9999)),
            num_timesteps=sched.num_timesteps,
        )
        # the NaN guard keeps the previous state alive to roll back to, which
        # is incompatible with donating it into the step
        self._nan_guard = bool(getattr(args, "nan_guard", False))
        self._nan_skips = 0
        donate = () if self._nan_guard else (0,)
        self._jitted_step = jax.jit(step_fn, donate_argnums=donate)
        # --steps_per_call K > 1: K steps fused into one device call.
        # Saves/eval shift to the first call boundary at-or-after their
        # configured step (checkpoints stay stamped with the true state
        # step); with --nan_guard a non-finite step rolls back the whole
        # K-step block.
        self.steps_per_call = max(1, int(getattr(args, "steps_per_call", 1)))
        if self.steps_per_call > 1 and isinstance(
            self.schedule_sampler, LossAwareSampler
        ):
            logger.log(
                f"WARNING: --steps_per_call {self.steps_per_call} with a "
                "loss-aware schedule sampler: timesteps for all K steps of "
                "a block are drawn up-front, so steps 2..K use an "
                "importance distribution up to K-1 updates stale (uniform "
                "sampling is unaffected)"
            )
        if self.steps_per_call > 1:
            self._jitted_multi_step = jax.jit(
                make_multi_train_step(step_fn), donate_argnums=donate
            )
        self._block_buf = []
        self._last_save_at = None  # self.step value (pre-increment) last saved

    # -- state ----------------------------------------------------------

    def _init_params(self):
        motion, cond = next(iter(self.data))
        x = jnp.asarray(motion[:1])
        cond_j = {
            # text-conditioned (humanml/kit) batches carry no actor stream;
            # the model still fuses a (zero) cmotion, matching the zero-
            # cmotion convention of the humanml sampling/eval paths
            "cmotion": (
                jnp.asarray(cond["y"]["cmotion"][:1])
                if "cmotion" in cond["y"] else jnp.zeros_like(x)
            ),
        }
        if "action" in cond["y"]:
            cond_j["action"] = jnp.asarray(cond["y"]["action"][:1])
        if "text" in self.model.cond_mode:
            cond_j["text_emb"] = jnp.zeros((1, 512), jnp.float32)
        init_rng, self.rng = jax.random.split(self.rng)
        params = self.model.init(
            {"params": init_rng, "dropout": init_rng, "cond_mask": init_rng},
            x, jnp.zeros((1,), jnp.int32), cond_j, train=False,
        )["params"]
        return params

    def _init_or_resume_state(self):
        params = self._init_params()
        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params)
        )
        logger.log(f"Model parameters: {n_params / 1e6:.2f}M")
        state = dict(
            params=params,
            opt_state=self.optimizer.init(params),
            # distinct buffers: the step donates the state, and donating the
            # same array through two tree leaves is invalid
            ema_params=jax.tree_util.tree_map(jnp.array, params),
            step=jnp.zeros((), jnp.int32),
        )
        resume = self.resume_checkpoint or checkpoint.latest_checkpoint(
            self.save_dir
        )
        if resume:
            logger.log(f"loading model from checkpoint: {resume}...")
            state = checkpoint.load_checkpoint(resume, state)
            self.resume_step = checkpoint.parse_step_from_path(resume)
        # place on mesh: params/ema follow the TP rules, the AdamW moments
        # mirror them, step replicated. --param_sharding fsdp additionally
        # shards every state leaf (params, EMA, mu/nu) over 'data' —
        # ZeRO-style, a GSPMD annotation rather than a wrapper class
        fsdp = getattr(self.args, "param_sharding", "replicated") == "fsdp"
        shardings = dict(
            params=mesh_lib.param_shardings(
                state["params"], self.mesh, fsdp=fsdp
            ),
            opt_state=mesh_lib.state_shardings(
                state["opt_state"], self.mesh, fsdp=fsdp
            ),
            ema_params=mesh_lib.param_shardings(
                state["ema_params"], self.mesh, fsdp=fsdp
            ),
            step=mesh_lib.replicated(self.mesh),
        )
        return jax.device_put(state, shardings)

    # -- stepping -------------------------------------------------------

    def _make_device_batch(self, motion, cond) -> Dict[str, Any]:
        return mesh_lib.shard_batch(
            self._make_host_batch(motion, cond), self.mesh
        )

    def _make_host_batch(self, motion, cond) -> Dict[str, Any]:
        t, weights = self.schedule_sampler.sample(
            motion.shape[0], self._host_rng
        )
        self._host_t = t  # local rows' timesteps, for the loss-aware update
        y = cond["y"]
        cond_j = {
            "mask": np.asarray(y["mask"]),
            "cmotion": (
                np.asarray(y["cmotion"]) if "cmotion" in y
                else np.zeros_like(np.asarray(motion))
            ),
        }
        if "action" in y:
            cond_j["action"] = np.asarray(y["action"])
        if "text" in self.model.cond_mode:
            from regennet_tpu.models.clip_text import encode_text_or_fallback

            cond_j["text_emb"] = encode_text_or_fallback(
                [str(t) for t in y.get("text", [""] * len(motion))]
            )
        return {
            "motion": np.asarray(motion),
            "t": t,
            "weights": weights,
            "cond": cond_j,
        }

    def _maybe_profile(self):
        """Capture a device trace for steps [profile_start, +profile_steps)
        when --profile_steps > 0 (SURVEY.md §5: the reference only has
        wall-clock profile_kv scopes; this wires real jax.profiler traces,
        viewable in TensorBoard/Perfetto)."""
        n = int(getattr(self.args, "profile_steps", 0) or 0)
        if n <= 0:
            return
        start = int(getattr(self.args, "profile_start", 10) or 0)
        import jax.profiler

        if self.step >= start and self.step < start + n and not getattr(
            self, "_profile_active", False
        ):
            self._profile_dir = os.path.join(self.save_dir, "profile")
            self._profile_active = True
            jax.profiler.start_trace(self._profile_dir)
        elif self.step >= start + n and getattr(self, "_profile_active", False):
            self._stop_profile()

    def _stop_profile(self):
        if getattr(self, "_profile_active", False):
            import jax.profiler

            self._profile_active = False
            jax.profiler.stop_trace()
            logger.log(f"profiler trace written to {self._profile_dir}")

    def run_step(self, motion, cond):
        batch = self._make_device_batch(motion, cond)
        prev_state = self.state if self._nan_guard else None
        self.state, metrics = self._jitted_step(self.state, batch, self.rng)
        loss_per_elem = metrics.pop("loss_per_elem")
        if self._nan_guard:
            # both checked: a finite loss can still come with overflowed
            # gradients, which would corrupt params past any later rollback
            loss = float(metrics["loss"])
            grad_norm = float(metrics["grad_norm"])
            if not (np.isfinite(loss) and np.isfinite(grad_norm)):
                # fault detection the reference lacks (SURVEY §5): a
                # non-finite step is dropped and the previous state restored
                self._nan_skips += 1
                logger.log(
                    f"WARNING: non-finite step (loss={loss}, "
                    f"grad_norm={grad_norm}) at step "
                    f"{self.step + self.resume_step}; dropping update "
                    f"({self._nan_skips} consecutive)"
                )
                self.state = prev_state
                if self._nan_skips > 50:
                    raise FloatingPointError(
                        "more than 50 consecutive non-finite training steps; "
                        "aborting"
                    )
                return {"nan_skipped": True}
            self._nan_skips = 0  # consecutive-skip semantics
        if isinstance(self.schedule_sampler, LossAwareSampler):
            # local timesteps + this process's rows of the per-element loss;
            # the sampler allgathers across processes internally
            self.schedule_sampler.update_with_local_losses(
                self._host_t, mesh_lib.host_local_slice(loss_per_elem, self.mesh)
            )
        return metrics

    def run_block(self, items):
        """K buffered (motion, cond) pairs -> ONE fused device call of K
        optimizer steps (--steps_per_call). Returns the per-step metrics
        dicts, in step order.

        Loss-aware sampling caveat: t/weights for all K batches are drawn
        up-front (the fused call has no host round-trips), so steps 2..K
        sample from an importance distribution up to K-1 updates staler
        than the reference's sample-step-update ordering (reference:
        train/training_loop.py:276 + diffusion/resample.py:60-104). The
        history itself is updated with every step's losses afterwards.
        Uniform sampling (the parity default) is unaffected."""
        K = len(items)
        host_batches, host_ts = [], []
        for motion, cond in items:
            host_batches.append(self._make_host_batch(motion, cond))
            host_ts.append(self._host_t)
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *host_batches
        )
        batch = mesh_lib.shard_batch(stacked, self.mesh, stacked=True)
        prev_state = self.state if self._nan_guard else None
        self.state, metrics = self._jitted_multi_step(
            self.state, batch, self.rng
        )
        loss_per_elem = metrics.pop("loss_per_elem")  # [K, B]
        if self._nan_guard:
            losses = np.asarray(jax.device_get(metrics["loss"]))
            grad_norms = np.asarray(jax.device_get(metrics["grad_norm"]))
            if not (np.all(np.isfinite(losses)) and np.all(np.isfinite(grad_norms))):
                # block-granular rollback: the fused call has no intermediate
                # states, so the whole K-step block is dropped
                self._nan_skips += 1
                logger.log(
                    f"WARNING: non-finite step inside the {K}-step block at "
                    f"step {self.step + self.resume_step} "
                    f"(losses={losses.tolist()}); dropping the block "
                    f"({self._nan_skips} consecutive)"
                )
                self.state = prev_state
                if self._nan_skips > 50:
                    raise FloatingPointError(
                        "more than 50 consecutive non-finite training "
                        "blocks; aborting"
                    )
                return [{"nan_skipped": True}] * K
            self._nan_skips = 0
        if isinstance(self.schedule_sampler, LossAwareSampler):
            for k in range(K):
                self.schedule_sampler.update_with_local_losses(
                    host_ts[k],
                    mesh_lib.host_local_slice(loss_per_elem[k], self.mesh),
                )
        return [
            {name: v[k] for name, v in metrics.items()} for k in range(K)
        ]

    def _steps_remaining(self) -> int:
        """Steps until num_steps / lr_anneal_steps stop the loop."""
        rem = self.num_steps - (self.step + self.resume_step)
        if self.lr_anneal_steps:
            rem = min(
                rem, self.lr_anneal_steps - (self.step + self.resume_step)
            )
        return rem

    def run_loop(self):
        start = time.time()
        K = self.steps_per_call
        for epoch in range(max(self.num_epochs, 1)):
            logger.log(f"Starting epoch {epoch}:{self.num_epochs}")
            for motion, cond in self.data:
                if self._steps_remaining() <= 0:
                    break
                self._maybe_profile()
                if K > 1 and self._steps_remaining() >= K:
                    self._block_buf.append((motion, cond))
                    if len(self._block_buf) < K:
                        continue
                    per_step = self.run_block(self._block_buf)
                    self._block_buf = []
                else:
                    per_step = [self.run_step(motion, cond)]
                if self._bookkeep(per_step, start):
                    return  # DIFFUSION_TRAINING_TEST early-exit
            # epoch boundary: flush a partial block with single steps
            for motion, cond in self._block_buf:
                if self._steps_remaining() <= 0:
                    break
                if self._bookkeep([self.run_step(motion, cond)], start):
                    return
            self._block_buf = []
            if self.step + self.resume_step >= self.num_steps:
                break
        self._stop_profile()  # in case the run ended mid-window
        if self._last_save_at != self.step - 1:
            self.save()
            self.evaluate()

    def _bookkeep(self, per_step_metrics, start) -> bool:
        """Per-step logging + boundary save/eval for one completed device
        call (a single step, or a --steps_per_call block). Returns True when
        the DIFFUSION_TRAINING_TEST hook requests an early exit."""
        first = self.step
        for metrics in per_step_metrics:
            if metrics.get("nan_skipped"):
                # dropped update: no scalar logging (NaNs would poison
                # logkv_mean / platform scalars), no step advance
                continue

            if self.step % self.log_interval == 0:
                metrics = jax.device_get(metrics)
                for k, v in metrics.items():
                    logger.logkv_mean(k, float(v))
                    if k == "loss":
                        logger.log(
                            f"step[{self.step + self.resume_step}]: "
                            f"loss[{float(v):0.5f}]"
                        )
                    self.train_platform.report_scalar(
                        name=k, value=float(v),
                        iteration=self.step, group_name="Loss",
                    )
                logger.logkv("step", self.step + self.resume_step)
                logger.logkv(
                    "samples",
                    (self.step + self.resume_step + 1) * self.global_batch,
                )
                logger.logkv(
                    "steps_per_sec",
                    (self.step + 1) / max(time.time() - start, 1e-9),
                )
                logger.dumpkvs()
            self.step += 1

        # save at the call boundary when any step in [first, self.step)
        # crossed a save_interval multiple — for steps_per_call == 1 this is
        # exactly the reference's per-step condition; for K > 1 the save
        # shifts to the block end (the checkpoint is stamped with the true
        # state step either way)
        crossings = [
            s for s in range(first, self.step) if s % self.save_interval == 0
        ]
        if crossings:
            self.save()
            self.evaluate()
            self._last_save_at = self.step - 1
            # early-exit only when a CROSSING step was > 0 (reference:
            # train/training_loop.py:209-211 tests the pre-increment step) —
            # testing the post-increment counter would make the very first
            # K>1 block (which contains the step-0 crossing) exit
            # immediately, unlike the single-step path
            if os.environ.get("DIFFUSION_TRAINING_TEST", "") and any(
                s > 0 for s in crossings
            ):
                return True
        return False

    def evaluate(self):
        """In-training evaluation (reference: train/training_loop.py:220-257).

        For the a2m datasets this runs the debug-scale harness (accuracy
        against a recognition checkpoint given via REGENNET_REC_MODEL_PATH or
        args.rec_model_path); skipped unless --eval_during_training.
        """
        if not getattr(self.args, "eval_during_training", False):
            return
        if self.args.dataset in ("humanml", "kit"):
            self._evaluate_humanml()
            return
        rec = getattr(self.args, "rec_model_path", "") or os.environ.get(
            "REGENNET_REC_MODEL_PATH", ""
        )
        if not rec:
            logger.log("eval_during_training set but no rec_model_path; skipping")
            return
        start = time.time()
        from argparse import Namespace

        from regennet_tpu.models.cmdm import make_model_fn

        eval_args = Namespace(**vars(self.args))
        eval_args.batch_size = self.args.eval_batch_size
        eval_args.num_samples = min(self.args.eval_num_samples, 100)
        eval_args.num_seeds = 1
        eval_args.eval_mode = "debug"
        eval_args.num_actions = getattr(self.data.dataset, "num_actions", 1)
        params = jax.device_get(self.state["params"])
        model_fn_builder = lambda: make_model_fn(self.model, params)  # noqa: E731
        if self.args.dataset in ("humanact12", "uestc"):
            # legacy in-train eval path (reference: training_loop.py:243-248)
            from regennet_tpu.eval import eval_humanact12_uestc as legacy

            eval_args.num_seeds = self.args.eval_rep_times
            eval_dict = legacy.evaluate(
                eval_args, model_fn_builder, self.sched, self.cfg,
                self.data.dataset, rec,
            )
        else:
            from regennet_tpu.eval import eval_cmdm

            evaluator = eval_cmdm.load_stgcn_evaluator(eval_args, rec)
            eval_dict = eval_cmdm.evaluate(
                eval_args, model_fn_builder,
                self.sched, self.cfg, self.data.dataset, evaluator,
            )
        for k, v in eval_dict["feats"].items():
            self.train_platform.report_scalar(
                name=k, value=float(v[0]),
                iteration=self.step + self.resume_step, group_name="Eval",
            )
        logger.log(f"Evaluation time: {round(time.time() - start) / 60}min")

    def _evaluate_humanml(self):
        """In-training t2m eval (reference: train/training_loop.py:220-241):
        matching/R-precision/FID/diversity of samples from the current params
        under the T2M evaluators, logged to the train platform (top-k
        R_precision flattened like the reference)."""
        start = time.time()
        from regennet_tpu.eval import eval_humanml

        if not hasattr(self, "_hml_eval"):
            # build once: the evaluator wrapper (incl. parsing finest.tar)
            # and the normalised eval split are identical across calls
            from regennet_tpu.data.humanml.dataset import Text2MotionDataset
            from regennet_tpu.models.t2m_eval import T2MEvaluatorWrapper

            rec = getattr(self.args, "rec_model_path", "")
            if rec and rec.endswith(".tar"):
                from regennet_tpu.convert.torch_ckpt import (
                    convert_t2m_checkpoint,
                )

                wrapper = T2MEvaluatorWrapper(
                    self.args.dataset, variables=convert_t2m_checkpoint(rec)
                )
            else:
                wrapper = T2MEvaluatorWrapper(self.args.dataset)
            eval_ds = Text2MotionDataset(
                self.args.data_path, split=self.args.eval_split,
                dataset_name=self.args.dataset,
            )
            self._hml_eval = (wrapper, eval_ds)
        wrapper, eval_ds = self._hml_eval
        params = jax.device_get(self.state["params"])
        gt_factory = eval_humanml.make_gt_loader_factory(
            eval_ds, self.args.eval_batch_size, self.args.eval_num_samples
        )
        gen_factory = eval_humanml.make_gen_loader_factory(
            eval_ds, self.model, params, self.sched, self.cfg,
            self.args.eval_batch_size, self.args.eval_num_samples,
            seed=self.args.seed,
        )
        log_file = os.path.join(
            self.save_dir,
            f"eval_humanml_{self.step + self.resume_step:09d}.log",
        )
        n_samples = self.args.eval_num_samples
        if n_samples is None or n_samples < 0:  # -1 = use the whole split
            n_samples = len(eval_ds)
        eval_dict = eval_humanml.evaluation(
            wrapper, gt_factory, {"model": gen_factory}, log_file,
            replication_times=self.args.eval_rep_times,
            diversity_times=min(300, n_samples),
            run_mm=False,
        )
        step = self.step + self.resume_step
        for k, v in eval_dict.items():
            if k.startswith("R_precision"):
                for i in range(len(v)):
                    self.train_platform.report_scalar(
                        name=f"top{i + 1}_{k}", value=float(v[i]),
                        iteration=step, group_name="Eval",
                    )
            else:
                self.train_platform.report_scalar(
                    name=k, value=float(np.asarray(v).mean()),
                    iteration=step, group_name="Eval",
                )
        logger.log(f"Evaluation time: {round(time.time() - start) / 60}min")

    def save(self):
        if jax.process_index() == 0:
            logger.log("saving model...")
        # the state is saved with its mesh shardings intact: every process
        # calls save (Orbax coordinates — each host writes only the shards it
        # owns, with an internal barrier), so replicated/FSDP state both work
        # with >1 process where a host device_get of sharded leaves would not
        # (reference equivalent: rank-0 torch.save + dist.barrier,
        # train/training_loop.py:330-345)
        step = int(jax.device_get(self.state["step"]))
        path = checkpoint.save_checkpoint(self.save_dir, step, self.state)
        logger.log(f"saved checkpoint: {path}")
