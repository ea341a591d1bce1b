"""Headline benchmark: reaction sequences/sec/chip, 1000-step DDPM sampling,
Chi3D SMPL-X 150-frame flagship CMDM (BASELINE.md north-star metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "seqs/s/chip", "vs_baseline": N}

vs_baseline is measured against an H100 PyTorch reference estimate
(overridable via BASELINE_SEQS_PER_SEC): the reference sampler launches the
~26M-param CMDM 1000 times sequentially per batch in eager PyTorch
(reference: diffusion/gaussian_diffusion.py:723-742); at batch 64 that is
~6-8 ms/call latency-bound on H100 => ~9 seqs/s. The driver separately
records real reference numbers when available.

Extra diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# persistent compilation cache: the axon remote compiler takes minutes per
# program; cached reruns (driver invocations) start in seconds
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", os.path.expanduser("~/.cache/jax_regennet")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from regennet_tpu.utils.rng import sampling_key  # noqa: E402

H100_REF_SEQS_PER_SEC = float(os.environ.get("BASELINE_SEQS_PER_SEC", "9.0"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_CACHE_DIR = os.environ.get(
    "JAX_CACHE_DIR", os.path.expanduser("~/.cache/jax_regennet")
)
_LAST_RESULT_PATH = os.path.join(_CACHE_DIR, "bench_last.json")


def _emit(out: dict) -> None:
    """Print the driver's one JSON line and record it as the last-known-good
    measurement (used for the honest stale fallback when the TPU relay is
    unreachable at bench time)."""
    print(json.dumps(out))
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        try:
            with open(_LAST_RESULT_PATH) as f:
                hist = json.load(f)
        except Exception:  # noqa: BLE001
            hist = {}
        hist[out["metric"]] = out
        with open(_LAST_RESULT_PATH, "w") as f:
            json.dump(hist, f)
    except Exception as e:  # noqa: BLE001
        log(f"bench cache write failed: {e}")


def _acquire_devices(timeout_s: float) -> dict:
    """jax.devices() with a watchdog: the axon TPU relay can block backend
    init forever when unreachable, and the driver still needs its one JSON
    line. The probe runs in a daemon thread so a hung init cannot pin the
    process."""
    import threading

    box: dict = {}

    def probe():
        try:
            box["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001
            box["error"] = repr(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    return box


def _emit_unreachable(metric: str, unit: str, reason: str) -> None:
    """No fresh measurement possible: emit the last recorded on-chip value
    explicitly flagged stale (or 0.0 if none), never a silent hang."""
    out = {
        "metric": metric, "value": 0.0, "unit": unit, "vs_baseline": 0.0,
        "error": f"TPU backend unreachable: {reason}",
    }
    try:
        with open(_LAST_RESULT_PATH) as f:
            last = json.load(f).get(metric)
    except Exception:  # noqa: BLE001
        last = None
    if last:
        out["value"] = last.get("value", 0.0)
        out["vs_baseline"] = last.get("vs_baseline", 0.0)
        if "mfu" in last:
            out["mfu"] = last["mfu"]
        out["stale"] = True
        out["note"] = (
            f"TPU backend unreachable at bench time ({reason}); value is "
            "the last successful on-chip measurement from this machine's "
            "bench cache, NOT a fresh run"
        )
    print(json.dumps(out))


def make_flagship(batch: int, num_frames: int = 150, dtype=jnp.float32,
                  guidance: float = 1.0, init_batch: int | None = None):
    """Flagship CMDM model_fn + sampling shape + condition dict.

    init_batch lets the FLOPs probe initialise params with a cheap batch-1
    forward while analysing the full-batch program (param shapes are
    batch-independent)."""
    from regennet_tpu.models.cmdm import CMDM, make_cfg_model_fn, make_model_fn

    model = CMDM(
        njoints=56, nfeats=6, num_actions=8, num_frames=num_frames,
        latent_dim=512, ff_size=1024, num_layers=8, num_heads=4,
        arch="online", cm_mode="concat", cond_mode="action",
        cond_mask_prob=0.1, dtype=dtype,
    )
    shape = (batch, 56, 6, num_frames)
    ib = init_batch or batch
    rng = jax.random.PRNGKey(0)
    cond = {
        "cmotion": jax.random.normal(rng, shape, jnp.float32) * 0.3,
        "action": jnp.tile(jnp.arange(batch, dtype=jnp.int32)[:, None] % 8, (1, 1)),
    }
    init_cond = {
        "cmotion": jnp.zeros((ib,) + shape[1:], jnp.float32),
        "action": jnp.zeros((ib, 1), jnp.int32),
    }
    params = model.init(
        rng, jnp.zeros((ib,) + shape[1:], jnp.float32),
        jnp.zeros((ib,), jnp.int32), init_cond,
    )["params"]
    if guidance != 1.0:
        model_fn = make_cfg_model_fn(model, params, guidance)
    else:
        model_fn = make_model_fn(model, params)
    return model_fn, shape, cond


def build(batch: int, num_frames: int = 150, steps: int = 1000,
          dtype=jnp.float32, guidance: float = 1.0):
    from regennet_tpu.diffusion import DiffusionConfig, make_schedule, sampling

    model_fn, shape, cond = make_flagship(batch, num_frames, dtype, guidance)
    sched = make_schedule("cosine", steps)
    cfg = DiffusionConfig(model_mean_type="start_x")

    decode = os.environ.get("BENCH_DECODE", "0") == "1"
    if decode:
        # BASELINE config 3: fused rot6d -> SMPL-X joints decode on-device
        # in the same program as the sampling scan
        from regennet_tpu.ops import body_model as bm
        from regennet_tpu.ops.pose_decode import make_rot2xyz

        rot2xyz = make_rot2xyz(
            bm.get_body_model("smplx"), jointstype="smplx", vertstrans=True
        )

        @jax.jit
        def run(rng):
            sample = sampling.p_sample_loop(
                sched, cfg, model_fn, shape, rng, cond, clip_denoised=False
            )
            return rot2xyz(sample)

        return run

    @jax.jit
    def run(rng):
        return sampling.p_sample_loop(
            sched, cfg, model_fn, shape, rng, cond, clip_denoised=False
        )

    return run


V5E_PEAK_BF16_TFLOPS = 197.0


def _flops_probe():
    """BENCH_FLOPS_PROBE=1 child: print the single denoiser-forward FLOPs
    (JSON to stdout) and exit.

    Runs on the CPU backend because (a) `Lowered.cost_analysis()` is
    client-side there (no compile needed; the axon TPU backend returns
    None pre-compile and its compiled whole-program analysis counts the
    sampling scan body only ONCE — 0.72 TFLOP reported for the real
    716-GFLOP-per-step x 1000-step program), and (b) HLO FLOP counts are
    backend-independent. Params init at batch 1; the full-batch forward is
    lowered with abstract ShapeDtypeStructs, so the probe never executes
    the big program."""
    jax.config.update("jax_platforms", "cpu")
    batch = int(os.environ["BENCH_BATCHES"].split(",")[0])
    num_frames = int(os.environ.get("BENCH_FRAMES", "150"))
    guidance = float(os.environ.get("BENCH_GUIDANCE", "1.0"))
    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        os.environ.get("BENCH_DTYPES", "bf16").split(",")[0]
    ]
    model_fn, shape, cond = make_flagship(
        batch, num_frames, dtype, guidance, init_batch=1
    )
    prep = model_fn.prepare(cond) if hasattr(model_fn, "prepare") else cond
    x_s = jax.ShapeDtypeStruct(shape, jnp.float32)
    t_s = jax.ShapeDtypeStruct((batch,), jnp.int32)
    low = jax.jit(lambda x, t: model_fn(x, t, prep)).lower(x_s, t_s)
    ca = low.cost_analysis() or {}
    print(json.dumps({"fwd_flops": float(ca.get("flops", 0.0))}))


def step_flops(batch: int, dtype_name: str) -> float:
    """Denoiser-forward FLOPs per sampling step (the sampler's own update
    math is <1% — see docs/PERF.md breakdown), via a CPU-platform child
    process running _flops_probe."""
    import subprocess

    env = dict(os.environ)
    env.update(
        BENCH_FLOPS_PROBE="1",
        BENCH_BATCHES=str(batch),
        BENCH_DTYPES=dtype_name,
        # count USEFUL work only: the timed program runs with the
        # sublane-tile sequence padding (models/cmdm._seq_pad_amount), but
        # MFU's numerator must not credit the pad rows as FLOPs — probe
        # the unpadded program so reported MFU stays conservative/honest
        REGENNET_PAD_T="0",
    )
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=600,
        )
        return float(json.loads(proc.stdout.strip().splitlines()[-1])["fwd_flops"])
    except Exception as e:  # noqa: BLE001
        log(f"  flops probe unavailable: {e}")
        return 0.0


def measure(run, batch: int, iters: int = 3) -> float:
    rng = sampling_key(1)
    t0 = time.time()
    out = run(rng)
    # force a real sync: on this TPU relay block_until_ready has been
    # observed to return early under contention; pulling a device-reduced
    # scalar (4-byte transfer) cannot
    checksum = float(out.mean())
    log(f"  compile+first run: {time.time() - t0:.1f}s (mean {checksum:.4f})")
    # (a) per-run latency: full scalar-fetch sync every iteration. Each
    # run carries ~2 relay round-trips of fixed overhead (~65 ms, see
    # CLAUDE.md relay floor) — negligible for 1000-step programs, 10-20%
    # for respaced 100/50-step ones.
    sync_times = []
    for i in range(iters):
        t0 = time.time()
        float(run(jax.random.fold_in(rng, i)).mean())
        sync_times.append(time.time() - t0)
    sync_dt = float(np.median(sync_times))
    # (b) steady-state throughput: enqueue iters runs back-to-back —
    # async dispatch overlaps the relay round-trips with device
    # execution, exactly how the eval harness consumes batches — and
    # sync once at the end. The device executes programs in submission
    # order, so fetching the last run's reduction syncs them all.
    rngs = [jax.random.fold_in(rng, 1000 + i) for i in range(iters)]
    t0 = time.time()
    outs = [run(r) for r in rngs]
    float(outs[-1].mean())
    pipe_dt = (time.time() - t0) / iters
    log(f"  per-run sync: {sync_dt:.3f}s; pipelined x{iters}: "
        f"{pipe_dt:.3f}s/run")
    dt = min(sync_dt, pipe_dt)
    log(f"  steady: {dt:.3f}s for batch {batch} -> {batch / dt:.2f} seqs/s")
    return batch / dt, dt


def build_flagship_train(batch: int, num_frames: int, dtype,
                         dropout: float = 0.1, cond_mask_prob: float = 0.1,
                         lambda_vel: float = 1.0, lambda_orient: float = 1.0,
                         lambda_body: float = 1.0,
                         lambda_transl: float = 1.0) -> dict:
    """The ONE definition of the flagship training scaffold: model,
    diffusion config, LBS decoder, optimizer, train state, and a synthetic
    batch. Shared by bench_training and the perf scripts
    (scripts/{train_profile,train_ab_inproc,fwd_profile}.py) — their
    cross-script comparisons are only meaningful while they measure the
    exact same config, so keep this the single copy."""
    from regennet_tpu.diffusion import DiffusionConfig, make_schedule
    from regennet_tpu.models.cmdm import CMDM
    from regennet_tpu.ops import body_model as bm
    from regennet_tpu.ops.pose_decode import make_rot2xyz
    from regennet_tpu.train.training_loop import make_optimizer
    from regennet_tpu.utils.rng import training_key

    model = CMDM(
        njoints=56, nfeats=6, num_actions=8, num_frames=num_frames,
        latent_dim=512, ff_size=1024, num_layers=8, num_heads=4,
        arch="online", cm_mode="concat", cond_mode="action",
        cond_mask_prob=cond_mask_prob, dropout=dropout, dtype=dtype,
    )
    sched = make_schedule("cosine", 1000)
    cfg = DiffusionConfig(
        model_mean_type="start_x", lambda_vel=lambda_vel,
        lambda_orient=lambda_orient, lambda_body=lambda_body,
        lambda_transl=lambda_transl, body_model="smplx", vel_threshold=0.01,
    )
    body = bm.get_body_model("smplx")
    rot2xyz = make_rot2xyz(body, jointstype="smplx", vertstrans=False)
    optimizer = make_optimizer(1e-4, 0.0, 0)
    rng = training_key(0)
    shape = (batch, 56, 6, num_frames)
    x = jax.random.normal(rng, shape) * 0.3
    cond = {
        "mask": jnp.ones((batch, 1, 1, num_frames), bool),
        "cmotion": jax.random.normal(jax.random.fold_in(rng, 1), shape) * 0.3,
        "action": jnp.zeros((batch, 1), jnp.int32),
    }
    params = model.init(rng, x, jnp.zeros((batch,), jnp.int32), cond)["params"]
    state = dict(
        params=params, opt_state=optimizer.init(params),
        ema_params=jax.tree_util.tree_map(jnp.array, params),
        step=jnp.zeros((), jnp.int32),
    )
    batch_dict = {
        "motion": x,
        "t": jnp.zeros((batch,), jnp.int32) + 500,
        "weights": jnp.ones((batch,)),
        "cond": cond,
    }
    return dict(model=model, sched=sched, cfg=cfg, rot2xyz=rot2xyz,
                optimizer=optimizer, params=params, state=state,
                batch_dict=batch_dict, rng=rng)


def bench_training(batch: int = 64, num_frames: int = 150):
    """BASELINE config 5: end-to-end CMDM training step throughput
    (diffusion + velocity + interaction losses, on-device LBS decode).
    BENCH_STEPS_PER_CALL=K measures the --steps_per_call fused-block
    training path (K optimizer steps per device call, lax.scan)."""
    from regennet_tpu.train.training_loop import (
        make_multi_train_step,
        make_train_step,
    )

    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_TRAIN_DTYPE", "f32")
    ]
    # default 8 = the shipped train CLI default (--steps_per_call 8),
    # so BENCH_MODE=train measures the default user path; set
    # BENCH_STEPS_PER_CALL=1 for the single-step A/B variant
    spc = int(os.environ.get("BENCH_STEPS_PER_CALL", "8"))
    env = build_flagship_train(batch, num_frames, dtype)
    state, batch_dict, rng = env["state"], env["batch_dict"], env["rng"]
    step_fn = make_train_step(env["model"], env["sched"], env["cfg"],
                              env["optimizer"], env["rot2xyz"],
                              num_timesteps=1000)
    if spc > 1:
        batch_dict = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (spc,) + x.shape), batch_dict
        )
        step = jax.jit(make_multi_train_step(step_fn), donate_argnums=(0,))
    else:
        step = jax.jit(step_fn, donate_argnums=(0,))

    def sync(state):
        # force a real sync: block_until_ready on the axon relay has
        # returned early under load; a device-reduced scalar fetch cannot
        return float(jax.tree_util.tree_leaves(state["params"])[0].sum())

    state, _ = step(state, batch_dict, rng)
    sync(state)
    t0 = time.time()
    n = 10
    for i in range(n):
        state, metrics = step(state, batch_dict, jax.random.fold_in(rng, i))
    sync(state)
    dt = (time.time() - t0) / (n * spc)
    log(
        f"training: {dt * 1e3:.1f} ms/step @ batch {batch} "
        f"(steps_per_call {spc}) -> {batch / dt:.1f} samples/s/chip"
    )
    return batch / dt


def main():
    if os.environ.get("BENCH_FLOPS_PROBE") == "1":
        _flops_probe()
        return
    # default covers a busy-but-healthy relay: the axon relay serializes
    # clients and another client's 5-10 min compile blocks jax.devices()
    timeout_s = float(os.environ.get("BENCH_DEVICE_TIMEOUT", "900"))
    box = _acquire_devices(timeout_s)
    if "devices" not in box:
        reason = box.get(
            "error", f"jax.devices() did not return within {timeout_s:.0f}s"
        )
        if os.environ.get("BENCH_MODE", "sample") == "train":
            _emit_unreachable(
                "train_samples_per_sec_per_chip_chi3d150",
                "samples/s/chip", reason,
            )
            return
        nf = int(os.environ.get("BENCH_FRAMES", "150"))
        st = int(os.environ.get("BENCH_STEPS", "1000"))
        metric = f"reaction_seqs_per_sec_per_chip_ddpm{st}_chi3d{nf}"
        if os.environ.get("BENCH_DECODE", "0") == "1":
            metric += "_fused_decode"
        _emit_unreachable(metric, "seqs/s/chip", reason)
        return
    log(f"devices: {box['devices']}")
    if os.environ.get("BENCH_MODE", "sample") == "train":
        # batch 64 is throughput-optimal on v5e with a real sync
        # (bf16 sweep: 32->2064, 64->2195-2376, 96->2070, 128->1923,
        # 256->1735 samples/s); override with BENCH_BATCHES=N
        val = bench_training(
            batch=int(os.environ.get("BENCH_BATCHES", "64").split(",")[0]),
            num_frames=int(os.environ.get("BENCH_FRAMES", "150")),
        )
        # reference training throughput estimate: the reference logs
        # ~3.4 it/s at batch 64 with its per-step double SMPL-X decode
        # (reference: diffusion/gaussian_diffusion.py:1256 comment)
        train_ref = float(
            os.environ.get("BASELINE_TRAIN_SAMPLES_PER_SEC", "218.0")
        )
        spc = int(os.environ.get("BENCH_STEPS_PER_CALL", "8"))
        _emit(
            {
                "metric": "train_samples_per_sec_per_chip_chi3d150"
                + (f"_spc{spc}" if spc > 1 else ""),
                "value": round(val, 3),
                "unit": "samples/s/chip",
                "vs_baseline": round(val / train_ref, 3),
                # denominator anchored by the reference's own in-code
                # "3.4 iter/sec" annotation x batch 64; full derivation in
                # BASELINE.md "Derivation of the estimated baseline
                # denominators"
                "baseline_estimated": True,
            }
        )
        return
    num_frames = int(os.environ.get("BENCH_FRAMES", "150"))
    steps = int(os.environ.get("BENCH_STEPS", "1000"))
    guidance = float(os.environ.get("BENCH_GUIDANCE", "1.0"))
    batches = [int(b) for b in os.environ.get("BENCH_BATCHES", "128").split(",")]
    dtypes = {
        "bf16": jnp.bfloat16, "f32": jnp.float32,
    }
    wanted = os.environ.get("BENCH_DTYPES", "bf16").split(",")
    best = 0.0
    best_cfg = None
    best_mfu = None
    for batch in batches:
        for dtype_name, dtype in ((k, dtypes[k]) for k in wanted):
            log(f"benchmark: batch={batch} dtype={dtype_name} "
                f"steps={steps} frames={num_frames}")
            try:
                run = build(batch, num_frames, steps, dtype, guidance)
                val, dt = measure(run, batch)
                fwd = step_flops(batch, dtype_name)
                mfu = (
                    fwd * steps / dt / (V5E_PEAK_BF16_TFLOPS * 1e12)
                    if fwd else None
                )
                if mfu:
                    log(f"  model fwd {fwd / 1e9:.1f} GFLOP x {steps} steps "
                        f"/ {dt:.3f}s -> {fwd * steps / dt / 1e12:.1f} TF/s "
                        f"= {100 * mfu:.1f}% MFU "
                        f"(peak {V5E_PEAK_BF16_TFLOPS})")
            except Exception as e:  # noqa: BLE001
                log(f"  failed: {e}")
                continue
            if val > best:
                best, best_cfg, best_mfu = val, (batch, dtype_name), mfu
    metric = f"reaction_seqs_per_sec_per_chip_ddpm{steps}_chi3d{num_frames}"
    if os.environ.get("BENCH_DECODE", "0") == "1":
        metric += "_fused_decode"
    if best_cfg is None:
        # every config failed; still honor the one-JSON-line contract
        _emit_unreachable(metric, "seqs/s/chip",
                          "all benchmark configs raised (see stderr)")
        return
    log(f"best: {best:.2f} seqs/s/chip @ batch={best_cfg[0]} {best_cfg[1]}"
        + (f" guidance={guidance}" if guidance != 1.0 else ""))
    out = {
        "metric": metric,
        "value": round(best, 3),
        "unit": "seqs/s/chip",
        "vs_baseline": round(best / H100_REF_SEQS_PER_SEC, 3),
        # the 9 seqs/s H100 denominator is an engineering estimate; the
        # full derivation (FLOP chain + eager-latency chain) lives in
        # BASELINE.md "Derivation of the estimated baseline denominators"
        "baseline_estimated": True,
    }
    if best_mfu is not None:
        out["mfu"] = round(best_mfu, 4)
        if best_mfu > 0.2:
            # compute-bound regime: the MFU bounds the achievable rate
            ceiling = best / best_mfu
            out["note"] = (
                f"{100 * best_mfu:.0f}% MFU of v5e bf16 peak "
                "(denoiser-forward FLOPs via XLA cost analysis); even at "
                f"100% MFU this chip caps at ~{ceiling:.0f} seqs/s for "
                "this protocol at this model size — see docs/PERF.md "
                "roofline. The reference's own eval protocol (respaced "
                "sampling) clears 25x (BENCH_CONFIGS.json)."
            )
        else:
            out["note"] = (
                f"{100 * best_mfu:.1f}% MFU — this config is "
                "latency/dispatch-bound, not compute-bound; the roofline "
                "argument applies to the batched flagship (docs/PERF.md)."
            )
    _emit(out)


if __name__ == "__main__":
    main()
