"""HumanML3D text-to-motion evaluation harness
(reference: eval/eval_humanml.py): matching score, R-precision (top-3), FID,
diversity, and per-prompt multimodality of generated motions under the
frozen T2M co-embedding evaluators, with multi-replication mean +/- 95%
confidence reporting.

Generated loaders sample through the same scan-fused diffusion path as the
rest of the framework; text conditioning enters as precomputed embeddings
(models/clip_text.py when CLIP weights are present, hashed fallback
otherwise — flagged, since published numbers require real CLIP + the
released finest.tar evaluator weights via convert/torch_ckpt.py).
"""

from __future__ import annotations

import sys
from collections import OrderedDict
from typing import Callable, Dict, List

import numpy as np

from regennet_tpu.eval import humanml_metrics as M
from regennet_tpu.models.t2m_eval import T2MEvaluatorWrapper


def evaluate_matching_score(eval_wrapper, motion_loaders, file=None):
    match_score_dict = OrderedDict()
    R_precision_dict = OrderedDict()
    activation_dict = OrderedDict()
    for name, loader in motion_loaders.items():
        all_motion_embeddings = []
        matching_score_sum, top_k_count, all_size = 0.0, np.zeros(3), 0
        for batch in loader:
            (word_embs, pos_ohot, _, sent_lens, motions, m_lens, _) = batch
            text_emb, motion_emb = eval_wrapper.get_co_embeddings(
                word_embs, pos_ohot, sent_lens, motions, m_lens
            )
            dist_mat = M.euclidean_distance_matrix(text_emb, motion_emb)
            matching_score_sum += dist_mat.trace()
            argsmax = np.argsort(dist_mat, axis=1)
            top_k_count = top_k_count + M.calculate_top_k(argsmax, 3).sum(axis=0)
            all_size += text_emb.shape[0]
            all_motion_embeddings.append(motion_emb)
        matching_score = matching_score_sum / max(all_size, 1)
        R_precision = top_k_count / max(all_size, 1)
        match_score_dict[name] = matching_score
        R_precision_dict[name] = R_precision
        activation_dict[name] = np.concatenate(all_motion_embeddings, axis=0)
        _log(file, f"---> [{name}] Matching Score: {matching_score:.4f}")
        _log(
            file,
            f"---> [{name}] R_precision: "
            + " ".join(f"(top {i+1}): {R_precision[i]:.4f}" for i in range(3)),
        )
    return match_score_dict, R_precision_dict, activation_dict


def evaluate_fid(eval_wrapper, groundtruth_loader, activation_dict, file=None):
    gt_embeddings = []
    for batch in groundtruth_loader:
        (_, _, _, _, motions, m_lens, _) = batch
        gt_embeddings.append(eval_wrapper.get_motion_embeddings(motions, m_lens))
    gt_embeddings = np.concatenate(gt_embeddings, axis=0)
    gt_mu, gt_cov = M.calculate_activation_statistics(gt_embeddings)
    eval_dict = OrderedDict()
    for name, embeddings in activation_dict.items():
        mu, cov = M.calculate_activation_statistics(embeddings)
        fid = M.calculate_frechet_distance(gt_mu, gt_cov, mu, cov)
        eval_dict[name] = fid
        _log(file, f"---> [{name}] FID: {fid:.4f}")
    return eval_dict


def evaluate_diversity(activation_dict, file=None, diversity_times=300):
    eval_dict = OrderedDict()
    for name, embeddings in activation_dict.items():
        times = min(diversity_times, len(embeddings))
        eval_dict[name] = M.calculate_diversity(embeddings, times)
        _log(file, f"---> [{name}] Diversity: {eval_dict[name]:.4f}")
    return eval_dict


def evaluate_multimodality(eval_wrapper, mm_motion_loaders, file=None,
                           mm_num_times=10):
    eval_dict = OrderedDict()
    for name, mm_loader in mm_motion_loaders.items():
        mm_embeddings = []
        for motions, m_lens in mm_loader:  # [num_repeats, T, F]
            emb = eval_wrapper.get_motion_embeddings(motions, m_lens)
            mm_embeddings.append(emb)
        if not mm_embeddings:
            eval_dict[name] = 0.0
            continue
        stacked = np.stack(mm_embeddings)  # [num_prompts, num_repeats, D]
        times = min(mm_num_times, stacked.shape[1])
        eval_dict[name] = M.calculate_multimodality(stacked, times)
        _log(file, f"---> [{name}] Multimodality: {eval_dict[name]:.4f}")
    return eval_dict


def _log(file, line):
    print(line)
    if file is not None:
        print(line, file=file, flush=True)


def _full_batches(n: int, bs: int, what: str):
    """Full-batch starts over n items, reference-parity tail drop.

    The reference loaders all use DataLoader(drop_last=True) (data_loaders/
    humanml/motion_loaders/model_motion_loaders.py:67,86,
    dataset_motion_loader.py:21) because R-precision ranks each prompt
    against its OWN batch of 32 (eval/eval_humanml.py:232 "This must be
    32!"); a short tail batch would change the metric's negative-set size.
    We keep the protocol but surface the dropped coverage."""
    dropped = n % bs
    if dropped:
        print(
            f"[eval_humanml] {what}: evaluating {n - dropped}/{n} samples "
            f"(tail of {dropped} dropped to keep full batches of {bs}, "
            "reference drop_last parity)",
            file=sys.stderr,
        )
    return range(0, n - bs + 1, bs)


def make_gt_loader_factory(dataset, batch_size: int, num_samples: int = -1):
    """Fresh GT 7-tuple batches per replication."""

    def factory():
        n = len(dataset) if num_samples == -1 else min(num_samples, len(dataset))
        bs = min(batch_size, n)
        if bs == 0:
            raise ValueError("evaluation dataset is empty")
        batches = []
        for start in _full_batches(n, bs, "gt"):
            items = [dataset[i] for i in range(start, start + bs)]
            batches.append(_stack_items(items))
        return batches

    return factory


def make_gen_loader_factory(dataset, model, params, sched, cfg,
                            batch_size: int, num_samples: int = -1,
                            guidance: float = 1.0, seed: int = 0,
                            text_encoder=None, mm_num_samples: int = 0,
                            mm_num_repeats: int = 0):
    """The get_mdm_loader equivalent (reference: data_loaders/humanml/
    motion_loaders/model_motion_loaders.py): sample motions for the dataset's
    prompts through the scan-fused diffusion path and re-pack them into the
    evaluator's 7-tuple batches. Motions come back in the dataset's
    normalised feature space (the model is trained there).

    With mm_num_samples > 0 the factory returns (batches, mm_list) where
    mm_list holds (motions [mm_num_repeats, T, F], m_lens) per selected
    prompt for the MultiModality metric (reference CompMDMGeneratedDataset
    mm_motions) — all repeats of a prompt are sampled in ONE batched scan
    call instead of the reference's per-repeat loop."""
    import jax
    import jax.numpy as jnp

    from regennet_tpu.diffusion import sampling
    from regennet_tpu.models.cmdm import make_cfg_model_fn, make_model_fn

    if text_encoder is None:
        # same encoder selection as training (_make_device_batch): real CLIP
        # when weights are present, the shared hashed fallback otherwise —
        # eval conditioning must match what the model was trained on
        from regennet_tpu.models.clip_text import encode_text_or_fallback

        text_encoder = encode_text_or_fallback

    model_fn = (
        make_cfg_model_fn(model, params, guidance)
        if guidance != 1.0 else make_model_fn(model, params)
    )

    state = {"rng": jax.random.PRNGKey(seed), "jitted": {}}

    def _sample_batch(captions, bs, T):
        """One jitted sampling call -> generated motions [bs, T, F]."""
        shape = (bs, model.njoints, model.nfeats, T)
        cond = {
            "cmotion": jnp.zeros(shape, jnp.float32),
            "text_emb": jnp.asarray(text_encoder(list(captions))),
        }
        key = (shape,)
        if key not in state["jitted"]:
            state["jitted"][key] = jax.jit(
                lambda rng, cond: sampling.p_sample_loop(
                    sched, cfg, model_fn, shape, rng, cond,
                    clip_denoised=False,
                )
            )
        state["rng"], srng = jax.random.split(state["rng"])
        sample = np.asarray(state["jitted"][key](srng, cond))
        return sample[:, :, 0, :].transpose(0, 2, 1).astype(np.float32)

    def factory():
        n = len(dataset) if num_samples == -1 else min(num_samples, len(dataset))
        bs = min(batch_size, n)
        if bs == 0:
            raise ValueError("evaluation dataset is empty")
        batches = []
        for start in _full_batches(n, bs, "gen"):
            items = [dataset[i] for i in range(start, start + bs)]
            (word_embs, pos_ohot, captions, sent_lens, motions, m_lens,
             tokens) = _stack_items(items)
            gen_motions = _sample_batch(captions, bs, motions.shape[1])
            batches.append(
                (word_embs, pos_ohot, captions, sent_lens,
                 gen_motions, m_lens, tokens)
            )
        if mm_num_samples <= 0:
            return batches

        # MultiModality: mm_num_repeats generations per selected prompt;
        # a fresh prompt subset per replication (the reference reselects via
        # the advancing global RNG), so the reported interval includes
        # prompt-selection variance
        state["mm_call"] = state.get("mm_call", 0) + 1
        mm_rng = np.random.default_rng(seed + state["mm_call"])
        mm_idxs = mm_rng.choice(
            len(dataset), min(mm_num_samples, len(dataset)), replace=False
        )
        mm_list = []
        for idx in np.sort(mm_idxs):
            item = dataset[int(idx)]
            (_, _, captions, _, motions, m_lens, _) = _stack_items(
                [item] * mm_num_repeats
            )
            mm_motions = _sample_batch(captions, mm_num_repeats,
                                       motions.shape[1])
            mm_list.append((mm_motions, m_lens))
        return batches, mm_list

    return factory


def make_comp_gen_loader_factory(dataset, gen, params, mov_enc,
                                 mov_enc_params, batch_size: int,
                                 num_samples: int = -1, seed: int = 0,
                                 unit_length: int = 4,
                                 mm_num_samples: int = 0,
                                 mm_num_repeats: int = 0,
                                 len_estimator=None, len_est_params=None,
                                 min_mov_length: int = 10):
    """Generated-motion loader for the comp_v6 text2motion generator
    (reference: data_loaders/humanml/motion_loaders/
    comp_v6_model_dataset.py): sample each caption's motion from the prior
    and re-pack into the evaluator's 7-tuple batches. With
    mm_num_samples > 0, also returns per-prompt repeat stacks for the
    MultiModality metric (reference mm_motions, batched per prompt).

    When a trained MotionLenEstimatorBiGRU is given, each prompt's motion
    length is sampled from the estimator's softmax with the reference's
    min-length retry (comp_v6_model_dataset.py:80-93: up to 3 multinomial
    draws, keeping the last even if still short; min_mov_length 10 for t2m,
    6 for kit), generated motions are zero-padded past the sampled length
    (:138-141), and the sampled lengths feed the evaluator 7-tuple. Without
    an estimator the ground-truth lengths are used — a protocol deviation
    (published numbers sample lengths), flagged on stderr."""
    import jax
    import jax.numpy as jnp

    state = {"rng": jax.random.PRNGKey(seed), "jitted": None, "est": None}

    def _sample_m_lens(word_embs, pos_ohot, sent_lens, T, call_idx):
        """Per-prompt length sampling (reference protocol above); returns
        int64 lengths in frames, multiples of unit_length, capped at T."""
        if state["est"] is None:
            state["est"] = jax.jit(
                lambda w, p, l: jax.nn.softmax(
                    len_estimator.apply(
                        {"params": len_est_params}, w, p, l
                    ),
                    axis=-1,
                )
            )
        probs = np.asarray(state["est"](
            jnp.asarray(word_embs, jnp.float32),
            jnp.asarray(pos_ohot, jnp.float32),
            jnp.asarray(sent_lens, jnp.int32),
        ), dtype=np.float64)
        probs = probs / probs.sum(-1, keepdims=True)
        est_rng = np.random.default_rng(seed * 7919 + call_idx)
        lens = np.empty(probs.shape[0], dtype=np.int64)
        for i in range(probs.shape[0]):
            for _ in range(3):
                mov_length = est_rng.choice(probs.shape[1], p=probs[i])
                if mov_length >= min_mov_length:
                    break
            lens[i] = mov_length * unit_length
        return np.clip(lens, unit_length, T)

    def factory():
        n = len(dataset) if num_samples == -1 else min(num_samples,
                                                       len(dataset))
        bs = min(batch_size, n)
        if bs == 0:
            raise ValueError("evaluation dataset is empty")
        batches = []
        state["call"] = state.get("call", 0) + 1
        if len_estimator is None:
            print(
                "[eval_humanml] comp_gen: no --length_estimator given; "
                "evaluating at ground-truth lengths (published protocol "
                "samples lengths from the trained estimator)",
                file=sys.stderr,
            )
        for start in _full_batches(n, bs, "comp_gen"):
            items = [dataset[i] for i in range(start, start + bs)]
            (word_embs, pos_ohot, captions, sent_lens, motions, m_lens,
             tokens) = _stack_items(items)
            T = motions.shape[1]
            mov_len = T // unit_length
            if len_estimator is not None:
                m_lens = _sample_m_lens(
                    word_embs, pos_ohot, sent_lens, T,
                    state["call"] * 100003 + start,
                )
            if state["jitted"] is None:
                def run(rng, word, pos, cap_lens, mlens):
                    mov_in0 = mov_enc.apply(
                        {"params": mov_enc_params},
                        jnp.zeros((word.shape[0], unit_length,
                                   motions.shape[-1] - 4)),
                    )[:, 0]
                    out = gen.apply(
                        {"params": params}, word, pos, cap_lens, mlens,
                        mov_in0, rng, mov_len,
                        unit_length=unit_length, method=gen.generate,
                    )
                    return out["fake_motions"]

                state["jitted"] = jax.jit(run)
            state["rng"], srng = jax.random.split(state["rng"])
            fake = np.asarray(state["jitted"](
                srng, jnp.asarray(word_embs, jnp.float32),
                jnp.asarray(pos_ohot, jnp.float32),
                jnp.asarray(sent_lens, jnp.int32),
                jnp.asarray(m_lens, jnp.int32),
            ))
            if len_estimator is not None:
                # zero-pad past each sampled length (reference :138-141)
                frame_idx = np.arange(fake.shape[1])[None, :, None]
                fake = np.where(frame_idx < m_lens[:, None, None], fake, 0.0)
            batches.append(
                (word_embs, pos_ohot, captions, sent_lens,
                 fake.astype(np.float32), m_lens, tokens)
            )
        if mm_num_samples <= 0:
            return batches

        # fresh prompt subset per replication (see make_gen_loader_factory)
        state["mm_call"] = state.get("mm_call", 0) + 1
        mm_rng = np.random.default_rng(seed + state["mm_call"])
        mm_idxs = mm_rng.choice(
            len(dataset), min(mm_num_samples, len(dataset)), replace=False
        )
        mm_list = []
        for idx in np.sort(mm_idxs):
            item = dataset[int(idx)]
            (word_embs, pos_ohot, _, sent_lens, motions, m_lens,
             _) = _stack_items([item] * mm_num_repeats)
            if len_estimator is not None:
                # each repeat draws its own length (reference :87-96 samples
                # inside the repeat loop)
                m_lens = _sample_m_lens(
                    word_embs, pos_ohot, sent_lens, motions.shape[1],
                    state["call"] * 100003 + 50021 + int(idx),
                )
            state["rng"], srng = jax.random.split(state["rng"])
            fake = np.asarray(state["jitted"](
                srng, jnp.asarray(word_embs, jnp.float32),
                jnp.asarray(pos_ohot, jnp.float32),
                jnp.asarray(sent_lens, jnp.int32),
                jnp.asarray(m_lens, jnp.int32),
            ))
            if len_estimator is not None:
                frame_idx = np.arange(fake.shape[1])[None, :, None]
                fake = np.where(frame_idx < m_lens[:, None, None], fake, 0.0)
            mm_list.append((fake.astype(np.float32), m_lens))
        return batches, mm_list

    return factory


def _stack_items(items):
    cols = list(zip(*items))
    word_embs = np.stack(cols[0])
    pos_ohot = np.stack(cols[1])
    captions = list(cols[2])
    sent_lens = np.asarray(cols[3], dtype=np.int64)
    motions = np.stack(cols[4])
    m_lens = np.asarray(cols[5], dtype=np.int64)
    tokens = list(cols[6])
    return word_embs, pos_ohot, captions, sent_lens, motions, m_lens, tokens


def _hashed_text_encoder(texts):
    """Deterministic stand-in for CLIP text embeddings — single shared
    implementation so training and eval conditioning stay bit-identical."""
    from regennet_tpu.models.clip_text import hashed_text_embeddings

    return hashed_text_embeddings(list(texts))


def main(args=None):
    """CLI — `python -m regennet_tpu.eval.eval_humanml` (reference:
    eval/eval_humanml.py main)."""
    import os

    import jax
    import jax.numpy as jnp

    from regennet_tpu.data.humanml.dataset import Text2MotionDataset
    from regennet_tpu.train import checkpoint
    from regennet_tpu.utils import parser_util
    from regennet_tpu.utils.fixseed import fixseed
    from regennet_tpu.utils.model_util import create_model_and_diffusion

    if args is None:
        args = parser_util.evaluation_parser()
    fixseed(args.seed)

    # protocol per mode (reference: eval/eval_humanml.py:244-269); debug is
    # scaled down for smoke runs
    args.batch_size = 32
    run_mm, mm_num_samples, mm_num_repeats, mm_num_times = False, 0, 0, 0
    if args.eval_mode == "debug":
        args.num_samples, replication_times = 32, 2
    elif args.eval_mode in ("wo_mm", "full"):
        args.num_samples, replication_times = 1000, 20
        if args.eval_mode == "full":
            print("eval_humanml: 'full' runs the wo_mm protocol "
                  "(MultiModality needs --eval_mode mm_short)", flush=True)
    elif args.eval_mode == "mm_short":
        args.num_samples, replication_times = 1000, 5
        run_mm, mm_num_samples, mm_num_repeats, mm_num_times = (
            True, 100, 30, 10
        )
    else:
        raise ValueError(f"unknown eval mode {args.eval_mode}")

    # published-numbers protocols must not silently hash instead of GloVe
    # (reference: data_loaders/humanml/utils/word_vectorizer.py is always
    # real GloVe there); debug mode and an explicit env opt-out keep the
    # asset-free smoke path runnable
    strict_glove = args.eval_mode != "debug" and os.environ.get(
        "REGENNET_ALLOW_HASHED_GLOVE", ""
    ) != "1"
    dataset = Text2MotionDataset(
        args.data_path, split="test", dataset_name=args.dataset,
        strict_glove=strict_glove,
    )

    gen_factory = None
    if args.model_path and args.model_path.endswith(".tar"):
        # released torch CompTrainerV6 checkpoint (e.g. Comp_v6_KLD01
        # latest.tar) — convert in place and take the comp_v6 route
        from regennet_tpu.convert.torch_ckpt import convert_comp_v6_checkpoint

        state = convert_comp_v6_checkpoint(args.model_path)
        gen_factory = _comp_gen_factory_from_checkpoint(
            args, state, dataset, mm_num_samples, mm_num_repeats
        )
    elif args.model_path and args.model_path != "random":
        state = checkpoint.load_checkpoint(args.model_path)
        if "movement_enc" in state:
            # comp_v6 generator checkpoint (train_t2m_gen) — evaluate it via
            # prior sampling (reference: motion_loaders/
            # model_motion_loaders.py get_motion_loader comp_v6 branch)
            gen_factory = _comp_gen_factory_from_checkpoint(
                args, state, dataset, mm_num_samples, mm_num_repeats
            )
    if gen_factory is None:
        class _D:
            num_actions = 1
            num_person = 1

        model, sched, cfg = create_model_and_diffusion(args, _D())
        x = jnp.zeros((1, model.njoints, model.nfeats, 196))
        cond = {"cmotion": x, "text_emb": jnp.zeros((1, 512))}
        params = model.init(jax.random.PRNGKey(args.seed), x,
                            jnp.zeros((1,), jnp.int32), cond)["params"]
        if args.model_path and args.model_path != "random":
            # reuse the state already restored for the route sniff above —
            # no second disk restore
            params = jax.tree_util.tree_map(
                lambda tmpl, v: jnp.asarray(v), params, state["params"]
            )
        gen_factory = make_gen_loader_factory(
            dataset, model, params, sched, cfg, args.batch_size,
            args.num_samples, guidance=getattr(args, "guidance_param", 1.0),
            seed=args.seed, mm_num_samples=mm_num_samples,
            mm_num_repeats=mm_num_repeats,
        )

    eval_wrapper = _load_t2m_wrapper(args)
    gt_factory = make_gt_loader_factory(dataset, args.batch_size,
                                        args.num_samples)
    name = os.path.basename(os.path.dirname(args.model_path)) or "model"
    log_file = os.path.join(
        os.path.dirname(args.model_path) or ".",
        f"eval_humanml_{name}_{args.eval_mode}.log",
    )
    return evaluation(
        eval_wrapper, gt_factory, {name: gen_factory}, log_file,
        replication_times=replication_times, run_mm=run_mm,
        mm_num_times=mm_num_times,
    )


def _comp_gen_factory_from_checkpoint(args, state, dataset,
                                      mm_num_samples: int = 0,
                                      mm_num_repeats: int = 0):
    """Rebuild the comp_v6 generator from its checkpoint + args.json and
    return its generated-motion loader factory."""
    sample = dataset[0]
    gen, mov_enc, unit_length = rebuild_comp_v6_generator(
        args.model_path, dim_pose=sample[4].shape[-1]
    )
    len_est, len_est_params = load_length_estimator(
        getattr(args, "length_estimator", "")
    )
    return make_comp_gen_loader_factory(
        dataset, gen, state["params"], mov_enc, state["movement_enc"],
        args.batch_size, args.num_samples, seed=args.seed,
        unit_length=unit_length,
        mm_num_samples=mm_num_samples, mm_num_repeats=mm_num_repeats,
        len_estimator=len_est, len_est_params=len_est_params,
        # reference comp_v6_model_dataset.py:65: 10 for t2m, 6 for kit
        min_mov_length=10 if args.dataset in ("humanml", "t2m") else 6,
    )


def load_length_estimator(path: str):
    """(module, params) for a trained MotionLenEstimatorBiGRU checkpoint —
    an orbax dir (train_t2m_eval --stage length_est) or a released torch
    length_est_bigru latest.tar. ('', None) input -> (None, None)."""
    if not path:
        return None, None
    from regennet_tpu.models.t2m_eval import MotionLenEstimatorBiGRU
    from regennet_tpu.train import checkpoint

    if path.endswith(".tar"):
        from regennet_tpu.convert.torch_ckpt import (
            convert_length_estimator_checkpoint,
        )

        est_state = convert_length_estimator_checkpoint(path)
    else:
        est_state = checkpoint.load_checkpoint(path)
    est_params = est_state.get("params", est_state)
    num_classes = np.asarray(est_params["head_out"]["kernel"]).shape[-1]
    return MotionLenEstimatorBiGRU(output_size=int(num_classes)), est_params


def rebuild_comp_v6_generator(model_path: str, dim_pose: int):
    """(generator module, movement-encoder module, unit_length) for a
    comp_v6 checkpoint: sizes come from the args.json written by
    train_t2m_gen, or from the release's opt.txt when present (the released
    <name>/model/latest.tar sits next to <name>/opt.txt; reference:
    data_loaders/humanml/utils/get_opt.py), falling back to the published
    comp_v6 defaults. Shared by the eval and generate routes."""
    import json
    import os

    from regennet_tpu.data.humanml.get_opt import (
        comp_v6_sizes_from_opt,
        find_opt_file,
        parse_opt_file,
    )
    from regennet_tpu.models import t2m_eval, t2m_gen

    gen_args_path = os.path.join(
        os.path.dirname(model_path.rstrip("/")), "args.json"
    )
    overrides = {}
    if os.path.exists(gen_args_path):
        with open(gen_args_path) as f:
            overrides = json.load(f)
    else:
        opt_path = find_opt_file(model_path)
        if opt_path:
            overrides = comp_v6_sizes_from_opt(parse_opt_file(opt_path))
    gen = t2m_gen.CompV6Generator(
        dim_pose=dim_pose,
        dim_z=int(overrides.get("dim_z", 128)),
        pri_hidden=int(overrides.get("pri_hidden", 1024)),
        dec_hidden=int(overrides.get("dec_hidden", 1024)),
        text_hidden=int(overrides.get("text_hidden", 512)),
        att_vec=int(overrides.get("att_vec", 512)),
        n_layers=int(overrides.get("n_layers", 1)),
        mov_latent=int(overrides.get("mov_latent", 512)),
    )
    mov_enc = t2m_eval.MovementConvEncoder(
        t2m_eval.T2M_OPT["dim_movement_enc_hidden"],
        t2m_eval.T2M_OPT["dim_movement_latent"],
    )
    return gen, mov_enc, int(overrides.get("unit_length", 4))


def _load_t2m_wrapper(args):
    rec = getattr(args, "rec_model_path", "")
    if rec and rec != "random" and rec.endswith(".tar"):
        from regennet_tpu.convert.torch_ckpt import convert_t2m_checkpoint

        return T2MEvaluatorWrapper(args.dataset,
                                   variables=convert_t2m_checkpoint(rec))
    print("eval_humanml: using randomly initialised T2M evaluators "
          "(pass --rec_model_path finest.tar for published-comparable numbers)")
    return T2MEvaluatorWrapper(args.dataset)


def evaluation(
    eval_wrapper: T2MEvaluatorWrapper,
    gt_loader_factory: Callable[[], List],
    eval_motion_loaders: Dict[str, Callable[[], List]],
    log_file: str,
    replication_times: int = 3,
    diversity_times: int = 300,
    mm_num_times: int = 0,
    run_mm: bool = False,
) -> Dict:
    """Replication loop + mean ± 95% interval summary
    (reference: eval/eval_humanml.py:139-229). Loader factories return lists
    of 7-tuple batches (fresh sampling per replication)."""
    all_metrics = OrderedDict(
        {"Matching Score": OrderedDict(), "R_precision": OrderedDict(),
         "FID": OrderedDict(), "Diversity": OrderedDict(),
         "MultiModality": OrderedDict()}
    )
    with open(log_file, "w") as f:
        for rep in range(replication_times):
            _log(f, f"==================== Replication {rep} ====================")
            gt_batches = gt_loader_factory()
            motion_loaders = {"ground truth": gt_batches}
            mm_loaders = {}
            for name, factory in eval_motion_loaders.items():
                result = factory()
                if isinstance(result, tuple):
                    batches, mm = result
                else:
                    batches, mm = result, []
                motion_loaders[name] = batches
                mm_loaders[name] = mm

            mat_dict, r_dict, act_dict = evaluate_matching_score(
                eval_wrapper, motion_loaders, f
            )
            fid_dict = evaluate_fid(eval_wrapper, gt_batches, act_dict, f)
            div_dict = evaluate_diversity(act_dict, f, diversity_times)
            mm_dict = (
                evaluate_multimodality(eval_wrapper, mm_loaders, f, mm_num_times)
                if run_mm else {}
            )
            for store, values in [
                ("Matching Score", mat_dict), ("R_precision", r_dict),
                ("FID", fid_dict), ("Diversity", div_dict),
                ("MultiModality", mm_dict),
            ]:
                for name, v in values.items():
                    all_metrics[store].setdefault(name, []).append(v)

        # summary: mean +/- 1.96 std/sqrt(n)
        mean_dict = {}
        for metric_name, store in all_metrics.items():
            for model_name, values in store.items():
                arr = np.asarray(values, dtype=np.float64)
                mean = arr.mean(axis=0)
                conf = (
                    1.96 * arr.std(axis=0) / np.sqrt(len(arr))
                    if len(arr) > 1 else np.zeros_like(mean)
                )
                key = f"{metric_name}_{model_name}"
                mean_dict[key] = (
                    mean.tolist() if np.ndim(mean) else float(mean)
                )
                _log(f, f"========== {key}: {mean} ± {conf} ==========")
    return mean_dict


if __name__ == "__main__":
    main()
