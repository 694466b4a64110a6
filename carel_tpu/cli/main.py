"""Command-line entry points.

Replaces the reference's ~20 file-forked trainers with preset invocations
(BASELINE.json "configs"; the reference's canonical run is
job_group_devin.sh:32 -> drl_classifier_ec_mmd_final_mul_newsplit_emnlp.py):

    python -m carel_tpu.cli train --preset ec_mmd_final_mul_newsplit_emnlp \
        --data_root /path/to/corpora [--regularizer mmd] [--adapter entmax] ...
    python -m carel_tpu.cli stage1 --language zh --source home --target education
    python -m carel_tpu.cli infer --preset ... --checkpoint_dir ... --model_id ...
    python -m carel_tpu.cli presets
    python -m carel_tpu.cli bench
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from typing import Optional

from carel_tpu.config import (
    PRESETS,
    AdapterKind,
    CarelConfig,
    EncoderConfig,
    Regularizer,
    SelfStrategy,
)


def _encoder_preset(name: str, language: str) -> EncoderConfig:
    from carel_tpu.models.encoder import tiny_encoder_config

    if name == "tiny":
        return tiny_encoder_config()
    if name == "base":
        arch = "bert" if language == "zh" else "roberta"
        return EncoderConfig(arch=arch, dtype="bfloat16")
    if name == "base_f32":
        arch = "bert" if language == "zh" else "roberta"
        return EncoderConfig(arch=arch, dtype="float32")
    raise SystemExit(f"unknown encoder preset: {name}")


def _apply_overrides(cfg: CarelConfig, args) -> CarelConfig:
    data = cfg.data
    loss = cfg.loss
    model = cfg.model
    train = cfg.train
    if args.data_root:
        data = dataclasses.replace(data, data_root=args.data_root)
    if args.language:
        data = dataclasses.replace(data, language=args.language)
    if args.source_domain:
        data = dataclasses.replace(data, source_domain=args.source_domain)
    if args.target_domain:
        data = dataclasses.replace(data, target_domain=args.target_domain)
    if args.max_len:
        data = dataclasses.replace(data, max_len=args.max_len)
    if getattr(args, "self_chain", False):
        data = dataclasses.replace(data, self_chain=True)
    if getattr(args, "train_file", ""):
        data = dataclasses.replace(data, train_file=args.train_file)
    if getattr(args, "test_file", ""):
        data = dataclasses.replace(data, test_file=args.test_file)
    if args.regularizer:
        loss = dataclasses.replace(loss, regularizer=Regularizer(args.regularizer))
    if args.mmd_loss_weight is not None:
        loss = dataclasses.replace(loss, mmd_loss_weight=args.mmd_loss_weight)
    if args.adapter:
        model = dataclasses.replace(model, adapter=AdapterKind(args.adapter))
    if getattr(args, "hf_encoder", ""):
        model = dataclasses.replace(model, pretrained_encoder=args.hf_encoder)
        # an HF checkpoint dir also supplies the tokenizer; an orbax dir
        # (carel_tpu.pretrain output) keeps the corpus-built tokenizer
        if os.path.exists(os.path.join(args.hf_encoder, "config.json")):
            data = dataclasses.replace(data, tokenizer=args.hf_encoder)
    if args.head_number:
        model = dataclasses.replace(model, head_number=args.head_number)
    kw = {}
    for f in ("epochs", "batch_size", "self_iteration", "self_epochs",
              "checkpoint_dir", "log_dir", "num_devices"):
        v = getattr(args, f, None)
        if v is not None:
            kw[f] = v
    if args.vae_lr is not None:
        kw["vae_lr"] = args.vae_lr
    if getattr(args, "seed", None) is not None:
        # one seed drives everything: ingest negative-sampling, init, and the
        # train/self-train PRNG chains (SURVEY §5: the reference leaves torch
        # unseeded and its numbers are distributions; here runs are exactly
        # reproducible per seed, so report mean±std over --seed values)
        data = dataclasses.replace(data, seed=args.seed)
        kw["seed"] = args.seed
    if getattr(args, "mesh_shape", ""):
        parts = [int(x) for x in args.mesh_shape.split(",")]
        if len(parts) != 2:
            raise SystemExit("--mesh_shape expects 'dp,tp', e.g. 4,2")
        kw["mesh_shape"] = tuple(parts)
    if args.self_strategy:
        kw["self_strategy"] = SelfStrategy(args.self_strategy)
    if getattr(args, "self_conf_margin", None):
        kw["self_conf_margin"] = args.self_conf_margin
    if getattr(args, "self_conf_keep", None) is not None \
            and args.self_conf_keep < 1.0:
        kw["self_conf_keep"] = args.self_conf_keep
    if getattr(args, "self_pairs_per_doc", 1) and args.self_pairs_per_doc > 1:
        kw["self_pairs_per_doc"] = args.self_pairs_per_doc
    if getattr(args, "self_lr", None):
        kw["self_lr"] = args.self_lr
    if getattr(args, "self_max_dist", 0) and args.self_max_dist > 0:
        kw["self_max_dist"] = args.self_max_dist
    if getattr(args, "rng_impl", None):
        kw["rng_impl"] = args.rng_impl
    if getattr(args, "optim_mu_dtype", None):
        kw["optim_mu_dtype"] = args.optim_mu_dtype
    if getattr(args, "no_round_up", False):
        kw["round_up"] = False
    elif getattr(args, "round_up", False):
        kw["round_up"] = True
    if args.debug_nans:
        kw["debug_nans"] = True
    if args.profile_dir:
        kw["profile_dir"] = args.profile_dir
    if getattr(args, "save_state_every", 0):
        kw["save_state_every"] = args.save_state_every
    if getattr(args, "scan_epoch", False):
        kw["scan_epoch"] = True
    if getattr(args, "no_scan_epoch", False):
        kw["scan_epoch"] = False
    if kw:
        train = dataclasses.replace(train, **kw)
    return dataclasses.replace(cfg, data=data, loss=loss, model=model,
                               train=train)


def _nonneg_float(value: str) -> float:
    v = float(value)
    if v < 0:
        raise argparse.ArgumentTypeError(f"must be >= 0, got {value}")
    return v


def _keep_fraction(value: str) -> float:
    v = float(value)
    if not 0.0 < v <= 1.0:
        raise argparse.ArgumentTypeError(f"must be in (0, 1], got {value}")
    return v


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--preset", default="ec_mmd_final_mul_newsplit_emnlp",
                   choices=sorted(PRESETS))
    p.add_argument("--data_root", default="")
    p.add_argument("--language", default="")
    p.add_argument("--source_domain", default="")
    p.add_argument("--target_domain", default="")
    p.add_argument("--train_file", default="",
                   help="explicit train-corpus path (overrides conventions)")
    p.add_argument("--test_file", default="")
    p.add_argument("--max_len", type=int, default=0)
    p.add_argument("--seed", type=int, default=None,
                   help="override the data/train seed (default 42)")
    p.add_argument("--self_conf_margin", type=_nonneg_float, default=0.0,
                   help="drop a doc's pseudo-pair unless P(pos)-P(neg) >= "
                        "margin (0 = reference-exact self-training)")
    p.add_argument("--self_fallback_base", action="store_true",
                   help="report the base model's metrics as best_f1 when "
                        "self-training never produces a non-empty pseudo "
                        "set (default OFF: the reference reports its "
                        "zero-initialized self_metrics in this corner, "
                        "flagship :967; PARITY.md quirk table)")
    p.add_argument("--self_anchor_base", action="store_true",
                   help="seed the self-training best from the base metrics "
                        "(the reference zero-inits it, flagship :967, so "
                        "iteration 1 can overwrite the best ckpt with a "
                        "worse model and drop the restart anchor)")
    p.add_argument("--self_pairs_per_doc", type=int, default=1,
                   help="pseudo-pairs per document in self-training (top-k "
                        "pos + k sampled negs; 1 = reference-exact)")
    p.add_argument("--self_lr", type=_nonneg_float, default=0.0,
                   help="separate lr for self-training fine-tunes (0 = "
                        "vae_lr, reference-exact; lower keeps attempts "
                        "near the restart-from-best anchor)")
    p.add_argument("--self_conf_keep", type=_keep_fraction, default=1.0,
                   help="keep only this fraction of docs per iteration, "
                        "ranked by P(pos)-P(neg) separation (quantile "
                        "variant of --self_conf_margin; 1.0 = reference)")
    p.add_argument("--rng_impl", choices=["threefry", "rbg"], default=None,
                   help="training PRNG implementation; rbg removes the TPU "
                        "threefry dropout-mask tax (~32%% of the flagship "
                        "step), threefry (default) is bit-reproducible "
                        "with published runs")
    p.add_argument("--optim_mu_dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="Adam first-moment dtype (bfloat16 halves one of "
                        "the three optimizer HBM arrays; float32 default)")
    p.add_argument("--self_max_dist", type=int, default=0,
                   help="locality prior on pseudo-labels: positives within "
                        "this |emo-cau| sentence distance, beyond-window "
                        "predicted-positives become hard negatives (0 = "
                        "reference-exact; zh gold pairs are 98%% within 2)")
    p.add_argument("--self_chain", action="store_true",
                   help="self-chain pair construction (read_ECPE_self_chain_"
                        "data: test keeps only emotion==cause docs; see "
                        "preset ec_mmd_self_chain)")
    p.add_argument("--round_up", action="store_true",
                   help="rank rounded 0/1 predictions in self-training "
                        "(the reference default; newsplit :70)")
    p.add_argument("--no_round_up", action="store_true",
                   help="rank raw probabilities in self-training "
                        "(reference --round_up false)")
    p.add_argument("--regularizer", default="",
                   choices=["", "none", "mmd", "hsic", "gan", "vi"])
    p.add_argument("--mmd_loss_weight", type=float, default=None)
    p.add_argument("--adapter", default="",
                   choices=["", "none", "raw", "sparsemax", "entmax"])
    p.add_argument("--head_number", type=int, default=0)
    p.add_argument("--encoder", default="base",
                   help="tiny | base (bf16) | base_f32")
    p.add_argument("--hf_encoder", default="",
                   help="local HF checkpoint dir to init the encoder from")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--vae_lr", type=float, default=None)
    p.add_argument("--self_iteration", type=int, default=None)
    p.add_argument("--self_epochs", type=int, default=None)
    p.add_argument("--self_strategy", default="",
                   choices=["", "threshold", "random", "extreme",
                            "temporal_order", "temporal_order_modification"])
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--log_dir", default=None)
    p.add_argument("--cache_dir", default=".carel_cache")
    p.add_argument("--num_devices", type=int, default=None,
                   help="devices for the data mesh (0/None = all)")
    p.add_argument("--mesh_shape", default="",
                   help="dp,tp mesh, e.g. 4,2 = dp4 x tp2 (Megatron-split "
                        "encoder weights on the model axis)")
    p.add_argument("--debug_nans", action="store_true",
                   help="jax_debug_nans (the reference's anomaly detection)")
    p.add_argument("--profile_dir", default="",
                   help="write a jax.profiler trace of the first epoch here")
    p.add_argument("--max_train_docs", type=int, default=0)
    p.add_argument("--max_test_docs", type=int, default=0)
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--ops_impl", default="xla", choices=["xla", "pallas"],
                   help="regularizer kernel implementation")
    p.add_argument("--scan_epoch", action="store_true",
                   help="run each epoch as one device dispatch (lax.scan; "
                        "the default)")
    p.add_argument("--no_scan_epoch", action="store_true",
                   help="per-step training loop (step-level debugging)")
    p.add_argument("--save_state_every", type=int, default=0,
                   help="full resumable-state snapshot cadence (epochs)")
    p.add_argument("--resume", default="",
                   help="model_id whose state snapshot to resume from")
    p.add_argument("--track_memorization", action="store_true",
                   help="log per-iteration pseudo-positive churn (the "
                        "memorization analysis variants)")


def _setup_backend(args) -> None:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        # a CPU mesh request (--mesh_shape / --num_devices) needs a virtual
        # multi-device backend; rebuild it if one is already live with fewer
        # devices (the image's sitecustomize pre-imports jax on 'axon')
        need = 1
        ms = getattr(args, "mesh_shape", "")
        if ms:
            p = [int(x) for x in ms.split(",")]
            need = p[0] * p[1] if len(p) == 2 else 1
        nd = getattr(args, "num_devices", None)
        if nd:
            need = max(need, nd)
        if need > 1:
            try:
                have = len(jax.devices())
            except Exception:
                have = 0
            if have < need:
                import jax.extend.backend

                jax.extend.backend.clear_backends()
                jax.config.update("jax_platforms", "cpu")
                jax.config.update("jax_num_cpu_devices", need)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    # persistent compilation cache: repeat runs of the same preset skip the
    # multi-minute first compile
    cache = os.path.join(getattr(args, "cache_dir", ".carel_cache") or
                         ".carel_cache", "xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def cmd_train(args) -> int:
    _setup_backend(args)
    import jax

    from carel_tpu.pipeline import build_pipeline, init_state
    from carel_tpu.selftrain import self_train
    from carel_tpu.train.logging import JsonlLogger
    from carel_tpu.train.loop import train_epochs
    from carel_tpu.train.steps import make_eval_step, make_train_step

    cfg = _apply_overrides(PRESETS[args.preset], args)
    enc = _encoder_preset(args.encoder, cfg.data.language)
    pipe = build_pipeline(cfg, cache_dir=args.cache_dir, encoder_cfg=enc,
                          max_train_docs=args.max_train_docs,
                          max_test_docs=args.max_test_docs)
    cfg = pipe.cfg
    logger = JsonlLogger(cfg.train.log_dir, f"{args.preset}_{pipe.model_id[:8]}")
    logger.log({"event": "config", "preset": args.preset,
                "model_id": pipe.model_id,
                "train_pairs": len(pipe.train_arrays),
                "test_pairs": len(pipe.test_arrays),
                "num_unpred": pipe.num_unpred_pairs,
                "bow_dim": cfg.model.bow_dim,
                "vocab": cfg.model.encoder.vocab_size})

    mesh = None
    if cfg.train.mesh_shape is not None:
        # dp x tp mesh, e.g. --mesh_shape 4,2: batch on 'data', encoder
        # attention/MLP weights Megatron-split on 'model'
        from carel_tpu.parallel.mesh import make_mesh

        d, m = cfg.train.mesh_shape
        mesh = make_mesh(d * m, axes=("data", "model"), shape=(d, m))
    elif cfg.train.num_devices and cfg.train.num_devices > 1:
        from carel_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.train.num_devices, axes=("data",))

    state = init_state(pipe, mesh=mesh)
    if args.resume:
        from carel_tpu.train import checkpoint as _ckpt

        state = _ckpt.load_state(cfg.train.checkpoint_dir, args.resume, state)
        logger.log({"event": "resumed", "from": args.resume,
                    "step": int(state.step)})
    if cfg.train.scan_epoch:
        from carel_tpu.train.scan_epoch import make_epoch_step

        train_step = make_epoch_step(cfg, pipe.model, ops_impl=args.ops_impl)
    else:
        train_step = make_train_step(cfg, pipe.model, ops_impl=args.ops_impl)
    eval_step = make_eval_step(cfg, pipe.model)

    if cfg.train.profile_dir:
        import jax.profiler

        jax.profiler.start_trace(cfg.train.profile_dir)

    best_cache: dict = {}
    state, best = train_epochs(
        cfg, state, train_step, eval_step, pipe.train_arrays,
        pipe.test_arrays, pipe.num_unpred_pairs, pipe.model_id,
        logger=logger, mesh=mesh, best_cache=best_cache)
    logger.log({"event": "base_done", "p": best[0], "r": best[1],
                "f1": best[2]})

    if cfg.train.profile_dir:
        jax.profiler.stop_trace()

    final_best = best
    if cfg.train.self_iteration > 0:
        self_cfg = cfg
        if cfg.train.self_lr > 0.0:
            # separate self-training lr (optax Adam state is lr-independent,
            # so the existing TrainState drives the new step unchanged)
            self_cfg = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train,
                                               vae_lr=cfg.train.self_lr))
        self_step = train_step
        if cfg.train.scan_epoch and (cfg.train.self_conf_margin > 0.0
                                     or cfg.train.self_conf_keep < 1.0
                                     or cfg.train.self_max_dist > 0):
            # margin filtering makes the pseudo-set size vary per iteration;
            # under scan_epoch every new size is a fresh stacked shape and a
            # multi-minute remote compile (and one transient compile failure
            # kills the run). The per-step path compiles once for any size.
            self_step = make_train_step(self_cfg, pipe.model,
                                        ops_impl=args.ops_impl)
        elif self_cfg is not cfg:
            if cfg.train.scan_epoch:
                from carel_tpu.train.scan_epoch import make_epoch_step

                self_step = make_epoch_step(self_cfg, pipe.model,
                                            ops_impl=args.ops_impl)
            else:
                self_step = make_train_step(self_cfg, pipe.model,
                                            ops_impl=args.ops_impl)
        state, sbest = self_train(
            cfg, state, self_step, eval_step, pipe.test_pairs,
            pipe.test_arrays, pipe.num_unpred_pairs, pipe.encode,
            pipe.model_id, logger=logger, mesh=mesh,
            track_memorization=args.track_memorization,
            best_cache=best_cache,
            initial_best=best if args.self_anchor_base else None)
        if args.track_memorization and logger.path:
            from carel_tpu.tools.memorization_plot import plot_memorization

            png = plot_memorization(
                logger.path, os.path.join(cfg.train.log_dir or ".",
                                          "memorization.png"))
            if png:
                logger.log({"event": "memorization_plot", "path": png})
        logger.log({"event": "self_done", "p": sbest[0], "r": sbest[1],
                    "f1": sbest[2]})
        # reference-exact default: when self-training never produces a
        # non-empty pseudo set (e.g. a large --self_conf_margin starved
        # every iteration) sbest stays at the (0,0,0) sentinel the
        # reference's self_metrics zero-init reports (flagship :967).
        # --self_fallback_base opts into reporting the base metrics instead
        # (PARITY.md quirk table; ADVICE r3 — quirks stay default-on).
        if sbest[2] > 0.0 or not args.self_fallback_base:
            final_best = sbest
        else:
            logger.log({"event": "selftrain_no_improvement",
                        "fallback": "base", "base_f1": best[2]})
    # best_f1 is the run's headline (self-training best when enabled, the
    # reference's reported number); base_f1 is the pre-self-training best
    print(json.dumps({"model_id": pipe.model_id, "best_f1": final_best[2],
                      "base_f1": best[2]}))
    return 0


def cmd_original(args) -> int:
    """Original 3-latent DRL trainer end-to-end (drl_classifier.py:802-1041;
    --bow_loss = drl_classifier_bow_loss.py's learned BoW re-weighting)."""
    _setup_backend(args)
    import uuid

    from carel_tpu.train.logging import JsonlLogger
    from carel_tpu.train.original_driver import run_original
    from carel_tpu.train.steps_original import OriginalLossConfig

    # old-split zh defaults (drl_classifier.py:995-999: society ->
    # pair_data/emotion/finance.txt)
    base = PRESETS["ec_mmd_final_mul"]
    base = dataclasses.replace(base, data=dataclasses.replace(
        base.data, source_domain="society", target_domain="finance"))
    cfg = _apply_overrides(base, args)
    loss_cfg = OriginalLossConfig(
        learned_bow_weights=args.bow_loss,
        con_mul_loss_weight=args.con_mul_loss_weight,
        pair_mul_loss_weight=args.pair_mul_loss_weight,
        vae_lr=cfg.train.vae_lr,
    )
    enc = _encoder_preset(args.encoder, cfg.data.language)
    model_id = str(uuid.uuid4())
    logger = JsonlLogger(cfg.train.log_dir, f"drl_original_{model_id[:8]}")
    _, base_best, self_best = run_original(
        cfg, loss_cfg, enc, model_id, cache_dir=args.cache_dir,
        logger=logger, max_train_docs=args.max_train_docs,
        max_test_docs=args.max_test_docs)
    final = self_best if self_best[2] > 0.0 else base_best
    print(json.dumps({"model_id": model_id, "best_f1": final[2],
                      "base_f1": base_best[2]}))
    return 0


def cmd_stage1(args) -> int:
    _setup_backend(args)
    import os

    from carel_tpu.data.ecpe_format import parse_ecpe_file
    from carel_tpu.data.tokenizer import build_tokenizer
    from carel_tpu.stage1 import build_doc_arrays
    from carel_tpu.stage1.trainer import Stage1Config, train_stage1
    from carel_tpu.train.logging import JsonlLogger

    language = args.language or "zh"
    s1 = Stage1Config(
        language=language,
        source_domain=args.source_domain or "home",
        target_domain=args.target_domain or "education",
        training_epoch=args.epochs if args.epochs is not None else 10,
        batch_size=args.batch_size or 4,
        clause_mixer=args.clause_mixer,
        fresh_adam=not args.carried_adam,
        save_dir=args.save_dir,
    )
    root = args.data_root
    if args.doc_dir:
        d = os.path.join(root, args.doc_dir)
    elif language == "zh":
        d = os.path.join(root, "data/ECPE_new_dataset")
    else:
        d = os.path.join(root, "domains/Englishnovel_multiple")
    train_path = os.path.join(d, f"{s1.source_domain}.txt")
    test_path = os.path.join(d, f"{s1.target_domain}.txt")

    train_docs = parse_ecpe_file(train_path)
    test_docs = parse_ecpe_file(test_path)
    if args.max_train_docs:
        train_docs = train_docs[: args.max_train_docs]
    if args.max_test_docs:
        test_docs = test_docs[: args.max_test_docs]

    corpus = [c.text for doc in train_docs + test_docs for c in doc.clauses]
    tok_cache = os.path.join(args.cache_dir, f"tokenizer_{language}.json")
    os.makedirs(args.cache_dir, exist_ok=True)
    tokenizer = build_tokenizer(language, corpus, tok_cache)

    strip = language == "zh"
    train_arr = build_doc_arrays(train_docs, tokenizer,
                                 s1.max_doc_len, s1.max_sen_len, strip)
    test_arr = build_doc_arrays(test_docs, tokenizer,
                                s1.max_doc_len, s1.max_sen_len, strip)

    enc = _encoder_preset(args.encoder, language)
    enc = dataclasses.replace(enc, vocab_size=tokenizer.vocab_size)
    logger = JsonlLogger(args.log_dir or "emotion_logs", "stage1")
    params, best, pair_file = train_stage1(
        s1, enc, train_arr, test_arr, tokenizer, logger,
        encoder_ckpt=args.hf_encoder)
    print(json.dumps({"best_f1": best[2], "pair_file": pair_file}))
    return 0


def cmd_infer(args) -> int:
    _setup_backend(args)
    import jax

    from carel_tpu.infer import run_pair_inference
    from carel_tpu.pipeline import build_pipeline, init_state
    from carel_tpu.train import checkpoint as ckpt
    from carel_tpu.train.steps import make_eval_step

    cfg = _apply_overrides(PRESETS[args.preset], args)
    enc = _encoder_preset(args.encoder, cfg.data.language)
    pipe = build_pipeline(cfg, cache_dir=args.cache_dir, encoder_cfg=enc,
                          max_test_docs=args.max_test_docs)
    cfg = pipe.cfg
    state = init_state(pipe)
    params = state.params
    if args.model_id:
        params = ckpt.load_best(cfg.train.checkpoint_dir, args.model_id, params)
    eval_step = make_eval_step(cfg, pipe.model)
    res = run_pair_inference(
        eval_step, params, pipe.test_pairs, pipe.test_arrays,
        jax.random.key(0), cfg.train.eval_batch_size,
        output_dir=args.output_dir, model_id=args.model_id or pipe.model_id)
    print(json.dumps({
        "precision": res.precision, "recall": res.recall, "f1": res.f1,
        "p50_batch_ms": res.p50_batch_ms, "p95_batch_ms": res.p95_batch_ms,
        "pairs_per_sec": res.pairs_per_sec,
    }))
    return 0


def cmd_pair(args) -> int:
    """Plain pair classifier (pair_classifier.py / _self_chain.py)."""
    _setup_backend(args)
    import random

    from carel_tpu.config import SelfStrategy
    from carel_tpu.data.batching import encode_pairs
    from carel_tpu.data.bow import BowVocab
    from carel_tpu.data.ecpe_format import parse_ecpe_file
    from carel_tpu.data.pairs import build_pairs
    from carel_tpu.data.self_chain import build_pairs_self_chain
    from carel_tpu.data.tokenizer import build_tokenizer
    from carel_tpu.pipeline import resolve_paths
    from carel_tpu.train.logging import JsonlLogger
    from carel_tpu.train.pair_trainer import (
        PairTrainerConfig, train_pair_classifier)

    cfg = _apply_overrides(PRESETS[args.preset], args)
    train_path, test_path, _ = resolve_paths(cfg)
    train_docs = parse_ecpe_file(train_path)
    test_docs = parse_ecpe_file(test_path)
    if args.max_train_docs:
        train_docs = train_docs[: args.max_train_docs]
    if args.max_test_docs:
        test_docs = test_docs[: args.max_test_docs]
    builder = build_pairs_self_chain if args.self_chain else build_pairs
    rng = random.Random(cfg.data.seed)
    train_pairs = builder(train_docs, test=False, rng=rng)
    test_pairs = builder(test_docs, test=True)

    corpus = [c.text for d in train_docs + test_docs for c in d.clauses]
    os.makedirs(args.cache_dir, exist_ok=True)
    tok = build_tokenizer(
        cfg.data.language, corpus,
        os.path.join(args.cache_dir, f"tokenizer_{cfg.data.language}.json"))
    bow = BowVocab.from_words([], cfg.data.language)  # unused by this model
    max_len = cfg.data.max_len
    if max_len == 0:  # auto-fit window (see pipeline.fit_max_len)
        from carel_tpu.pipeline import fit_max_len

        max_len = fit_max_len(tok, train_pairs.pairs + test_pairs.pairs)
    enc_arrays = lambda ps: encode_pairs(
        ps, tok, bow, max_len, sentence_pair=args.sentence_pair)

    pcfg = PairTrainerConfig(
        max_len=max_len,
        batch_size=cfg.train.batch_size,
        epochs=cfg.train.epochs if args.epochs is None else args.epochs,
        self_epochs=cfg.train.self_epochs,
        self_iteration=(args.self_iteration
                        if args.self_iteration is not None else 0),
        self_strategy=SelfStrategy.THRESHOLD,
        seed=cfg.train.seed)
    enc = _encoder_preset(args.encoder, cfg.data.language)
    enc = dataclasses.replace(enc, vocab_size=tok.vocab_size)
    logger = JsonlLogger(cfg.train.log_dir, "pair")
    num_unpred = getattr(test_pairs, "num_unpred_emotions", 0)
    params, best = train_pair_classifier(
        pcfg, enc, enc_arrays(train_pairs), enc_arrays(test_pairs),
        num_unpred, test_pairs, enc_arrays, logger)
    print(json.dumps({"p": best[0], "r": best[1], "f1": best[2]}))
    return 0


def cmd_embed(args) -> int:
    """Contrastive domain-embedder fine-tuning (the sentence-transformer
    scripts: chi/en[_ec]_sentence_transformer.py): batch-all triplet loss on
    domain labels over whole docs (--level doc) or single clauses
    (--level clause); saves the fine-tuned encoder as an orbax dir usable
    anywhere --hf_encoder is accepted, and optionally dumps embeddings."""
    _setup_backend(args)
    from carel_tpu.data.ecpe_format import parse_ecpe_file
    from carel_tpu.data.tokenizer import build_tokenizer
    from carel_tpu.embeddings import (
        EmbedderTrainConfig,
        EncoderEmbedder,
        load_domain_docs,
        save_embeddings,
        train_domain_embedder,
    )
    from carel_tpu.pretrain import save_encoder
    from carel_tpu.train.logging import JsonlLogger

    language = args.language or "zh"
    paths = {os.path.splitext(os.path.basename(p))[0]: p
             for p in args.files}
    if args.level == "doc":
        texts, labels = load_domain_docs(paths)
    else:  # clause-level (the _ec_ script variants)
        texts, labels = [], []
        for label, (name, p) in enumerate(sorted(paths.items())):
            for doc in parse_ecpe_file(p):
                for cl in doc.clauses:
                    texts.append(
                        (cl.text_field3 or cl.text).replace(" ", "")
                        if language == "zh" else (cl.text_field3 or cl.text))
                    labels.append(label)
    if args.max_texts:
        texts, labels = texts[: args.max_texts], labels[: args.max_texts]

    os.makedirs(args.cache_dir, exist_ok=True)
    tok = build_tokenizer(
        language, texts,
        os.path.join(args.cache_dir, f"tokenizer_{language}.json"))
    enc = _encoder_preset(args.encoder, language)
    enc = dataclasses.replace(enc, vocab_size=tok.vocab_size)
    ecfg = EmbedderTrainConfig(
        batch_size=args.batch_size or 32,
        epochs=args.epochs if args.epochs is not None else 9,
        max_len=args.max_len or 200)
    logger = JsonlLogger(args.log_dir or "result_logs", "embed")
    init_params = None
    if args.hf_encoder:
        import jax

        from carel_tpu.models.encoder import TransformerEncoder

        probe = tok.encode_batch(["init"], 8)
        init_params = TransformerEncoder(enc).init(
            {"params": jax.random.key(0)}, probe.input_ids,
            probe.attention_mask, None, deterministic=True)["params"]
        if os.path.exists(os.path.join(args.hf_encoder, "config.json")):
            from carel_tpu.models.hf_port import port_hf_encoder

            init_params = port_hf_encoder(args.hf_encoder, enc)
        else:
            from carel_tpu.pretrain import load_encoder

            init_params = load_encoder(args.hf_encoder, init_params)
    params = train_domain_embedder(ecfg, enc, tok, texts, labels,
                                   init_params=init_params, logger=logger)
    out = save_encoder(args.out, params)
    emb_path = ""
    if args.dump_embeddings:
        import numpy as np

        embedder = EncoderEmbedder(enc, params, tok, max_len=ecfg.max_len)
        emb_path = save_embeddings(args.dump_embeddings, embedder(texts),
                                   np.asarray(labels))
    print(json.dumps({"encoder_ckpt": out, "texts": len(texts),
                      "embeddings": emb_path}))
    return 0


def cmd_cit(args) -> int:
    """CIT triple classifier chained onto pair-inference outputs
    (mc_classifier.py:442-547): gold triples with KNN negatives from the
    source domain, prediction-filtering eval on the target candidates,
    per-document KNN self-training."""
    _setup_backend(args)
    import random

    import pandas as pd

    from carel_tpu.data.ecpe_format import parse_ecpe_file
    from carel_tpu.data.pairs import build_pairs
    from carel_tpu.data.tokenizer import build_tokenizer
    from carel_tpu.data.triples import build_cit_triples
    from carel_tpu.embeddings import EncoderEmbedder
    from carel_tpu.pipeline import fit_max_len, resolve_paths
    from carel_tpu.train.cit_trainer import CitConfig, run_cit
    from carel_tpu.train.logging import JsonlLogger

    cfg = _apply_overrides(PRESETS[args.preset], args)
    train_path, test_path, _ = resolve_paths(cfg)
    train_docs = parse_ecpe_file(train_path)
    test_docs = parse_ecpe_file(test_path)
    if args.max_train_docs:
        train_docs = train_docs[: args.max_train_docs]
    if args.max_test_docs:
        test_docs = test_docs[: args.max_test_docs]
    from carel_tpu.pipeline import _spaced_sep

    import numpy as np

    test_pairs = build_pairs(test_docs, test=True,
                             spaced_sep=_spaced_sep(cfg),
                             rng=random.Random(cfg.data.seed))

    # prediction/true tables from `infer --output_dir` (the reference reads
    # pair_data/ec_pair/{id}_{true,pred}.pkl, mc_classifier.py:462-470)
    pred_df = pd.read_pickle(args.pred_pkl)
    true_df = pd.read_pickle(args.true_pkl)
    pair_texts = [str(t) for t in pred_df["pair"]]
    pred_labels = np.asarray(pred_df["label"], np.float32)
    true_labels = np.asarray(true_df["label"], np.float32)
    if len(pred_labels) != sum(test_pairs.docs_pair_size):
        raise SystemExit(
            f"prediction table has {len(pred_labels)} rows but the test "
            f"candidate enumeration has {sum(test_pairs.docs_pair_size)} — "
            "pass the same --preset/--test_file/--max_test_docs used for "
            "`infer`")

    corpus = [c.text for d in train_docs + test_docs for c in d.clauses]
    os.makedirs(args.cache_dir, exist_ok=True)
    tok = build_tokenizer(
        cfg.data.language, corpus,
        os.path.join(args.cache_dir, f"tokenizer_{cfg.data.language}.json"))
    enc = _encoder_preset(args.encoder, cfg.data.language)
    enc = dataclasses.replace(enc, vocab_size=tok.vocab_size)

    # embedder for KNN negatives: our encoder (pretrained when provided) in
    # place of the reference's downloaded SimCSE (mc_classifier.py:120-144)
    import jax

    from carel_tpu.models.encoder import TransformerEncoder

    probe = tok.encode_batch(["init"], 8)
    enc_params = TransformerEncoder(enc).init(
        {"params": jax.random.key(0)}, probe.input_ids,
        probe.attention_mask, None, deterministic=True)["params"]
    if args.hf_encoder:
        if os.path.exists(os.path.join(args.hf_encoder, "config.json")):
            from carel_tpu.models.hf_port import port_hf_encoder

            enc_params = port_hf_encoder(args.hf_encoder, enc)
        else:
            from carel_tpu.pretrain import load_encoder

            enc_params = load_encoder(args.hf_encoder, enc_params)
    embedder = EncoderEmbedder(enc, enc_params, tok, max_len=64)

    max_len = cfg.data.max_len or fit_max_len(tok, pair_texts)
    ccfg = CitConfig(
        max_len=max_len,
        batch_size=args.batch_size or 32,
        epochs=args.epochs if args.epochs is not None else 1,
        self_epochs=(args.self_epochs
                     if args.self_epochs is not None else 5),
        self_iteration=(args.self_iteration
                        if args.self_iteration is not None else 10),
        learning_rate=args.vae_lr if args.vae_lr is not None else 1e-5,
        seed=cfg.train.seed)
    logger = JsonlLogger(args.log_dir or "result_logs", "cit")
    train_triples = build_cit_triples(train_docs, embedder)
    res = run_cit(ccfg, enc, tok, train_triples, test_docs,
                  test_pairs.docs_pair_size, pair_texts, pred_labels,
                  true_labels, embedder, logger,
                  encoder_params=enc_params if args.hf_encoder else None)
    print(json.dumps({"base": res["base"], "best": res["best"]}))
    return 0


def cmd_dann(args) -> int:
    """Clause-level DANN emotion classifier (emotion_classifier.py:448-553):
    imbalanced-sampled source training + full-set pseudo-label self-training,
    with the gradient-reversal domain loss on by default (--no_domain_loss
    reproduces the reference's shipped recipe, which comments it out)."""
    _setup_backend(args)
    from carel_tpu.data.tokenizer import build_tokenizer
    from carel_tpu.stage1.dann_driver import (
        DannConfig,
        read_clause_data,
        run_dann,
    )
    from carel_tpu.train.logging import JsonlLogger

    language = args.language or "zh"
    cfg = DannConfig(
        source_domain=args.source_domain or "society",
        target_domain=args.target_domain or "finance",
        doc_dir=args.doc_dir or "domains/THUCTC_multiple",
        epochs=args.epochs if args.epochs is not None else 20,
        self_iteration=(args.self_iteration
                        if args.self_iteration is not None else 5),
        self_epochs=(args.self_epochs
                     if args.self_epochs is not None else 10),
        batch_size=args.batch_size or 32,
        learning_rate=args.vae_lr if args.vae_lr is not None else 1e-5,
        domain_weight=args.domain_weight,
        max_len=args.max_len or 128,
        use_domain_loss=not args.no_domain_loss,
    )
    src = os.path.join(args.data_root, cfg.doc_dir,
                       f"{cfg.source_domain}.txt")
    tgt = os.path.join(args.data_root, cfg.doc_dir,
                       f"{cfg.target_domain}.txt")
    corpus = read_clause_data(src)[0] + read_clause_data(tgt)[0]
    os.makedirs(args.cache_dir, exist_ok=True)
    tokenizer = build_tokenizer(
        language, corpus,
        os.path.join(args.cache_dir, f"tokenizer_{language}.json"))
    enc = _encoder_preset(args.encoder, language)
    enc = dataclasses.replace(enc, vocab_size=tokenizer.vocab_size)
    logger = JsonlLogger(args.log_dir or "emotion_logs", "dann")
    res = run_dann(cfg, enc, tokenizer, args.data_root, logger,
                   encoder_ckpt=args.hf_encoder,
                   max_clauses=args.max_test_docs)
    print(json.dumps({"base": res["base"], "best": res["best"]}))
    return 0


def cmd_pretrain(args) -> int:
    """MLM pretraining (carel_tpu.pretrain): bootstraps an encoder in the
    no-egress environment where the reference's hub downloads are impossible;
    the result feeds train via --hf_encoder pointing at the orbax dir."""
    _setup_backend(args)
    from carel_tpu.data.ecpe_format import parse_ecpe_file
    from carel_tpu.data.tokenizer import build_tokenizer
    from carel_tpu.pipeline import resolve_paths
    from carel_tpu.pretrain import MlmConfig, pretrain_mlm, save_encoder
    from carel_tpu.train.logging import JsonlLogger

    cfg = _apply_overrides(PRESETS[args.preset], args)
    _, _, bow_path = resolve_paths(cfg)
    corpus_paths = list(args.corpus) if args.corpus else [bow_path]
    texts = []
    for cp in corpus_paths:
        for d in parse_ecpe_file(cp):
            texts.extend(c.text for c in d.clauses)
    if cfg.data.language == "zh":
        texts = [t.strip().replace(" ", "") for t in texts]
    # raw (non-ECPE) text corpora — e.g. data/amazon review files — split into
    # clause-sized sentence segments. The reference's encoders are pretrained
    # on web-scale raw text (flagship :63-71); in this no-egress environment
    # every local byte of in-language text is pretraining signal.
    from carel_tpu.data.ecpe_format import split_raw_corpus
    for rp in (args.raw_corpus or []):
        texts.extend(split_raw_corpus(rp, cfg.data.language))
    os.makedirs(args.cache_dir, exist_ok=True)
    tok = build_tokenizer(
        cfg.data.language, texts,
        os.path.join(args.cache_dir, f"tokenizer_{cfg.data.language}.json"))
    if args.save_mlm:
        # pin the exact tokenizer as a SIBLING of the full-MLM checkpoint
        # ("<dir>.tokenizer.json") so `ordering --mlm_model` can never pair
        # the weights with a differently-built vocab (ADVICE r4). It cannot
        # live INSIDE the dir: orbax owns that path and force=True save
        # wipes it.
        if os.path.dirname(args.save_mlm):
            os.makedirs(os.path.dirname(args.save_mlm), exist_ok=True)
        tok.save(args.save_mlm.rstrip("/") + ".tokenizer.json")
    enc = _encoder_preset(args.encoder, cfg.data.language)
    enc = dataclasses.replace(enc, vocab_size=tok.vocab_size)
    logger = JsonlLogger(cfg.train.log_dir, "pretrain")
    logger.log({"event": "pretrain_config", "corpus": corpus_paths,
                "raw_corpus": list(args.raw_corpus or []),
                "clauses": len(texts), "vocab": tok.vocab_size,
                "steps": args.steps})
    mlm_cfg = MlmConfig(batch_size=args.mlm_batch, seq_len=args.seq_len,
                        steps=args.steps, learning_rate=args.mlm_lr,
                        seed=cfg.train.seed, scan_size=args.scan_size,
                        mask_prob=args.mask_prob,
                        whole_word=args.whole_word,
                        language=cfg.data.language,
                        lr_decay=args.lr_decay,
                        warmup_steps=args.warmup_steps,
                        save_every=args.save_every, save_path=args.out,
                        save_full_path=args.save_mlm)
    init_params = None
    if args.init_encoder:
        # resume pretraining from a previously saved encoder (same
        # corpus-built tokenizer => same vocab/shapes)
        import jax

        from carel_tpu.models.encoder import TransformerEncoder
        from carel_tpu.pretrain import load_encoder

        probe = tok.encode_batch(["init"], 8)
        template = TransformerEncoder(enc).init(
            {"params": jax.random.key(0)},
            probe.input_ids, probe.attention_mask, None,
            deterministic=True)["params"]
        init_params = load_encoder(args.init_encoder, template)
    encoder_params = pretrain_mlm(enc, tok, texts, mlm_cfg, logger,
                                  init_params=init_params)
    path = save_encoder(args.out, encoder_params)
    print(json.dumps({"encoder_ckpt": path, "clauses": len(texts)}))
    return 0


def cmd_case_analysis(args) -> int:
    """Two-checkpoint comparison on the target test set split by self-chain
    (mmd_wommd_case_analysis.py equivalent)."""
    _setup_backend(args)
    import jax

    from carel_tpu.data.ecpe_format import parse_ecpe_file
    from carel_tpu.pipeline import build_pipeline, init_state, resolve_paths
    from carel_tpu.tools.case_analysis import compare_checkpoints
    from carel_tpu.train import checkpoint as ckpt
    from carel_tpu.train.steps import make_eval_step

    cfg = _apply_overrides(PRESETS[args.preset], args)
    enc = _encoder_preset(args.encoder, cfg.data.language)
    pipe = build_pipeline(cfg, cache_dir=args.cache_dir, encoder_cfg=enc,
                          max_test_docs=args.max_test_docs)
    cfg = pipe.cfg
    state = init_state(pipe)
    pa = ckpt.load_best(cfg.train.checkpoint_dir, args.model_id_a,
                        state.params)
    pb = ckpt.load_best(cfg.train.checkpoint_dir, args.model_id_b,
                        state.params)
    _, test_path, _ = resolve_paths(cfg)
    docs = parse_ecpe_file(test_path)
    if args.max_test_docs:
        docs = docs[: args.max_test_docs]
    ev = make_eval_step(cfg, pipe.model)
    res = compare_checkpoints(ev, pa, pb, pipe.test_pairs, pipe.test_arrays,
                              docs, args.out_csv, jax.random.key(0),
                              cfg.train.eval_batch_size)
    print(json.dumps({
        "model_a_f1": res.model_a_f1, "model_b_f1": res.model_b_f1,
        "csv": res.csv_path,
        "self_chain": res.self_chain_counts, "normal": res.normal_counts,
        "split_f1": res.split_f1,
    }))
    return 0


def cmd_hpo(args) -> int:
    """Random search + median pruning over loss weights / lr, objective =
    best pair-F1 of a short training run (drl_classifier_search.py:44-69
    semantics with a working engine)."""
    _setup_backend(args)
    from carel_tpu.pipeline import build_pipeline, init_state
    from carel_tpu.tools.hpo import DEFAULT_SPACE, search
    from carel_tpu.train.logging import JsonlLogger
    from carel_tpu.train.loop import train_epochs
    from carel_tpu.train.steps import make_eval_step, make_train_step

    base = _apply_overrides(PRESETS[args.preset], args)
    enc = _encoder_preset(args.encoder, base.data.language)
    pipe = build_pipeline(base, cache_dir=args.cache_dir, encoder_cfg=enc,
                          max_train_docs=args.max_train_docs,
                          max_test_docs=args.max_test_docs)
    logger = JsonlLogger(base.train.log_dir or "result_logs", "hpo")

    def objective(cfg, report):
        import dataclasses as dc

        cfg = dc.replace(cfg, model=pipe.cfg.model)
        state = init_state(pipe)
        ts = make_train_step(cfg, pipe.model, ops_impl=args.ops_impl)
        es = make_eval_step(cfg, pipe.model)
        best_f1 = 0.0
        for epoch in range(cfg.train.epochs):
            _, best = train_epochs(
                cfg, state, ts, es, pipe.train_arrays, pipe.test_arrays,
                pipe.num_unpred_pairs, pipe.model_id, epochs=1, logger=logger)
            best_f1 = max(best_f1, best[2])
            report(epoch, best_f1)
        return best_f1

    best, trials = search(objective, base, DEFAULT_SPACE, args.n_trials,
                          logger=logger)
    print(json.dumps({"best_value": best.value if best else None,
                      "best_params": best.params if best else None,
                      "trials": len(trials)}))
    return 0


def cmd_presets(_args) -> int:
    for name, cfg in sorted(PRESETS.items()):
        print(f"{name}: regularizer={cfg.loss.regularizer.value}, "
              f"language={cfg.data.language}, "
              f"{cfg.data.source_domain}->{cfg.data.target_domain}")
    return 0


def cmd_bench(_args) -> int:
    import bench

    bench.main()
    return 0


def cmd_convert(args) -> int:
    from carel_tpu.tools import convert as cv

    if args.kind == "reccon":
        cv.reccon_to_ecpe(args.source[0], args.target,
                          minusone=args.minusone,
                          bow_optimize=args.bow_optimize)
    elif args.kind == "train_to_test":
        cv.convert_train_to_test(args.source[0], args.target,
                                 args.bow_optimize)
    elif args.kind == "json_split":
        cv.json_to_ecpe_split(args.source[0], args.target)
    elif args.kind == "bow_concat":
        cv.concat_bow_corpus(list(args.source), args.target)
    print(json.dumps({"written": args.target}))
    return 0


def cmd_ordering(args) -> int:
    from carel_tpu.data.ecpe_format import parse_ecpe_file
    from carel_tpu.tools.ordering import ordering_probe

    scorer = None
    if args.mlm_model:
        # directional P(hypothesis | premise) via the in-framework MLM —
        # the ordering_chatyuan.py calc_prob analog (tools/mlm_scorer.py)
        if args.cpu:
            import jax

            jax.config.update("jax_platforms", "cpu")
        from carel_tpu.data.tokenizer import build_tokenizer
        from carel_tpu.tools.mlm_scorer import MlmScorer

        # the tokenizer MUST be the one the MLM checkpoint was trained with:
        # a rebuilt one can silently share vocab_size (zh pads to a multiple
        # of 128) yet permute ids, which loads fine and scores garbage
        # (ADVICE r4). Prefer the copy saved next to the checkpoint by
        # `pretrain --save_mlm`; else the training cache; never rebuild.
        tok_candidates = [
            args.mlm_model.rstrip("/") + ".tokenizer.json",
            os.path.join(args.cache_dir, f"tokenizer_{args.language}.json"),
        ]
        tok_path = next((p for p in tok_candidates if os.path.exists(p)),
                        None)
        if tok_path is None:
            raise SystemExit(
                "ordering --mlm_model: no tokenizer found at "
                f"{tok_candidates}; pass --cache_dir pointing at the cache "
                "the MLM was pretrained with (rebuilding from the probe "
                "file would silently mis-map token ids)")
        tok = build_tokenizer(args.language, None, tok_path)
        enc = _encoder_preset(args.encoder, args.language)
        enc = dataclasses.replace(enc, vocab_size=tok.vocab_size)
        scorer = MlmScorer(args.mlm_model, tok, enc)

    stats = ordering_probe(parse_ecpe_file(args.file),
                           entailment_scorer=scorer)
    out = {
        "total_pairs": stats.total_pairs,
        "cause_before": stats.cause_before,
        "cause_equal": stats.cause_equal,
        "cause_after": stats.cause_after,
        "temporal_order_rate": stats.temporal_order_rate,
    }
    if scorer is not None:
        out.update({"scored_pairs": stats.scored_pairs,
                    "forward_wins": stats.forward_wins,
                    "backward_wins": stats.backward_wins})
    print(json.dumps(out))
    return 0


def cmd_vis(args) -> int:
    from carel_tpu.data.ecpe_format import parse_ecpe_file
    from carel_tpu.tools.vis import visualize_domain_shift

    texts, labels = [], []
    for path in args.files:
        name = os.path.splitext(os.path.basename(path))[0]
        for doc in parse_ecpe_file(path):
            texts.append(" ".join(c.text.strip() for c in doc.clauses))
            labels.append(name)
    out = visualize_domain_shift(texts, labels, args.out, method=args.method)
    print(json.dumps({"written": out, "docs": len(texts)}))
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="carel_tpu",
                                     description=__doc__.split("\n")[0])
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="stage-2 DRL pair classifier")
    _add_common(p_train)
    p_train.set_defaults(fn=cmd_train)

    p_s1 = sub.add_parser("stage1", help="doc-level emotion + pair files")
    _add_common(p_s1)
    p_s1.add_argument("--clause_mixer", default="bilstm",
                      choices=["bilstm", "transformer"])
    p_s1.add_argument("--carried_adam", action="store_true",
                      help="use a standard carried Adam instead of the "
                           "reference's fresh-Adam-per-step quirk")
    p_s1.add_argument("--save_dir", default="")
    p_s1.add_argument("--doc_dir", default="",
                      help="override the doc-file directory (e.g. "
                           "domains/THUCTC_multiple for the zh old split)")
    p_s1.set_defaults(fn=cmd_stage1)

    p_inf = sub.add_parser("infer", help="batched pair inference")
    _add_common(p_inf)
    p_inf.add_argument("--model_id", default="")
    p_inf.add_argument("--output_dir", default="")
    p_inf.set_defaults(fn=cmd_infer)

    p_pre = sub.add_parser("presets", help="list presets")
    p_pre.set_defaults(fn=cmd_presets)

    p_bench = sub.add_parser("bench", help="train-step throughput")
    p_bench.set_defaults(fn=cmd_bench)

    p_conv = sub.add_parser("convert", help="dataset conversion tools")
    p_conv.add_argument("kind", choices=["reccon", "train_to_test",
                                         "json_split", "bow_concat"])
    p_conv.add_argument("--source", required=True, nargs="+")
    p_conv.add_argument("--target", required=True)
    p_conv.add_argument("--bow_optimize", action="store_true")
    p_conv.add_argument("--minusone", action="store_true")
    p_conv.set_defaults(fn=cmd_convert)

    p_ord = sub.add_parser("ordering", help="temporal-order probe")
    p_ord.add_argument("--file", required=True)
    p_ord.add_argument("--mlm_model", default="",
                       help="full MLM dir (pretrain --save_mlm) enabling the "
                            "directional entailment comparison")
    p_ord.add_argument("--encoder", default="base")
    p_ord.add_argument("--language", default="zh")
    p_ord.add_argument("--cache_dir", default="cache")
    p_ord.add_argument("--cpu", action="store_true")
    p_ord.set_defaults(fn=cmd_ordering)

    p_vis = sub.add_parser("vis", help="domain-shift visualization")
    p_vis.add_argument("--files", required=True, nargs="+",
                       help="ECPE files; one domain label per file")
    p_vis.add_argument("--out", default="domains.png")
    p_vis.add_argument("--method", default="pca",
                       choices=["pca", "tsne", "lda"],
                       help="lda = supervised LinearDiscriminant projection "
                            "by domain (doc_cluster_vis scripts)")
    p_vis.set_defaults(fn=cmd_vis)

    p_orig = sub.add_parser(
        "original", help="original 3-latent DRL trainer (drl_classifier.py; "
                         "--bow_loss = drl_classifier_bow_loss.py)")
    _add_common(p_orig)
    p_orig.add_argument("--bow_loss", action="store_true",
                        help="learned BoW re-weighting (content classifier "
                             "sigmoid as detached per-word BCE weights)")
    p_orig.add_argument("--con_mul_loss_weight", type=float, default=3.0,
                        help="content multitask loss weight "
                             "(drl_classifier.py:46; sweep axis of the "
                             "bow_loss variant)")
    p_orig.add_argument("--pair_mul_loss_weight", type=float, default=30.0,
                        help="pair loss weight (the weights=[...] sweep at "
                             "drl_classifier.py:966)")
    p_orig.set_defaults(fn=cmd_original)

    p_pair = sub.add_parser("pair", help="plain (non-VAE) pair classifier")
    _add_common(p_pair)
    p_pair.add_argument("--sentence_pair", action="store_true",
                        help="two-segment encoding (self-chain variant)")
    p_pair.set_defaults(fn=cmd_pair)

    p_emb = sub.add_parser(
        "embed", help="contrastive domain-embedder fine-tuning "
                      "(sentence-transformer scripts)")
    _add_common(p_emb)
    p_emb.add_argument("--files", required=True, nargs="+",
                       help="ECPE domain files; each file = one domain label")
    p_emb.add_argument("--level", default="doc", choices=["doc", "clause"],
                       help="doc = chi/en_sentence_transformer, clause = "
                            "the _ec_ variants")
    p_emb.add_argument("--out", required=True,
                       help="orbax output dir for the fine-tuned encoder")
    p_emb.add_argument("--dump_embeddings", default="",
                       help="optional .npz path for the corpus embeddings")
    p_emb.add_argument("--max_texts", type=int, default=0)
    p_emb.set_defaults(fn=cmd_embed)

    p_cit = sub.add_parser(
        "cit", help="CIT triple classifier over pair-inference outputs "
                    "(mc_classifier.py)")
    _add_common(p_cit)
    p_cit.add_argument("--pred_pkl", required=True,
                       help="{id}_pred.pkl from `infer --output_dir`")
    p_cit.add_argument("--true_pkl", required=True,
                       help="{id}_true.pkl from `infer --output_dir`")
    p_cit.set_defaults(fn=cmd_cit)

    p_dann = sub.add_parser(
        "dann", help="clause-level DANN emotion classifier "
                     "(emotion_classifier.py)")
    _add_common(p_dann)
    p_dann.add_argument("--doc_dir", default="",
                        help="domain-file dir under data_root "
                             "(default domains/THUCTC_multiple)")
    p_dann.add_argument("--domain_weight", type=float, default=3.0,
                        help="GRL lambda (reference default 3)")
    p_dann.add_argument("--no_domain_loss", action="store_true",
                        help="drop the adversarial domain term, exactly "
                             "like the reference's shipped train loop")
    p_dann.set_defaults(fn=cmd_dann)

    p_pre2 = sub.add_parser("pretrain",
                            help="MLM-pretrain the encoder on a corpus")
    _add_common(p_pre2)
    p_pre2.add_argument("--corpus", default="", nargs="*",
                        help="ECPE corpus paths (default: the preset's bow "
                             "corpus)")
    p_pre2.add_argument("--raw_corpus", default="", nargs="*",
                        help="plain-text corpus paths, split into sentence "
                             "segments (e.g. data/amazon reviews)")
    p_pre2.add_argument("--scan_size", type=int, default=50)
    p_pre2.add_argument("--out", required=True,
                        help="orbax output dir for the encoder params")
    p_pre2.add_argument("--steps", type=int, default=2000)
    p_pre2.add_argument("--seq_len", type=int, default=64)
    p_pre2.add_argument("--mlm_batch", type=int, default=256)
    p_pre2.add_argument("--mlm_lr", type=float, default=1e-4)
    p_pre2.add_argument("--mask_prob", type=float, default=0.15,
                        help="MLM masking ratio (0.3 trains faster at this "
                             "scale — MosaicBERT, arXiv:2312.17482)")
    p_pre2.add_argument("--whole_word", action="store_true",
                        help="whole-word masking (jieba words for zh, "
                             "WordPiece words for en) — the wwm-ext recipe")
    p_pre2.add_argument("--lr_decay", action="store_true",
                        help="cosine decay to 10%% of peak over --steps")
    p_pre2.add_argument("--warmup_steps", type=int, default=200)
    p_pre2.add_argument("--init_encoder", default="",
                        help="orbax encoder dir to resume pretraining from")
    p_pre2.add_argument("--save_every", type=int, default=0,
                        help="snapshot the encoder every N steps")
    p_pre2.add_argument("--save_mlm", default="",
                        help="also save the full MLM model (encoder + head) "
                             "here, for `ordering --mlm_model` scoring")
    p_pre2.set_defaults(fn=cmd_pretrain)

    p_case = sub.add_parser("case_analysis",
                            help="compare two checkpoints (mmd vs ablation)")
    _add_common(p_case)
    p_case.add_argument("--model_id_a", required=True)
    p_case.add_argument("--model_id_b", required=True)
    p_case.add_argument("--out_csv", default="wommd_mmd_fin.csv")
    p_case.set_defaults(fn=cmd_case_analysis)

    p_hpo = sub.add_parser("hpo", help="hyperparameter search")
    _add_common(p_hpo)
    p_hpo.add_argument("--n_trials", type=int, default=20)
    p_hpo.set_defaults(fn=cmd_hpo)

    return parser


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
