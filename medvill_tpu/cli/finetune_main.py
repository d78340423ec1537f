"""Report-generation / VQA finetune CLI — mirror of the reference
(reference: sc/finetune.py:49-495; DDP/NCCL replaced by a pjit data mesh,
apex AMP by native bf16, resume-by-scan by orbax latest_epoch)."""
from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax
import numpy as np

from medvill_tpu.cli import add_parallelism_args, parallelism_kwargs
from medvill_tpu.core.config import (BertConfig, FinetuneConfig,
                                     ImageEncoderConfig)
from medvill_tpu.core import checkpoint as ckpt_lib
from medvill_tpu.core.mesh import (cli_mesh_and_place, global_any,
                                   multihost_initialize)
from medvill_tpu.data.pretrain import BatchLoader, dispatch_loader
from medvill_tpu.data.seq2seq import Img2TxtDataset
from medvill_tpu.data.tokenization import BertTokenizer
from medvill_tpu.data.vqa import VQADataset
from medvill_tpu.train import finetune as ft
from medvill_tpu.train import optim
from medvill_tpu.train.pretrain import TrainState
from medvill_tpu.utils.logging import (MetricLogger, create_logger,
                                        drain_metrics)
from medvill_tpu.utils import preempt
from medvill_tpu.utils.seed import set_seed, use_hardware_prng


def make_tokenizer(vocab_file: str, remap_unused: bool = False):
    """Native-backed tokenizer when the C++ library builds, else Python."""
    try:
        from medvill_tpu.data.native_tokenizer import NativeBertTokenizer

        t = NativeBertTokenizer(vocab_file, remap_unused=remap_unused)
        return t
    except Exception:
        return BertTokenizer.from_vocab_file(vocab_file,
                                             remap_unused=remap_unused)


from medvill_tpu.cli import str2bool  # noqa: E402


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--tasks", type=str, default="report_generation",
                   choices=["report_generation", "vqa"])
    p.add_argument("--src_file", type=str, required=True,
                   help="report-gen: train JSONL; vqa: VQA-RAD dataroot")
    p.add_argument("--image_root", type=str, default="")
    p.add_argument("--vocab_file", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="output_finetune")
    p.add_argument("--model_recover_path", type=str, default=None)
    p.add_argument("--train_batch_size", type=int, default=4)
    p.add_argument("--num_train_epochs", type=int, default=5)
    p.add_argument("--learning_rate", type=float, default=3e-5)
    p.add_argument("--warmup_proportion", type=float, default=0.1)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--label_smoothing", type=float, default=0.1)
    p.add_argument("--drop_prob", type=float, default=0.1,
                   help="model dropout override — sets BOTH attention and "
                        "hidden dropout (reference model.py:620-623)")
    p.add_argument("--max_drop_worst_ratio", type=float, default=0.0,
                   help="Ruotian-Luo drop-worst ratio (reference "
                        "finetune.py:179; 0 = off, the reference default)")
    p.add_argument("--drop_after", type=int, default=6,
                   help="drop-worst activates when the 1-based epoch "
                        "exceeds this (reference finetune.py:180,440)")
    p.add_argument("--trunc_seg", type=str, default="b",
                   choices=["a", "b", ""],
                   help="segment to truncate when neither cap is exceeded "
                        "(reference finetune.py:158)")
    p.add_argument("--always_truncate_tail", action="store_true",
                   help="always pop the tail instead of 50%% head/tail "
                        "(reference finetune.py:160)")
    p.add_argument("--sche_mode", type=str, default="warmup_linear",
                   choices=["warmup_linear", "warmup_constant",
                            "warmup_cosine"],
                   help="BertAdam LR schedule (reference finetune.py:175)")
    p.add_argument("--from_scratch", action="store_true",
                   help="ignore --bert_init_path/--model_recover_path and "
                        "train from random init (reference finetune.py:314)")
    p.add_argument("--do_train", type=str2bool, default=True,
                   help="False skips training (eval-only with --vqa_eval; "
                        "reference finetune.py:101,260,410)")
    p.add_argument("--data_set", type=str, default="train",
                   choices=["train", "valid"],
                   help="'valid' loads --file_valid_jpgs instead of "
                        "--src_file (reference data_loader.py:217-224)")
    p.add_argument("--file_valid_jpgs", type=str, default=None)
    p.add_argument("--config_path", type=str, default=None,
                   help="reference-style config.json overlaying the BERT "
                        "config (written next to torch checkpoints; "
                        "reference finetune.py:319)")
    p.add_argument("--max_position_embeddings", type=int, default=512)
    p.add_argument("--num_workers", type=int, default=1,
                   help="loader worker threads (reference DataLoader "
                        "num_workers, finetune.py:284-286)")
    add_parallelism_args(p)
    p.add_argument("--log_file", type=str, default="training.log",
                   help="log filename under output_dir (reference "
                        "--log_file, finetune.py:223)")
    p.add_argument("--max_pred", type=int, default=128)
    p.add_argument("--mask_prob", type=float, default=0.15)
    p.add_argument("--len_vis_input", type=int, default=256)
    p.add_argument("--max_len_b", type=int, default=253)
    p.add_argument("--max_seq_length", type=int, default=512)
    p.add_argument("--new_segment_ids", type=str2bool, default=True)
    p.add_argument("--s2s_prob", type=float, default=1.0)
    p.add_argument("--bi_prob", type=float, default=0.0)
    p.add_argument("--bar", type=str2bool, default=False)
    p.add_argument("--vqa_rad", type=str, default="chest",
                   choices=["all", "chest", "head", "abd"])
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--vqa_eval", type=str2bool, default=False)
    p.add_argument("--bert_model", type=str, default="bert-base-scratch")
    p.add_argument("--vocab_size", type=int, default=30522)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--bert_init_path", type=str, default=None,
                   help="HF BERT torch .bin to initialize the VLP encoder "
                        "(used when training without a pretrain recover "
                        "path; reference: from_pretrained in finetune.py)")
    p.add_argument("--resnet_init_path", type=str, default=None,
                   help="torchvision resnet50 .pth for the visual trunk "
                        "(reference: vlp resnet pretrained init)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="k train micro-steps per jit dispatch (lax.scan "
                        "over stacked batches) — amortizes per-dispatch "
                        "host/RPC overhead; same mechanism as the pretrain "
                        "CLI's flag")
    p.add_argument("--relax_projection", action="store_true",
                   help="4 task-specific MLM-head projections selected by "
                        "task_idx (reference: finetune.py:182,307-319)")
    return p


def config_from_args(args) -> FinetuneConfig:
    import dataclasses

    bert = BertConfig.vlp(
        BertConfig.from_name(args.bert_model, args.vocab_size),
        new_segment_ids=args.new_segment_ids)
    if getattr(args, "relax_projection", False):
        # reference: relax_projection = 4 if args.relax_projection else 0
        # (finetune.py:307)
        bert = dataclasses.replace(bert, relax_projection=4)
    if getattr(args, "config_path", None):
        bert = BertConfig.from_reference_json(args.config_path, base=bert)
    # --drop_prob sets both dropout rates (reference model.py:620-623)
    bert = dataclasses.replace(
        bert, hidden_dropout_prob=args.drop_prob,
        attention_probs_dropout_prob=args.drop_prob)
    # --max_position_embeddings is a from_pretrained override
    # (finetune.py:320); a non-default value wins over config.json
    mpe = getattr(args, "max_position_embeddings", 512)
    if mpe not in (None, 512):
        bert = dataclasses.replace(bert, max_position_embeddings=mpe)
    return FinetuneConfig(
        task=args.tasks, src_file=args.src_file,
        output_dir=args.output_dir,
        model_recover_path=args.model_recover_path,
        batch_size=args.train_batch_size, epochs=args.num_train_epochs,
        lr=args.learning_rate, warmup=args.warmup_proportion,
        weight_decay=args.weight_decay,
        label_smoothing=args.label_smoothing, drop_prob=args.drop_prob,
        max_drop_worst_ratio=getattr(args, "max_drop_worst_ratio", 0.0),
        drop_after=getattr(args, "drop_after", 6),
        trunc_seg=(getattr(args, "trunc_seg", "b") or None),
        always_truncate_tail=getattr(args, "always_truncate_tail", False),
        sche_mode=getattr(args, "sche_mode", "warmup_linear"),
        max_pred=args.max_pred, mask_prob=args.mask_prob,
        len_vis_input=args.len_vis_input, max_len_b=args.max_len_b,
        max_seq_length=args.max_seq_length,
        new_segment_ids=args.new_segment_ids, s2s_prob=args.s2s_prob,
        bi_prob=args.bi_prob, bar=args.bar,
        vqa_organs=(args.vqa_rad,) if args.vqa_rad != "all" else
        ("chest", "head", "abd"),
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        img_size=args.img_size, seed=args.seed, bert=bert,
        image=ImageEncoderConfig(num_image_embeds=args.len_vis_input,
                                 img_size=args.img_size,
                                 encoder="full-fiber"))


def main(args) -> None:
    multihost_initialize()
    set_seed(args.seed)
    use_hardware_prng()  # TPU rbg dropout keys: ~5% of step time
    if getattr(args, "from_scratch", False):
        # reference: _state_dict = {} if args.from_scratch else None
        # (finetune.py:314) — no pretrained weights of any kind
        args.bert_init_path = None
        args.resnet_init_path = None
        args.model_recover_path = None
    cfg = config_from_args(args)
    os.makedirs(cfg.output_dir, exist_ok=True)
    logger = create_logger(os.path.join(
        cfg.output_dir, getattr(args, "log_file", "training.log")), args)
    with open(os.path.join(cfg.output_dir, "opt.json"), "w") as f:
        json.dump(vars(args), f, indent=2)  # reference: finetune.py:213-214
    metrics_log = MetricLogger(cfg.output_dir, project="finetune",
                               config=vars(args))
    tokenizer = make_tokenizer(args.vocab_file, remap_unused=True)

    if cfg.task == "vqa":
        ds = VQADataset(cfg, tokenizer, args.src_file, split="train",
                        image_root=args.image_root, seed=cfg.seed)
    else:
        # data_set='valid' reads --file_valid_jpgs instead of --src_file
        # (reference data_loader.py:217-224)
        src = args.src_file
        if (getattr(args, "data_set", "train") == "valid"
                and getattr(args, "file_valid_jpgs", None)):
            src = args.file_valid_jpgs
        ds = Img2TxtDataset(src, tokenizer, cfg, seed=cfg.seed)
    loader = BatchLoader(ds, cfg.batch_size, shuffle=True, seed=cfg.seed,
                         num_shards=jax.process_count(),
                         shard_index=jax.process_index(),
                         workers=getattr(args, "num_workers", 1))
    # t_total counts OPTIMIZER steps (reference: finetune.py t_total =
    # len(loader) / grad_accum * epochs)
    t_total = max(1, len(loader) * cfg.epochs
                  // cfg.gradient_accumulation_steps)

    mp = max(1, getattr(args, "model_parallel", 1))
    mesh, place_state = cli_mesh_and_place(cfg.mesh_shape,
                                           num_heads=cfg.bert.num_attention_heads,
                                           **parallelism_kwargs(args))
    model = ft.build_model(cfg)
    import jax.numpy as jnp

    B, L = 2, cfg.max_seq_length
    dummy_bias = jnp.zeros((B, 1, L, L))
    variables = model.init(
        {"params": jax.random.PRNGKey(cfg.seed)},
        jnp.zeros((B, cfg.img_size, cfg.img_size, 3)),
        jnp.zeros((B, L), jnp.int32), jnp.zeros((B, L), jnp.int32),
        dummy_bias,
        masked_pos=(jnp.zeros((B, cfg.max_pred), jnp.int32)
                    if cfg.task != "vqa" else None),
        deterministic=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if args.bert_init_path:
        from medvill_tpu.core import torch_init

        params = torch_init.init_bert_from_torch(
            params, args.bert_init_path, enc_key="bert",
            num_layers=cfg.bert.num_hidden_layers)
        logger.info("initialized encoder from %s", args.bert_init_path)
    if args.resnet_init_path:
        from medvill_tpu.core import torch_init

        params, batch_stats = torch_init.init_resnet_from_torch(
            params, batch_stats, args.resnet_init_path,
            trunk_path=("bert", "img_encoder"))
        logger.info("initialized visual trunk from %s",
                    args.resnet_init_path)
    tx = ft.make_finetune_tx(cfg)
    if cfg.image.freeze_prefix_stages:
        # unconditional whole-trunk CNN freeze from the reference model
        # constructor (model.py:910-924); the train step stop-grads the
        # same leaves
        from medvill_tpu.models import resnet as resnet_lib
        tx = optim.masked_trainable(
            tx, lambda p: resnet_lib.cnn_freeze_mask(
                p, ("bert", "img_encoder")))
    state = TrainState(step=jnp.zeros([], jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params))

    # resume-by-scan (reference: finetune.py:37-47,396-405)
    start_epoch = 0
    skip_batches = 0
    recover = ckpt_lib.latest_epoch(cfg.output_dir)
    if recover is not None:
        pass  # placed restore below (after place_state)
    elif cfg.model_recover_path:
        if os.path.isfile(cfg.model_recover_path):
            # torch pretrain checkpoint (the published MedViLL .pth) —
            # the reference finetune's recover path with the enc.->bert.,
            # mlm.->cls. key remap (finetune.py:330-357)
            from medvill_tpu.core import torch_init

            sd = _torch_pretrain_to_vlp_sd(
                torch_init.load_torch_state_dict(cfg.model_recover_path),
                getattr(cfg.bert, "relax_projection", 1) or 1)
            params, bs = torch_init.init_vlp_from_torch(
                params, state.batch_stats, sd)
        else:
            # orbax pretrain run dir (key remap enc.->bert. handled by
            # subtree merge; reference: finetune.py:333-339)
            pe = ckpt_lib.latest_epoch(cfg.model_recover_path)
            if pe is None:
                # fail loudly: a typo'd recover path silently finetuning
                # from random init would report garbage as real results
                raise FileNotFoundError(
                    f"--model_recover_path {cfg.model_recover_path}: not "
                    "a torch checkpoint file and no orbax epoch found")
            restored = ckpt_lib.restore(cfg.model_recover_path, pe, None)
            params, bs = _merge_pretrain(params, restored,
                                         state.batch_stats)
        state = TrainState(step=state.step, params=params,
                           batch_stats=bs, opt_state=tx.init(params))
        logger.info("recovered pretrain weights from %s",
                    cfg.model_recover_path)

    # place BEFORE the orbax resume restore: the checkpoint then reads
    # directly into the run's sharded layout (zero1/TP).  Restoring into
    # the unplaced host state first would make the later placement reshard
    # committed cross-process arrays outside jit (DCN transport error on
    # the CPU Gloo multi-host harness; see pretrain_main + the pretrain
    # multi-process preemption test for the composed proof).
    state = place_state(state)
    if recover is not None:
        state = ckpt_lib.restore(cfg.output_dir, recover, state)
        start_epoch = recover + 1
        logger.info("resumed from epoch %d", recover)
        # a preemption marker (utils/preempt.py) means epoch `recover` was
        # interrupted mid-epoch: re-enter it and skip the trained batches
        # instead of skipping to recover + 1
        _marker = preempt.read_marker(cfg.output_dir)
        if _marker is not None:
            if _marker["epoch"] == recover and _marker["batches_done"]:
                start_epoch = recover
                skip_batches = int(_marker["batches_done"])
                logger.info("preemption marker: re-entering epoch %d at "
                            "host batch %d", recover, skip_batches)
            preempt.clear_marker(cfg.output_dir)
    if mp > 1:
        logger.info("tensor-parallel degree %d over a %s mesh", mp,
                    dict(mesh.shape))
    # drop-worst is epoch-gated (reference finetune.py:440: active when the
    # 1-based epoch exceeds drop_after) and static in the compiled step, so
    # at most two jitted specializations exist (x single/multi dispatch)
    k_disp = max(1, getattr(args, "steps_per_dispatch", 1))
    _steps = {}
    # canonical output placement: keeps the live run on the same program
    # as a checkpoint-restored run (see pretrain_main — GSPMD-propagated
    # output shardings otherwise diverge at the ulp level under --zero1,
    # breaking bit-exact preemption resume)
    canon = jax.tree_util.tree_map(lambda x: getattr(x, "sharding", None),
                                   state)

    def step_for_epoch(epoch0: int, multi: bool):
        ratio = ft.drop_worst_ratio_for_epoch(cfg, epoch0)
        key = (ratio, multi)
        if key not in _steps:
            make = (lambda: ft.make_multi_train_step(
                model, tx, cfg, t_total, k_disp, drop_worst_ratio=ratio)
            ) if multi else (lambda: ft.make_train_step(
                model, tx, cfg, t_total, drop_worst_ratio=ratio))
            _steps[key] = jax.jit(make(), donate_argnums=(0,),
                                  out_shardings=(canon, None))
        return _steps[key]

    _KEYS = ("image", "input_ids", "segment_ids", "mask_spec", "masked_ids",
             "masked_pos", "masked_weights", "ans_target", "task_idx")

    def filtered(batches):
        for b in batches:
            yield {k: v for k, v in b.items() if k in _KEYS}

    epochs = range(start_epoch, cfg.epochs) if getattr(
        args, "do_train", True) else ()
    if skip_batches >= len(loader):
        epochs = range(start_epoch + 1, cfg.epochs) if epochs else ()
        skip_batches = 0
    loader.epoch = start_epoch
    if skip_batches:
        loader.skip_next(skip_batches)
    guard = preempt.PreemptionGuard(logger=logger)
    _multi = jax.process_count() > 1

    def preempted() -> bool:
        # multi-host: every host must agree to stop at the same dispatch
        # boundary (core/mesh.py::global_any)
        return (global_any(mesh, guard.triggered) if _multi
                else guard.triggered)

    with guard:
      for epoch in epochs:
        agg = {}
        batches_done = skip_batches if epoch == start_epoch else 0
        # prefetch + device placement overlap the running step (same
        # pipeline as the pretrain CLI)
        prefetched = dispatch_loader(filtered(loader), mesh, k_disp)
        for batch, is_group in prefetched:
            train_step = step_for_epoch(epoch, is_group)
            state, m = train_step(state, batch,
                                  jax.random.PRNGKey(cfg.seed))
            # keep metrics on device: float() here would host-sync every
            # step and serialize the pipeline on dispatch latency
            for k, v in m.items():
                agg.setdefault(k, []).append(v)
            batches_done += k_disp if is_group else 1
            if preempted():
                # graceful preemption: checkpoint post-step state + the
                # host-batch position; the resume-by-scan above re-enters
                # this epoch at this exact batch on relaunch
                jax.block_until_ready(m[next(iter(m))])
                if ckpt_lib.is_saving_process(state):
                    ckpt_lib.save(cfg.output_dir, epoch, state,
                                  config=vars(args))
                    preempt.write_marker(cfg.output_dir, epoch,
                                         batches_done)
                logger.info("preempted (signal %s): saved epoch %d at "
                            "host batch %d to %s; relaunch to resume",
                            guard.signum, epoch, batches_done,
                            cfg.output_dir)
                metrics_log.finish()
                return
        row = {k: float(np.mean(drain_metrics(v)))
               for k, v in agg.items()}
        metrics_log.log(row, step=epoch)
        logger.info("epoch %d: %s", epoch, row)
        # rank-0 save (finetune.py:474-487); all hosts when shards cross
        # processes (--zero1 multi-host)
        if ckpt_lib.is_saving_process(state):
            ckpt_lib.save(cfg.output_dir, epoch, state, config=vars(args))

    if cfg.task == "vqa" and args.vqa_eval:
        # open/closed soft-score accuracy on the test split
        # (reference: model.py:1021-1041)
        test_ds = VQADataset(cfg, tokenizer, args.src_file, split="test",
                             image_root=args.image_root, seed=cfg.seed)
        test_loader = BatchLoader(test_ds, cfg.batch_size, shuffle=False,
                                  drop_last=False)
        eval_step = jax.jit(ft.make_vqa_eval_step(model, cfg))
        results = ft.vqa_evaluate(eval_step, state, test_loader)
        logger.info("vqa eval: %s", results)
        metrics_log.log(results)
    metrics_log.finish()


def _torch_pretrain_to_vlp_sd(sd, relax_projection=1):
    """Rewrite a torch CXRBERT *pretrain* state_dict into the VLP finetune
    layout that ``torch_init.init_vlp_from_torch`` ingests: ``enc.`` keys
    drop their prefix, ``mlm.`` becomes ``cls.`` and ``itm.`` is dropped —
    the reference finetune's recover remap (finetune.py:333-339,
    load_state_dict(strict=False)).  Under relax_projection the cls
    transform leaves are pre-tiled along the torch out-axis
    (model.py:689-707 stacks the pretrained projection per task)."""
    from medvill_tpu.core.torch_init import _strip_module_prefix

    out = {}
    for k, v in _strip_module_prefix(dict(sd)).items():
        if k.startswith("enc."):
            out[k[len("enc."):]] = v
        elif k.startswith("mlm."):
            out["cls." + k[len("mlm."):]] = v
        # itm.* has no finetune-model equivalent (strict=False drops it)
    if relax_projection and relax_projection > 1:
        for k in ("cls.predictions.transform.dense.weight",
                  "cls.predictions.transform.dense.bias",
                  "cls.predictions.transform.LayerNorm.weight",
                  "cls.predictions.transform.LayerNorm.bias"):
            if k in out:
                leaf = np.asarray(out[k])
                out[k] = np.concatenate([leaf] * relax_projection, axis=0)
    return out


def _merge_pretrain(params, restored, batch_stats=None):
    """Map pretrain CXRBERT params onto the finetune VLP model: ``enc.`` ->
    ``bert.`` (encoder/embeddings/img stack) and ``mlm.`` -> ``cls.``
    (reference key remap: finetune.py:333-339).  When ``batch_stats`` is
    given, the trunk BN running mean/var transfer under the same remap —
    the pretrain trunk is frozen, so those stats are the only trunk state
    pretraining updates; returns ``(params, batch_stats)`` in that case.

    Under --relax_projection the finetune MLM-head transform is
    ``relax_projection`` times wider than the pretrain one; the reference
    tiles the pretrained transform dense weight/bias and LayerNorm
    weight/bias that many times along the widened axis
    (model.py:689-707 "initialize relax projection") so every task slice
    starts from the pretrained projection.  Our flax kernel is [in, out]
    (torch is [out, in]), so the torch stack-along-out equals a tile along
    the kernel's last axis."""
    import flax

    if restored is None:
        return params if batch_stats is None else (params, batch_stats)

    def merge_tree(dst_tree, src_tree, tile_widened):
        if src_tree is None:
            return dst_tree
        flat_dst = flax.traverse_util.flatten_dict(dst_tree)
        flat_src = flax.traverse_util.flatten_dict(src_tree)
        merged = dict(flat_dst)
        for path, leaf in flat_src.items():
            if path[0] == "enc":
                cand = ("bert",) + path[1:]
            elif path[0] == "mlm":
                cand = ("cls",) + path[1:]
            else:
                cand = path
            if cand not in flat_dst:
                continue
            dst_shape = flat_dst[cand].shape
            leaf = np.asarray(leaf)
            if dst_shape == leaf.shape:
                merged[cand] = leaf
            elif (len(cand) >= 2
                  and cand[-2] == "token_type_embeddings"
                  and leaf.ndim == 2 and len(dst_shape) == 2
                  and dst_shape[1] == leaf.shape[1]):
                # pretrain type_vocab 2 -> VLP 6: the reference seeds the
                # new s2s segment slots from the pretrained image/text
                # slots (model.py:650-666) — random slots here break the
                # transferred image binding (see the helper's docstring)
                merged[cand] = ckpt_lib.expand_token_type_embeddings(
                    leaf, flat_dst[cand])
            elif (tile_widened and len(cand) >= 2
                  and cand[-2] in ("transform_dense", "transform_LayerNorm")
                  and leaf.ndim >= 1 and leaf.shape[-1] > 0
                  and dst_shape[:-1] == leaf.shape[:-1]
                  and dst_shape[-1] % leaf.shape[-1] == 0):
                reps = dst_shape[-1] // leaf.shape[-1]
                merged[cand] = np.tile(leaf,
                                       (1,) * (leaf.ndim - 1) + (reps,))
        return flax.traverse_util.unflatten_dict(merged)

    params = merge_tree(params, restored.get("params", restored), True)
    if batch_stats is None:
        return params
    return params, merge_tree(batch_stats, restored.get("batch_stats"),
                              False)


if __name__ == "__main__":
    main(build_parser().parse_args())
