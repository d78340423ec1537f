"""Retrieval CLI — mirror of the reference entry point
(reference: Downstream_task/Retrieval/full_dset_retrieval.py:512-793)."""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from medvill_tpu.cli import add_parallelism_args, parallelism_kwargs
from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                     RetrievalConfig)
from medvill_tpu.core import checkpoint as ckpt_lib
from medvill_tpu.core.mesh import cli_mesh_and_place, global_any
from medvill_tpu.data.pretrain import BatchLoader, dispatch_loader
from medvill_tpu.data.retrieval import CXRRetrievalDataset, collate_pairs
from medvill_tpu.data.tokenization import BertTokenizer
from medvill_tpu.train import optim, retrieve
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
    p.add_argument("--train_dataset", type=str, default="")
    p.add_argument("--eval_dataset", type=str, default="",
                   help="explicit eval JSONL; overrides the per-protocol "
                        "flags below for both valid and test")
    # the reference selects the eval pools by protocol: label-conditioned
    # vs study-ID matching (full_dset_retrieval.py:564-585)
    p.add_argument("--label_conditioned_valid_dataset", type=str, default="")
    p.add_argument("--label_conditioned_test_dataset", type=str, default="")
    p.add_argument("--studyID_valid_dataset", type=str, default="")
    p.add_argument("--studyID_test_dataset", type=str, default="")
    p.add_argument("--MIMIC_dset", type=str2bool, default=False,
                   help="accepted for reference compatibility; the "
                        "reference uses it to skip a 'split' key when "
                        "positionally unpacking row keys "
                        "(full_dset_retrieval.py:109-155) — our rows are "
                        "read by name, so both layouts just work")
    add_parallelism_args(p)
    p.add_argument("--num_workers", type=int, default=1,
                   help="eval-loader worker threads (reference "
                        "full_dset_retrieval.py:572-585 DataLoader "
                        "num_workers)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="train micro-steps per jit dispatch (lax.scan "
                        "over stacked pos+neg pair batches) — amortizes "
                        "per-dispatch host/runtime overhead; no reference "
                        "equivalent")
    p.add_argument("--vocab_file", type=str, required=True)
    p.add_argument("--output_path", type=str, default="output_retrieval")
    p.add_argument("--do_train", type=str2bool, default=True)
    p.add_argument("--do_test", type=str2bool, default=False)
    p.add_argument("--eval_during_training", type=str2bool, default=False)
    p.add_argument("--i2t", type=str2bool, default=True)
    p.add_argument("--t2i", type=str2bool, default=False)
    p.add_argument("--label_conditioned", type=str2bool, default=True)
    p.add_argument("--batch_size", type=int, default=70)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--seq_len", type=int, default=253)
    p.add_argument("--num_image_embeds", type=int, default=180)
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--img_channel", type=int, default=3, choices=[1, 3],
                   help="1 expands grayscale JPGs to 3 channels at load "
                        "(reference full_dset_retrieval.py:174-176,239-241)")
    p.add_argument("--eval_len_size", type=int, default=759)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--load_pretrained_model", type=str, default=None)
    p.add_argument("--bert_model", type=str, default="bert-base-scratch")
    p.add_argument("--vocab_size", type=int, default=30522)
    p.add_argument("--CXRBERT", type=str2bool, default=True,
                   help="True: CXRBERT joint-encoder retrieval; False: the "
                        "late-fusion CNN_BERT baseline (reference: "
                        "full_dset_retrieval.py:656,549-555)")
    return p


def main(args) -> None:
    set_seed(args.seed)
    use_hardware_prng()  # TPU rbg dropout keys: ~5% of step time
    os.makedirs(args.output_path, exist_ok=True)
    logger = create_logger(os.path.join(args.output_path, "train.log"), args)
    metrics_log = MetricLogger(args.output_path, project="retrieval",
                               config=vars(args))
    tokenizer = make_tokenizer(args.vocab_file, remap_unused=False)
    bert = BertConfig.from_name(args.bert_model, args.vocab_size)
    cfg = RetrievalConfig(
        bert=bert,
        train_dataset=args.train_dataset, eval_dataset=args.eval_dataset,
        output_path=args.output_path, batch_size=args.batch_size,
        epochs=args.epochs, lr=args.lr, seq_len=args.seq_len,
        img_size=args.img_size, seed=args.seed,
        direction="i2t" if args.i2t else "t2i",
        eval_len_size=args.eval_len_size,
        pretrained_ckpt=args.load_pretrained_model,
        image=ImageEncoderConfig(num_image_embeds=args.num_image_embeds,
                                 img_size=args.img_size,
                                 img_channel=getattr(args, "img_channel",
                                                     3)))

    mesh, place_state = cli_mesh_and_place(cfg.mesh_shape,
                                           num_heads=cfg.bert.num_attention_heads,
                                           **parallelism_kwargs(args))
    import jax.numpy as jnp
    from medvill_tpu.train.pretrain import init_state
    from medvill_tpu.core.config import PretrainConfig

    if not args.CXRBERT:
        # late-fusion CNN_BERT baseline branch
        # (reference: full_dset_retrieval.py:38,549-555,656)
        from medvill_tpu.models.cnn_bert import CNNBert

        model = CNNBert(cfg.bert, n_classes=2)
        L2 = cfg.seq_len + 2
        tx = optim.adamw(cfg.lr)
        variables = model.init(
            {"params": jax.random.PRNGKey(cfg.seed)},
            jnp.zeros((2, L2), jnp.int32), jnp.ones((2,), jnp.int32),
            jnp.zeros((2, L2), jnp.int32),
            jnp.zeros((2, cfg.img_size, cfg.img_size, 3)))
        state = TrainState(step=jnp.zeros([], jnp.int32),
                           params=variables["params"],
                           batch_stats=variables.get("batch_stats", {}),
                           opt_state=tx.init(variables["params"]))
        if cfg.pretrained_ckpt:
            from medvill_tpu.core import torch_init

            # reference: CNN_BERT.from_pretrained(ckpt)
            # (full_dset_retrieval.py:549-555)
            state = ckpt_lib.restore_pretrained(
                state, tx, cfg.pretrained_ckpt,
                torch_init.init_cnn_bert_from_torch, logger, "CNN_BERT")
        state = place_state(state)
        run_retrieval(args, cfg, mesh, model, tx, state, tokenizer,
                      retrieve.make_cnn_train_step,
                      retrieve.make_cnn_score_step, logger, metrics_log)
        metrics_log.finish()
        return

    model = retrieve.build_model(cfg)
    pcfg = PretrainConfig(seq_len=cfg.seq_len, bert=cfg.bert,
                          image=cfg.image, lr=cfg.lr)
    tx = optim.adamw(cfg.lr)
    if cfg.image.freeze_prefix_stages and cfg.image.encoder != "ViT":
        # whole-trunk CNN freeze inherited from the CXRBERT constructor
        # (cxrbert_origin.py:66-70)
        from medvill_tpu.models import resnet as resnet_lib
        tx = optim.masked_trainable(
            tx, lambda p: resnet_lib.cnn_freeze_mask(
                p, ("enc", "img_encoder")))
    _, state = init_state(pcfg, jax.random.PRNGKey(cfg.seed), tx)
    if cfg.pretrained_ckpt:
        from medvill_tpu.core import torch_init

        # the published MedViLL weights are a torch CXRBERT checkpoint
        # (reference: retrieval.py:17-24 CXRBERT.from_pretrained)
        state = ckpt_lib.restore_pretrained(
            state, tx, cfg.pretrained_ckpt,
            torch_init.init_cxrbert_from_torch, logger, "pretrain")
    state = place_state(state)
    run_retrieval(args, cfg, mesh, model, tx, state, tokenizer,
                  retrieve.make_train_step, retrieve.make_score_step,
                  logger, metrics_log)
    metrics_log.finish()


def run_retrieval(args, cfg, mesh, model, tx, state, tokenizer, make_train,
                  make_score, logger, metrics_log) -> None:
    """Shared train/eval driver for both model branches
    (reference: full_dset_retrieval.py:341-510)."""
    cxr_bert = bool(args.CXRBERT)
    # eval-pool resolution (reference full_dset_retrieval.py:564-585):
    # valid pool during training, test pool for do_test; each chosen by the
    # label_conditioned protocol switch; --eval_dataset overrides both
    if args.label_conditioned:
        valid_path = (args.eval_dataset
                      or getattr(args, "label_conditioned_valid_dataset", ""))
        test_path = (args.eval_dataset
                     or getattr(args, "label_conditioned_test_dataset", ""))
    else:
        valid_path = (args.eval_dataset
                      or getattr(args, "studyID_valid_dataset", ""))
        test_path = (args.eval_dataset
                     or getattr(args, "studyID_test_dataset", ""))
    workers = getattr(args, "num_workers", 1)
    if args.do_train:
        train_ds = CXRRetrievalDataset(
            cfg.train_dataset, tokenizer, cfg, is_train=True,
            label_conditioned=args.label_conditioned, seed=cfg.seed,
            cxr_bert=cxr_bert)
        # pair collate: pos+neg concatenated on batch; fold the epoch into
        # the shuffle seed so every epoch visits a fresh order (the
        # reference's DataLoader(shuffle=True) reshuffles per epoch)
        def pair_iter(epoch):
            order = np.arange(len(train_ds))
            np.random.default_rng(cfg.seed + epoch).shuffle(order)
            B = cfg.batch_size
            for i in range(len(train_ds) // B):
                yield collate_pairs([train_ds[int(j)]
                                     for j in order[i * B:(i + 1) * B]])

        k_disp = max(1, getattr(args, "steps_per_dispatch", 1))
        train_step = jax.jit(make_train(model, tx, cfg),
                             donate_argnums=(0,))
        # k-micro-steps/dispatch works for BOTH model branches: the scan
        # wrapper is step-agnostic (optim.scan_micro_steps)
        multi_step = (jax.jit(optim.scan_micro_steps(
            make_train(model, tx, cfg), k_disp), donate_argnums=(0,))
            if k_disp > 1 else None)
        # build the eval pipeline ONCE: a fresh jax.jit(make_score(...))
        # per epoch would retrace/recompile the scoring program every time
        eval_ds = eval_loader = score_step = None
        if args.eval_during_training and valid_path:
            eval_ds = CXRRetrievalDataset(valid_path, tokenizer, cfg,
                                          is_train=False, cxr_bert=cxr_bert)
            eval_loader = BatchLoader(eval_ds, cfg.batch_size,
                                      shuffle=False, workers=workers,
                                      drop_last=False)
            score_step = jax.jit(make_score(model, cfg))
        guard = preempt.PreemptionGuard(logger=logger)
        _multi = jax.process_count() > 1
        PREEMPT_POLL = preempt.POLL_EVERY

        def preempted(batch_idx: int) -> bool:
            # multi-host: every host must agree to stop at the same
            # dispatch boundary (core/mesh.py::global_any).  Collective
            # poll every PREEMPT_POLL batches, gated on the SHARED batch
            # counter (not the local flag — every host must enter the
            # collective at the same boundary); per-batch checks would
            # host-sync the pipeline each step.
            if not _multi:
                return guard.triggered
            if (batch_idx + 1) % PREEMPT_POLL:
                return False
            return global_any(mesh, guard.triggered)

        with guard:
          for epoch in range(cfg.epochs):
            losses, accs = [], []
            for bi, (batch, is_group) in enumerate(
                    dispatch_loader(pair_iter(epoch), mesh, k_disp)):
                step = multi_step if is_group else train_step
                state, m = step(state, batch, jax.random.PRNGKey(cfg.seed))
                # device values — float() here would host-sync every step
                losses.append(m["loss"])
                accs.append(m["acc"])
                if preempted(bi):
                    # graceful preemption: keep the work (save-only, like
                    # classification — retrieval pairs are resampled per
                    # epoch so there is no replayable mid-epoch position)
                    jax.block_until_ready(m["loss"])
                    if ckpt_lib.is_saving_process(state):
                        ckpt_lib.save(cfg.output_path, epoch, state,
                                      config=vars(args))
                    logger.info("preempted (signal %s): saved epoch %d to "
                                "%s", guard.signum, epoch, cfg.output_path)
                    return
            row = {"train_loss": float(np.mean(drain_metrics(losses))),
                   "train_acc": float(np.mean(drain_metrics(accs)))}
            metrics_log.log(row, step=epoch)
            logger.info("epoch %d: %s", epoch, row)
            if ckpt_lib.is_saving_process(state):
                ckpt_lib.save(cfg.output_path, epoch, state,
                              config=vars(args))
            if score_step is not None:
                # reference: full_dset_retrieval.py:415-458 (valid pool)
                res = retrieve.run_retrieval_eval(
                    score_step, state, eval_loader, cfg.eval_len_size,
                    cfg.direction,
                    rank_dump_path=os.path.join(
                        cfg.output_path, "rank_result_at_eval.json"),
                    records=eval_ds.data)
                logger.info("epoch %d eval: %s", epoch, res)
                metrics_log.log({"mrr": res["mrr"]}, step=epoch)

    if args.do_test and test_path:
        eval_ds = CXRRetrievalDataset(test_path, tokenizer, cfg,
                                      is_train=False, cxr_bert=cxr_bert)
        eval_loader = BatchLoader(eval_ds, cfg.batch_size, shuffle=False,
                                  workers=workers, drop_last=False)
        if not args.do_train or score_step is None:
            score_step = jax.jit(make_score(model, cfg))
        results = retrieve.run_retrieval_eval(
            score_step, state, eval_loader, cfg.eval_len_size,
            cfg.direction,
            rank_dump_path=os.path.join(cfg.output_path,
                                        "rank_result_at_eval.json"),
            records=eval_ds.data)
        logger.info("retrieval eval: %s", results)
        with open(os.path.join(cfg.output_path, "eval_results.json"),
                  "w") as f:
            json.dump(results, f, indent=2)
        metrics_log.log({"mrr": results["mrr"],
                         **results["hits"][f"{cfg.direction}_retrieval"]})


if __name__ == "__main__":
    main(build_parser().parse_args())
