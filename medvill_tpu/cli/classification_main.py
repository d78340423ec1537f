"""Disease-classification CLI — mirror of the reference MMBT entry point
(reference: Downstream_task/Classification/mmbt/main.py:23-91,385-403)."""
from __future__ import annotations

import argparse
import csv
import dataclasses
import os

import jax
import numpy as np

from medvill_tpu.cli import add_parallelism_args, parallelism_kwargs
from medvill_tpu.core.config import (BertConfig, ClassificationConfig,
                                     ImageEncoderConfig)
from medvill_tpu.core import checkpoint as ckpt_lib
from medvill_tpu.core.mesh import cli_mesh_and_place, global_any
from medvill_tpu.data.classification import (ClassificationDataset,
                                             get_labels_and_frequencies,
                                             pos_weights)
from medvill_tpu.data.pretrain import BatchLoader, dispatch_loader
from medvill_tpu.data.tokenization import BertTokenizer
from medvill_tpu.train import classify
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
    p.add_argument("--data_path", type=str, required=True)
    p.add_argument("--Train_dset_name", type=str, default="Train.jsonl")
    p.add_argument("--Valid_dset_name", type=str, default="Valid.jsonl")
    p.add_argument("--vocab_file", type=str, required=True)
    p.add_argument("--savedir", type=str, default="output_clf")
    p.add_argument("--loaddir", type=str, default="")
    p.add_argument("--save_name", "--name", dest="save_name", type=str,
                   default="clf",
                   help="run name (reference --name, mmbt/main.py:45)")
    p.add_argument("--model", type=str, default="mmbt", choices=["mmbt"],
                   help="model registry key (the reference registry contains "
                        "only 'mmbt'; mmbt/models/__init__.py:4-6)")
    p.add_argument("--task_type", type=str, default="multilabel",
                   choices=["multilabel", "classification"],
                   help="multilabel: weighted BCE + AUROC/F1; "
                        "classification: softmax CE + accuracy "
                        "(reference mmbt/main.py:30)")
    p.add_argument("--freeze_img_all", type=str2bool, default=True,
                   help="False freezes the image encoder for the whole run "
                        "(the reference assigns this to requires_grad, "
                        "mmbt/main.py:204-206 — note the inversion; its "
                        "string-typed default never freezes)")
    p.add_argument("--freeze_txt_all", type=str2bool, default=True,
                   help="False freezes the text encoder for the whole run "
                        "(mmbt/main.py:208-209)")
    p.add_argument("--n_workers", type=int, default=1,
                   help="loader worker threads (reference --n_workers, "
                        "torch DataLoader num_workers; <=1 is the "
                        "deterministic shared-RNG-stream mode)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="train micro-steps per jit dispatch (lax.scan "
                        "over stacked batches) — amortizes per-dispatch "
                        "host/runtime overhead; no reference equivalent")
    add_parallelism_args(p)
    p.add_argument("--openi", type=str2bool, default=False)
    p.add_argument("--batch_sz", type=int, default=56)
    p.add_argument("--max_epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_factor", type=float, default=0.5)
    p.add_argument("--lr_patience", type=int, default=2)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--warmup", type=float, default=0.1)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--max_seq_len", type=int, default=512)
    p.add_argument("--num_image_embeds", type=int, default=256)
    p.add_argument("--img_embed_pool_type", type=str, default="avg",
                   choices=["avg", "max"],
                   help="adaptive pool type for num_image_embeds 1-9 "
                        "(reference: mmbt/models/image.py:24-39)")
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--freeze_img", type=int, default=0)
    p.add_argument("--freeze_txt", type=int, default=0)
    p.add_argument("--weight_classes", type=str2bool, default=True)
    p.add_argument("--drop_img_percent", type=float, default=0.0)
    p.add_argument("--bert_model", type=str, default="bert-base-scratch")
    p.add_argument("--vocab_size", type=int, default=30522)
    p.add_argument("--do_test", type=str2bool, default=False)
    p.add_argument("--Test_dset_name", type=str, default="Test.jsonl")
    p.add_argument("--bert_init_path", type=str, default=None,
                   help="HF BERT torch .bin to initialize the text encoder "
                        "(reference: mmbt BertModel.from_pretrained)")
    p.add_argument("--resnet_init_path", type=str, default=None,
                   help="torchvision resnet50 .pth to initialize the image "
                        "encoder (reference: mmbt/models/image.py "
                        "pretrained=True)")
    return p


def train(args) -> None:
    set_seed(args.seed)
    use_hardware_prng()  # TPU rbg dropout keys: ~5% of step time
    savedir = os.path.join(args.savedir, args.save_name)
    os.makedirs(savedir, exist_ok=True)
    logger = create_logger(os.path.join(savedir, "logfile.log"), args)
    metrics_log = MetricLogger(savedir, project="classification",
                               config=vars(args))

    tokenizer = make_tokenizer(args.vocab_file, remap_unused=False)
    train_path = os.path.join(args.data_path, args.Train_dset_name)
    valid_path = os.path.join(args.data_path, args.Valid_dset_name)
    labels, freqs = get_labels_and_frequencies(train_path)
    bert = BertConfig.from_name(args.bert_model, args.vocab_size)
    # reference freeze-all semantics: requires_grad = args.freeze_img_all,
    # i.e. False means FROZEN for the whole run (mmbt/main.py:204-209)
    if not getattr(args, "freeze_img_all", True):
        args.freeze_img = args.max_epochs
    if not getattr(args, "freeze_txt_all", True):
        args.freeze_txt = args.max_epochs
    cfg = ClassificationConfig(
        bert=bert, task_type=getattr(args, "task_type", "multilabel"),
        data_path=args.data_path, batch_size=args.batch_sz,
        max_epochs=args.max_epochs, lr=args.lr, lr_factor=args.lr_factor,
        lr_patience=args.lr_patience, patience=args.patience,
        warmup=args.warmup, max_seq_len=args.max_seq_len,
        num_image_embeds=args.num_image_embeds, img_size=args.img_size,
        seed=args.seed, freeze_img=args.freeze_img,
        freeze_txt=args.freeze_txt, weight_classes=args.weight_classes,
        labels=tuple(labels),
        image=ImageEncoderConfig(num_image_embeds=args.num_image_embeds,
                                 img_size=args.img_size,
                                 # the 1-9-embed configs use the reference's
                                 # adaptive-pool table; larger counts take
                                 # trunk fibers directly
                                 encoder=("pool" if args.num_image_embeds <= 9
                                          else "full-fiber"),
                                 pool_type=args.img_embed_pool_type))

    train_ds = ClassificationDataset(
        train_path, tokenizer, labels, cfg.max_seq_len,
        cfg.num_image_embeds, cfg.img_size,
        drop_img_percent=args.drop_img_percent, openi=args.openi,
        task_type=cfg.task_type)
    valid_ds = ClassificationDataset(
        valid_path, tokenizer, labels, cfg.max_seq_len,
        cfg.num_image_embeds, cfg.img_size, openi=args.openi,
        task_type=cfg.task_type)
    workers = getattr(args, "n_workers", 0)
    train_loader = BatchLoader(train_ds, cfg.batch_size, shuffle=True,
                               seed=cfg.seed, workers=workers)
    valid_loader = BatchLoader(valid_ds, cfg.batch_size, shuffle=False,
                               drop_last=False,
                               workers=workers)

    # pos_weight applies to the multilabel BCE only (reference
    # mmbt/main.py:92-103: CrossEntropyLoss takes no weights)
    pw = (pos_weights(freqs, labels, len(train_ds))
          if cfg.weight_classes and cfg.task_type == "multilabel" else None)
    t_total = max(1, int(len(train_ds) / cfg.batch_size
                         / cfg.gradient_accumulation_steps * cfg.max_epochs))

    mesh, place_state = cli_mesh_and_place(cfg.mesh_shape,
                                           num_heads=bert.num_attention_heads,
                                           **parallelism_kwargs(args))
    model = classify.build_model(cfg, len(labels))
    import jax.numpy as jnp
    cls_id = tokenizer.vocab["[CLS]"]
    sep_id = tokenizer.vocab["[SEP]"]
    L = cfg.max_seq_len - cfg.num_image_embeds
    dummy = dict(
        input_txt=jnp.zeros((2, L), jnp.int32),
        txt_len=jnp.ones((2,), jnp.int32),
        segment=jnp.ones((2, L), jnp.int32),
        image=jnp.zeros((2, cfg.img_size, cfg.img_size, 3)))
    variables = model.init({"params": jax.random.PRNGKey(cfg.seed)},
                           dummy["input_txt"], dummy["txt_len"],
                           dummy["segment"], dummy["image"], cls_id, sep_id)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if args.bert_init_path:
        from medvill_tpu.core import torch_init

        params = torch_init.init_bert_from_torch(
            params, args.bert_init_path, enc_key="enc",
            num_layers=cfg.bert.num_hidden_layers)
        logger.info("initialized text encoder from %s", args.bert_init_path)
    if args.resnet_init_path:
        from medvill_tpu.core import torch_init

        params, batch_stats = torch_init.init_resnet_from_torch(
            params, batch_stats, args.resnet_init_path,
            trunk_path=("enc", "img_encoder"))
        logger.info("initialized image encoder from %s",
                    args.resnet_init_path)
    if args.loaddir:
        epoch = ckpt_lib.latest_epoch(args.loaddir)
        if epoch is None:
            # fail loudly: a typo'd --loaddir silently training from
            # random init would report garbage as real results
            raise FileNotFoundError(
                f"--loaddir {args.loaddir}: no orbax epoch checkpoint "
                "found (expected <dir>/<epoch>/ written by pretrain)")
        logger.info("loading pretrain weights from %s", args.loaddir)
        # partial restore: shared encoder/embedding subtrees + BN stats
        restored = ckpt_lib.restore(args.loaddir, epoch, None)
        params, batch_stats = _merge_pretrained(params, batch_stats,
                                                restored)

    tx = classify.make_tx(cfg, t_total)
    state = TrainState(step=jnp.zeros([], jnp.int32), params=params,
                       batch_stats=batch_stats, opt_state=tx.init(params))
    state = place_state(state)
    # phase-static freeze: (epoch < freeze_img, epoch < freeze_txt) selects
    # a jit specialization; the opt_state structure is phase-invariant
    # (freeze is applied inside the step), so state carries across phases
    k_disp = max(1, getattr(args, "steps_per_dispatch", 1))
    _steps: dict = {}

    def train_step_for(epoch: int, multi: bool):
        phase = (epoch < cfg.freeze_img, epoch < cfg.freeze_txt)
        key = (phase, multi)
        if key not in _steps:
            make = (lambda: classify.make_multi_train_step(
                model, tx, cfg, t_total, pw, cls_id, sep_id, k_disp,
                freeze=phase)
            ) if multi else (lambda: classify.make_train_step(
                model, tx, cfg, t_total, pw, cls_id, sep_id, freeze=phase))
            _steps[key] = jax.jit(make(), donate_argnums=(0,))
        return _steps[key]

    eval_step = jax.jit(classify.make_eval_step(model, cls_id, sep_id))

    sched = classify.PlateauScheduler(cfg.lr_factor, cfg.lr_patience)
    best_metric, n_no_improve = -np.inf, 0
    lr_scale = 1.0
    guard = preempt.PreemptionGuard(logger=logger)
    _multi = jax.process_count() > 1
    PREEMPT_POLL = preempt.POLL_EVERY

    def preempted(batch_idx: int) -> bool:
        # multi-host: every host must agree to stop at the same dispatch
        # boundary (core/mesh.py::global_any).  The collective's device
        # read-back host-syncs the pipeline, so it only runs every
        # PREEMPT_POLL batches — gated on the SHARED batch counter, never
        # the local flag (all hosts must enter the collective at the same
        # boundary or the non-flagged ones hang).  Exit latency grows by
        # at most PREEMPT_POLL-1 dispatches; per-batch checks stay local.
        if not _multi:
            return guard.triggered
        if (batch_idx + 1) % PREEMPT_POLL:
            return False
        return global_any(mesh, guard.triggered)

    with guard:
      for epoch in range(cfg.max_epochs):
        losses = []
        # prefetch + device placement overlap the running step (same
        # pipeline as the pretrain/finetune CLIs)
        for bi, (batch, is_group) in enumerate(
                dispatch_loader(train_loader, mesh, k_disp)):
            train_step = train_step_for(epoch, is_group)
            state, loss = train_step(state, batch,
                                     jax.random.PRNGKey(cfg.seed),
                                     jnp.asarray(lr_scale))
            # device value — float() here would host-sync every step
            losses.append(loss)
            if preempted(bi):
                # graceful preemption: keep the work (classification runs
                # are short + early-stopped, so resume is save-only — no
                # mid-epoch position marker like pretrain/finetune)
                jax.block_until_ready(loss)
                if ckpt_lib.is_saving_process(state):
                    ckpt_lib.save(savedir, epoch, state, config=vars(args))
                logger.info("preempted (signal %s): saved epoch %d to %s",
                            guard.signum, epoch, savedir)
                metrics_log.finish()
                return
        metrics, _, _ = classify.evaluate(eval_step, state, valid_loader,
                                          task_type=cfg.task_type)
        metrics["train_loss"] = float(np.mean(drain_metrics(losses)))
        metrics_log.log({k: v for k, v in metrics.items()
                         if not isinstance(v, dict)}, step=epoch)
        logger.info("epoch %d: %s", epoch, metrics)

        # model-selection metric: micro_f1 for multilabel, acc otherwise
        # (reference mmbt/main.py:287)
        tuning = (metrics["micro_f1"] if cfg.task_type == "multilabel"
                  else metrics["acc"])
        lr_scale = sched.step(tuning)
        improved = tuning > best_metric
        if improved:
            best_metric, n_no_improve = tuning, 0
        else:
            n_no_improve += 1

        # CSV dump (reference: mmbt/main.py:307-317; AUROC columns exist in
        # the multilabel protocol only)
        with open(os.path.join(savedir, f"{args.save_name}.csv"), "w",
                  newline="") as f:
            w = csv.writer(f)
            if cfg.task_type == "multilabel":
                per_class = metrics["per_class_auroc"]
                w.writerow(["micro_auc", "macro_auc", "micro_f1", "macro_f1"]
                           + list(per_class.keys()))
                w.writerow([metrics["micro_roc_auc"],
                            metrics["macro_roc_auc"],
                            metrics["micro_f1"], metrics["macro_f1"]]
                           + list(per_class.values()))
            else:
                w.writerow(["acc"])
                w.writerow([metrics["acc"]])
        if ckpt_lib.is_saving_process(state):
            ckpt_lib.save(savedir, epoch, state,
                          config=vars(args), best=improved)
        if n_no_improve >= cfg.patience:
            logger.info("No improvement. Breaking out of loop.")
            break

    if args.do_test:
        # reference: mmbt/main.py test() — best checkpoint, test-set metrics
        test_path = os.path.join(args.data_path, args.Test_dset_name)
        if os.path.exists(os.path.join(savedir, "best")):
            state = ckpt_lib.restore(savedir, "best", jax.device_get(state))
            logger.info("loaded best checkpoint for test")
        test_ds = ClassificationDataset(
            test_path, tokenizer, labels, cfg.max_seq_len,
            cfg.num_image_embeds, cfg.img_size, openi=args.openi,
            task_type=cfg.task_type)
        test_loader = BatchLoader(test_ds, cfg.batch_size, shuffle=False,
                                  drop_last=False)
        metrics, _, _ = classify.evaluate(eval_step, state, test_loader,
                                          task_type=cfg.task_type)
        logger.info("test: %s", metrics)
        metrics_log.log({k: v for k, v in metrics.items()
                         if not isinstance(v, dict)})
    metrics_log.finish()


def _merge_pretrained(params, batch_stats, restored):
    """Load pretrain weights non-strictly (reference: mmbt/main.py:241-244
    ``load_state_dict(..., strict=False)``): copy matching subtrees from a
    pretrain TrainState checkpoint into the classification params AND
    batch_stats — the pretrain trunk is frozen, so the BN running
    mean/var are the only trunk state pretraining updates (the reference's
    strict=False load carries running_mean/running_var too)."""
    import flax

    if restored is None:
        return params, batch_stats

    def merge_tree(dst_tree, src_tree):
        if src_tree is None:
            return dst_tree
        if "enc" in src_tree:
            src_tree = src_tree["enc"]
        dst = flax.traverse_util.flatten_dict(dst_tree)
        flat_src = flax.traverse_util.flatten_dict(src_tree)
        merged = dict(dst)
        for path, leaf in flat_src.items():
            cand = ("enc",) + path
            if cand in dst and dst[cand].shape == leaf.shape:
                merged[cand] = leaf
        return flax.traverse_util.unflatten_dict(merged)

    return (merge_tree(params, restored.get("params", restored)),
            merge_tree(batch_stats, restored.get("batch_stats")))


if __name__ == "__main__":
    train(build_parser().parse_args())
