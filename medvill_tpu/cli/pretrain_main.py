"""Pretraining CLI — mirror of the reference entry point
(reference: main_origin.py:65-155, flag-for-flag; author-machine path
defaults replaced by required arguments).

Usage: python -m medvill_tpu.cli.pretrain_main --train_dataset ... \
           --vocab_file ... [--BAR_attn ...]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time

import jax
import numpy as np

from medvill_tpu.cli import add_parallelism_args, parallelism_kwargs
from medvill_tpu.core.config import (BertConfig, ImageEncoderConfig,
                                     PretrainConfig)
from medvill_tpu.core import checkpoint as ckpt_lib
from medvill_tpu.core.mesh import (cli_mesh_and_place, global_any,
                                   multihost_initialize, shard_batch)
from medvill_tpu.data.pretrain import (BatchLoader, CXRPretrainDataset,
                                       dispatch_loader)
from medvill_tpu.data.tokenization import BertTokenizer
from medvill_tpu.train import optim
from medvill_tpu.train.pretrain import (init_state, make_eval_step,
                                        make_multi_train_step,
                                        make_train_step)
from medvill_tpu.utils.logging import (MetricLogger, create_logger,
                                       watch_norms,
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


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    # datasets (reference: main_origin.py:68-73)
    p.add_argument("--train_dataset", type=str, required=True)
    p.add_argument("--test_dataset", type=str, default=None)
    p.add_argument("--vocab_file", type=str, required=True,
                   help="BERT wordpiece vocab.txt (no-network replacement "
                        "for HF tokenizer download)")
    p.add_argument("--output_path", type=str, default="output")
    p.add_argument("--log_freq", type=int, default=10)
    p.add_argument("--watch_interval", type=int, default=1000,
                   help="dispatches between param/grad-EMA norm summaries "
                        "(the wandb.watch(model) equivalent, "
                        "models/train_origin.py:51 — watch logs histograms "
                        "every 1000 steps; we log L2 norms; 0 disables)")
    # tasks
    p.add_argument("--mlm_task", type=str2bool, default=True)
    p.add_argument("--itm_task", type=str2bool, default=True)
    # mask variants (main_origin.py:90-95)
    p.add_argument("--attn_1d", type=str2bool, default=False)
    p.add_argument("--BAR_attn", type=str2bool, default=True)
    p.add_argument("--Mixed", type=str2bool, default=False)
    p.add_argument("--s2s_prob", type=float, default=1.0)
    p.add_argument("--bi_prob", type=float, default=0.0)
    p.add_argument("--disturbing_mask", type=str2bool, default=False)
    # schedule (main_origin.py:97-99)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--batch_size", type=int, default=36)
    p.add_argument("--num_workers", type=int, default=4,
                   help="loader worker threads (reference --num_workers, "
                        "main_origin.py:52-54 DataLoader workers).  >1 "
                        "derives a per-(seed,epoch,index) RNG per sample — "
                        "deterministic for a given seed at ANY worker "
                        "count, but a different masking/ITM stream than "
                        "the sequential mode; 1 = the shared-stream "
                        "sequential mode the RNG-parity tests pin down")
    # model (main_origin.py:102-139)
    p.add_argument("--hidden_size", type=int, default=768)
    p.add_argument("--embedding_size", type=int, default=768)
    p.add_argument("--bert_model", type=str, default="bert-base-scratch",
                   choices=["bert-base-scratch", "bert-small-scratch",
                            "bert-base-uncased",
                            "google/bert_uncased_L-4_H-512_A-8",
                            "google/bert_uncased_L-2_H-128_A-2",
                            "test-tiny"])  # CI/smoke scale
    p.add_argument("--vocab_size", type=int, default=30522)
    p.add_argument("--weight_load", type=str2bool, default=False)
    p.add_argument("--pre_trained_model_path", type=str, default=None)
    p.add_argument("--img_postion", type=str2bool, default=True)
    p.add_argument("--seq_len", type=int, default=253)
    p.add_argument("--max_seq_len", type=int, default=512)
    p.add_argument("--img_hidden_sz", type=int, default=2048)
    p.add_argument("--img_encoder", type=str, default="random-pixel",
                   choices=["random-pixel", "full-fiber", "ViT"])
    p.add_argument("--img_channel", type=int, default=3)
    p.add_argument("--num_image_embeds", type=int, default=180)
    p.add_argument("--img_size", type=int, default=512)
    # optimizer (main_origin.py:141-151)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--gradient_accumulation_steps", type=int, default=4)
    p.add_argument("--warmup", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--dropout_prob", type=float, default=0.1)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.999)
    p.add_argument("--eps", type=float, default=1e-6)
    p.add_argument("--weight_decay", type=float, default=0.0)
    # TPU extras
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of a few steps here")
    p.add_argument("--save_interval", type=int, default=1,
                   help="checkpoint every N epochs (last epoch always; "
                        "preemption saves are unaffected).  The reference "
                        "saves per epoch (default 1); raise it when the "
                        "epoch is short relative to the checkpoint write "
                        "— e.g. a frozen ResNet trunk makes every save "
                        "~100 MB of unchanged weights")
    p.add_argument("--hf_bert_checkpoint", "--bert_init_path",
                   dest="hf_bert_checkpoint", type=str, default=None,
                   help="torch state_dict (.bin/.pt) of an HF BERT to "
                        "initialize the joint encoder "
                        "(BertModel.from_pretrained equivalent, "
                        "cxrbert_origin.py:42-55)")
    p.add_argument("--resnet_init_path", type=str, default=None,
                   help="torchvision resnet50 .pth to initialize the "
                        "visual trunk (reference: models/image.py:50 "
                        "pretrained=True)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help="train micro-steps fused into one jit dispatch via "
                        "lax.scan (amortizes per-dispatch overhead; 8 is a "
                        "good TPU value).  Epoch-tail batches that do not "
                        "fill a group still train, individually, via a "
                        "single-step dispatch.")
    add_parallelism_args(p)
    p.add_argument("--freeze_img_trunk", type=str2bool, default=True,
                   help="freeze the entire ResNet trunk (the reference's "
                        "executed behavior: its children()[5:] unfreeze is "
                        "a no-op, cxrbert_origin.py:65-70); set false to "
                        "train the trunk")
    return p


def config_from_args(args) -> PretrainConfig:
    if args.bert_model in ("bert-small-scratch",
                           "google/bert_uncased_L-4_H-512_A-8"):
        bert = BertConfig.small()
    elif args.bert_model == "google/bert_uncased_L-2_H-128_A-2":
        bert = BertConfig.tiny()
    elif args.bert_model == "test-tiny":
        bert = BertConfig.test_tiny(vocab_size=args.vocab_size)
    else:
        bert = BertConfig.base()
    bert = dataclasses.replace(bert, vocab_size=args.vocab_size)
    image = ImageEncoderConfig(
        encoder=args.img_encoder, img_size=args.img_size,
        img_channel=args.img_channel, img_hidden_size=args.img_hidden_sz,
        num_image_embeds=args.num_image_embeds,
        freeze_prefix_stages=args.freeze_img_trunk)
    return PretrainConfig(
        train_dataset=args.train_dataset, test_dataset=args.test_dataset,
        output_path=args.output_path, log_freq=args.log_freq,
        mlm_task=args.mlm_task, itm_task=args.itm_task,
        attn_1d=args.attn_1d, bar_attn=args.BAR_attn, mixed=args.Mixed,
        s2s_prob=args.s2s_prob, bi_prob=args.bi_prob,
        disturbing_mask=args.disturbing_mask, epochs=args.epochs,
        batch_size=args.batch_size, num_workers=args.num_workers,
        bert=bert, image=image, lr=args.lr,
        gradient_accumulation_steps=args.gradient_accumulation_steps,
        warmup=args.warmup, seed=args.seed,
        dropout_prob=args.dropout_prob, beta1=args.beta1, beta2=args.beta2,
        eps=args.eps, weight_decay=args.weight_decay,
        weight_load=args.weight_load,
        pre_trained_model_path=args.pre_trained_model_path,
        img_position=args.img_postion, seq_len=args.seq_len,
        max_seq_len=args.max_seq_len)


def train(args) -> None:
    multihost_initialize()
    set_seed(args.seed)
    use_hardware_prng()  # TPU rbg dropout keys: ~5% of step time
    cfg = config_from_args(args)
    logger = create_logger(os.path.join(cfg.output_path, "train.log"), args)
    metrics_log = MetricLogger(cfg.output_path, project="CXR-BERT",
                               config=vars(args))

    tokenizer = make_tokenizer(args.vocab_file, remap_unused=False)
    train_ds = CXRPretrainDataset(cfg.train_dataset, tokenizer, cfg,
                                  seed=cfg.seed)
    train_loader = BatchLoader(train_ds, cfg.batch_size, shuffle=True,
                               seed=cfg.seed,
                               num_shards=jax.process_count(),
                               shard_index=jax.process_index(),
                               workers=cfg.num_workers)
    test_loader = None
    if cfg.test_dataset:
        test_ds = CXRPretrainDataset(cfg.test_dataset, tokenizer, cfg,
                                     seed=cfg.seed + 1)
        # drop_last stays True here: the pretrain eval step runs SHARDED
        # (shard_batch over the mesh), so tail batches must keep the
        # mesh-divisible static shape
        test_loader = BatchLoader(test_ds, cfg.batch_size, shuffle=False)

    mp = max(1, getattr(args, "model_parallel", 1))
    mesh, place_state = cli_mesh_and_place(cfg.mesh_shape,
                                           num_heads=cfg.bert.num_attention_heads,
                                           **parallelism_kwargs(args))
    tx = optim.accumulate(
        optim.adamw(cfg.lr, cfg.beta1, cfg.beta2, cfg.eps, cfg.weight_decay),
        cfg.gradient_accumulation_steps)
    if cfg.image.freeze_prefix_stages and cfg.image.encoder != "ViT":
        # unconditional whole-trunk CNN freeze — the reference constructor
        # sets requires_grad=False on the entire ResNet (the children()[5:]
        # unfreeze is a no-op; cxrbert_origin.py:65-70, image.py:46-52);
        # the train step stop-grads the same leaves so XLA drops their
        # backward
        from medvill_tpu.models import resnet as resnet_lib
        tx = optim.masked_trainable(
            tx, lambda p: resnet_lib.cnn_freeze_mask(
                p, ("enc", "img_encoder")))
        trunk_from_ckpt = (cfg.weight_load and cfg.pre_trained_model_path)
        if not getattr(args, "resnet_init_path", None) and not trunk_from_ckpt:
            # reference always freezes an ImageNet-pretrained trunk
            # (torchvision resnet50(pretrained=True), image.py:50); freezing
            # a random trunk trains against fixed random conv features
            logger.warning(
                "CNN trunk is frozen (reference semantics) but no "
                "--resnet_init_path was given: the frozen trunk stays "
                "RANDOMLY initialized. Pass --resnet_init_path with "
                "torchvision ResNet-50 weights for reference-equivalent "
                "training, or --freeze_img_trunk false to train the trunk.")
    model, state = init_state(cfg, jax.random.PRNGKey(cfg.seed), tx)
    if getattr(args, "hf_bert_checkpoint", None):
        from medvill_tpu.core import torch_init

        new_params = torch_init.init_bert_from_torch(
            state.params, args.hf_bert_checkpoint, enc_key="enc",
            num_layers=cfg.bert.num_hidden_layers)
        state = state.replace(params=new_params,
                              opt_state=tx.init(new_params))
        logger.info("initialized joint encoder from %s",
                    args.hf_bert_checkpoint)
    if getattr(args, "resnet_init_path", None):
        from medvill_tpu.core import torch_init

        new_params, new_bs = torch_init.init_resnet_from_torch(
            state.params, state.batch_stats, args.resnet_init_path,
            trunk_path=("enc", "img_encoder"))
        # the whole-trunk freeze (cxrbert_origin.py:65-70) is already
        # applied unconditionally to tx above
        state = state.replace(params=new_params, batch_stats=new_bs,
                              opt_state=tx.init(new_params))
        logger.info("initialized visual trunk from %s (trunk frozen=%s)",
                    args.resnet_init_path, cfg.image.freeze_prefix_stages)
    if cfg.weight_load and cfg.pre_trained_model_path \
            and os.path.isfile(cfg.pre_trained_model_path):
        # torch CXRBERT pretrain .pth (the published MedViLL weights):
        # the reference's --weight_load restarts pretraining from
        # CXRBERT.from_pretrained (main_origin.py:106-115,
        # train_origin.py:28-34)
        from medvill_tpu.core import torch_init

        new_params, new_bs = torch_init.init_cxrbert_from_torch(
            state.params, state.batch_stats,
            cfg.pre_trained_model_path)
        state = state.replace(params=new_params, batch_stats=new_bs,
                              opt_state=tx.init(new_params))
        logger.info("restored torch pretrain checkpoint %s",
                    cfg.pre_trained_model_path)
    # place BEFORE any orbax restore so the checkpoint reads directly into
    # the run's sharded layout (zero1/TP).  Restoring into the unplaced
    # host state and re-placing afterwards would ask device_put to reshard
    # committed cross-process arrays OUTSIDE jit — which needs a DCN
    # transport that e.g. the CPU Gloo multi-host harness doesn't have
    # (caught by tests/test_multiprocess_preempt.py); reading each host's
    # own shards from the checkpoint is also strictly less I/O.
    state = place_state(state)
    if cfg.weight_load and cfg.pre_trained_model_path \
            and not os.path.isfile(cfg.pre_trained_model_path):
        epoch = ckpt_lib.latest_epoch(cfg.pre_trained_model_path)
        if epoch is None:
            # fail loudly: a typo'd path silently pretraining from
            # random init would misattribute the resulting run
            raise FileNotFoundError(
                f"--pre_trained_model_path "
                f"{cfg.pre_trained_model_path}: not a torch checkpoint "
                "file and no orbax epoch found")
        state = ckpt_lib.restore(cfg.pre_trained_model_path, epoch,
                                 state)
        logger.info("restored checkpoint epoch %s", epoch)
    # preemption resume: a SIGTERM'd run (utils/preempt.py) leaves a marker
    # pointing at its mid-epoch checkpoint in output_path; consume it,
    # restore, and skip the already-trained host batches of that epoch.
    # Takes precedence over --pre_trained_model_path: the preempted run
    # already folded any pretrained init into its checkpoint.
    start_epoch = 0
    skip_batches = 0
    _marker = preempt.read_marker(cfg.output_path)
    if _marker is not None:
        state = ckpt_lib.restore(cfg.output_path, _marker["epoch"], state)
        start_epoch = int(_marker["epoch"])
        skip_batches = int(_marker["batches_done"])
        preempt.clear_marker(cfg.output_path)
        logger.info(
            "resuming preempted run from %s: epoch %d, %d host batches "
            "already trained", cfg.output_path, start_epoch, skip_batches)
    if mp > 1:
        logger.info("tensor-parallel degree %d over a %s mesh", mp,
                    dict(mesh.shape))
    k_disp = max(1, getattr(args, "steps_per_dispatch", 1))
    # pin the output state to the CANONICAL placement: without it, GSPMD
    # propagates its own output shardings, so the live run's state drifts
    # onto a different program than a checkpoint-restored run's (restore
    # targets the canonical placement) — measured ulp-level divergence per
    # step under --zero1, which breaks bit-exact preemption resume
    # (tests/test_multiprocess_preempt.py digests)
    canon = jax.tree_util.tree_map(lambda x: getattr(x, "sharding", None),
                                   state)
    if k_disp > 1:
        # k micro-steps per jit dispatch (lax.scan over stacked batches):
        # amortizes per-dispatch host/RPC overhead (~25% of wall step time
        # measured at the reference config); grad accumulation composes —
        # MultiSteps state advances inside the scan
        train_step = jax.jit(make_multi_train_step(model, tx, cfg, k_disp),
                             donate_argnums=(0,),
                             out_shardings=(canon, None))
    else:
        train_step = jax.jit(make_train_step(model, tx, cfg),
                             donate_argnums=(0,),
                             out_shardings=(canon, None))
    eval_step = jax.jit(make_eval_step(model, cfg))
    rng = jax.random.PRNGKey(cfg.seed)

    single_step = None  # compiled lazily, only if an epoch tail occurs

    if skip_batches >= len(train_loader):
        # preempted exactly at an epoch boundary (or the marker covers the
        # whole epoch): nothing left to skip, continue at the next epoch
        start_epoch += 1
        skip_batches = 0
    train_loader.epoch = start_epoch
    if skip_batches:
        train_loader.skip_next(skip_batches)
    # a consumed MID-epoch marker means <output_path>/<start_epoch>
    # currently holds mid-epoch state under the epoch-complete naming that
    # latest_epoch() consumers (finetune --model_recover_path, retrieval)
    # rely on — force an end-of-epoch overwrite of that epoch even when
    # --save_interval would skip it
    force_save_epoch = start_epoch if skip_batches else -1

    guard = preempt.PreemptionGuard(logger=logger)
    _multi = jax.process_count() > 1

    def preempted() -> bool:
        # multi-host: SIGTERM lands on one host; every host must agree to
        # stop at the same dispatch boundary or the others hang in the next
        # gradient all-reduce (core/mesh.py::global_any)
        return (global_any(mesh, guard.triggered) if _multi
                else guard.triggered)

    with guard:
      for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        agg = {}
        batches_done = skip_batches if epoch == start_epoch else 0
        prefetched = dispatch_loader(train_loader, mesh, k_disp)
        profiling = (args.profile_dir and epoch == 0)
        for i, (batch, is_group) in enumerate(prefetched):
            if profiling and i == 2:
                jax.profiler.start_trace(args.profile_dir)
            if k_disp > 1 and is_group:
                step_fn = train_step
            elif k_disp > 1:
                if single_step is None:
                    single_step = jax.jit(make_train_step(model, tx, cfg),
                                          donate_argnums=(0,),
                                          out_shardings=(canon, None))
                step_fn = single_step
            else:
                step_fn = train_step
            state, m = step_fn(state, batch, rng)
            batches_done += k_disp if is_group else 1
            if preempted():
                # graceful preemption: checkpoint the post-step state,
                # record the host-batch position, exit 0.  A relaunch of
                # the same command resumes here bit-exact at any worker
                # count (workers>1: derived per-sample RNG; workers=1:
                # skip_next replays the shared stream — see
                # BatchLoader.skip_next / utils/preempt.py)
                jax.block_until_ready(m["loss"])
                if ckpt_lib.is_saving_process(state):
                    ckpt_lib.save(cfg.output_path, epoch, state,
                                  config=vars(args))
                    preempt.write_marker(cfg.output_path, epoch,
                                         batches_done)
                logger.info(
                    "preempted (signal %s): saved epoch %d at host batch "
                    "%d to %s; relaunch to resume", guard.signum, epoch,
                    batches_done, cfg.output_path)
                metrics_log.finish()
                return
            if profiling and i == 4:
                jax.block_until_ready(m["loss"])
                jax.profiler.stop_trace()
                profiling = False
            # accumulate DEVICE values; converting here would host-sync
            # every dispatch and serialize the pipeline on dispatch latency
            # (measured 35-55% of wall step time at k_disp=1 on a
            # remote-tunnel chip) — the log_freq read below is the only
            # periodic sync
            for k, val in m.items():
                agg.setdefault(k, []).append(val)
            if i % cfg.log_freq == 0:
                logger.info("epoch %d it %d loss %.4f", epoch, i * k_disp,
                            float(np.asarray(m["loss"]).reshape(-1)[-1]))
            if args.watch_interval and i % args.watch_interval == 0:
                # wandb.watch equivalent — off the hot path (host-syncs
                # the params, so keep the interval coarse)
                metrics_log.log(watch_norms(state),
                                step=epoch * 10 ** 6 + i * k_disp)
        # one D2H transfer per metric+shape (not per dispatch) — see
        # utils/logging.py::drain_metrics
        agg = {k: drain_metrics(v) for k, v in agg.items()}
        row = {f"avg_{k}": float(np.mean(v)) for k, v in agg.items()}
        if "mlm_correct" in agg:
            row["mlm_acc"] = (np.sum(agg["mlm_correct"])
                              / max(np.sum(agg["mlm_total"]), 1))
        if "itm_correct" in agg:
            row["itm_acc"] = (np.sum(agg["itm_correct"])
                              / max(np.sum(agg["itm_total"]), 1))
        row["epoch_time_s"] = time.time() - t0
        metrics_log.log(row, step=epoch)
        logger.info("epoch %d done: %s", epoch, row)

        if test_loader is not None:
            eagg = {}
            for batch in test_loader:
                m = eval_step(state, shard_batch(mesh, batch))
                for k, val in m.items():
                    eagg.setdefault(k, []).append(float(val))
            erow = {f"eval_avg_{k}": float(np.mean(v))
                    for k, v in eagg.items()}
            metrics_log.log(erow, step=epoch)
            logger.info("epoch %d eval: %s", epoch, erow)

        # rank 0 for replicated state; every host when shards cross
        # processes (--zero1 multi-host: orbax writes per-host shards)
        interval = max(1, getattr(args, "save_interval", 1))
        save_now = ((epoch + 1) % interval == 0 or epoch + 1 == cfg.epochs
                    or epoch == force_save_epoch)
        if save_now and ckpt_lib.is_saving_process(state):
            ckpt_lib.save(cfg.output_path, epoch, state, config=vars(args))
        if preempted() and epoch + 1 < cfg.epochs:
            # preempted during eval/checkpoint: mark the whole epoch done
            # so a relaunch continues at epoch + 1 (writing the epoch
            # checkpoint first if --save_interval skipped it)
            if ckpt_lib.is_saving_process(state):
                if not save_now:
                    ckpt_lib.save(cfg.output_path, epoch, state,
                                  config=vars(args))
                preempt.write_marker(cfg.output_path, epoch,
                                     len(train_loader))
            logger.info("preempted (signal %s) at epoch %d boundary; "
                        "relaunch to resume at epoch %d", guard.signum,
                        epoch, epoch + 1)
            metrics_log.finish()
            return
    metrics_log.finish()


if __name__ == "__main__":
    train(build_parser().parse_args())
