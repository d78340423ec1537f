"""Generation-decode CLI — a *working* equivalent of the reference decode
entry point (reference: sc/generation_decode.py:112-636, which ships with
missing imports and an undefined beam_size — SURVEY.md §0; we provide the
intended behavior): batched greedy/beam decode over a test JSONL,
detokenization, ppl from teacher-forced CE, BLEU-1..4 + CSV dumps."""
from __future__ import annotations

import argparse
import dataclasses
import json
import math
import os

import jax
import numpy as np

from medvill_tpu.core.config import (BertConfig, DecodeConfig,
                                     FinetuneConfig, ImageEncoderConfig)
from medvill_tpu.core import checkpoint as ckpt_lib
from medvill_tpu.data import images as image_lib
from medvill_tpu.data.seq2seq import Seq2seqDecodePreprocessor
from medvill_tpu.data.tokenization import BertTokenizer, detokenize
from medvill_tpu.eval.bleu import language_eval_bleu
from medvill_tpu.models.decoder import (DecodeSettings, beam_search,
                                        greedy_decode)
from medvill_tpu.train import finetune as ft
from medvill_tpu.utils.logging import MetricLogger, create_logger
from medvill_tpu.utils.seed import set_seed


def str2bool(v):
    return str(v).lower() in ("1", "true", "yes")


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--src_file", type=str, required=True,
                   help="test JSONL with text+img per line")
    p.add_argument("--vocab_file", type=str, required=True)
    p.add_argument("--model_recover_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="output_decode")
    p.add_argument("--run_name", type=str, default="decode")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--beam_size", type=int, default=1)
    p.add_argument("--length_penalty", type=float, default=0.0)
    p.add_argument("--forbid_duplicate_ngrams", type=str2bool, default=False)
    p.add_argument("--ngram_size", type=int, default=3)
    p.add_argument("--max_tgt_length", type=int, default=128)
    p.add_argument("--len_vis_input", type=int, default=256)
    p.add_argument("--img_size", type=int, default=512)
    p.add_argument("--max_seq_length", type=int, default=512)
    p.add_argument("--new_segment_ids", type=str2bool, default=True)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--bert_model", type=str, default="bert-base-scratch")
    p.add_argument("--vocab_size", type=int, default=30522)
    p.add_argument("--teacher_forcing", type=str2bool, default=False,
                   help="True reproduces the reference greedy loop's "
                        "gt-token feeding (model.py:1177-1189)")
    return p


def main(args) -> None:
    set_seed(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)
    logger = create_logger(os.path.join(args.output_dir, "decode.log"), args)
    metrics_log = MetricLogger(args.output_dir, project="decode",
                               config=vars(args))
    tokenizer = BertTokenizer.from_vocab_file(args.vocab_file)
    v = tokenizer.vocab

    bert = BertConfig.vlp(
        BertConfig.from_name(args.bert_model, args.vocab_size),
        new_segment_ids=args.new_segment_ids)
    cfg = FinetuneConfig(
        max_seq_length=args.max_seq_length,
        len_vis_input=args.len_vis_input, img_size=args.img_size,
        new_segment_ids=args.new_segment_ids, bert=bert,
        image=ImageEncoderConfig(num_image_embeds=args.len_vis_input,
                                 img_size=args.img_size,
                                 encoder="full-fiber"))
    model = ft.build_model(cfg)
    import jax.numpy as jnp

    B, L = args.batch_size, cfg.max_seq_length
    variables = model.init(
        {"params": jax.random.PRNGKey(args.seed)},
        jnp.zeros((2, cfg.img_size, cfg.img_size, 3)),
        jnp.zeros((2, L), jnp.int32), jnp.zeros((2, L), jnp.int32),
        jnp.zeros((2, 1, L, L)),
        masked_pos=jnp.zeros((2, cfg.max_pred), jnp.int32),
        deterministic=True)
    epoch = ckpt_lib.latest_epoch(args.model_recover_path)
    if epoch is not None:
        # inference-only load: restore just params/batch_stats subtrees
        restored = ckpt_lib.restore(
            args.model_recover_path, epoch,
            {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {})},
            partial=True)
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
        logger.info("recovered model epoch %s", epoch)

    settings = DecodeSettings(
        max_txt_length=args.max_tgt_length, mask_word_id=v["[MASK]"],
        eos_id=v["[SEP]"], beam_size=args.beam_size,
        length_penalty=args.length_penalty,
        forbid_duplicate_ngrams=args.forbid_duplicate_ngrams,
        ngram_size=args.ngram_size, new_segment_ids=args.new_segment_ids)

    with open(args.src_file) as f:
        records = [json.loads(l) for l in f]
    data_dir = os.path.dirname(args.src_file)

    def image_loader(p):
        return image_lib.load_image(os.path.join(data_dir, p),
                                    args.img_size, grayscale_to_rgb=True,
                                    do_resize=(args.len_vis_input < 100))

    prep = Seq2seqDecodePreprocessor(cfg, tokenizer, args.max_tgt_length)

    @jax.jit
    def run_greedy(image, gt):
        return greedy_decode(model, variables, image, settings, v["[CLS]"],
                             v["[SEP]"], gt_tokens=gt,
                             teacher_forcing=args.teacher_forcing)

    @jax.jit
    def run_beam(image):
        return beam_search(model, variables, image, settings, v["[CLS]"],
                           v["[SEP]"])

    predictions = []
    total_nll, total_tok = 0.0, 0
    for start in range(0, len(records) - B + 1, B):
        chunk = records[start:start + B]
        samples = [prep(r["img"], r["text"], image_loader) for r in chunk]
        image = jnp.asarray(np.stack([s["image"] for s in samples]))
        gt = jnp.asarray(np.stack([s["gt_token"] for s in samples]))
        if args.beam_size > 1:
            out_ids, _ = run_beam(image)
            out_ids = np.asarray(out_ids)
        else:
            out_ids, _, gt_nll = run_greedy(image, gt)
            out_ids = np.asarray(out_ids)
            gt_np = np.asarray(gt)
            mask = gt_np != 0
            total_nll += float((np.asarray(gt_nll) * mask).sum())
            total_tok += int(mask.sum())
        for i, rec in enumerate(chunk):
            toks = []
            for t in out_ids[i]:
                tok = tokenizer.ids_to_tokens.get(int(t), "[UNK]")
                if tok == "[SEP]":
                    break
                toks.append(tok)
            caption = " ".join(detokenize(toks))
            predictions.append({"image_id": rec.get("id", str(start + i)),
                                "caption": caption,
                                "gt_caption": rec["text"]})
    bleu = language_eval_bleu(predictions, args.output_dir, args.run_name)
    result = dict(bleu)
    if total_tok:
        result["ppl"] = math.exp(total_nll / total_tok)
    logger.info("decode results: %s", result)
    metrics_log.log(result)
    with open(os.path.join(args.output_dir,
                           f"{args.run_name}_predictions.json"), "w") as f:
        json.dump(predictions, f, indent=2)
    metrics_log.finish()


if __name__ == "__main__":
    main(build_parser().parse_args())
