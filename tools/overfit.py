"""Learning-dynamics proof: overfit every workload end-to-end via the CLIs.

The test pyramid proves step parity (losses/logits match the reference
bit-for-bit at init) and mechanics (resume bit-exactness, decode
equivalence); this tool proves the framework OPTIMIZES: each of the four
reference workloads (SURVEY.md §2), run through its real CLI entry point
on a tiny synthetic corpus, drives its training metric to the overfit
target —

  pretrain   MLM accuracy > 0.9 and ITM accuracy > 0.8 (the model must
             memorize which report belongs to which class image; 0.8 for
             ITM because the cross-modal equality over a frozen random
             trunk peaks ~0.85 at this scale — see run_pretrain)
  classify   micro-F1 -> 1.0 on an eval split that equals the train split
  retrieve   ITM pair accuracy > 0.9 on per-epoch resampled negatives
  finetune   a finetuned model decodes its own training reports:
             corpus BLEU-1 > 0.8 on the train set (decode CLI end-to-end)

Each workload prints one JSON line {"workload", "metric", "value",
"target", "ok", "seconds"}; exit status is 0 iff every selected workload
met its target.  The reference's only equivalent validation was watching
wandb curves by eye (SURVEY.md §4).

Usage:
    python tools/overfit.py [--workloads pretrain,classify,retrieve,finetune]
                            [--root DIR] [--n 32] [--epochs-scale 1.0]

CPU note: runs fine (minutes) at the default test-tiny scale; set
JAX_PLATFORMS=cpu to force off-TPU.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WORDS = ["no", "acute", "disease", "heart", "size", "normal", "lungs",
         "clear", "mild", "edema", "stable", "chest", "effusion", "right",
         "left", "small", "seen", "pleural", "focal", "consolidation"]
SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
CHEXPERT = ["'Cardiomegaly'", "'Edema'", "'Pleural Effusion'", "'Others'"]


def make_structured_tree(root: str, n: int) -> None:
    """A LEARNABLE synthetic corpus (unlike tools/synthetic_data.py's
    uniform-random text, on which MLM cannot beat the unigram prior and a
    test-tiny model plateaus).  There are exactly 2 fixed
    disjoint-vocabulary sentences, one per class (2 classes, not one per
    CheXpert label — the k-class ITM interaction is XOR-like and stalls a
    test-tiny model for k=4; see the inline comment); record i carries
    sentence i % 2 and its class's shared noise image.  MLM then reduces
    to (which-sentence, position) -> word memorization (no induction-head
    copying required — a 2-layer model learns it in tens of steps),
    ITM/retrieval/report-gen reduce to memorizing image -> sentence-class,
    and the classification label is a pure function of the text."""
    import numpy as np
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    npr = np.random.default_rng(0)
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    # 2 disjoint-vocabulary sentences: sentence k differs from the other
    # at EVERY position, so any visible token identifies the sentence.
    # Two classes, not four: ITM is an equality test between image-class
    # and text-class, and over k classes that is a k^2-cell XOR-like
    # interaction — a 4-class version kept a 2-layer/32-hidden model at
    # chance for 300+ steps, while the 2-class XNOR is representable by
    # two tanh units and trains quickly.
    sentences = [" ".join([WORDS[k], WORDS[4 + k], WORDS[8 + k],
                           WORDS[12 + k], WORDS[16 + k], WORDS[k]])
                 for k in range(2)]
    # 4 fixed high-dimensional noise patterns, one per class; every record
    # of a class shares its class image.  (Two earlier corpus designs
    # stalled ITM for hundreds of steps: per-record noise asks a frozen /
    # from-scratch ResNet-50 to memorize 16 arbitrary images, and
    # constant-brightness class images differ along a single dimension
    # that shrinks through 50 random conv+BN+ReLU layers.  Distinct noise
    # PATTERNS stay far apart through any random trunk, so the joint
    # encoder's image->class learning is the thing under test — the trunk
    # keeps the reference-default freeze.)
    class_imgs = [npr.integers(0, 255, (64, 64), np.uint8)
                  for _ in range(2)]
    rows = []
    for i in range(n):
        p = os.path.join(img_dir, f"{i}.png")
        Image.fromarray(class_imgs[i % 2], "L").save(p)
        rows.append({"i": i, "img": os.path.abspath(p),
                     "text": sentences[i % 2],
                     "label": CHEXPERT[i % 2]})

    with open(os.path.join(root, "vocab.txt"), "w") as f:
        for w in SPECIALS + WORDS:
            f.write(w + "\n")

    os.makedirs(os.path.join(root, "pretrain"), exist_ok=True)
    for fname in ("Train.jsonl", "Valid.jsonl"):
        with open(os.path.join(root, "pretrain", fname), "w") as f:
            for r in rows:
                f.write(json.dumps({
                    "id": f"p{r['i']}", "split": "train",
                    "label": r["label"], "text": r["text"],
                    "img": r["img"]}) + "\n")

    os.makedirs(os.path.join(root, "classification"), exist_ok=True)
    for fname in ("Train.jsonl", "Valid.jsonl", "Test.jsonl"):
        with open(os.path.join(root, "classification", fname), "w") as f:
            for r in rows:
                f.write(json.dumps({
                    "id": f"c{r['i']}", "text": r["text"],
                    "label": r["label"].strip("'"),
                    "img": r["img"]}) + "\n")

    os.makedirs(os.path.join(root, "retrieval"), exist_ok=True)
    with open(os.path.join(root, "retrieval", "train.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps({
                "id": f"t{r['i']}", "split": "train",
                "label": r["label"], "text": r["text"],
                "img": r["img"]}) + "\n")

    os.makedirs(os.path.join(root, "reportgen"), exist_ok=True)
    with open(os.path.join(root, "reportgen", "train.jsonl"), "w") as f:
        for r in rows:
            f.write(json.dumps({
                "id": f"r{r['i']}", "text": r["text"],
                "label": r["label"], "img": r["img"]}) + "\n")


def _rows(path: str) -> list:
    if not os.path.exists(path):
        return []
    return [json.loads(line) for line in open(path)]


def _last(rows: list, key: str, tail: int = 1):
    """Mean of the last ``tail`` values — per-epoch accuracies on a
    16-record corpus are 16-sample binomials (sd ~0.12 even at true 0.95),
    so targets are asserted on a tail mean, not one epoch's draw."""
    vals = [r[key] for r in rows if key in r]
    if not vals:
        return None
    t = vals[-tail:]
    return sum(t) / len(t)


def _best_window(rows: list, key: str, w: int = 10):
    """Best w-epoch rolling mean — 'did training REACH the target', the
    same convention as the classification runner's best-epoch metric (a
    constant-lr AdamW, which both frameworks' pretrain recipes use,
    oscillates around the optimum once overfit)."""
    vals = [r[key] for r in rows if key in r]
    if len(vals) < w:
        return _last(rows, key, w)
    return max(sum(vals[i:i + w]) / w for i in range(len(vals) - w + 1))


def run_pretrain(root: str, out: str, epochs: int) -> dict:
    from medvill_tpu.cli import pretrain_main

    args = pretrain_main.build_parser().parse_args([
        "--train_dataset", os.path.join(root, "pretrain", "Train.jsonl"),
        "--vocab_file", os.path.join(root, "vocab.txt"),
        # 128-hidden 2-layer (reference's own small-model choice): the
        # 32-hidden test-tiny stalls on the cross-modal ITM binding, and
        # on a TPU chip the tiny step is dispatch-bound anyway, so the
        # extra capacity is free
        "--output_path", out,
        "--bert_model", "google/bert_uncased_L-2_H-128_A-2",
        "--vocab_size", "32", "--epochs", str(epochs), "--batch_size", "8",
        # reference-default random-pixel encoder + frozen trunk (a
        # trainable trunk's ResNet Adam moments make every per-epoch orbax
        # save ~200 MB); measured-best overfit config of the A/B series
        "--num_image_embeds", "3", "--img_size", "64", "--seq_len", "8",
        "--gradient_accumulation_steps", "1", "--num_workers", "2",
        "--lr", "1e-3", "--save_interval", "50",
        # reference-default masks (BAR): CLS attends to every column
        # (masks.py: bar rows < img_block see all), so ITM gets signal on
        # every sample; under pure s2s the CLS row sees only the image
        # block and ITM would cap at chance on those samples.  The trunk
        # keeps the reference-default freeze (class-coded images stay
        # separable through the frozen random trunk).
        "--watch_interval", "0", "--log_freq", "1000000",
    ])
    pretrain_main.train(args)
    rows = _rows(os.path.join(out, "metrics.jsonl"))
    mlm = _best_window(rows, "mlm_acc")
    itm = _best_window(rows, "itm_acc")
    value = min(v for v in (mlm, itm) if v is not None)
    # ITM target 0.8, not ~1.0: the cross-modal equality over a frozen
    # random trunk peaks ~0.85 here, and the REFERENCE's own torch model
    # stays at the 0.5 chance level on the identical corpus (DESIGN.md §9
    # control) — 0.8 demonstrates genuine cross-modal optimization
    return {"metric": "min(mlm_acc, itm_acc)", "value": value,
            "target": "mlm>0.9, itm>0.8",
            "ok": bool(mlm and itm and mlm > 0.9 and itm > 0.8),
            "detail": {"mlm_acc": mlm, "itm_acc": itm}}


def run_classify(root: str, out: str, epochs: int) -> dict:
    from medvill_tpu.cli import classification_main

    # overfit target is the train set itself: eval split == train split
    data = os.path.join(out, "data")
    os.makedirs(data, exist_ok=True)
    src = os.path.join(root, "classification", "Train.jsonl")
    for name in ("Train.jsonl", "Valid.jsonl", "Test.jsonl"):
        shutil.copy(src, os.path.join(data, name))
    args = classification_main.build_parser().parse_args([
        "--data_path", data, "--vocab_file", os.path.join(root, "vocab.txt"),
        "--savedir", out, "--bert_model", "test-tiny",
        "--vocab_size", "32", "--batch_sz", "8",
        "--max_epochs", str(epochs), "--patience", str(epochs),
        "--num_image_embeds", "3", "--img_size", "64",
        "--max_seq_len", "16", "--name", "overfit", "--lr", "1e-3",
    ])
    classification_main.train(args)
    rows = _rows(os.path.join(out, "overfit", "metrics.jsonl"))
    f1 = max((r["micro_f1"] for r in rows if "micro_f1" in r),
             default=None)
    return {"metric": "eval micro_f1 (eval==train)", "value": f1,
            "target": 0.95, "ok": bool(f1 is not None and f1 > 0.95)}


def run_retrieve(root: str, out: str, epochs: int,
                 pretrained: str | None = None) -> dict:
    from medvill_tpu.cli import retrieval_main

    # the reference workflow finetunes retrieval FROM a pretrained MedViLL
    # checkpoint (retrieval.py:17-24 CXRBERT.from_pretrained), and that is
    # also what makes the corpus learnable: pure ITM from scratch is a
    # cross-modal equality test that plateaus at chance (the reference's
    # own torch model plateaus identically — DESIGN.md §9)
    extra = (["--load_pretrained_model", pretrained] if pretrained else [])
    args = retrieval_main.build_parser().parse_args([
        "--train_dataset", os.path.join(root, "retrieval", "train.jsonl"),
        "--vocab_file", os.path.join(root, "vocab.txt"),
        "--output_path", out,
        "--bert_model", "google/bert_uncased_L-2_H-128_A-2",
        "--vocab_size", "32", "--batch_size", "8",
        "--epochs", str(epochs), "--seq_len", "8",
        "--num_image_embeds", "3", "--img_size", "64",
        "--do_train", "true", "--do_test", "false", "--lr", "1e-3",
    ] + extra)
    retrieval_main.main(args)
    rows = _rows(os.path.join(out, "metrics.jsonl"))
    acc = _best_window(rows, "train_acc")
    return {"metric": "train ITM acc", "value": acc,
            "target": 0.9, "ok": bool(acc is not None and acc > 0.9)}


def run_finetune(root: str, out: str, epochs: int,
                 pretrained: str | None = None) -> dict:
    from medvill_tpu.cli import decode_main, finetune_main

    train = os.path.join(root, "reportgen", "train.jsonl")
    vocab = os.path.join(root, "vocab.txt")
    ft_out = os.path.join(out, "ft")
    # recover from the pretrain run like the reference
    # (--model_recover_path, finetune.py:330-357): decoding the right
    # report requires the image->class binding the pretrain stage learned
    extra = (["--model_recover_path", pretrained] if pretrained else [])
    args = finetune_main.build_parser().parse_args([
        "--tasks", "report_generation", "--src_file", train,
        "--vocab_file", vocab, "--output_dir", ft_out,
        "--bert_model", "google/bert_uncased_L-2_H-128_A-2",
        "--vocab_size", "32",
        "--train_batch_size", "8", "--num_train_epochs", str(epochs),
        "--len_vis_input", "3", "--img_size", "64",
        "--max_seq_length", "20", "--max_pred", "8", "--max_len_b", "14",
        "--learning_rate", "1e-3",
    ] + extra)
    finetune_main.main(args)

    dec_out = os.path.join(out, "decode")
    dargs = decode_main.build_parser().parse_args([
        "--src_file", train, "--vocab_file", vocab,
        "--model_recover_path", ft_out, "--output_dir", dec_out,
        "--bert_model", "google/bert_uncased_L-2_H-128_A-2",
        "--vocab_size", "32",
        "--batch_size", "8", "--len_vis_input", "3", "--img_size", "64",
        "--max_seq_length", "20", "--max_tgt_length", "14",
        "--run_name", "overfit",
    ])
    decode_main.main(dargs)
    results = json.load(open(os.path.join(dec_out, "all_results.json")))
    b1 = max(r["Bleu_1"] for r in results)
    return {"metric": "train-set Bleu_1 after finetune",
            "value": b1, "target": 0.8, "ok": bool(b1 > 0.8)}


WORKLOADS = {
    # (runner, base epochs at the default n=16 corpus).  Pretrain's budget
    # is dominated by ITM: the cross-modal match is an equality test whose
    # ITM-only version plateaus at chance for 300+ steps — for the
    # REFERENCE's own torch CXRBERT on the identical corpus too (control
    # run, DESIGN.md §9) — and only cracks once co-trained MLM has shaped
    # class-separable text features, several hundred steps in.
    "pretrain": (run_pretrain, 400),
    "classify": (run_classify, 40),
    "retrieve": (run_retrieve, 40),
    # 240, not 60: the image->masked-token routing is the one circuit no
    # earlier stage pre-trains (pretrain MLM needs only text context on
    # this corpus), and BertAdam's warmup-linear-DECAY schedule (reference
    # parity) starves it at small t_total: measured 60 epochs -> BLEU 0.5
    # (class collapse), 120 -> 0.5 or 0.83 depending on the RNG draw,
    # 240 -> comfortably past the 0.8 target (same recovered checkpoint)
    "finetune": (run_finetune, 240),
}


def main() -> int:
    p = argparse.ArgumentParser(
        description="overfit proof over the four CLI workloads")
    p.add_argument("--workloads", type=str,
                   default="pretrain,classify,retrieve,finetune")
    p.add_argument("--root", type=str, default="/tmp/medvill_overfit",
                   help="work dir (synthetic data + run outputs)")
    p.add_argument("--n", type=int, default=16,
                   help="synthetic records per split (max 20)")
    p.add_argument("--epochs-scale", type=float, default=1.0,
                   help="multiply every workload's epoch budget")
    p.add_argument("--pretrained", type=str, default=None,
                   help="existing pretrain output dir for the retrieve/"
                        "finetune stages to recover from (the reference "
                        "workflow; REQUIRED for those stages to hit their "
                        "targets unless 'pretrain' runs in the same "
                        "invocation — scratch ITM plateaus at chance, "
                        "DESIGN.md §9)")
    a = p.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        # the TPU image's site hook force-selects its platform via
        # jax.config; the env var alone is not enough (tests/conftest.py)
        jax.config.update("jax_platforms", "cpu")
    from medvill_tpu.utils import jax_cache
    jax_cache.enable()  # durable machine-keyed persistent compile cache

    data_root = os.path.join(a.root, "data")
    shutil.rmtree(a.root, ignore_errors=True)
    make_structured_tree(data_root, n=a.n)

    ok = True
    pretrain_out = os.path.join(a.root, "pretrain")
    for name in a.workloads.split(","):
        name = name.strip()
        runner, epochs = WORKLOADS[name]
        t0 = time.time()
        kwargs = {}
        if name in ("retrieve", "finetune"):
            # the reference workflow: downstream stages recover from the
            # pretrain run (also what makes the ITM binding learnable)
            from medvill_tpu.core import checkpoint as ckpt_lib

            for src in (pretrain_out, a.pretrained):
                if src and ckpt_lib.latest_epoch(src) is not None:
                    kwargs["pretrained"] = src
                    break
        res = runner(data_root, os.path.join(a.root, name),
                     max(1, int(round(epochs * a.epochs_scale))), **kwargs)
        res = {"workload": name, **res,
               "seconds": round(time.time() - t0, 1)}
        print(json.dumps(res), flush=True)
        ok = ok and res["ok"]
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
