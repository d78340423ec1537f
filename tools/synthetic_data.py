"""Generate a complete synthetic dataset tree for every medvill_tpu CLI.

The reference's workloads need MIMIC-CXR / Open-I / VQA-RAD, none of which
are redistributable; this tool emits structurally identical (tiny, random)
data so every entry point can be exercised end-to-end on any machine:

- pretrain/      Train.jsonl + Valid.jsonl (reference main_origin.py rows:
                 id/split/label/text/img — SURVEY.md §2.1)
- classification/ Train|Valid|Test.jsonl with comma-separated CheXpert
                 labels (reference mmbt/data/dataset.py)
- retrieval/     train.jsonl + eval_pool.jsonl with per-row ``is_aligned``
                 candidate labels, one aligned row per ``eval_len_size``
                 pool (reference full_dset_retrieval.py:145-162)
- reportgen/     train.jsonl + test.jsonl for finetune/decode
                 (reference sc/data_loader.py Img2txtDataset rows)
- vqa/           VQA-RAD layout: {train,test}set.json +
                 cache/{split}_target.pkl + imgid2idx.json + images/
                 (reference sc/data_loader.py:166-188,267-273)
- vocab.txt      wordpiece vocab covering every generated token
- imgs/          shared grayscale + RGB PNGs

Usage:
    python tools/synthetic_data.py OUTDIR [--n 16] [--img_size 64]
                                   [--num_answers 458] [--seed 0]

Then e.g.:
    python -m medvill_tpu.cli.pretrain_main \
        --train_dataset OUTDIR/pretrain/Train.jsonl \
        --test_dataset OUTDIR/pretrain/Valid.jsonl \
        --vocab_file OUTDIR/vocab.txt --bert_model test-tiny ...
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import random

import numpy as np

WORDS = ["no", "acute", "disease", "heart", "size", "normal", "lungs",
         "clear", "mild", "edema", "stable", "chest", "effusion", "right",
         "left", "small", "seen", "pleural", "focal", "consolidation"]
SPECIALS = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
CHEXPERT = ["'Cardiomegaly'", "'Edema'", "'Pleural Effusion'", "'Others'"]


def _text(rng: random.Random, lo=5, hi=12) -> str:
    return " ".join(rng.choices(WORDS, k=rng.randint(lo, hi)))


def _images(root: str, n: int, img_size: int, seed: int) -> list:
    from PIL import Image

    npr = np.random.default_rng(seed)
    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    paths = []
    for i in range(n):
        p = os.path.join(img_dir, f"{i}.png")
        if i % 2:  # mix grayscale sources (the MIMIC JPGs are grayscale)
            Image.fromarray(npr.integers(0, 255, (img_size, img_size),
                                         np.uint8), "L").save(p)
        else:
            Image.fromarray(npr.integers(0, 255, (img_size, img_size, 3),
                                         np.uint8), "RGB").save(p)
        paths.append(p)
    return paths


def generate(root: str, n: int = 16, img_size: int = 64,
             num_answers: int = 458, seed: int = 0) -> None:
    rng = random.Random(seed)
    os.makedirs(root, exist_ok=True)
    paths = _images(root, n, img_size, seed)

    with open(os.path.join(root, "vocab.txt"), "w") as f:
        for w in SPECIALS + WORDS:
            f.write(w + "\n")

    # pretrain + retrieval rows share the shape {id,split,label,text,img}
    os.makedirs(os.path.join(root, "pretrain"), exist_ok=True)
    for split, fname in (("train", "Train.jsonl"), ("valid", "Valid.jsonl")):
        with open(os.path.join(root, "pretrain", fname), "w") as f:
            for i, p in enumerate(paths):
                f.write(json.dumps({
                    "id": f"{split}{i}", "split": split,
                    "label": rng.choice(CHEXPERT), "text": _text(rng),
                    "img": os.path.abspath(p)}) + "\n")

    os.makedirs(os.path.join(root, "classification"), exist_ok=True)
    for fname in ("Train.jsonl", "Valid.jsonl", "Test.jsonl"):
        with open(os.path.join(root, "classification", fname), "w") as f:
            for i, p in enumerate(paths):
                labels = rng.sample(CHEXPERT, rng.randint(1, 2))
                if fname == "Train.jsonl":
                    # the CLI derives the label vocabulary from the TRAIN
                    # split (get_labels_and_frequencies, like the
                    # reference's mmbt); guarantee every label appears
                    # there so Valid/Test rows can't carry unseen labels
                    labels = sorted(set(labels) | {CHEXPERT[i % len(CHEXPERT)]})
                f.write(json.dumps({
                    "id": f"{fname}-{i}",
                    "text": _text(rng),
                    "label": ", ".join(s.strip("'") for s in labels),
                    "img": os.path.abspath(p)}) + "\n")

    os.makedirs(os.path.join(root, "retrieval"), exist_ok=True)
    with open(os.path.join(root, "retrieval", "train.jsonl"), "w") as f:
        for i, p in enumerate(paths):
            f.write(json.dumps({
                "id": f"t{i}", "split": "train",
                "label": rng.choice(CHEXPERT), "text": _text(rng),
                "img": os.path.abspath(p)}) + "\n")
    # eval pool: one aligned candidate per pool of n (use --eval_len_size n)
    with open(os.path.join(root, "retrieval", "eval_pool.jsonl"), "w") as f:
        for i, p in enumerate(paths):
            f.write(json.dumps({
                "id": f"e{i}", "split": "valid",
                "label": rng.choice(CHEXPERT), "text": _text(rng),
                "img": os.path.abspath(p),
                "is_aligned": [1 if i == 0 else 0]}) + "\n")

    os.makedirs(os.path.join(root, "reportgen"), exist_ok=True)
    for fname in ("train.jsonl", "test.jsonl"):
        with open(os.path.join(root, "reportgen", fname), "w") as f:
            for i, p in enumerate(paths):
                f.write(json.dumps({
                    "id": f"r{i}", "text": _text(rng),
                    "label": rng.choice(CHEXPERT),
                    "img": os.path.abspath(p)}) + "\n")

    # VQA-RAD layout (reference sc/data_loader.py:166-188)
    vqa = os.path.join(root, "vqa")
    os.makedirs(os.path.join(vqa, "cache"), exist_ok=True)
    os.makedirs(os.path.join(vqa, "images"), exist_ok=True)
    img_names = []
    for i, p in enumerate(paths):
        name = f"synpic{i}.jpg"
        from PIL import Image

        Image.open(p).convert("L").save(
            os.path.join(vqa, "images", name))
        img_names.append(name)
    with open(os.path.join(vqa, "imgid2idx.json"), "w") as f:
        json.dump({name: i for i, name in enumerate(img_names)}, f)
    for split in ("train", "test"):
        samples, answers = [], []
        for i, name in enumerate(img_names):
            qid = i if split == "train" else n + i
            organ = rng.choice(["CHEST", "HEAD", "ABD"])
            samples.append({
                "qid": qid, "image_name": name,
                "question": _text(rng, 3, 8) + "? -yes/no",
                "answer_type": rng.choice(["CLOSED", "OPEN"]),
                "image_organ": organ})
            labels = rng.sample(range(num_answers), rng.randint(1, 2))
            answers.append({"qid": qid, "labels": labels,
                            "scores": [1.0] * len(labels)})
        with open(os.path.join(vqa, f"{split}set.json"), "w") as f:
            json.dump(samples, f)
        with open(os.path.join(vqa, "cache", f"{split}_target.pkl"),
                  "wb") as f:
            pickle.dump(answers, f)
    print(f"synthetic dataset tree written to {root} "
          f"({n} rows per split, img_size {img_size})")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("outdir")
    p.add_argument("--n", type=int, default=16)
    p.add_argument("--img_size", type=int, default=64)
    p.add_argument("--num_answers", type=int, default=458)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    generate(a.outdir, a.n, a.img_size, a.num_answers, a.seed)


if __name__ == "__main__":
    main()
