"""VQA-RAD dataset support.

Equivalent of the VQA branch of ``Img2txtDataset`` + ``_load_dataset`` +
question ``pre_processing`` (reference: sc/data_loader.py:61-293):

- loads ``{train,test}set.json`` + ``cache/{name}_target.pkl`` (soft answer
  targets) + ``imgid2idx.json`` + ``cache/trainval_{ans2label,label2ans}.pkl``;
- organ filter: all / chest / head / abd (data_loader.py:180-188);
- question normalization: strip "? -yes/no" / "? -open" markers, commas,
  question marks, "x ray" -> "x-ray" (data_loader.py:135-143);
- 458-way soft target built by scattering answer scores
  (data_loader.py:267-273);
- answer_type CLOSED->0 / OPEN->1, organ CHEST/HEAD/ABD -> 0/1/2
  (data_loader.py:432-449).
"""
from __future__ import annotations

import json
import os
import pickle
import random
from typing import Dict, List, Optional, Sequence

import numpy as np

from medvill_tpu.core.config import FinetuneConfig
from medvill_tpu.data import images as image_lib
from medvill_tpu.data.seq2seq import Seq2seqPreprocessor

ANS_TYPE = {"CLOSED": 0, "CLOSED ": 0, "OPEN": 1, "OPEN ": 1}
ORGAN = {"CHEST": 0, "HEAD": 1, "ABD": 2}


def preprocess_question(text: str) -> str:
    """(reference: sc/data_loader.py:135-143)."""
    s = text.lower()
    for marker in ("? -yes/no", "? -open", "? - open"):
        s = s.replace(marker, "")
    s = (s.replace(",", "").replace("?", "").replace("'s", " 's")
         .replace("...", "").replace("x ray", "x-ray").replace(".", ""))
    return s


def load_vqa_entries(dataroot: str, split: str, organ_filter: str = "all"
                     ) -> List[dict]:
    """(reference: sc/data_loader.py:166-188)."""
    with open(os.path.join(dataroot, split + "set.json")) as f:
        samples = sorted(json.load(f), key=lambda x: x["qid"])
    with open(os.path.join(dataroot, "cache", f"{split}_target.pkl"),
              "rb") as f:
        answers = sorted(pickle.load(f), key=lambda x: x["qid"])
    with open(os.path.join(dataroot, "imgid2idx.json")) as f:
        img_id2idx = json.load(f)
    # hardening beyond the reference (data_loader.py:177-187 zips the two
    # sorted lists blindly): a missing/extra qid in either file would pair
    # every later question with the wrong soft answer target silently
    if len(samples) != len(answers) or any(
            s["qid"] != a["qid"] for s, a in zip(samples, answers)):
        raise ValueError(
            f"{split}set.json and cache/{split}_target.pkl disagree on "
            "qids — answers would silently misalign")
    entries = []
    for sample, answer in zip(samples, answers):
        organ = str(sample.get("image_organ", "")).strip()
        if organ_filter != "all" and organ.upper() != organ_filter.upper():
            continue
        entries.append(dict(
            qid=sample["qid"], image_name=sample["image_name"],
            image=img_id2idx.get(sample["image_name"]),
            question=sample["question"], answer=answer,
            answer_type=sample["answer_type"], image_organ=organ))
    return entries


def soft_target(answer: Optional[dict], num_answers: int) -> np.ndarray:
    """Scatter answer scores into a dense soft target
    (reference: data_loader.py:267-273)."""
    target = np.zeros(num_answers, np.float32)
    if answer:
        labels = answer.get("labels")
        scores = answer.get("scores")
        if labels is not None and len(labels):
            target[np.asarray(labels, int)] = np.asarray(scores, np.float32)
    return target


class VQADataset:
    """VQA-RAD examples preprocessed through the s2s/bi pipelines (the text
    segment is the question; no MLM masking in vqa mode)."""

    def __init__(self, cfg: FinetuneConfig, tokenizer,
                 entries_or_dataroot, split: str = "train",
                 image_root: str = "", seed: int = 0, image_loader=None):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.rng = random.Random(seed)
        if isinstance(entries_or_dataroot, str):
            organ = cfg.vqa_organs[0] if len(cfg.vqa_organs) == 1 else "all"
            self.entries = load_vqa_entries(entries_or_dataroot, split,
                                            organ)
        else:
            self.entries = list(entries_or_dataroot)
        self.image_root = image_root
        self.image_loader = image_loader or self._default_image_loader
        self.pipelines = [
            Seq2seqPreprocessor(cfg, tokenizer, "s2s", bar=cfg.bar,
                                rng=self.rng),
            Seq2seqPreprocessor(cfg, tokenizer, "bi", rng=self.rng),
        ]
        self.probs = [cfg.s2s_prob, cfg.bi_prob]

    def _default_image_loader(self, image_name: str) -> np.ndarray:
        return image_lib.load_image(
            os.path.join(self.image_root, image_name), self.cfg.img_size,
            grayscale_to_rgb=True, do_resize=(self.cfg.len_vis_input < 100))

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self.fetch(idx)

    def fetch(self, idx: int, rng: Optional[random.Random] = None,
              load_image: bool = True) -> "Dict[str, np.ndarray] | None":
        """``__getitem__`` with an optional per-sample RNG override (see
        ``BatchLoader(workers>1)``).  ``load_image=False`` is the
        mid-epoch-resume RNG replay path (``BatchLoader.skip_next``,
        workers=1): identical pipeline-choice + masking draws, no image IO,
        returns ``None``."""
        e = self.entries[idx]
        q_tokens = self.tokenizer.tokenize(
            preprocess_question(e["question"]))
        proc = (rng or self.rng).choices(self.pipelines,
                                         weights=self.probs)[0]
        out = proc(q_tokens, rng=rng)
        if not load_image:
            return None
        out["image"] = image_lib.as_wire_image(self.image_loader(e["image_name"]))
        out["ans_target"] = soft_target(e.get("answer"),
                                        self.cfg.vqa_num_answers)
        out["ans_type"] = np.int32(
            ANS_TYPE.get(str(e["answer_type"]).strip().upper(), 0))
        out["organ"] = np.int32(
            ORGAN.get(str(e["image_organ"]).strip().upper(), 0))
        return out


def synthetic_vqa_entries(n: int, num_answers: int = 458, seed: int = 0
                          ) -> List[dict]:
    rng = random.Random(seed)
    words = [f"word{i}" for i in range(30)]
    entries = []
    for i in range(n):
        labels = rng.sample(range(num_answers), rng.randint(1, 2))
        entries.append(dict(
            qid=i, image_name=f"img{i}.jpg", image=i,
            question=" ".join(rng.choices(words, k=rng.randint(3, 10)))
            + "? -yes/no",
            answer=dict(labels=labels,
                        scores=[1.0] * len(labels)),
            answer_type=rng.choice(["CLOSED", "OPEN"]),
            image_organ="CHEST"))
    return entries
