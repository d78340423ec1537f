"""Finetune (report-generation / VQA) data pipeline.

Equivalent of ``Img2txtDataset`` + ``Preprocess4Seq2seq(+Decoder)``
(reference: sc/data_loader.py:61-540):

- report-gen mode reads JSONL records with an image path and tokenized text
  (data_loader.py:215-234); VQA mode consumes the VQA-RAD pickles
  (see medvill_tpu/data/vqa.py);
- each example picks the s2s or bi preprocessor by weighted choice
  (data_loader.py:280-284; finetune.py:263-283 two-member bi_uni_pipeline);
- generation-style masking over the text segment only, with a 50% chance of
  force-masking the final [SEP] (teaches EOS; data_loader.py:354-377),
  ``n_pred = min(max_pred, max(1, round(len_b * mask_prob)))``;
- masked_ids/pos/weights padded to max_pred (data_loader.py:414-419);
- the 2-D mask is carried as a per-sample ``(variant, n_tokens)`` spec
  realized on device (medvill_tpu/data/masks.py:seq2seq_spec_dense) instead
  of the reference's materialized [512, 512] tensor (data_loader.py:395-412).
"""
from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional, Sequence

import numpy as np

from medvill_tpu.core.config import FinetuneConfig
from medvill_tpu.data import images as image_lib
from medvill_tpu.data.masks import SEQ2SEQ_VARIANT_IDS, Seq2seqMaskMode
from medvill_tpu.data.sampling import truncate_tokens_pair


class Seq2seqPreprocessor:
    """One mode (s2s / bi / bar) of the train-time preprocessor
    (reference: Preprocess4Seq2seq, sc/data_loader.py:295-452)."""

    def __init__(self, cfg: FinetuneConfig, tokenizer, mode: str,
                 bar: bool = False, rng: Optional[random.Random] = None):
        assert mode in ("s2s", "bi", "bar")
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.mode = mode
        self.bar = bar
        self.rng = rng or random
        self.task_idx = 3 if mode == "s2s" else 0
        self.max_len = cfg.max_seq_length

    def __call__(self, tokens_b: List[str],
                 rng: Optional[random.Random] = None) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        v = self.tokenizer.vocab
        rng = rng or self.rng
        len_vis = cfg.len_vis_input
        tokens_a = ["[UNK]"] * len_vis
        tokens_b = list(tokens_b)
        truncate_tokens_pair(tokens_a, tokens_b, len_vis + cfg.max_len_b,
                             max_len_b=cfg.max_len_b,
                             trunc_seg=getattr(cfg, "trunc_seg", "b"),
                             always_truncate_tail=getattr(
                                 cfg, "always_truncate_tail", False),
                             rng=rng)
        tokens = ["[CLS]"] + tokens_a + ["[SEP]"] + tokens_b + ["[SEP]"]

        if cfg.new_segment_ids and self.mode == "s2s":
            segment = [4] * (len(tokens_a) + 2) + [5] * (len(tokens_b) + 1)
        else:
            segment = [0] * (len(tokens_a) + 2) + [1] * (len(tokens_b) + 1)

        effective = len(tokens_b)
        n_pred = min(cfg.max_pred, max(1, round(effective * cfg.mask_prob)))
        if cfg.task == "report_generation":
            cand_pos = [i for i, tk in enumerate(tokens)
                        if i >= len(tokens_a) + 2 and tk != "[CLS]"]
            rng.shuffle(cand_pos)
            if rng.random() > 0.5:  # 50% force-mask final [SEP]
                masked_pos = cand_pos[:n_pred - 1] + [len(tokens) - 1]
            else:
                masked_pos = cand_pos[:n_pred]
            masked_tokens = [tokens[p] for p in masked_pos]
            for p in masked_pos:
                tokens[p] = "[MASK]"
        else:
            n_pred, masked_pos, masked_tokens = 0, [], []
        masked_weights = [1] * len(masked_tokens)

        input_ids = [v.get(t, v["[UNK]"]) for t in tokens]
        masked_ids = [v.get(t, v["[UNK]"]) for t in masked_tokens]

        n_tokens = len(input_ids)
        n_pad = self.max_len - n_tokens
        input_ids += [0] * n_pad
        segment += [0] * n_pad

        n_pred_now = len(masked_ids)
        if cfg.max_pred > n_pred_now:
            pad = cfg.max_pred - n_pred_now
            masked_ids += [0] * pad
            masked_pos += [0] * pad
            masked_weights += [0] * pad

        mode = Seq2seqMaskMode.BAR if self.bar else self.mode
        return dict(
            input_ids=np.array(input_ids, np.int32),
            segment_ids=np.array(segment, np.int32),
            mask_spec=np.array([SEQ2SEQ_VARIANT_IDS[mode], n_tokens],
                               np.int32),
            masked_ids=np.array(masked_ids, np.int32),
            masked_pos=np.array(masked_pos, np.int32),
            masked_weights=np.array(masked_weights, np.float32),
            task_idx=np.int32(self.task_idx),
        )


class Img2TxtDataset:
    """Report-generation dataset: JSONL -> (image, preprocessed text)
    (reference: sc/data_loader.py:190-293 report-gen branch)."""

    def __init__(self, data_path_or_records, tokenizer, cfg: FinetuneConfig,
                 seed: int = 0, image_loader=None,
                 pretokenized: bool = False):
        if isinstance(data_path_or_records, str):
            self.data_dir = os.path.dirname(data_path_or_records)
            with open(data_path_or_records) as f:
                self.data = [json.loads(l) for l in f]
        else:
            self.data_dir = ""
            self.data = list(data_path_or_records)
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.rng = random.Random(seed)
        self.pretokenized = pretokenized
        self.image_loader = image_loader or self._default_image_loader
        self.pipelines = [
            Seq2seqPreprocessor(cfg, tokenizer, "s2s", bar=cfg.bar,
                                rng=self.rng),
            Seq2seqPreprocessor(cfg, tokenizer, "bi", rng=self.rng),
        ]
        self.probs = [cfg.s2s_prob, cfg.bi_prob]

    def _default_image_loader(self, img_path: str) -> np.ndarray:
        # grayscale -> 3ch; resize only if len_vis_input < 100
        # (reference: data_loader.py:421-428)
        return image_lib.load_image(
            os.path.join(self.data_dir, img_path), self.cfg.img_size,
            grayscale_to_rgb=True,
            do_resize=(self.cfg.len_vis_input < 100))

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        return self.fetch(idx)

    def fetch(self, idx: int, rng: Optional[random.Random] = None,
              load_image: bool = True) -> "Dict[str, np.ndarray] | None":
        """``__getitem__`` with an optional per-sample RNG override (see
        ``BatchLoader(workers>1)``).  ``load_image=False`` is the
        mid-epoch-resume RNG replay path (``BatchLoader.skip_next``,
        workers=1): identical pipeline-choice + masking draws, no image IO,
        returns ``None``."""
        rec = self.data[idx]
        text = rec["text"]
        tokens_b = (text if self.pretokenized
                    else self.tokenizer.tokenize(text))
        proc = (rng or self.rng).choices(self.pipelines,
                                         weights=self.probs)[0]
        out = proc(tokens_b, rng=rng)
        if not load_image:
            return None
        out["image"] = image_lib.as_wire_image(self.image_loader(rec["img"]))
        return out


class Seq2seqDecodePreprocessor:
    """Decode-time preprocessing (reference: Preprocess4Seq2seqDecoder,
    sc/data_loader.py:455-541): pads gt tokens to max_txt_length for
    teacher-forcing/ppl."""

    def __init__(self, cfg, tokenizer, max_txt_length: int = 128):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_txt_length = max_txt_length

    def __call__(self, img_path: str, original_text: str,
                 image_loader) -> Dict[str, np.ndarray]:
        gt_ids = self.tokenizer.convert_tokens_to_ids(
            self.tokenizer.tokenize(original_text))
        del gt_ids[self.max_txt_length:]
        gt_ids += [0] * (self.max_txt_length - len(gt_ids))
        return dict(
            image=image_lib.as_wire_image(image_loader(img_path)),
            gt_token=np.array(gt_ids, np.int32),
        )
