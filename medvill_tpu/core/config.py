"""Typed configuration for every task in the framework.

The reference uses one argparse parser per entry point with author-machine
defaults (reference: main_origin.py:66-152, Classification/mmbt/main.py:23-91,
Retrieval/full_dset_retrieval.py:646-793, sc/finetune.py:50-186,
sc/generation_decode.py:114-311).  Here each task gets a frozen dataclass whose
defaults reproduce the reference flags; CLIs parse into these.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple


class MaskVariant(enum.IntEnum):
    """The five self-attention mask variants (reference: README.md:25-33,
    data/dataset_origin.py:140-177).

    Values are wire format: a per-sample ``(variant, txt_len)`` int32 spec is
    what crosses the host->device boundary instead of an L x L tensor.

    - FULL: bidirectional; row r sees col c iff c is a valid (non-pad) position
      (reference: full_attn, dataset_origin.py:140-141).
    - S2S: all rows see the image block (cols < num_img+2); text rows attend
      causally over the *whole* text block including padding — the reference
      builds the tril over ``len(input_ids)`` after padding was appended
      (dataset_origin.py:122,144-148); we bit-match that.
    - BAR: S2S plus image rows (r < num_img+2) see everything
      (dataset_origin.py:158-161).
    - NONCROSS: block-diagonal I<->I, T<->T with *no* padding mask — the
      reference fills both blocks with ones (dataset_origin.py:163-167).
    - ATTN1D: 1-D padding mask broadcast over rows; dense semantics equal FULL
      (dataset_origin.py:170-172).
    - MIXED is not a wire value: the host resolves it per sample into FULL or
      S2S with probs (bi_prob, s2s_prob) (dataset_origin.py:152-156).
    """

    FULL = 0
    S2S = 1
    BAR = 2
    NONCROSS = 3
    ATTN1D = 4


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """Mirror of HF/vendored BertConfig (reference:
    sc/pytorch_pretrained_bert/model.py:106-199)."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    # dtype policy: params fp32, compute bf16 on TPU (reference used apex AMP
    # fp16, sc/finetune.py:297-301; bf16 needs no loss scaling).
    compute_dtype: str = "bfloat16"
    # rematerialize encoder layers in backward (memory for FLOPs; enables
    # larger batches than the 16 GB HBM otherwise allows)
    remat: bool = False
    # fuse the Q/K/V projections into one [H, 3H] gemm at apply time
    # (param tree unchanged).  Measured SLOWER on v5e at the reference
    # config (-10 pairs/s: the per-step param concat defeats XLA's
    # weight-layout assignment), so off by default.
    fused_qkv: bool = False
    # integer-threshold Bernoulli for the hidden/embedding dropouts: keep
    # iff raw PRNG bits >= floor(rate * 2^32) — the same Bernoulli(rate)
    # marginal as random.bernoulli without the bits->float conversion on
    # the VPU.  A different stream mapping (dropout is not bit-matched to
    # the reference in any mode); perf A/B knob, off by default.
    fast_dropout: bool = False
    # fuse each encoder block's (dropout + residual-add + LayerNorm)
    # elementwise chain into ONE Pallas kernel (ops/fused_ln.py): one
    # VMEM-resident pass instead of XLA's separate mask-gen/add/two-pass
    # LN re-touching the [B*L, H] activation in HBM.  Param tree unchanged
    # (scale/bias names match nn.LayerNorm).  Perf A/B knob — measurement
    # ledger in DESIGN.md §10.3.
    fused_ln: bool = False
    # relax_projection>1: the MLM-head transform emits that many stacked
    # task-specific projections, selected per sample by task_idx (reference:
    # sc/pytorch_pretrained_bert/model.py:435-496; finetune.py:307-319 sets 4
    # under --relax_projection, task_idx 3=s2s / 0=bi)
    relax_projection: int = 0
    # remat granularity: "layer" recomputes the whole BertLayer (max memory
    # savings); "ffn" checkpoints only the FFN block — the [B, L, 4H]
    # intermediates that dominate activation memory are still freed, but
    # attention and the QKV/output gemms are NOT recomputed (~25% less
    # backward work at the reference config).  Ignored when remat=False.
    remat_mode: str = "ffn"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def base() -> "BertConfig":
        return BertConfig()

    @staticmethod
    def small() -> "BertConfig":
        # google/bert_uncased_L-4_H-512_A-8
        return BertConfig(hidden_size=512, num_hidden_layers=4,
                          num_attention_heads=8, intermediate_size=2048)

    @staticmethod
    def tiny() -> "BertConfig":
        # google/bert_uncased_L-2_H-128_A-2
        return BertConfig(hidden_size=128, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=512)

    @staticmethod
    def from_name(name: str, vocab_size: int = 30522) -> "BertConfig":
        """Map the reference's --bert_model names to configs
        (reference: main_origin.py:116-125 choices)."""
        if name in ("bert-small-scratch", "google/bert_uncased_L-4_H-512_A-8"):
            cfg = BertConfig.small()
        elif name == "google/bert_uncased_L-2_H-128_A-2":
            cfg = BertConfig.tiny()
        elif name == "test-tiny":
            return BertConfig.test_tiny(vocab_size=vocab_size)
        else:
            cfg = BertConfig.base()
        return dataclasses.replace(cfg, vocab_size=vocab_size)

    @staticmethod
    def vlp(base: "BertConfig | None" = None,
            new_segment_ids: bool = True) -> "BertConfig":
        """Config for the vendored finetune/decode stack: LayerNorm eps
        1e-5 (reference: sc/.../model.py:238) and type_vocab_size 6 when
        new_segment_ids (s2s uses segment ids 4/5; reference:
        model.py:1062, data_loader.py:342-348)."""
        base = base or BertConfig.base()
        return dataclasses.replace(
            base, layer_norm_eps=1e-5,
            type_vocab_size=6 if new_segment_ids else 2)

    @staticmethod
    def from_reference_json(path: str,
                            base: "BertConfig | None" = None) -> "BertConfig":
        """Overlay a reference-style ``config.json`` (the vendored
        BertConfig.to_json_string dict written next to every torch
        checkpoint — reference model.py:106-199; loaded by decode/finetune
        via --config_path, generation_decode.py:361) onto ``base``.
        Keys with no equivalent in this dataclass (task_idx,
        fp32_embedding, label_smoothing — training-state knobs, not
        architecture) are ignored."""
        import json as _json

        with open(path) as f:
            d = _json.load(f)
        base = base or BertConfig()
        fields = {f.name for f in dataclasses.fields(BertConfig)}
        return dataclasses.replace(
            base, **{k: v for k, v in d.items()
                     if k in fields and v is not None})

    @staticmethod
    def test_tiny(vocab_size: int = 128) -> "BertConfig":
        """Scratch config for unit tests (fast CPU compile)."""
        return BertConfig(vocab_size=vocab_size, hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=2,
                          intermediate_size=64, max_position_embeddings=512,
                          compute_dtype="float32")


@dataclasses.dataclass(frozen=True)
class ImageEncoderConfig:
    """Visual encoder config (reference: models/image.py, main_origin.py:133-139)."""

    # random-pixel | full-fiber | ViT | pool (1-9-embed adaptive-pool table,
    # mmbt/models/image.py:16-56) | pool-half ((M/2,M/2) pooling,
    # models/image.py:71-93)
    encoder: str = "random-pixel"
    img_size: int = 512            # 224 | 512
    # DATA-LAYER flag: 1 means the source JPGs are grayscale and get
    # expanded to 3 channels at load (reference full_dset_retrieval.py:
    # 174-176 Grayscale(num_output_channels=3)); the model input and the
    # ResNet stem are always 3-channel either way.
    img_channel: int = 3
    img_hidden_size: int = 2048    # ResNet-50 final channels
    num_image_embeds: int = 180    # 36 | 49 | 180 | 256; 1-9 for pool
    patch_size: int = 32           # ViT only: 32 if img_size==512 else 16
    pool_type: str = "avg"         # pool encoders: avg | max
                                   # (--img_embed_pool_type)
    # ResNet-50 freeze: the reference freezes the ENTIRE trunk — its
    # children()[5:] unfreeze loop is a no-op because ImageEncoder_cnn's
    # only child is one nn.Sequential (reference:
    # models/cxrbert_origin.py:65-70, models/image.py:46-52).
    freeze_prefix_stages: bool = True
    # checkpoint bottleneck blocks (recompute in backward) — frees the
    # early-stage activations that cap batch size at 512 px
    remat_blocks: bool = False
    # exact space-to-depth realization of the 7x7/s2 stem conv
    s2d_stem: bool = True

    @property
    def num_fibers(self) -> int:
        """Spatial positions emitted by the CNN trunk: (img_size/32)^2."""
        return (self.img_size // 32) ** 2

    @staticmethod
    def test_tiny() -> "ImageEncoderConfig":
        return ImageEncoderConfig(img_size=64, num_image_embeds=3,
                                  img_hidden_size=64)


@dataclasses.dataclass(frozen=True)
class PretrainConfig:
    """Pretraining flags (reference: main_origin.py:66-152)."""

    train_dataset: str = ""
    test_dataset: Optional[str] = None
    output_path: str = "output"
    log_freq: int = 10

    mlm_task: bool = True
    itm_task: bool = True

    # Mask variant selection (reference flags --attn_1d/--BAR_attn/--Mixed/
    # --s2s_prob/--bi_prob/--disturbing_mask; main_origin.py:90-95).
    attn_1d: bool = False
    bar_attn: bool = True
    mixed: bool = False
    s2s_prob: float = 1.0
    bi_prob: float = 0.0
    disturbing_mask: bool = False

    epochs: int = 50
    batch_size: int = 36
    num_workers: int = 4

    hidden_size: int = 768
    embedding_size: int = 768
    vocab_size: int = 30522
    bert_model: str = "bert-base-scratch"
    weight_load: bool = False
    pre_trained_model_path: Optional[str] = None

    img_position: bool = True
    seq_len: int = 253
    max_seq_len: int = 512

    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    image: ImageEncoderConfig = dataclasses.field(default_factory=ImageEncoderConfig)

    lr: float = 1e-5
    gradient_accumulation_steps: int = 4
    warmup: float = 0.1
    seed: int = 123
    dropout_prob: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-6
    weight_decay: float = 0.0  # HF AdamW default; args.weight_decay unused in
                               # reference trainer (models/train_origin.py:60)

    # TPU extras (no reference equivalent)
    mesh_shape: Tuple[int, ...] = (-1,)     # -1 = all devices on the data axis
    use_flash_attention: bool = True
    donate_state: bool = True
    # MLM loss position-chunk size; full [B,L,V] logits OOM HBM at the
    # reference batch-36 config, so the loss streams over text chunks
    mlm_loss_chunk: int = 128
    # gather only the labeled text positions before the vocab projection
    # (p=0.15 per-token masking -> ~38 of 253; 96 is +10 sigma).  0 falls
    # back to the chunked full-position path.
    mlm_gather_bound: int = 96

    def resolve_variant(self) -> "MaskVariant | None":
        """Map flags to a static variant; MIXED (per-sample) returns None."""
        if self.mixed:
            return None
        if self.bar_attn:
            return MaskVariant.BAR
        if self.disturbing_mask:
            return MaskVariant.NONCROSS
        if self.attn_1d:
            return MaskVariant.ATTN1D
        return MaskVariant.FULL

    @property
    def total_len(self) -> int:
        """[CLS] + img(N) + [SEP] + txt(seq_len) + [SEP]
        (reference: data/dataset_origin.py:37)."""
        return self.seq_len + self.image.num_image_embeds + 3


@dataclasses.dataclass(frozen=True)
class ClassificationConfig:
    """MMBT multilabel classification (reference:
    Downstream_task/Classification/mmbt/main.py:23-91)."""

    data_path: str = ""
    output_path: str = "output_clf"
    task: str = "mimic-cxr"  # mimic-cxr | openi
    # "multilabel": weighted BCE + AUROC/F1; "classification": softmax CE +
    # accuracy (reference --task_type, mmbt/main.py:30,92-104,147-193)
    task_type: str = "multilabel"
    batch_size: int = 56
    max_epochs: int = 10
    lr: float = 1e-4
    lr_factor: float = 0.5
    lr_patience: int = 2
    patience: int = 10       # early stop
    warmup: float = 0.1
    gradient_accumulation_steps: int = 1
    dropout_prob: float = 0.1
    max_seq_len: int = 512
    num_image_embeds: int = 256
    img_size: int = 512
    seed: int = 123
    freeze_img: int = 3      # epochs to keep image encoder frozen
    freeze_txt: int = 5      # (reference passes these as flags; main.py:204-209)
    weight_classes: bool = True
    pretrained_ckpt: Optional[str] = None
    labels: Tuple[str, ...] = ()
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    image: ImageEncoderConfig = dataclasses.field(
        default_factory=lambda: ImageEncoderConfig(num_image_embeds=256))
    mesh_shape: Tuple[int, ...] = (-1,)
    use_flash_attention: bool = True


@dataclasses.dataclass(frozen=True)
class RetrievalConfig:
    """Label-conditioned image-text retrieval (reference:
    Downstream_task/Retrieval/full_dset_retrieval.py:646-793)."""

    train_dataset: str = ""
    eval_dataset: str = ""
    output_path: str = "output_retrieval"
    batch_size: int = 70
    epochs: int = 10
    lr: float = 1e-5
    seq_len: int = 253
    num_image_embeds: int = 180
    img_size: int = 512
    seed: int = 123
    direction: str = "i2t"     # i2t | t2i
    eval_len_size: int = 759   # candidates per query (759/1536/710/354)
    pretrained_ckpt: Optional[str] = None
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    image: ImageEncoderConfig = dataclasses.field(default_factory=ImageEncoderConfig)
    mesh_shape: Tuple[int, ...] = (-1,)
    use_flash_attention: bool = True

    @property
    def total_len(self) -> int:
        return self.seq_len + self.image.num_image_embeds + 3


@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    """Report-generation / VQA finetune (reference: sc/finetune.py:50-186)."""

    task: str = "report_generation"  # report_generation | vqa
    data_dir: str = ""
    src_file: str = ""
    output_dir: str = "output_finetune"
    model_recover_path: Optional[str] = None

    batch_size: int = 4          # reference: 2/GPU x 2 GPUs
    epochs: int = 5              # reference: --num_train_epochs
    lr: float = 3e-5
    warmup: float = 0.1
    weight_decay: float = 0.01
    gradient_accumulation_steps: int = 1
    label_smoothing: float = 0.1
    # --drop_prob overrides the model's dropout rates (reference
    # model.py:620-623 sets attention_probs_dropout_prob AND
    # hidden_dropout_prob from it); it is NOT the drop-worst ratio.
    drop_prob: float = 0.1
    # Ruotian-Luo drop-worst: ratio --max_drop_worst_ratio (default 0 — OFF),
    # active only when the 1-based epoch exceeds --drop_after
    # (reference finetune.py:179-180,440)
    max_drop_worst_ratio: float = 0.0
    drop_after: int = 6
    # pair-truncation policy (reference finetune.py:158-161; at the default
    # call shapes the trunc_seg branch is unreachable because only segment b
    # can exceed its cap — see data/sampling.py::truncate_tokens_pair)
    trunc_seg: Optional[str] = "b"
    always_truncate_tail: bool = False
    # BertAdam schedule mode (reference --sche_mode, finetune.py:175; the
    # fp16 manual-lr override computes warmup_linear but in the executed
    # non-fp16 path BertAdam's internal schedule governs)
    sche_mode: str = "warmup_linear"
    max_pred: int = 3            # max masked tokens per sample (report-gen: 128)
    mask_prob: float = 0.15
    seed: int = 123

    len_vis_input: int = 256     # reference --len_vis_input (finetune.py:68)
    max_len_a: int = 256         # image segment length
    max_len_b: int = 253         # text segment length
    max_seq_length: int = 512
    new_segment_ids: bool = True # s2s uses segment ids 4/5 (data_loader.py:342-348)

    s2s_prob: float = 1.0
    bi_prob: float = 0.0
    bar: bool = False            # BAR mask variant (reference --bar flag)
    mask_image_regions: bool = False
    vqa_organs: Tuple[str, ...] = ("chest",)  # chest|head|abd filter
    vqa_num_answers: int = 458

    img_size: int = 512
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    image: ImageEncoderConfig = dataclasses.field(
        default_factory=lambda: ImageEncoderConfig(num_image_embeds=256,
                                                   encoder="full-fiber"))
    mesh_shape: Tuple[int, ...] = (-1,)
    use_flash_attention: bool = True


@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    """Generation decode (reference: sc/generation_decode.py:114-311)."""

    model_recover_path: str = ""
    src_file: str = ""
    output_dir: str = "output_decode"
    batch_size: int = 16
    beam_size: int = 1
    length_penalty: float = 0.0
    forbid_duplicate_ngrams: bool = False
    forbid_ignore_word: Optional[str] = None
    ngram_size: int = 3
    max_txt_length: int = 128   # reference --max_tgt_length
    len_vis_input: int = 256
    split: str = "test"
    seed: int = 123
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    image: ImageEncoderConfig = dataclasses.field(
        default_factory=lambda: ImageEncoderConfig(num_image_embeds=256,
                                                   encoder="full-fiber"))
