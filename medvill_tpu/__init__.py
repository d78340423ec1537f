"""medvill-tpu: a TPU-native (JAX/XLA/Pallas/pjit) vision-language framework.

Re-implements the full capability surface of MedViLL
(reonaledo/Multi-modality-Self-supervision) with a TPU-first design:

- single-stream BERT-base joint encoder over ``[CLS] + image regions + [SEP] + text``
- MLM + label-conditioned ITM pretraining under five attention-mask variants
  (BAR, Bi+Seq2Seq mixed, Bidirectional, Seq2Seq, Non-cross)
- downstream: multilabel disease classification (MMBT), label-conditioned
  image-text retrieval, VQA-RAD, autoregressive report generation (greedy/beam)

TPU-first choices (vs the PyTorch reference):
- attention masks are *specs* ``(variant_id, txt_len)``, never materialized L x L
  host tensors (reference: data/dataset_origin.py:140-177)
- one pjit-compiled train step per task over a ``data`` mesh axis (reference:
  nn.DataParallel / NCCL DDP)
- mask-parameterized Pallas flash-attention kernel for the joint encoder
- KV-cached ``lax.while_loop`` decoding (reference: hidden-state cache with K/V
  recompute, sc/pytorch_pretrained_bert/model.py:285-294)
- orbax checkpointing with torch-key-remap import shims
"""

__version__ = "0.1.0"
