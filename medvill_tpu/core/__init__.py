from medvill_tpu.core.config import (
    BertConfig,
    ImageEncoderConfig,
    MaskVariant,
    PretrainConfig,
    ClassificationConfig,
    RetrievalConfig,
    FinetuneConfig,
    DecodeConfig,
)
from medvill_tpu.core.mesh import make_mesh, shard_batch, replicate

__all__ = [
    "BertConfig",
    "ImageEncoderConfig",
    "MaskVariant",
    "PretrainConfig",
    "ClassificationConfig",
    "RetrievalConfig",
    "FinetuneConfig",
    "DecodeConfig",
    "make_mesh",
    "shard_batch",
    "replicate",
]
