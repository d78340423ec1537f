"""CNN_BERT retrieval branch (the reference's non-CXRBERT path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytest as _pytest
pytestmark = _pytest.mark.slow

from medvill_tpu.core.config import BertConfig, ImageEncoderConfig, \
    RetrievalConfig
from medvill_tpu.data.retrieval import (CXRRetrievalDataset, collate_pairs,
                                        synthetic_retrieval_records)
from medvill_tpu.data.tokenization import BertTokenizer, build_vocab
from medvill_tpu.models.cnn_bert import CNNBert
from medvill_tpu.train import optim, retrieve
from medvill_tpu.train.pretrain import TrainState


def test_cnn_branch_dataset_and_step():
    tok = BertTokenizer(build_vocab([f"word{i}" for i in range(50)]))
    cfg = RetrievalConfig(
        bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=4),
        seq_len=7, img_size=64, batch_size=4)
    rng = np.random.default_rng(0)
    ds = CXRRetrievalDataset(
        synthetic_retrieval_records(8), tok, cfg, is_train=True, seed=0,
        cxr_bert=False,
        image_loader=lambda p: rng.standard_normal((64, 64, 3)).astype(
            np.float32))
    idx, pos, neg = ds[0]
    # CNN branch layout: [CLS] tokens [SEP] + pad over seq_len+2
    assert pos["input_txt"].shape == (cfg.seq_len + 2,)
    assert pos["input_txt"][0] == tok.vocab["[CLS]"]
    assert "attn_len" in pos and "cls_tok" not in pos

    batch = collate_pairs([ds[i] for i in range(4)])
    model = CNNBert(cfg.bert, n_classes=2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(batch["input_txt"][:2]),
        jnp.asarray(batch["attn_len"][:2]),
        jnp.asarray(batch["segment"][:2]),
        jnp.asarray(batch["image"][:2]))
    tx = optim.adamw(1e-3)
    state = TrainState(step=jnp.zeros([], jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]))
    step = jax.jit(retrieve.make_cnn_train_step(model, tx, cfg))
    b = jax.tree_util.tree_map(jnp.asarray, batch)
    state, m = step(state, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    score = jax.jit(retrieve.make_cnn_score_step(model, cfg))
    s = score(state, b)
    assert s.shape == (8,)
    assert np.isfinite(np.asarray(s)).all()
