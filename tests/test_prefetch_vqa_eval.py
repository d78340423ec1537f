"""PrefetchLoader semantics + VQA inference/eval path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytest as _pytest
pytestmark = _pytest.mark.slow

from medvill_tpu.core.config import (BertConfig, FinetuneConfig,
                                     ImageEncoderConfig)
from medvill_tpu.data.pretrain import BatchLoader, PrefetchLoader
from medvill_tpu.train.pretrain import TrainState


def test_prefetch_loader_order_and_error():
    batches = [{"x": np.array([i])} for i in range(5)]
    out = [b["x"][0] for b in PrefetchLoader(batches, depth=2)]
    assert out == [0, 1, 2, 3, 4]

    def bad():
        yield {"x": np.array([0])}
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        list(PrefetchLoader(bad()))


def test_prefetch_place_fn():
    batches = [{"x": np.array([i])} for i in range(3)]
    seen = []
    out = list(PrefetchLoader(batches, place_fn=lambda b: (seen.append(1),
                                                           b)[1]))
    assert len(out) == 3 and len(seen) == 3


def test_vqa_inference_and_eval():
    from medvill_tpu.data.tokenization import BertTokenizer, build_vocab
    from medvill_tpu.data.vqa import VQADataset, synthetic_vqa_entries
    from medvill_tpu.train import finetune as ft

    tok = BertTokenizer(build_vocab([f"word{i}" for i in range(30)]))
    cfg = FinetuneConfig(
        task="vqa", bert=BertConfig.vlp(BertConfig.test_tiny(vocab_size=64)),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=4,
                                 encoder="full-fiber"),
        len_vis_input=4, max_len_b=10, max_seq_length=24, max_pred=3,
        img_size=64, vqa_num_answers=16, batch_size=4)
    rng = np.random.default_rng(0)
    ds = VQADataset(cfg, tok, synthetic_vqa_entries(8, 16),
                    image_loader=lambda p: rng.standard_normal(
                        (64, 64, 3)).astype(np.float32))
    model = ft.build_model(cfg)
    B, L = 2, cfg.max_seq_length
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((B, 64, 64, 3)), jnp.zeros((B, L), jnp.int32),
        jnp.zeros((B, L), jnp.int32), jnp.zeros((B, 1, L, L)),
        deterministic=True)
    state = TrainState(step=jnp.zeros([], jnp.int32),
                       params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=None)
    eval_step = jax.jit(ft.make_vqa_eval_step(model, cfg))
    loader = BatchLoader(ds, 4, shuffle=False)
    out = ft.vqa_evaluate(eval_step, state, loader)
    assert 0.0 <= out["vqa_acc"] <= 1.0
    assert out["n_closed"] + out["n_open"] == 8
