"""Full torch-checkpoint ingestion for the retrieval and decode CLIs.

Builds torch-layout state_dicts (the reference's exact key names) from one
randomly-initialized model tree, imports them into a DIFFERENTLY-seeded tree,
and checks every mapped leaf now equals the source — covering:

- ``init_cxrbert_from_torch``: the published-MedViLL pretrain layout the
  retrieval entry loads (reference: Downstream_task/Retrieval/
  retrieval.py:17-24, models/cxrbert_origin.py:132-149);
- ``init_vlp_from_torch``: the ``model.{epoch}.bin`` finetune layout the
  decode entry recovers with its bert.-prefix remap (reference:
  sc/generation_decode.py:377-410, model.py:898-945).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from medvill_tpu.core import torch_init
from medvill_tpu.core.config import (BertConfig, FinetuneConfig,
                                     ImageEncoderConfig, PretrainConfig)


def tiny_pretrain_cfg():
    return PretrainConfig(
        seq_len=7, bert=BertConfig.test_tiny(vocab_size=64),
        image=ImageEncoderConfig(img_size=64, num_image_embeds=4,
                                 encoder="full-fiber"),
        batch_size=2, use_flash_attention=False)


def np32(x):
    return np.asarray(x, np.float32)


def bert_sd(prefix, enc, emb_key="embeddings"):
    """Vendored-BERT torch keys from our param subtree (torch Linear weight
    is our kernel transposed)."""
    sd = {}
    emb = enc[emb_key]
    sd[f"{prefix}txt_embeddings.word_embeddings.weight"] = np32(
        emb["word_embeddings"]["embedding"])
    sd[f"{prefix}txt_embeddings.position_embeddings.weight"] = np32(
        emb["position_embeddings"]["embedding"])
    sd[f"{prefix}txt_embeddings.token_type_embeddings.weight"] = np32(
        emb["token_type_embeddings"]["embedding"])
    sd[f"{prefix}txt_embeddings.LayerNorm.weight"] = np32(
        emb["LayerNorm"]["scale"])
    sd[f"{prefix}txt_embeddings.LayerNorm.bias"] = np32(
        emb["LayerNorm"]["bias"])
    for name, layer in enc["encoder"].items():
        i = int(name.split("_")[1])
        lp = f"{prefix}encoder.layer.{i}"
        for axis, mod in (("query", "query"), ("key", "key"),
                          ("value", "value")):
            sd[f"{lp}.attention.self.{axis}.weight"] = np32(
                layer["self"][mod]["kernel"]).T
            sd[f"{lp}.attention.self.{axis}.bias"] = np32(
                layer["self"][mod]["bias"])
        sd[f"{lp}.attention.output.dense.weight"] = np32(
            layer["attention_output"]["dense"]["kernel"]).T
        sd[f"{lp}.attention.output.dense.bias"] = np32(
            layer["attention_output"]["dense"]["bias"])
        sd[f"{lp}.attention.output.LayerNorm.weight"] = np32(
            layer["attention_output"]["LayerNorm"]["scale"])
        sd[f"{lp}.attention.output.LayerNorm.bias"] = np32(
            layer["attention_output"]["LayerNorm"]["bias"])
        sd[f"{lp}.intermediate.dense.weight"] = np32(
            layer["intermediate"]["kernel"]).T
        sd[f"{lp}.intermediate.dense.bias"] = np32(
            layer["intermediate"]["bias"])
        sd[f"{lp}.output.dense.weight"] = np32(
            layer["output_dense"]["kernel"]).T
        sd[f"{lp}.output.dense.bias"] = np32(layer["output_dense"]["bias"])
        sd[f"{lp}.output.LayerNorm.weight"] = np32(
            layer["output_LayerNorm"]["scale"])
        sd[f"{lp}.output.LayerNorm.bias"] = np32(
            layer["output_LayerNorm"]["bias"])
    sd[f"{prefix}pooler.dense.weight"] = np32(
        enc["pooler"]["dense"]["kernel"]).T
    sd[f"{prefix}pooler.dense.bias"] = np32(enc["pooler"]["dense"]["bias"])
    return sd


def trunk_sd(prefix, trunk_params, trunk_stats):
    """torch nn.Sequential(resnet50 children [:-2]) keys: 0=conv1, 1=bn1,
    4..7=layer1..4 (reference: models/image.py:46-52)."""
    sd = {}

    def conv(dst_key, kern):
        sd[dst_key] = np32(kern).transpose(3, 2, 0, 1)  # HWIO -> OIHW

    def bn(dst, p, s):
        sd[dst + ".weight"] = np32(p["scale"])
        sd[dst + ".bias"] = np32(p["bias"])
        sd[dst + ".running_mean"] = np32(s["mean"])
        sd[dst + ".running_var"] = np32(s["var"])

    conv(f"{prefix}model.0.weight", trunk_params["conv1"]["kernel"])
    bn(f"{prefix}model.1", trunk_params["bn1"], trunk_stats["bn1"])
    stage_sizes = [3, 4, 6, 3]
    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            src = f"layer{stage + 1}_{block}"
            dst = f"{prefix}model.{stage + 4}.{block}"
            for ci in (1, 2, 3):
                conv(f"{dst}.conv{ci}.weight",
                     trunk_params[src][f"conv{ci}"]["kernel"])
                bn(f"{dst}.bn{ci}", trunk_params[src][f"bn{ci}"],
                   trunk_stats[src][f"bn{ci}"])
            if "downsample_conv" in trunk_params[src]:
                conv(f"{dst}.downsample.0.weight",
                     trunk_params[src]["downsample_conv"]["kernel"])
                bn(f"{dst}.downsample.1",
                   trunk_params[src]["downsample_bn"],
                   trunk_stats[src]["downsample_bn"])
    return sd


def assert_trees_equal(a, b, atol=0.0):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    for path, leaf in la:
        np.testing.assert_allclose(
            np.asarray(leaf, np.float32), np.asarray(lb[path], np.float32),
            atol=atol, err_msg=jax.tree_util.keystr(path))


def cxrbert_pretrain_sd(src):
    """The published-MedViLL pretrain torch layout from a pretrain
    TrainState (cxrbert_origin.py:132-149 key names)."""
    sd = bert_sd("enc.", src.params["enc"])
    # CXRBERT uses enc.txt_embeddings / enc.encoder naming
    # (cxrbert_origin.py:57,72); bert_sd already emits those
    sd.update(trunk_sd("enc.img_encoder.",
                       src.params["enc"]["img_encoder"],
                       src.batch_stats["enc"]["img_encoder"]))
    sd["enc.img_embeddings.img_embeddings.weight"] = np32(
        src.params["enc"]["img_projection"]["kernel"]).T
    sd["enc.img_embeddings.img_embeddings.bias"] = np32(
        src.params["enc"]["img_projection"]["bias"])
    sd["mlm.predictions.transform.dense.weight"] = np32(
        src.params["mlm"]["transform_dense"]["kernel"]).T
    sd["mlm.predictions.transform.dense.bias"] = np32(
        src.params["mlm"]["transform_dense"]["bias"])
    sd["mlm.predictions.transform.LayerNorm.weight"] = np32(
        src.params["mlm"]["transform_LayerNorm"]["scale"])
    sd["mlm.predictions.transform.LayerNorm.bias"] = np32(
        src.params["mlm"]["transform_LayerNorm"]["bias"])
    sd["mlm.predictions.bias"] = np32(src.params["mlm"]["decoder_bias"])
    sd["itm.linear.weight"] = np32(src.params["itm"]["linear"]["kernel"]).T
    sd["itm.linear.bias"] = np32(src.params["itm"]["linear"]["bias"])
    return sd


def test_cxrbert_pretrain_checkpoint_roundtrip():
    from medvill_tpu.train.pretrain import init_state

    cfg = tiny_pretrain_cfg()
    _, src = init_state(cfg, jax.random.PRNGKey(0))
    _, dst = init_state(cfg, jax.random.PRNGKey(1))

    sd = cxrbert_pretrain_sd(src)
    new_params, new_bs = torch_init.init_cxrbert_from_torch(
        dst.params, dst.batch_stats, sd)
    assert_trees_equal(src.params, new_params)
    assert_trees_equal(src.batch_stats["enc"]["img_encoder"],
                       new_bs["enc"]["img_encoder"])


def test_vlp_finetune_checkpoint_roundtrip():
    from medvill_tpu.train import finetune as ft

    bert = dataclasses.replace(
        BertConfig.vlp(BertConfig.test_tiny(vocab_size=64)),
        relax_projection=4)
    cfg = FinetuneConfig(
        bert=bert, len_vis_input=4, img_size=64, max_seq_length=32,
        max_pred=3,
        image=ImageEncoderConfig(img_size=64, num_image_embeds=4,
                                 encoder="full-fiber"),
        use_flash_attention=False)
    model = ft.build_model(cfg)
    L = cfg.max_seq_length

    def make_vars(seed):
        return model.init(
            {"params": jax.random.PRNGKey(seed)},
            jnp.zeros((2, 64, 64, 3)), jnp.zeros((2, L), jnp.int32),
            jnp.zeros((2, L), jnp.int32), jnp.zeros((2, 1, L, L)),
            masked_pos=jnp.zeros((2, cfg.max_pred), jnp.int32),
            deterministic=True)

    src = make_vars(0)
    dst = make_vars(1)

    sd = bert_sd("", src["params"]["bert"])
    sd.update(trunk_sd("img_encoder.",
                       src["params"]["bert"]["img_encoder"],
                       src["batch_stats"]["bert"]["img_encoder"]))
    sd["img_embeddings.img_embeddings.weight"] = np32(
        src["params"]["bert"]["img_projection"]["kernel"]).T
    sd["img_embeddings.img_embeddings.bias"] = np32(
        src["params"]["bert"]["img_projection"]["bias"])
    # relax_projection=4: the transform is 4x widened — the checkpoint
    # carries the widened shapes directly (finetune.py:307-319)
    sd["cls.predictions.transform.dense.weight"] = np32(
        src["params"]["cls"]["transform_dense"]["kernel"]).T
    sd["cls.predictions.transform.dense.bias"] = np32(
        src["params"]["cls"]["transform_dense"]["bias"])
    sd["cls.predictions.transform.LayerNorm.weight"] = np32(
        src["params"]["cls"]["transform_LayerNorm"]["scale"])
    sd["cls.predictions.transform.LayerNorm.bias"] = np32(
        src["params"]["cls"]["transform_LayerNorm"]["bias"])
    sd["cls.predictions.bias"] = np32(src["params"]["cls"]["decoder_bias"])

    # the decode entry's remap ADDS bert. prefixes (generation_decode.py:
    # 384-388); init_vlp_from_torch must accept both layouts
    for variant in (sd, {("bert." + k if k.split(".")[0] in
                          ("txt_embeddings", "img_embeddings", "img_encoder",
                           "encoder", "pooler") else k): v
                         for k, v in sd.items()}):
        new_params, new_bs = torch_init.init_vlp_from_torch(
            jax.tree_util.tree_map(np32, dst["params"]),
            jax.tree_util.tree_map(np32, dst["batch_stats"]), variant)
        assert_trees_equal(src["params"]["bert"], new_params["bert"])
        assert_trees_equal(src["params"]["cls"], new_params["cls"])


def test_torch_checkpoint_detection(tmp_path):
    f = tmp_path / "model.3.bin"
    f.write_bytes(b"x")
    assert torch_init.is_torch_checkpoint(str(f))
    d = tmp_path / "hfdir"
    d.mkdir()
    assert not torch_init.is_torch_checkpoint(str(d))
    (d / "pytorch_model.bin").write_bytes(b"x")
    assert torch_init.is_torch_checkpoint(str(d))


def test_cnn_bert_checkpoint_roundtrip():
    """CNN_BERT late-fusion torch layout (main_cnn_bert.py:124-195;
    loaded by full_dset_retrieval.py:549-555)."""
    import jax.numpy as jnp

    from medvill_tpu.models.cnn_bert import CNNBert

    bert = BertConfig.test_tiny(vocab_size=64)
    model = CNNBert(bert, n_classes=2)

    def make_vars(seed):
        return model.init(
            {"params": jax.random.PRNGKey(seed)},
            jnp.zeros((2, 9), jnp.int32), jnp.ones((2,), jnp.int32),
            jnp.zeros((2, 9), jnp.int32), jnp.zeros((2, 64, 64, 3)))

    src = make_vars(0)
    dst = make_vars(1)
    # bert_sd emits txt_embeddings./encoder./pooler. names; prefix for the
    # CNN_BERT namespace
    sd = {("txt_enc." + k): v
          for k, v in bert_sd("", src["params"]["txt_encoder"]).items()}
    sd.update(trunk_sd("img_enc.",
                       src["params"]["img_encoder"]["trunk"],
                       src["batch_stats"]["img_encoder"]["trunk"]))
    sd["linear.weight"] = np32(src["params"]["fc"]["kernel"]).T
    sd["linear.bias"] = np32(src["params"]["fc"]["bias"])

    new_params, new_bs = torch_init.init_cnn_bert_from_torch(
        jax.tree_util.tree_map(np32, dst["params"]),
        jax.tree_util.tree_map(np32, dst["batch_stats"]), sd)
    assert_trees_equal(src["params"], new_params)
    assert_trees_equal(src["batch_stats"], new_bs)


def test_finetune_recovers_torch_pretrain_checkpoint():
    """--model_recover_path pointing at the published torch *pretrain*
    .pth: the finetune entry remaps enc.->bert., mlm.->cls. and drops itm.
    (reference: sc/finetune.py:330-357 load_state_dict(strict=False)),
    tiling the cls transform leaves under relax_projection
    (model.py:689-707)."""
    from medvill_tpu.cli.finetune_main import _torch_pretrain_to_vlp_sd
    from medvill_tpu.train import finetune as ft
    from medvill_tpu.train.pretrain import init_state

    cfg_pre = tiny_pretrain_cfg()
    _, src = init_state(cfg_pre, jax.random.PRNGKey(0))
    sd_pre = cxrbert_pretrain_sd(src)

    for relax in (1, 4):
        bert = BertConfig.vlp(BertConfig.test_tiny(vocab_size=64))
        if relax > 1:
            bert = dataclasses.replace(bert, relax_projection=relax)
        cfg = FinetuneConfig(
            bert=bert, len_vis_input=4, img_size=64, max_seq_length=32,
            max_pred=3,
            image=ImageEncoderConfig(img_size=64, num_image_embeds=4,
                                     encoder="full-fiber"),
            use_flash_attention=False)
        model = ft.build_model(cfg)
        L = cfg.max_seq_length
        dst = model.init(
            {"params": jax.random.PRNGKey(1)},
            jnp.zeros((2, 64, 64, 3)), jnp.zeros((2, L), jnp.int32),
            jnp.zeros((2, L), jnp.int32), jnp.zeros((2, 1, L, L)),
            masked_pos=jnp.zeros((2, cfg.max_pred), jnp.int32),
            deterministic=True)

        sd = _torch_pretrain_to_vlp_sd(sd_pre, relax)
        assert not any(k.startswith(("enc.", "mlm.", "itm.")) for k in sd)
        new_params, new_bs = torch_init.init_vlp_from_torch(
            jax.tree_util.tree_map(np32, dst["params"]),
            jax.tree_util.tree_map(np32, dst["batch_stats"]), sd)

        # encoder/embeddings/trunk transfer under the bert. remap
        assert_trees_equal(src.params["enc"]["encoder"],
                           new_params["bert"]["encoder"])
        assert_trees_equal(src.params["enc"]["img_projection"],
                           new_params["bert"]["img_projection"])
        assert_trees_equal(src.batch_stats["enc"]["img_encoder"],
                           new_bs["bert"]["img_encoder"])
        # cls head: pretrain mlm transform tiled relax x along the widened
        # kernel axis (torch stack-along-out == flax tile-along-last)
        got = np.asarray(new_params["cls"]["transform_dense"]["kernel"])
        want = np.tile(np32(src.params["mlm"]["transform_dense"]["kernel"]),
                       (1, relax))
        np.testing.assert_allclose(got, want)
        got_ln = np.asarray(new_params["cls"]["transform_LayerNorm"]["scale"])
        np.testing.assert_allclose(
            got_ln,
            np.tile(np32(src.params["mlm"]["transform_LayerNorm"]["scale"]),
                    relax))
        np.testing.assert_allclose(
            np.asarray(new_params["cls"]["decoder_bias"]),
            np32(src.params["mlm"]["decoder_bias"]))
