"""Checkpoint roundtrip + torch-key remap + import shims."""
import numpy as np
import pytest

from medvill_tpu.core import checkpoint as C


def test_save_restore_roundtrip(tmp_path):
    import jax.numpy as jnp

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(3)}
    C.save(str(tmp_path), 0, state)
    C.save(str(tmp_path), 4, state, best=True)
    assert C.latest_epoch(str(tmp_path)) == 4
    restored = C.restore(str(tmp_path), 4, state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.arange(6.0).reshape(2, 3))
    assert (tmp_path / "best").exists()


def test_latest_epoch_empty(tmp_path):
    assert C.latest_epoch(str(tmp_path)) is None
    assert C.latest_epoch(str(tmp_path / "missing")) is None


def test_torch_remap_pretrain_to_finetune():
    sd = {"enc.encoder.layer.0.attention.self.query.weight": 1,
          "mlm.predictions.bias": 2, "itm.linear.weight": 3}
    out = C.torch_remap(sd, "pretrain_to_finetune")
    assert "encoder.layer.0.attention.self.query.weight" in out
    assert "cls.predictions.bias" in out
    assert "itm.linear.weight" in out  # untouched


def test_torch_remap_finetune_to_decoder():
    sd = {"encoder.layer.0.x": 1, "cls.predictions.bias": 2}
    out = C.torch_remap(sd, "finetune_to_decoder")
    assert "bert.encoder.layer.0.x" in out
    assert "cls.predictions.bias" in out  # cls.* not re-prefixed


def test_resize_position_embeddings():
    params = {"position_embeddings": {
        "embedding": np.arange(12.0).reshape(4, 3)}}
    bigger = C.resize_position_embeddings(params, 6)
    t = bigger["position_embeddings"]["embedding"]
    assert t.shape == (6, 3)
    np.testing.assert_array_equal(t[:4], np.arange(12.0).reshape(4, 3))
    np.testing.assert_array_equal(t[4], t[3])  # extended with last row
    smaller = C.resize_position_embeddings(params, 2)
    assert smaller["position_embeddings"]["embedding"].shape == (2, 3)


def test_import_hf_bert_shapes():
    H, V, I = 8, 20, 16
    rng = np.random.default_rng(0)

    def lin(o, i):
        return rng.standard_normal((o, i)).astype(np.float32)

    sd = {}
    sd["bert.embeddings.word_embeddings.weight"] = lin(V, H)
    sd["bert.embeddings.position_embeddings.weight"] = lin(10, H)
    sd["bert.embeddings.token_type_embeddings.weight"] = lin(2, H)
    sd["bert.embeddings.LayerNorm.weight"] = np.ones(H, np.float32)
    sd["bert.embeddings.LayerNorm.bias"] = np.zeros(H, np.float32)
    for i in range(2):
        p = f"bert.encoder.layer.{i}"
        for name, shape in [("attention.self.query", (H, H)),
                            ("attention.self.key", (H, H)),
                            ("attention.self.value", (H, H)),
                            ("attention.output.dense", (H, H)),
                            ("intermediate.dense", (I, H)),
                            ("output.dense", (H, I))]:
            sd[f"{p}.{name}.weight"] = lin(*shape)
            sd[f"{p}.{name}.bias"] = np.zeros(shape[0], np.float32)
        for ln in ["attention.output.LayerNorm", "output.LayerNorm"]:
            sd[f"{p}.{ln}.weight"] = np.ones(H, np.float32)
            sd[f"{p}.{ln}.bias"] = np.zeros(H, np.float32)
    sd["bert.pooler.dense.weight"] = lin(H, H)
    sd["bert.pooler.dense.bias"] = np.zeros(H, np.float32)

    out = C.import_hf_bert(sd, num_layers=2)
    assert out["embeddings"]["word_embeddings"]["embedding"].shape == (V, H)
    l0 = out["encoder"]["layer_0"]
    # torch Linear weight [out, in] -> flax kernel [in, out]
    assert l0["self"]["query"]["kernel"].shape == (H, H)
    assert l0["intermediate"]["kernel"].shape == (H, I)
    assert l0["output_dense"]["kernel"].shape == (I, H)
    np.testing.assert_array_equal(
        l0["self"]["query"]["kernel"],
        sd["bert.encoder.layer.0.attention.self.query.weight"].T)
    assert out["pooler"]["dense"]["kernel"].shape == (H, H)


def test_import_torchvision_resnet50_shapes():
    rng = np.random.default_rng(0)
    sd = {}

    def conv(o, i, k):
        return rng.standard_normal((o, i, k, k)).astype(np.float32)

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = np.ones(c, np.float32)
        sd[f"{prefix}.bias"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{prefix}.running_var"] = np.ones(c, np.float32)

    sd["conv1.weight"] = conv(64, 3, 7)
    bn("bn1", 64)
    stage_sizes = [3, 4, 6, 3]
    widths = [64, 128, 256, 512]
    in_c = 64
    for s, (n, w) in enumerate(zip(stage_sizes, widths)):
        for b in range(n):
            p = f"layer{s + 1}.{b}"
            sd[f"{p}.conv1.weight"] = conv(w, in_c if b == 0 else w * 4, 1)
            bn(f"{p}.bn1", w)
            sd[f"{p}.conv2.weight"] = conv(w, w, 3)
            bn(f"{p}.bn2", w)
            sd[f"{p}.conv3.weight"] = conv(w * 4, w, 1)
            bn(f"{p}.bn3", w * 4)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = conv(w * 4, in_c, 1)
                bn(f"{p}.downsample.1", w * 4)
        in_c = w * 4

    out = C.import_torchvision_resnet50(sd)
    assert out["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)  # HWIO
    assert out["params"]["layer1_0"]["downsample_conv"]["kernel"].shape == \
        (1, 1, 64, 256)
    assert out["batch_stats"]["layer4_2"]["bn3"]["var"].shape == (2048,)

    # loads into the actual model param tree
    import jax
    import jax.numpy as jnp
    from medvill_tpu.models.resnet import ResNet50Trunk

    model = ResNet50Trunk(dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    flat_model = jax.tree_util.tree_structure(variables["params"])
    flat_import = jax.tree_util.tree_structure(out["params"])
    assert flat_model == flat_import
    shapes_model = jax.tree_util.tree_map(lambda x: x.shape,
                                          variables["params"])
    shapes_import = jax.tree_util.tree_map(lambda x: x.shape, out["params"])
    assert shapes_model == shapes_import
