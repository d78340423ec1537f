"""Durable machine-keyed compile cache (utils/jax_cache) and the decode
backend auto-selection built on it (models/decoder.resolve_scan_layers) —
VERDICT r4 items 1-3."""
import os

from medvill_tpu.core.config import BertConfig
from medvill_tpu.models.decoder import (note_unrolled_decode_ran,
                                        resolve_scan_layers,
                                        unrolled_warm_key)
from medvill_tpu.utils import jax_cache


def test_machine_key_stable_and_versioned():
    k1, k2 = jax_cache.machine_key(), jax_cache.machine_key()
    assert k1 == k2 and len(k1) == 16
    import jax

    # the key must change with the jax version (cache format/compiler):
    # same-machine different-runtime artifacts must not share a directory
    import hashlib
    import platform

    assert jax.__version__ in "|".join(
        (jax.__version__, platform.machine()))  # sanity of inputs
    blob_other = "|".join(("0.0.0-other", platform.machine(), ""))
    assert k1 != hashlib.sha256(blob_other.encode()).hexdigest()[:16]


def test_cache_dir_override_and_markers(tmp_path, monkeypatch):
    monkeypatch.setenv("MEDVILL_JAX_CACHE_DIR", str(tmp_path / "cache"))
    d = jax_cache.cache_dir()
    assert d == str(tmp_path / "cache") and os.path.isdir(d)
    key = ("decode_unrolled", "cpu", "b8")
    assert not jax_cache.is_warm(key)
    jax_cache.mark_warm(key)
    assert jax_cache.is_warm(key)
    # marker lives INSIDE the cache dir: wiping the cache wipes the marker
    assert os.path.dirname(jax_cache.warm_marker_path(key)) == d


def test_resolve_scan_layers_auto(tmp_path, monkeypatch):
    monkeypatch.setenv("MEDVILL_JAX_CACHE_DIR", str(tmp_path / "c2"))
    key = unrolled_warm_key(BertConfig.vlp(), 8, 4, 128, 256)
    # distinct configs -> distinct keys (a warm greedy program must not
    # vouch for a cold beam program)
    assert key != unrolled_warm_key(BertConfig.vlp(), 8, 1, 128, 256)
    # cold: auto falls back to the scan-layers backend
    assert resolve_scan_layers("auto", key) is True
    # explicit requests always win
    assert resolve_scan_layers(False, key) is False
    assert resolve_scan_layers(True, key) is True
    # after a recorded successful unrolled run, auto picks unrolled
    note_unrolled_decode_ran(key)
    assert resolve_scan_layers("auto", key) is False


def test_str2bool_or_auto():
    from medvill_tpu.cli import str2bool_or_auto

    assert str2bool_or_auto("auto") == "auto"
    assert str2bool_or_auto("AUTO") == "auto"
    assert str2bool_or_auto("true") is True
    assert str2bool_or_auto("false") is False
