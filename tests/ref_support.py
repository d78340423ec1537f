"""Shared helpers for the reference-parity tests.

The parity tests import the reference's own code from /root/reference, which
requires prepending reference roots to ``sys.path``, purging ambiguous
top-level package caches (the reference tree has several independent
``models``/``data`` packages), and patching HF ``BertConfig.from_pretrained``
to return a tiny config.  All three are process-global state: done naked they
leak into every later test in the same pytest process (a later ``import
models`` silently resolving into the reference tree, or an unrelated
``from_pretrained`` call getting a 2-layer config).  These context managers
scope each mutation to the reference-model construction and restore it.
"""
import contextlib
import sys


def to_torch(sd):
    """numpy state_dict -> torch tensors via the SAME conversion the export
    save path uses (core.torch_export.to_torch_tensors), so the parity tests
    can never drift from what export actually writes."""
    from medvill_tpu.core.torch_export import to_torch_tensors

    return to_torch_tensors(sd)


def purge_modules(names):
    for name in list(sys.modules):
        if any(name == p or name.startswith(p + ".") for p in names):
            del sys.modules[name]


@contextlib.contextmanager
def reference_on_path(roots, purge=("models",)):
    """Temporarily prepend reference roots to sys.path.  The ambiguous
    package caches are purged on entry (so imports resolve into the requested
    subtree even if another parity test imported a different one) AND on exit
    (so nothing reference-resolved is left for later unrelated imports);
    sys.path is restored exactly."""
    saved = list(sys.path)
    purge_modules(purge)
    for r in reversed(list(roots)):
        if r in sys.path:
            sys.path.remove(r)
        sys.path.insert(0, r)
    try:
        yield
    finally:
        sys.path[:] = saved
        purge_modules(purge)


@contextlib.contextmanager
def tiny_bert_from_pretrained(cfg):
    """Patch HF ``BertConfig.from_pretrained`` to return ``cfg`` for the
    duration (the reference constructors call it with real model names, which
    would try to fetch bert-base); restores the original resolution."""
    import transformers.models.bert.modeling_bert as mbert

    had_own = "from_pretrained" in vars(mbert.BertConfig)
    orig = vars(mbert.BertConfig).get("from_pretrained")
    mbert.BertConfig.from_pretrained = classmethod(lambda c, *a, **k: cfg)
    try:
        yield
    finally:
        if had_own:
            setattr(mbert.BertConfig, "from_pretrained", orig)
        else:
            delattr(mbert.BertConfig, "from_pretrained")
