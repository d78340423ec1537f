"""ctypes binding for the native wordpiece tokenizer (native/wordpiece.cc).

`NativeBertTokenizer` is a drop-in accelerated backend for
`medvill_tpu.data.tokenization.BertTokenizer`: the C++ fast path handles
pure-ASCII text (radiology reports are ASCII); anything containing
non-ASCII bytes or literal special-token brackets falls back to the exact
Python implementation, so outputs are always identical
(tests/test_native_tokenizer.py asserts equality on both paths).

The shared library is built on demand with ``make -C native`` (g++ only;
no pybind11 in this image, hence the plain C ABI + ctypes).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

from medvill_tpu.data.tokenization import BertTokenizer

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwordpiece.so")


_SRC_PATH = os.path.join(_NATIVE_DIR, "wordpiece.cc")
_STAMP_PATH = _LIB_PATH + ".src.sha256"


def _src_digest() -> Optional[str]:
    import hashlib

    try:
        with open(_SRC_PATH, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()
    except OSError:
        return None


def build_library(force: bool = False) -> Optional[str]:
    """Build native/libwordpiece.so if missing OR if wordpiece.cc drifted
    since the last build (the .so is NOT checked into git; a stale binary
    silently winning over edited source was the failure mode).  Returns
    None if the toolchain or sources are unavailable."""
    digest = _src_digest()
    if digest is None:
        return _LIB_PATH if os.path.exists(_LIB_PATH) else None
    if not force and os.path.exists(_LIB_PATH):
        try:
            with open(_STAMP_PATH) as f:
                if f.read().strip() == digest:
                    return _LIB_PATH
        except OSError:
            pass  # no stamp (e.g. built by hand) -> rebuild to be safe
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s", "-B"], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        with open(_STAMP_PATH, "w") as f:
            f.write(digest + "\n")
    except OSError:
        pass
    return _LIB_PATH


def _load(lib_path: str):
    lib = ctypes.CDLL(lib_path)
    lib.wp_new.restype = ctypes.c_void_p
    lib.wp_new.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.wp_tokenize.restype = ctypes.c_int
    lib.wp_tokenize.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.wp_vocab_size.restype = ctypes.c_int
    lib.wp_vocab_size.argtypes = [ctypes.c_void_p]
    lib.wp_free.argtypes = [ctypes.c_void_p]
    return lib


class NativeBertTokenizer(BertTokenizer):
    """BertTokenizer with a native tokenize-to-ids fast path."""

    MAX_IDS = 4096

    def __init__(self, vocab_file: str, do_lower_case: bool = True,
                 remap_unused: bool = True, lib_path: Optional[str] = None):
        from medvill_tpu.data.tokenization import load_vocab

        super().__init__(load_vocab(vocab_file, remap_unused=remap_unused),
                         do_lower_case=do_lower_case)
        self._handle = None
        self._lib = None
        lib_path = lib_path or build_library()
        if lib_path:
            try:
                self._lib = _load(lib_path)
                self._handle = self._lib.wp_new(
                    vocab_file.encode(), int(do_lower_case),
                    int(remap_unused))
                if self._handle:
                    assert self._lib.wp_vocab_size(self._handle) == \
                        len(self.vocab)
                    self._buf = (ctypes.c_int * self.MAX_IDS)()
            except (OSError, AssertionError):
                self._handle = None

    @property
    def native_available(self) -> bool:
        return self._handle is not None

    def tokenize_to_ids(self, text: str) -> List[int]:
        """tokenize + convert_tokens_to_ids in one call (ids of wordpieces;
        unknown words -> [UNK] id)."""
        if self._handle is not None and "[" not in text:
            try:
                encoded = text.encode("ascii")
            except UnicodeEncodeError:
                encoded = None
            if encoded is not None:
                n = self._lib.wp_tokenize(self._handle, encoded, self._buf,
                                          self.MAX_IDS)
                if n >= 0:
                    return list(self._buf[:n])
        # exact Python fallback
        toks = self.tokenize(text)
        unk = self.vocab["[UNK]"]
        return [self.vocab.get(t, unk) for t in toks]

    def __del__(self):
        try:
            if self._handle is not None and self._lib is not None:
                self._lib.wp_free(self._handle)
        except Exception:
            pass
