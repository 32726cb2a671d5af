"""GPT-2-style byte-level BPE tokenizer with a native (C++) merge loop.

The reference framework has no tokenizer (models consume integer ids,
/root/reference/train.py); a serving stack needs text in/out on the host.
This is the exact GPT-2 byte-level BPE scheme — the de-facto format of
GPT-2/NeoX/LLaMA-BPE-family checkpoints: HF ``vocab.json`` + ``merges.txt``
load directly and encodings are asserted token-identical to
``transformers.GPT2Tokenizer`` in tests.

Division of labour (mirrors training/native_data.py): Python owns the
correctness-critical cold path — GPT-2's regex pre-tokenization and the
byte<->unicode vocabulary mapping — while the hot per-pre-token merge loop
runs in np_modeling_tpu/native/bpe.cc (compiled on first use with g++,
loaded via ctypes, GIL released during batch encodes). A pure-Python
fallback implements the identical greedy lowest-rank merge, so behaviour
is bit-identical with or without a compiler (tested).
"""

from __future__ import annotations

import ctypes
import functools
import json
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "bpe.cc")
_LIB = None
_LIB_ERR = None

# GPT-2's pre-tokenizer regex (contractions, letter runs, number runs,
# punctuation runs, trailing-aware whitespace). Requires the `regex`
# module for \p classes — a hard dependency of transformers, so always
# present wherever HF checkpoints are.
_PRETOKEN_PATTERN = (r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+"
                     r"| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+")


def _build_library() -> str:
    cache = os.path.join(tempfile.gettempdir(),
                         f"npm_tpu_native_{os.getuid()}")
    os.makedirs(cache, exist_ok=True)
    src_mtime = int(os.path.getmtime(_SRC))
    so_path = os.path.join(cache, f"bpe_{src_mtime}.so")
    if not os.path.exists(so_path):
        tmp = so_path + f".tmp{os.getpid()}"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", tmp],
            check=True, capture_output=True)
        os.replace(tmp, so_path)
    return so_path


def _load_library():
    global _LIB, _LIB_ERR
    if _LIB is not None or _LIB_ERR is not None:
        return _LIB
    try:
        lib = ctypes.CDLL(_build_library())
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [i32p, i32p, i32p, i32p, ctypes.c_int64]
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.bpe_encode.restype = ctypes.c_int64
        lib.bpe_encode.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_uint8), i64p,
                                   ctypes.c_int64, i32p, i64p]
        _LIB = lib
    except Exception as e:                     # no g++ / sandboxed build
        _LIB_ERR = e
        _LIB = None
    return _LIB


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode-char map (vocab.json
    stores token strings in this space so raw bytes survive JSON)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class BPETokenizer:
    """Byte-level BPE encoder/decoder (GPT-2 scheme).

    ``vocab``: token string (byte-unicode space) -> id. ``merges``: ranked
    ``(left, right)`` token-string pairs. ``native=None`` uses the C++
    merge loop when it builds, else the Python fallback; True/False force
    one side (True raises if unavailable).
    """

    def __init__(self, vocab: dict[str, int], merges: list[tuple[str, str]],
                 *, native: bool | None = None):
        self.vocab = dict(vocab)
        self.inv_vocab = {i: t for t, i in self.vocab.items()}
        self.merges = list(merges)
        self.ranks = {pair: r for r, pair in enumerate(self.merges)}
        b2u = bytes_to_unicode()
        self._byte_to_char = b2u
        self._char_to_byte = {c: b for b, c in b2u.items()}
        self._byte_ids = np.asarray(
            [self.vocab[b2u[b]] for b in range(256)], np.int32)
        self._pretoken = None          # compiled lazily (needs `regex`)
        # Per-pre-token memo, capped: serving traffic has an unbounded
        # stream of distinct words (hashes, numbers); clear-on-full bounds
        # resident memory (the HF fast-tokenizer strategy).
        self._cache: dict[bytes, list[int]] = {}
        self._cache_cap = 65536

        lib = _load_library() if native in (None, True) else None
        if native is True and lib is None:
            raise RuntimeError(f"native BPE unavailable: {_LIB_ERR}")
        self._lib = lib
        self._handle = None
        if lib is not None:
            left = np.asarray([self.vocab[a] for a, _ in self.merges],
                              np.int32)
            right = np.asarray([self.vocab[b] for _, b in self.merges],
                               np.int32)
            result = np.asarray([self.vocab[a + b] for a, b in self.merges],
                                np.int32)
            i32p = ctypes.POINTER(ctypes.c_int32)
            # Per-instance native handle (bpe_create copies the tables):
            # multiple tokenizers coexist without affecting each other.
            self._handle = lib.bpe_create(
                self._byte_ids.ctypes.data_as(i32p),
                left.ctypes.data_as(i32p), right.ctypes.data_as(i32p),
                result.ctypes.data_as(i32p), len(self.merges))
            assert self._handle

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle and self._lib is not None:
            self._lib.bpe_destroy(handle)
            self._handle = None

    # ---- constructors --------------------------------------------------

    @classmethod
    def from_files(cls, vocab_json: str, merges_txt: str, **kw):
        """Load HF-format ``vocab.json`` + ``merges.txt``."""
        with open(vocab_json) as f:
            vocab = json.load(f)
        merges = []
        with open(merges_txt) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split(" ")
                merges.append((a, b))
        return cls(vocab, merges, **kw)

    @classmethod
    def from_hf(cls, hf_tokenizer, **kw):
        """From a ``transformers.GPT2Tokenizer``-style slow tokenizer."""
        merges = [tuple(p) for p in
                  sorted(hf_tokenizer.bpe_ranks,
                         key=hf_tokenizer.bpe_ranks.get)]
        return cls(hf_tokenizer.get_vocab(), merges, **kw)

    # ---- encode / decode ----------------------------------------------

    def _pretokenize(self, text: str) -> list[bytes]:
        if self._pretoken is None:
            import regex
            self._pretoken = regex.compile(_PRETOKEN_PATTERN)
        return [m.encode("utf-8") for m in self._pretoken.findall(text)]

    def _merge_python(self, bs: bytes) -> list[int]:
        """Reference greedy lowest-rank merge (the exact semantics of
        bpe.cc's loop — fallback parity is asserted in tests)."""
        b2u = self._byte_to_char
        word = [b2u[b] for b in bs]
        while len(word) >= 2:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 60))
            if best not in self.ranks:
                break
            a, b = best
            out, i = [], 0
            while i < len(word):
                if (i + 1 < len(word) and word[i] == a
                        and word[i + 1] == b):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = out
        return [self.vocab[t] for t in word]

    def encode(self, text: str) -> list[int]:
        """Text -> token ids (token-identical to HF GPT2Tokenizer)."""
        pres = self._pretokenize(text)
        out: list[int] = []
        if len(self._cache) > self._cache_cap:
            self._cache.clear()
        misses = [p for p in dict.fromkeys(pres) if p not in self._cache]
        if misses:
            if self._lib is not None:
                for p, ids in zip(misses, self._encode_native(misses)):
                    self._cache[p] = ids
            else:
                for p in misses:
                    self._cache[p] = self._merge_python(p)
        for p in pres:
            out.extend(self._cache[p])
        return out

    def _encode_native(self, pretokens: list[bytes]) -> list[list[int]]:
        buf = b"".join(pretokens)
        offsets = np.zeros(len(pretokens) + 1, np.int64)
        np.cumsum([len(p) for p in pretokens], out=offsets[1:])
        data = np.frombuffer(buf, np.uint8) if buf else np.zeros(1, np.uint8)
        out = np.empty(max(len(buf), 1), np.int32)
        out_offsets = np.empty(len(pretokens) + 1, np.int64)
        n = self._lib.bpe_encode(
            self._handle,
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(pretokens),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        assert n >= 0, "native BPE handle missing"
        return [out[out_offsets[i]:out_offsets[i + 1]].tolist()
                for i in range(len(pretokens))]

    def decode(self, ids) -> str:
        return self.decode_bytes(ids).decode("utf-8", errors="replace")

    def decode_bytes(self, ids) -> bytes:
        """Token ids -> raw bytes (no UTF-8 decoding). Streaming detokenizers
        need the byte stream: byte-level BPE freely splits one multi-byte
        character across tokens, so per-token ``decode`` would emit U+FFFD
        for every such boundary (serving.text buffers bytes instead)."""
        chars = "".join(self.inv_vocab[int(i)] for i in ids)
        return bytes(self._char_to_byte[c] for c in chars)
