"""Native C++ BPE encoder (native/bpe_encode.cpp) is id-for-id identical to
the Python GPT2BPE on a real (test-trained) merge table, across scripts,
contractions, whitespace shapes, and random unicode fuzz — and faster.

The merge table is learned here with the textbook BPE procedure over the
byte->unicode alphabet, then written as encoder.json + vocab.bpe, exactly the
asset format both implementations load (reference downloads the same pair,
reference preprocessor/tokenizer/gpt2_bpe.py)."""

import collections
import json
import os
import random
import time

import pytest

from ofasys_tpu.preprocessor.tokenizer.gpt2_bpe import GPT2BPE, bytes_to_unicode

pytestmark = pytest.mark.skipif(
    not os.path.exists(
        os.path.join(os.path.dirname(__file__), "..", "native", "libbpe_encode.so")
    ),
    reason="native library not built (make -C native)",
)

CORPUS = (
    "the quick brown fox jumps over the lazy dog. "
    "The Quick Brown Fox! don't can't won't it's we're they've I'll he'd "
    "hello world hello there hello again 12345 3.14159 100,000 "
    "naïve café jalapeño übermäßig çağrı Ελληνικά русский 中文分词 日本語 한국어 "
    "🙂🚀 emoji test 🙂 tabs\tand\nnewlines   multiple   spaces "
) * 4


def train_bpe(corpus: str, n_merges: int = 200):
    """Classic BPE training on byte-unicode symbol sequences."""
    be = bytes_to_unicode()
    words = collections.Counter()
    for w in corpus.split(" "):
        if w:
            words[tuple(be[b] for b in w.encode("utf-8"))] += 1
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for word, c in words.items():
            for i in range(len(word) - 1):
                pairs[(word[i], word[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = pairs.most_common(1)[0]
        if cnt < 2:
            break
        merges.append((a, b))
        new_words = collections.Counter()
        for word, c in words.items():
            out, i = [], 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words
    vocab = [be[i] for i in range(256)] + [a + b for a, b in merges]
    # dedupe preserving order (a merge result can collide with a byte symbol)
    seen, toks = set(), []
    for t in vocab:
        if t not in seen:
            seen.add(t)
            toks.append(t)
    return {t: i for i, t in enumerate(toks)}, merges


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    enc, merges = train_bpe(CORPUS)
    d = tmp_path_factory.mktemp("bpe")
    enc_path, bpe_path = str(d / "encoder.json"), str(d / "vocab.bpe")
    with open(enc_path, "w", encoding="utf-8") as f:
        json.dump(enc, f, ensure_ascii=False)
    with open(bpe_path, "w", encoding="utf-8") as f:
        f.write("#version: test\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return enc_path, bpe_path


@pytest.fixture(scope="module")
def pair(assets):
    from ofasys_tpu.preprocessor.tokenizer.native_bpe import NativeGPT2BPE

    py = GPT2BPE(*assets)
    nat = NativeGPT2BPE(*assets)
    return py, nat


CASES = [
    "the quick brown fox",
    "The Quick Brown Fox!",
    "don't can't won't it's we're they've I'll he'd 'tis 'r",
    "  leading spaces",
    "trailing spaces   ",
    "multi   internal    spaces",
    "tabs\tand\nnewlines\r\nmixed \t whitespace",
    "numbers 123 45.67 1,000,000",
    "punct!!! ??? ... ---",
    "naïve café jalapeño übermäßig",
    "Ελληνικά and русский текст",
    "中文没有空格的句子也要正确切分",
    "日本語のテキスト 한국어 텍스트",
    "emoji 🙂🚀 mixed with text",
    "'s's's weird 'repeats",
    "",
    " ",
    "   ",
    "a",
    "ä",
    "x y z",  # unicode spaces
    "word​word",  # zero-width space (Cf: not \s -> 'other')
]


def test_native_matches_python_on_cases(pair):
    py, nat = pair
    for s in CASES:
        assert nat.encode(s) == py.encode(s), repr(s)


def test_native_matches_python_fuzz(pair):
    py, nat = pair
    rng = random.Random(0)
    pool = (
        "abcdefXYZ 0123456789 .,!?'\"-_()[] \t\n"
        "äöüßçéñ Ωλφ жзд 中文字 かなカナ 한글 🙂🚀𝔘"
    )
    for _ in range(300):
        s = "".join(rng.choice(pool) for _ in range(rng.randrange(0, 60)))
        assert nat.encode(s) == py.encode(s), repr(s)


def test_decode_roundtrip(pair):
    py, nat = pair
    for s in CASES:
        assert nat.decode(nat.encode(s)) == py.decode(py.encode(s))


def test_native_is_faster(pair):
    py, nat = pair
    lines = [CORPUS[i : i + 200] for i in range(0, len(CORPUS) - 200, 37)]
    # warm both caches on distinct text, then time on fresh text so the
    # comparison is cache-cold for words (the realistic regime is mixed)
    for tok in (py, nat):
        t0 = time.perf_counter()
        for _ in range(3):
            for ln in lines:
                tok.encode(ln)
        tok._elapsed = time.perf_counter() - t0
    speedup = py._elapsed / max(nat._elapsed, 1e-9)
    # conservative bound: even cache-warm python pays per-call regex+joins
    assert speedup > 2.0, f"native speedup only {speedup:.2f}x"


def test_long_line_buffer_regrow(pair):
    """A single line yielding >4096 ids exercises the -(needed) retry path."""
    py, nat = pair
    words = CORPUS.split()
    rng = random.Random(3)
    big = " ".join(rng.choice(words) for _ in range(3000))
    a, b = py.encode(big), nat.encode(big)
    assert len(a) > 4096
    assert a == b


def test_build_tokenizer_prefers_native(assets):
    from ofasys_tpu.preprocessor.tokenizer.gpt2_bpe import build_tokenizer
    from ofasys_tpu.preprocessor.tokenizer.native_bpe import NativeGPT2BPE

    tok = build_tokenizer("gpt2", encoder_json=assets[0], vocab_bpe=assets[1])
    assert isinstance(tok, NativeGPT2BPE)
    os.environ["OFASYS_NATIVE_BPE"] = "0"
    try:
        tok2 = build_tokenizer("gpt2", encoder_json=assets[0], vocab_bpe=assets[1])
        assert not isinstance(tok2, NativeGPT2BPE)
    finally:
        os.environ.pop("OFASYS_NATIVE_BPE")
