import io

import numpy as np

from ofasys_tpu.preprocessor.dictionary import Dictionary


def test_special_tokens():
    d = Dictionary()
    assert d.bos() == 0 and d.pad() == 1 and d.eos() == 2 and d.unk() == 3
    assert d[d.bos()] == "<s>"
    assert len(d) == 4 and d.nspecial == 4


def test_add_and_index():
    d = Dictionary()
    i = d.add_symbol("hello")
    assert d.index("hello") == i
    assert d.index("nonexistent") == d.unk()
    assert "hello" in d
    assert d[i] == "hello"
    # re-adding bumps count, same index
    assert d.add_symbol("hello") == i
    assert d.get_count(i) == 2


def test_namespace_ranges():
    d = Dictionary()
    start, end = d.add_namespace("<bin>", 1000)
    assert end - start == 1000
    assert d.index("<bin>_0") == start
    assert d.index("<bin>_999") == end - 1
    assert d.get_start_end_idx("<bin>") == (start, end)
    # idempotent
    assert d.add_namespace("<bin>", 1000) == (start, end)
    s2, e2 = d.add_namespace("<code>", 8192)
    assert s2 == end and e2 - s2 == 8192


def test_encode_decode_roundtrip():
    d = Dictionary()
    for w in "the quick brown fox".split():
        d.add_symbol(w)
    ids = d.encode_line("the quick fox")
    assert ids.dtype == np.int32
    assert ids[-1] == d.eos()
    assert d.string(ids) == "the quick fox"


def test_string_ignores_special():
    d = Dictionary()
    a = d.add_symbol("a")
    seq = [d.bos(), a, d.pad(), d.eos()]
    assert d.string(seq) == "a"
    assert d.string(seq, include_eos=True) == "a </s>"


def test_pad_to_multiple():
    d = Dictionary()
    d.add_symbol("x")
    d.pad_to_multiple_(128)
    assert len(d) % 128 == 0


def test_add_from_file_with_prefix():
    d = Dictionary()
    f = io.StringIO("AA 5\nAE 3\nAH 2\n")
    d.add_from_file(f, prefix="<phone>_")
    assert d.index("<phone>_AA") == d.nspecial
    start, end = d.get_start_end_idx("<phone>_")
    assert end - start == 3


def test_state_dict_roundtrip():
    d = Dictionary()
    d.add_symbol("w1")
    d.add_namespace("<bin>", 10)
    d2 = Dictionary.from_state_dict(d.state_dict())
    assert d2 == d
    assert d2.pad() == d.pad() and d2.eos() == d.eos()
    assert d2.get_start_end_idx("<bin>") == d.get_start_end_idx("<bin>")


def test_bpe_symbol_strip():
    d = Dictionary()
    for w in ["hel@@", "lo"]:
        d.add_symbol(w)
    ids = d.encode_line("hel@@ lo")
    assert d.string(ids, bpe_symbol="@@ ") == "hello"
