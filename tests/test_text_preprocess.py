import numpy as np
import pytest

from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.preprocessor.general import GeneralPreprocess
from ofasys_tpu.preprocessor.instruction import Instruction
from ofasys_tpu.preprocessor.tokenizer.gpt2_bpe import ByteTokenizer, bytes_to_unicode
from ofasys_tpu.configure import ConfigStore


@pytest.fixture
def gp():
    d = Dictionary()
    g = GeneralPreprocess(d, active=["text"])
    return g, d


def test_byte_tokenizer_roundtrip():
    t = ByteTokenizer()
    s = "Hello, wörld!"
    assert t.decode(t.encode(s)) == s


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256


def test_text_encode_decode(gp):
    g, d = gp
    pre = g.name2pre["text"]
    toks = pre.encode("hello world")
    assert toks.dtype == np.int32
    assert (toks >= pre.text_start).all() and (toks < pre.text_end).all()
    assert pre.decode(toks) == "hello world"


def test_full_sample_pipeline(gp):
    g, d = gp
    ist = Instruction("[TEXT:src] summarize: -> [TEXT:tgt]", split="train").format(
        src="the quick brown fox", tgt="quick fox"
    )
    processed = g(ist)
    # src group merged into one slot, tgt one slot
    assert len(processed.slots) == 2
    src, tgt = processed.slots
    assert src.is_src and not tgt.is_src
    # wrapped with bos/eos
    assert src.value["inputs"][0] == d.bos() and src.value["inputs"][-1] == d.eos()
    assert tgt.value["target"][0] == d.bos() and tgt.value["target"][-1] == d.eos()


def test_collate_shapes_and_shift(gp):
    g, d = gp
    samples = []
    for text in ["short one", "a somewhat longer example text", "mid size here"]:
        ist = Instruction("[TEXT:src] -> [TEXT:tgt]").format(src=text, tgt=text)
        samples.append(g(ist))
    batch = g.collate(samples)
    slots = batch["net_input"]["slots"]
    assert len(slots) == 2
    src, tgt = slots
    B, Ts = src.value["inputs"].shape
    assert B == 3 and Ts % 8 == 0  # pad_to_multiple
    prev = tgt.value["inputs"]
    target = batch["target"]
    assert prev.shape == target.shape
    # teacher forcing: prev starts with bos, target ends with eos before pad
    assert (prev[:, 0] == d.bos()).all()
    for row in target:
        nonpad = row[row != d.pad()]
        assert nonpad[-1] == d.eos()
    # prev[1:] == target[:-1] on the overlap (shifted by one)
    for p_row, t_row in zip(prev, target):
        n = (t_row != d.pad()).sum()
        np.testing.assert_array_equal(p_row[1:n], t_row[:n - 1])
    assert batch["ntokens"] == sum((batch["target"] != d.pad()).sum(0))


def test_mask_ratio_applied(gp):
    g, d = gp
    pre = g.name2pre["text"]
    long_text = " ".join(["word"] * 50)
    ist = Instruction("[TEXT:s,mask_ratio=0.5] -> [TEXT:s]", split="train").format(s=long_text)
    processed = g(ist)
    src = processed.slots[0]
    assert (src.value["inputs"] == pre.mask_idx).any()
    # masking shortens the input (replace_length=1 span collapse)
    assert len(src.value["inputs"]) < len(src.value["raw_tokens"]) + 2


def test_no_mask_at_eval(gp):
    g, d = gp
    pre = g.name2pre["text"]
    ist = Instruction("[TEXT:s,mask_ratio=0.5] -> [TEXT:s]", split="test").format(s="hello world")
    processed = g(ist)
    assert not (processed.slots[0].value["inputs"] == pre.mask_idx).any()


def test_closed_set_constraint_masks(gp):
    g, d = gp
    pre = g.name2pre["text"]
    pre.build_constraint_trie(["yes", "no", "maybe"])
    ist = Instruction("[TEXT:q] -> [TEXT:a,closed_set]").format(q="is it red?", a="yes")
    processed = g(ist)
    batch = g.collate([processed])
    cm = batch["constraint_masks"]
    assert cm is not None and cm.dtype == bool
    # first target step must allow exactly the first tokens of the candidates
    first_allowed = set(np.nonzero(cm[0, 0])[0].tolist())
    starts = {int(pre.encode(a)[0]) for a in ["yes", "no", "maybe"]}
    assert first_allowed == starts


def test_truncation(gp):
    g, d = gp
    pre = g.name2pre["text"]
    pre.cfg.max_src_length = 16
    ist = Instruction("[TEXT:s] -> [TEXT:t]").format(s=" ".join(["tok"] * 100), t="ok")
    processed = g(ist)
    assert len(processed.slots[0].value["inputs"]) <= 17
