import os

import numpy as np
import pytest

from ofasys_tpu.io.reader import (
    CachedReader,
    ConcatReader,
    EpochBatchIterator,
    FileLineReader,
    ListReader,
    MixedReader,
    TsvReader,
    parse_dataset_paths,
)
from ofasys_tpu.configure import ConfigStore
import ofasys_tpu.metric  # register metric zoo


def _write_tsv(tmp_path, name, rows):
    p = tmp_path / name
    p.write_text("\n".join("\t".join(r) for r in rows) + "\n")
    return str(p)


def test_file_line_reader_native_and_fallback(tmp_path):
    rows = [[f"line{i}", str(i)] for i in range(100)]
    p = _write_tsv(tmp_path, "a.tsv", rows)
    for use_native in (True, False):
        r = FileLineReader(p, use_native=use_native)
        r.open()
        assert len(r) == 100
        assert r.read(0) == "line0\t0"
        assert r.read(99) == "line99\t99"
        r.close()
        # clear cache between variants
        import glob
        for f in glob.glob(os.path.expanduser("~/.cache/ofasys_tpu/a.tsv.*")):
            os.remove(f)


def test_tsv_reader_columns(tmp_path):
    p = _write_tsv(tmp_path, "b.tsv", [["x", "y", "z"], ["1", "2", "3"]])
    r = TsvReader(p, selected_cols="0:src,2:tgt")
    r.open()
    assert r.read(1) == {"src": "1", "tgt": "3"}


def test_cached_reader_shuffles_per_epoch(tmp_path):
    r = CachedReader(ListReader([{"i": i} for i in range(50)]), shuffle=True, seed=3)
    r.open()
    e0 = [r.read(i)["i"] for i in range(50)]
    r.reset(1)
    e1 = [r.read(i)["i"] for i in range(50)]
    assert sorted(e0) == sorted(e1) == list(range(50))
    assert e0 != e1


def test_concat_and_mixed():
    a = ListReader([{"v": f"a{i}"} for i in range(10)])
    b = ListReader([{"v": f"b{i}"} for i in range(5)])
    c = ConcatReader([a, b])
    c.open()
    assert len(c) == 15 and c.read(12)["v"] == "b2"
    m = MixedReader([a, b], ratios=[0.5, 2.0])
    m.open()
    assert len(m) == 5 + 10


def test_parse_dataset_paths():
    groups = parse_dataset_paths("x[1-3].tsv,y.tsv|||z.tsv")
    assert groups == [["x1.tsv", "x2.tsv", "x3.tsv", "y.tsv"], ["z.tsv"]]


def test_epoch_batch_iterator_resume():
    reader = ListReader([{"i": i} for i in range(32)])
    made = []
    it = EpochBatchIterator(
        reader, process_fn=lambda r, i: r["i"], collate_fn=lambda xs: {"x": np.asarray(xs)},
        batch_size=4, shuffle=False, drop_last=True, prefetch=0,
    )
    batches = list(it.next_epoch_itr())
    assert len(batches) == 8
    # resume mid-epoch: skip first 3 batches
    it2 = EpochBatchIterator(
        reader, process_fn=lambda r, i: r["i"], collate_fn=lambda xs: {"x": np.asarray(xs)},
        batch_size=4, shuffle=False, drop_last=True, prefetch=0,
    )
    it2.load_state_dict({"epoch": 1, "iterations_in_epoch": 3})
    resumed = list(it2.next_epoch_itr())
    assert len(resumed) == 5
    np.testing.assert_array_equal(resumed[0]["x"], batches[3]["x"])


def test_metrics_zoo():
    cs = ConfigStore()
    get = lambda n: cs.get("ofasys.metric", n).target_cls()
    assert get("accuracy").compute(["a", "b"], ["a", "c"])["accuracy"] == 0.5
    assert get("exact_match").compute(["The cat!"], ["cat"])["exact_match"] == 1.0
    bleu = get("bleu").compute(["the cat sat on the mat"], ["the cat sat on the mat"])["bleu"]
    assert bleu > 99.0
    w = get("wer").compute(["the cat sat"], ["the cat sits"])["wer"]
    assert abs(w - 1 / 3) < 1e-6
    r = get("rouge").compute(["the cat sat on the mat"], ["the cat sat on a mat"])
    assert 0.5 < r["rougeL"] <= 1.0
    iou = get("iou_acc").compute([[0, 0, 10, 10]], [[0, 0, 10, 11]])["iou_acc"]
    assert iou == 1.0
    mcc = get("matthews_corrcoef").compute(["1", "0", "1", "0"], ["1", "0", "1", "0"])
    assert abs(mcc["matthews_corrcoef"] - 1.0) < 1e-9
    cid = get("cider").compute(["a red bird", "a blue dog"], [["a red bird"], ["a green dog"]])["cider"]
    assert cid > 0
    vqa = get("vqa_score").compute(["blue"], [["blue", "blue", "blue", "red"]])["vqa_score"]
    assert vqa == 1.0
    s = get("solved_acc").compute(["1 2 3"], ["123"])["solved_acc"]
    assert s == 1.0
