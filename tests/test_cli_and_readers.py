"""fairseq-style flag bridge, AzureML sink, WordPiece tokenizer, remote
image sources, object-store readers, video augmentation (reference
configure/options.py, logging/progress_bar.py:443, tokenizer/hf_bert_bpe.py,
default/image.py:40-82, io/reader/{oss,odps}_reader.py, utils/video/*)."""

import os

import numpy as np
import pytest

from ofasys_tpu.configure import ConfigStore


@pytest.fixture(autouse=True)
def _reset():
    yield
    ConfigStore().reset()


def test_parse_flags_builds_config_dict():
    from ofasys_tpu.configure.options import parse_flags

    data, rest = parse_flags([
        "--ofasys.task=caption,gigaword",
        "--ofasys.task.caption.dataset.batch_size=16",
        "--ofasys.model.arch=base",
        "--ofasys.optimization.lr=[0.0001]",
        "--ofasys.checkpoint.no_save=true",
        "extra.yaml",
    ])
    assert set(data["tasks"]) == {"caption", "gigaword"}
    assert data["tasks"]["caption"]["dataset"]["batch_size"] == 16
    assert data["model"]["arch"] == "base"
    assert data["trainer"]["optimization"]["lr"] == [0.0001]
    assert data["trainer"]["checkpoint"]["no_save"] is True
    assert rest == ["extra.yaml"]


@pytest.mark.slow
def test_flag_bridge_end_to_end_fit(tmp_path):
    import csv

    tsv = tmp_path / "toy.tsv"
    with open(tsv, "w") as f:
        for i in range(32):
            f.write(f"red bird {i % 4}\tred bird\n")

    from ofasys_tpu.configure.options import parse_args_and_build

    trainer, model, tasks = parse_args_and_build([
        "--ofasys.task=default",
        "--ofasys.task.default.instruction.template=[TEXT:src] -> [TEXT:tgt]",
        f"--ofasys.task.default.dataset.train_data={tsv}",
        "--ofasys.task.default.dataset.selected_cols=0:src,1:tgt",
        "--ofasys.task.default.dataset.batch_size=8",
        "--ofasys.model.arch=tiny",
        "--ofasys.model.encoder.layers=1",
        "--ofasys.model.decoder.layers=1",
        "--ofasys.checkpoint.no_save=true",
        "--ofasys.optimization.lr=[0.005]",
    ])
    state = trainer.fit(model, tasks, max_update=2)
    assert int(state.step) == 2


def test_get_training_parser_has_flags():
    from ofasys_tpu.configure.options import get_training_parser

    parser = get_training_parser()
    helptext = parser.format_help()
    assert "--ofasys.optimization.lr" in helptext
    assert "--ofasys.checkpoint.save_dir" in helptext


def test_azureml_sink_with_injected_run():
    from ofasys_tpu.logging.progress_bar import build_progress_bar

    logged = []

    class FakeRun:
        def log(self, name, value):
            logged.append((name, value))

    bar = build_progress_bar("none", azureml_run=FakeRun())
    bar.log({"loss": 1.5, "note": "skip-me"}, tag="train", step=3)
    assert ("train/loss", 1.5) in logged
    assert all(n != "train/note" for n, _ in logged)


def test_wordpiece_tokenizer_roundtrip(tmp_path):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        ["[UNK]", "the", "cat", "s", "##at", "##s", "on", "mat"]
    ))
    from ofasys_tpu.preprocessor.tokenizer.gpt2_bpe import build_tokenizer

    tok = build_tokenizer("wordpiece", vocab_file=str(vocab))
    ids = tok.encode("the cats sat on the mat")
    assert tok.decode(ids) == "the cats sat on the mat"
    # continuation pieces used: 'cats' -> cat ##s ; 'sat' -> s ##at
    assert len(ids) == 8
    # unknown word -> [UNK]
    assert tok.encode("zzz") == [0]


def test_image_url_source_uses_scheme_fetcher(tmp_path):
    from PIL import Image

    from ofasys_tpu.preprocessor.image import load_image
    from ofasys_tpu.utils import file_utils

    img_path = tmp_path / "x.png"
    Image.new("RGB", (8, 8), (255, 0, 0)).save(img_path)

    def fake_fetch(url, dest):
        import shutil

        shutil.copy(img_path, dest)

    file_utils.register_scheme_fetcher("fakehttp", fake_fetch)
    try:
        # route through cached_path by pretending to be http
        file_utils.register_scheme_fetcher("http", fake_fetch)
        arr = load_image("http://example.com/x.png")
        assert arr.shape == (8, 8, 3) and arr[0, 0, 0] == 255.0
    finally:
        file_utils._SCHEME_FETCHERS.pop("http", None)
        file_utils._SCHEME_FETCHERS.pop("fakehttp", None)


def test_object_store_readers(tmp_path):
    from ofasys_tpu.io.reader.object_store import (
        ObjectStoreLineReader,
        OdpsReader,
        OssTextBinReader,
    )

    src = tmp_path / "data.tsv"
    src.write_text("a\t1\nb\t2\nc\t3\n")
    r = ObjectStoreLineReader("oss://bucket/data.tsv", fetcher=lambda url: str(src))
    assert len(r) == 3 and r.read(1) == "b\t2"

    binf = tmp_path / "toks.bin"
    np.arange(32, dtype=np.int32).tofile(binf)
    br = OssTextBinReader("oss://bucket/toks.bin", block_tokens=8,
                          fetcher=lambda url: str(binf))
    assert len(br) == 4
    np.testing.assert_array_equal(br.read(1), np.arange(8, 16))

    class FakeOdps:
        rows = [{"q": "hi", "a": "yo", "extra": 1}, {"q": "x", "a": "y", "extra": 2}]

        def count(self):
            return len(self.rows)

        def read(self, i):
            return self.rows[i]

    odps = OdpsReader("proj.table", client=FakeOdps(), selected_cols=["q", "a"])
    assert len(odps) == 2 and odps.read(0) == {"q": "hi", "a": "yo"}
    with pytest.raises(ImportError):
        OdpsReader("proj.table")


def test_video_augmentation_paths():
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.preprocessor.instruction import Slot
    from ofasys_tpu import ModalityType

    node = ConfigStore().get("ofasys.preprocess", "video")
    node.config.patch_image_size = 16
    node.config.num_frames = 4
    node.config.video_rand_augment = True
    node.config.random_erasing_prob = 1.0
    pre = node.target_cls(Dictionary(), node.config)
    rng = np.random.default_rng(0)
    vid = (rng.random((6, 24, 24, 3)) * 255).astype(np.float32)
    slot = Slot(ModalityType.VIDEO, True, "v", split="train")
    slot.value = vid
    out = pre.map(slot)
    assert out.value["inputs"].shape == (4, 16, 16, 3)
    assert np.isfinite(out.value["inputs"]).all()


def test_create_oss_list_objects_manifest(tmp_path):
    from ofasys_tpu.tools.create_oss_list_objects import MANIFEST, write_manifest

    path = "oss://bucket/data/"
    listing = [
        "oss://bucket/data/part-0.tsv",
        "oss://bucket/data/part-1.tsv",
        "oss://bucket/data/sub/",            # directory: skipped
        "oss://bucket/data/__list_object__.txt",  # bookkeeping: skipped
        "oss://other/elsewhere.tsv",         # outside path: skipped
    ]
    uploads = {}
    local = write_manifest(
        path, out_dir=str(tmp_path),
        list_fn=lambda p: listing,
        put_fn=lambda src, dst: uploads.update({dst: open(src).read()}),
    )
    assert os.path.basename(local) == MANIFEST
    lines = open(local).read().splitlines()
    assert lines == ["oss://bucket/data/part-0.tsv", "oss://bucket/data/part-1.tsv"]
    assert path + MANIFEST in uploads

    with pytest.raises(ValueError):
        write_manifest("oss://bucket/data", list_fn=lambda p: [])
