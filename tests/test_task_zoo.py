"""Task zoo sanity: every registered task builds, parses its template, and
reports its required preprocessors/adaptors; a few verticals run a
training step; VQGAN tokenizer round-trips shapes; struct/phone/category
preprocessors behave."""

import numpy as np
import pytest

from ofasys_tpu.configure import ConfigStore
from ofasys_tpu.preprocessor.dictionary import Dictionary
from ofasys_tpu.preprocessor.instruction import Instruction
import ofasys_tpu.task  # register zoo


@pytest.fixture(autouse=True)
def _reset():
    yield
    ConfigStore().reset()


def test_all_tasks_build_and_parse():
    cs = ConfigStore()
    names = cs.names("ofasys.task")
    assert len(names) >= 30
    skip_build = {"default", "traverse"}
    for name in names:
        if name in skip_build:
            continue
        node = cs.get("ofasys.task", name)
        task = node.target_cls()
        assert task.templates, name
        for t in task.templates:
            Instruction(t)
        pres = task.required_preprocessors()
        adas = task.required_adaptors()
        assert pres and adas, name
        # every referenced preprocessor/adaptor is registered
        for p in pres:
            assert cs.contains("ofasys.preprocess", p), (name, p)
        for a in adas:
            assert cs.contains("ofasys.adaptor", a), (name, a)


def test_struct_preprocessor_linearizes():
    d = Dictionary()
    node = ConfigStore().get("ofasys.preprocess", "struct")
    pre = node.target_cls(d, node.config)
    s = pre.linearize({"header": ["name", "age"], "rows": [["bob", 3], ["amy", 5]]})
    assert s == "name : age | bob : 3 | amy : 5"
    s2 = pre.linearize([["subj", "pred", "obj"]])
    assert s2 == "subj : pred : obj"
    db = ConfigStore().get("ofasys.preprocess", "database")
    dpre = db.target_cls(d, db.config)
    s3 = dpre.linearize({"db_id": "farm", "tables": {"cows": ["id", "name"]}})
    # peteshaw format incl. the leading "| " the reference's strip() keeps
    # (ref struct.py:252-260, 300-303)
    assert s3 == "| farm | cows : id , name"


def test_phone_preprocessor_roundtrip():
    d = Dictionary()
    node = ConfigStore().get("ofasys.preprocess", "phone")
    pre = node.target_cls(d, node.config)
    ids = pre.encode_phones("HH AH L OW")
    assert len(ids) == 4
    assert pre.decode(ids) == "HH AH L OW"
    start, end = d.get_start_end_idx("<phone>")
    assert (ids >= start).all() and (ids < end).all()


def test_vqgan_tokenizer_shapes():
    from ofasys_tpu.model.vqgan import VQGANTokenizer

    tok = VQGANTokenizer(code_image_size=64)  # tiny for test speed
    assert tok.codes_per_image == 64  # 64/8=8 -> 8*8
    img = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    codes = tok.encode(img)
    assert codes.shape == (1, 64) and codes.dtype == np.int32
    assert (codes >= 0).all() and (codes < 8192).all()
    rec = tok.decode(codes)
    assert rec.shape == (1, 64, 64, 3)
    assert (rec >= 0).all() and (rec <= 1).all()
    # deterministic tokenization
    np.testing.assert_array_equal(codes, tok.encode(img))


def test_glue_subtask_templates():
    from ofasys_tpu.task.tasks import GlueTask

    for sub in GlueTask.SUBTASK_TEMPLATES:
        t = GlueTask(subtask=sub)
        assert t.name == f"glue_{sub}"
        Instruction(t.templates[0])


def test_glue_subtask_from_config():
    # subtask is a GlueTaskConfig field, so --ofasys.task.<name>.subtask=...
    # (and the YAML equivalent) select the template/metric (reference
    # task/glue_task.py drives all 8 subtasks from config)
    import pytest

    from ofasys_tpu.configure.options import parse_flags
    from ofasys_tpu.launch import build_from_config
    from ofasys_tpu.task.tasks import GlueTask

    data, _ = parse_flags([
        "--ofasys.task.mnli.task=glue",
        "--ofasys.task.mnli.subtask=mnli",
        "--ofasys.task.cola.task=glue",
        "--ofasys.task.cola.subtask=cola",
    ])
    _, _, tasks = build_from_config(data)
    by_name = {t.name: t for t in tasks}
    mnli, cola = by_name["mnli"], by_name["cola"]
    assert mnli.subtask == "mnli" and cola.subtask == "cola"
    assert mnli.cfg.instruction.template != cola.cfg.instruction.template
    assert "premise" in mnli.cfg.instruction.template
    assert tuple(mnli.cfg.evaluation.metrics) == ("accuracy",)
    assert tuple(cola.cfg.evaluation.metrics) == ("matthews_corrcoef",)
    with pytest.raises(ValueError, match="unknown GLUE subtask"):
        GlueTask(subtask="nope")


def test_image_vqgan_preprocess_registers_codes():
    d = Dictionary()
    node = ConfigStore().get("ofasys.preprocess", "image_vqgan")
    import dataclasses
    cfg = dataclasses.replace(node.config, code_image_size=64)
    pre = node.target_cls(d, cfg)
    start, end = d.get_start_end_idx("<code>")
    assert end - start == 8192
    img = np.random.default_rng(0).random((64, 64, 3)).astype(np.float32) * 255
    toks = pre.encode_image(img)
    assert toks.shape == (64,)
    assert (toks >= start).all() and (toks < end).all()
    rec = pre.decode(toks)
    assert rec.shape == (64, 64, 3)
