import pytest

from ofasys_tpu import ModalityType
from ofasys_tpu.preprocessor.instruction import Instruction, Slot


def test_caption_template():
    ist = Instruction("[IMAGE:img] what does the image describe? -> [TEXT:cap]")
    mods = [s.modality for s in ist.slots]
    assert mods == [ModalityType.IMAGE, ModalityType.TEXT, ModalityType.TEXT]
    assert ist.slots[0].is_src and ist.slots[1].is_src
    assert not ist.slots[2].is_src
    assert ist.slots[1].is_plaintext
    assert ist.slots[1].value == "what does the image describe?"
    assert ist.slots[0].column_name == "img"
    assert ist.slots[2].column_name == "cap"


def test_plaintext_interleaving():
    ist = Instruction("can text1 [TEXT:s1] imply text2 [TEXT:s2]? -> [TEXT:label,closed_set]")
    vals = [s.value for s in ist.slots if s.is_plaintext]
    assert vals == ["can text1", "imply text2", "?"]
    label = ist.slots[-1]
    assert label.has_attr("closed_set")
    assert not label.has_attr("closed")  # prefix must not false-positive... see below


def test_attrs_parse():
    ist = Instruction("[TEXT:sentence,mask_ratio=0.3,max_length=256] -> [TEXT:sentence]")
    s = ist.slots[0]
    assert s.get_attr("mask_ratio", float) == 0.3
    assert s.get_attr("max_length", int) == 256
    assert s.attr2kwargs() == {"mask_ratio": "0.3", "max_length": "256"}
    assert s.get_attr("missing") is None


def test_every_modality_parses():
    for m in ModalityType:
        ist = Instruction(f"[{m.name}:x] -> [TEXT:y]")
        assert ist.slots[0].modality is m


def test_format_positional_and_kw():
    ist = Instruction("[IMAGE:img] caption: -> [TEXT:cap]")
    bound = ist.format("IMG_DATA", cap="a bird")
    assert bound.slots[0].value == "IMG_DATA"
    assert bound.slots[-1].value == "a bird"
    # original untouched
    assert ist.slots[0].value is None


def test_format_shared_column_name():
    ist = Instruction("[TEXT:sentence,mask_ratio=0.3] -> [TEXT:sentence]")
    bound = ist.format("hello world")
    assert bound.slots[0].value == "hello world"
    assert bound.slots[-1].value == "hello world"


def test_format_missing_source_raises():
    ist = Instruction("[IMAGE:img] -> [TEXT:cap]")
    with pytest.raises(ValueError):
        ist.format(cap="x")


def test_format_target_may_be_empty():
    ist = Instruction("[IMAGE:img] -> [TEXT:cap]")
    bound = ist.format(img="I")
    assert bound.slots[-1].value is None  # inference mode: target open


def test_target_slot_selection():
    ist = Instruction("[IMAGE:img] -> describe: [TEXT:cap]")
    t = Slot.get_target_slot_from_slots(ist.slots)
    assert t.column_name == "cap" and not t.is_plaintext


def test_double_arrow_rejected():
    with pytest.raises(ValueError):
        Instruction("[TEXT:a] -> [TEXT:b] -> [TEXT:c]")
    with pytest.raises(ValueError):
        Instruction("[TEXT:a] [TEXT:b]")


def test_default_column_names_are_positions():
    ist = Instruction("[IMAGE] what does the region describe? region: [BOX] -> [TEXT]")
    open_names = ist.get_slot_names()
    assert len(open_names) == 3
    # unnamed slots take their global position as name
    assert all(n.isdigit() for n in open_names)
    bound = ist.format("I", "B", "T")
    assert [s.value for s in bound.slots if not s.is_plaintext] == ["I", "B", "T"]


def test_others_kwargs_kept():
    ist = Instruction("[TEXT:a] -> [TEXT:b]")
    bound = ist.format(a="x", b="y", extra_meta=42)
    assert bound.others.get("extra_meta") == 42


def test_all_30_reference_task_shapes():
    # a sampling of real templates used across the reference's task suite
    templates = [
        "[IMAGE:img] what does the image describe? -> [TEXT:cap]",
        "[TEXT:src,mask_ratio=0.3] -> [TEXT:src]",
        "[IMAGE:img] which region does the text ' [TEXT:txt] ' describe? -> [BOX:box]",
        "[AUDIO:wav] what is the transcription? -> [TEXT:txt]",
        "[TEXT:text] what is the motion? -> [MOTION:bvh,preprocess=motion_6d]",
        "[VIDEO:video] what does the video describe? -> [TEXT:cap]",
        "[STRUCT:database,preprocess=database] -> [TEXT:query]",
        "[IMAGE:img,preprocess=image_vqgan] -> [IMAGE:img,preprocess=image_vqgan,adaptor=image_vqgan]",
    ]
    for t in templates:
        ist = Instruction(t)
        assert len(ist.target_slots) >= 1
