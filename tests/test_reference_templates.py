"""Reference-template compatibility sweep (VERDICT r3 item #4).

Extracts every instruction template string from the reference corpus
(/root/reference: task classes, scripts, README, docs) and proves the DSL
accepts each verbatim: Instruction parse, per-slot preprocessor resolution
against this repo's registry, and adaptor-name resolution. Any unsupported
template fails loudly with the offending string.

The reference declares templates in docs/scripts rather than the task
classes themselves (e.g. /root/reference/README.md:149,
/root/reference/scripts/inference_multiple_task.py,
/root/reference/docs/source/task/*.rst); this sweep covers all of them.
"""

import os
import re

import pytest

from ofasys_tpu import ModalityType
from ofasys_tpu.preprocessor.instruction import Instruction

REFERENCE = "/root/reference"

_MODALITIES = {m.name for m in ModalityType}
# a real slot: [MOD], [MOD:col], [MOD:col,attrs], [MOD,attrs]
_SLOT = re.compile(r"\[([A-Z_]+)(?::[_A-Za-z0-9]+)?(?:,[^\]\[]+)?\]")
# quoted string literals that look like templates
_QUOTED = re.compile(r"'([^'\n]*->[^'\n]*)'|\"([^\"\n]*->[^\"\n]*)\"")


def _slot_names(s):
    return [m.group(1) for m in _SLOT.finditer(s)]


def _is_template(s):
    """A template has '->' and at least one slot, and every UPPER-CASE slot
    token is a real modality (filters the philosophy-doc pseudo-syntax like
    [BOUNDING_BOX], /root/reference/docs/source/concept/philosophy.rst:76)."""
    if "->" not in s or "[" not in s:
        return False
    names = _slot_names(s)
    if not names:
        return False
    return all(n in _MODALITIES for n in names)


def collect_reference_templates():
    if not os.path.isdir(REFERENCE):
        return []
    found = set()
    for root, dirs, files in os.walk(REFERENCE):
        dirs[:] = [d for d in dirs if d not in (".git", "_3rdparty")]
        for fname in files:
            if not fname.endswith((".py", ".md", ".rst", ".yaml")):
                continue
            try:
                text = open(os.path.join(root, fname), errors="ignore").read()
            except OSError:
                continue
            for m in _QUOTED.finditer(text):
                cand = (m.group(1) or m.group(2)).strip()
                if _is_template(cand):
                    found.add(cand)
            if fname.endswith(".rst"):
                # docs also show templates as bare code-block lines; strip
                # doctest/assignment/list wrappers so the corpus holds the
                # template string itself
                for line in text.splitlines():
                    line = line.strip()
                    line = re.sub(r"^(>>>|\.\.\.|-)\s*", "", line)
                    line = re.sub(r"^(instruction\s*=|template:)\s*", "", line)
                    line = line.strip().strip(",").strip("'\"").strip()
                    if _is_template(line) and not line.startswith("#"):
                        found.add(line)
    return sorted(found)


TEMPLATES = collect_reference_templates()


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference absent")
def test_corpus_is_substantial():
    # the reference documents dozens of task templates; a tiny count means
    # the extractor broke, not that the reference shrank
    assert len(TEMPLATES) >= 25, TEMPLATES


@pytest.mark.skipif(not TEMPLATES, reason="reference absent")
@pytest.mark.parametrize("template", TEMPLATES, ids=lambda t: t[:60])
def test_reference_template_parses_and_resolves(template):
    from ofasys_tpu.adaptor.general import DEFAULT_ADAPTOR_BY_MODALITY
    from ofasys_tpu.configure import ConfigStore
    from ofasys_tpu.preprocessor.general import DEFAULT_PREPROCESS

    import ofasys_tpu.preprocessor  # noqa: F401  (registers the zoo)
    import ofasys_tpu.adaptor  # noqa: F401

    store = ConfigStore()
    ist = Instruction(template)
    slots = [s for s in ist.slots if not s.is_plaintext]
    assert slots, f"no slots parsed from {template!r}"
    for slot in slots:
        pre = (slot.get_attr("preprocess") or slot.preprocess
               or DEFAULT_PREPROCESS[slot.modality])
        # must resolve in the registry — raises KeyError (with the available
        # names) when a reference template names a preprocessor we lack
        store.get("ofasys.preprocess", pre)
        ad = slot.get_attr("adaptor")
        if ad:
            store.get("ofasys.adaptor", ad)
        else:
            assert slot.modality in DEFAULT_ADAPTOR_BY_MODALITY


@pytest.mark.skipif(not TEMPLATES, reason="reference absent")
def test_known_templates_covered():
    """Spot-check that the extractor catches the flagship task templates."""
    corpus = "\n".join(TEMPLATES)
    assert "what does the image describe?" in corpus          # caption
    assert "generating sql code" in corpus                    # spider (table/database)
    assert "motion capture:" in corpus                        # motion diffusion
    assert "preprocess=text_phone" in corpus                  # ASR w/ phones
    assert "preprocess=image_vqgan" in corpus                 # image gen


# ---------------------------------------------------------------- collate
# VERDICT r3 #4 asked for parse + resolution + a COLLATE of dummy data.
# The factory below synthesizes a record value per preprocessor; a template
# collates end to end through GeneralPreprocess's 4 phases. Preprocessors
# whose data needs real external assets are skipped with a named reason.
import numpy as np

_NEEDS_ASSET = {
    # value-linked schema serialization opens the task's sqlite database
    "database": "needs a Spider sqlite database file",
}


def _dummy_value(pre_name: str, modality: str):
    rng = np.random.default_rng(0)
    if pre_name in ("image", "imagenet", "imagepretrain", "image_vqgan"):
        return (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    if pre_name == "box":
        return {"box": [4.0, 4.0, 32.0, 32.0], "width": 64.0, "height": 64.0,
                "image": (rng.random((64, 64, 3)) * 255).astype(np.uint8)}
    if pre_name in ("audio", "audio_embed"):
        return (rng.standard_normal(16000) * 0.1).astype(np.float32)
    if pre_name == "video":
        return (rng.random((4, 64, 64, 3)) * 255).astype(np.uint8)
    if pre_name == "motion_6d":
        return rng.standard_normal((40, 135)).astype(np.float32)
    if pre_name in ("phone", "text_phone"):
        return "hello world"
    if pre_name == "table":
        return "city : name | country | population"
    if pre_name == "category":
        return "dog"
    if modality == "IMAGE":
        return (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    if modality == "AUDIO":
        return (rng.standard_normal(16000) * 0.1).astype(np.float32)
    return "a small test sentence"


@pytest.mark.skipif(not TEMPLATES, reason="reference absent")
@pytest.mark.parametrize("template", TEMPLATES, ids=lambda t: t[:60])
def test_reference_template_collates(template):
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.preprocessor.general import DEFAULT_PREPROCESS, GeneralPreprocess

    import ofasys_tpu.preprocessor  # noqa: F401

    ist0 = Instruction(template, split="train")
    slots = [s for s in ist0.slots if not s.is_plaintext]
    pres, data = [], {}
    for idx, slot in enumerate(slots):
        pre = (slot.get_attr("preprocess") or slot.preprocess
               or DEFAULT_PREPROCESS[slot.modality])
        if pre in _NEEDS_ASSET:
            pytest.skip(f"{pre}: {_NEEDS_ASSET[pre]}")
        if pre not in pres:
            pres.append(pre)
        name = slot.column_name or f"slot{idx}"
        data[name] = _dummy_value(pre, slot.modality.name)
    d = Dictionary()
    gp = GeneralPreprocess(d, active=sorted(set(pres)))
    ist = Instruction(template, split="train").format(
        **{k: v for k, v in data.items()})
    out = gp(ist)
    assert out is not None, f"preprocess dropped the sample for {template!r}"
    batch = gp.collate([out])
    slots_out = batch["net_input"]["slots"]
    assert slots_out, f"no collated slots for {template!r}"
    for sb in slots_out:
        assert sb.value is None or isinstance(sb.value, dict)
