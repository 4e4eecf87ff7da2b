from dataclasses import dataclass, field

import pytest

from ofasys_tpu.configure import (
    ConfigStore,
    TrainerConfig,
    from_dict,
    register_config,
    to_dict,
)


@dataclass
class _InnerCfg:
    depth: int = 2
    names: tuple = ("a", "b")


@dataclass
class _DemoCfg:
    lr: float = 0.1
    use_thing: bool = False
    inner: _InnerCfg = field(default_factory=_InnerCfg)


@register_config("test.group", "demo", _DemoCfg)
class _DemoTarget:
    def __init__(self, cfg):
        self.cfg = cfg


@pytest.fixture(autouse=True)
def _reset_store():
    yield
    ConfigStore().reset()


def test_register_and_get():
    node = ConfigStore().get("test.group", "demo")
    assert node.config_cls is _DemoCfg
    assert node.target_cls is _DemoTarget
    assert isinstance(node.config, _DemoCfg)


def test_build_active():
    cs = ConfigStore()
    cs.set_active("test.group", "demo")
    built = cs.build("test.group")
    assert isinstance(built["demo"], _DemoTarget)
    assert built["demo"].cfg.lr == 0.1


def test_dotted_override_with_coercion():
    cs = ConfigStore()
    cs.override("test.group.demo.lr", "0.5")
    cs.override("test.group.demo.use_thing", "true")
    cs.override("test.group.demo.inner.depth", "7")
    cfg = cs.get("test.group", "demo").config
    assert cfg.lr == 0.5 and cfg.use_thing is True and cfg.inner.depth == 7


def test_override_unknown_field_raises():
    with pytest.raises(AttributeError):
        ConfigStore().override("test.group.demo.nope", 1)
    with pytest.raises(KeyError):
        ConfigStore().override("no.such.group.x", 1)


def test_state_dict_roundtrip():
    cs = ConfigStore()
    cs.set_active("test.group", "demo")
    cs.override("test.group.demo.lr", 0.9)
    state = cs.state_dict()
    assert state["test.group"]["demo"]["lr"] == 0.9
    cs.reset()
    cs.load_state_dict(state)
    assert cs.get("test.group", "demo").config.lr == 0.9
    assert cs.get("test.group", "demo").active


def test_trainer_config_tree():
    cfg = TrainerConfig()
    assert cfg.common.dtype == "bfloat16"
    assert cfg.parallel.data == -1 and cfg.parallel.tensor == 1
    cfg.update(**{"optimization.lr": (0.001,), "dataset.batch_size": 4})
    assert cfg.dataset.batch_size == 4
    d = to_dict(cfg)
    cfg2 = from_dict(TrainerConfig, d)
    assert cfg2.dataset.batch_size == 4
    assert cfg2.optimization.lr == (0.001,)


def test_tuple_coercion_from_string():
    cfg = TrainerConfig()
    cfg.update(**{"optimization.adam_betas": "0.9,0.98"})
    assert cfg.optimization.adam_betas == (0.9, 0.98)


def test_task_configs_are_isolated_per_instance():
    """Regression: Task() used dataclasses.replace (SHALLOW) on the store's
    default config, so two tasks shared nested InstructionConfig — the second
    task's `instruction=` silently rewrote the first's template (both tasks
    then trained on identical batches)."""
    from ofasys_tpu.task.base import Task

    t1 = Task(name="a", instruction="[TEXT:src] -> [TEXT:tgt]")
    t2 = Task(name="b", instruction="[TEXT:src] translate -> [TEXT:tgt]")
    assert t1.cfg.instruction.template == "[TEXT:src] -> [TEXT:tgt]"
    assert t2.cfg.instruction.template == "[TEXT:src] translate -> [TEXT:tgt]"
    t1.cfg.dataset.batch_size = 4
    assert t2.cfg.dataset.batch_size != 4 or t2.cfg.dataset is not t1.cfg.dataset
    # store default untouched
    from ofasys_tpu.configure import ConfigStore
    assert ConfigStore().get("ofasys.task", "default").config.instruction.template == ""


def test_model_config_isolated_from_store():
    """GeneralistModel(arch=...) must not mutate the store's default model
    config (apply_arch/update mutate in place)."""
    from ofasys_tpu.configure import ConfigStore
    from ofasys_tpu.model.ofa import GeneralistModel

    default_dropout = ConfigStore().get("ofasys.model", "unify").config.dropout
    m = GeneralistModel(arch="tiny")
    m.cfg.dropout = 0.987
    assert ConfigStore().get("ofasys.model", "unify").config.dropout == default_dropout
    m2 = GeneralistModel(arch="tiny")
    assert m2.cfg.dropout != 0.987


def test_preprocessor_configs_isolated_per_task():
    """Each GeneralPreprocess owns deep copies of preprocessor configs —
    per-task tuning (e.g. multi-host pad_to_fixed) must not leak."""
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.preprocessor.general import GeneralPreprocess

    d = Dictionary()
    g1 = GeneralPreprocess(d, active=["text"])
    g2 = GeneralPreprocess(d, active=["text"])
    assert g1.name2pre["text"].cfg is not g2.name2pre["text"].cfg
