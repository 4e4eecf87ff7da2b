"""Import shim for running the reference OFASys package on CPU.

The reference (/root/reference, torch) is used ONLY for verification: the
numerics-parity harness (tests/test_reference_parity.py) instantiates its
transformer modules with random weights and diffs activations against ours,
and bench.py measures its CPU train step as the vs_baseline denominator
(BASELINE.md directs us to measure the torch reference ourselves).

The image lacks the reference's Aliyun/cluster deps (oss2, common_io, hydra,
omegaconf, torchvision, ...). None of them participate in the transformer
math; this module installs just-enough stubs so ``import ofasys`` succeeds.
Everything stubbed here raises or returns inert objects when actually used.
"""

from __future__ import annotations

import importlib.abc
import importlib.machinery
import sys
import types
from typing import Optional

#: top-level distributions the reference imports but the image lacks; all are
#: IO/cluster/vision-aug plumbing, not model math.
STUB_TOP_LEVEL = {
    "oss2", "common_io", "hydra", "dacite", "torchvision", "soundfile",
    "librosa", "torchaudio", "av", "timm", "editdistance", "sqlparse",
    "g2p_en", "pypinyin", "iopath", "boto3", "botocore", "wandb",
    "fairscale", "apex", "deepspeed", "gossip", "clip", "kaldi",
    "modelscope", "azureml", "torch_xla", "diffusers",
}


class _StubObject:
    """Inert attribute sink: any attribute access / call yields another stub."""

    def __init__(self, name: str):
        self._name = name

    def __getattr__(self, item):
        if item.startswith("__") and item.endswith("__"):
            raise AttributeError(item)
        return _StubObject(f"{self._name}.{item}")

    def __call__(self, *args, **kwargs):
        return _StubObject(f"{self._name}()")

    def __repr__(self):
        return f"<stub {self._name}>"

    def __mro_entries__(self, bases):
        # allow `class X(stub.Something):` — substitute a plain base
        return (object,)


class _StubModule(types.ModuleType):
    __file__ = "<ofasys_tpu reference_compat stub>"
    __path__: list = []

    def __getattr__(self, item):
        if item.startswith("__") and item.endswith("__"):
            raise AttributeError(item)
        value = _StubObject(f"{self.__name__}.{item}")
        setattr(self, item, value)
        return value


class _StubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    def find_spec(self, fullname: str, path=None, target=None):
        top = fullname.split(".")[0]
        if top not in STUB_TOP_LEVEL:
            return None
        if top in sys.modules and not isinstance(sys.modules[top], _StubModule):
            return None  # the real package exists
        return importlib.machinery.ModuleSpec(fullname, self, is_package=True)

    def create_module(self, spec):
        return _StubModule(spec.name)

    def exec_module(self, module):
        pass


def _make_omegaconf() -> types.ModuleType:
    m = types.ModuleType("omegaconf")
    m.__file__ = "<ofasys_tpu reference_compat omegaconf>"
    m.MISSING = "???"
    m.II = lambda key: f"${{{key}}}"
    m.SI = lambda s: s

    class DictConfig(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    class ListConfig(list):
        pass

    class _OmegaConf:
        @staticmethod
        def create(obj=None, **kw):
            if isinstance(obj, dict):
                return DictConfig(obj)
            if isinstance(obj, list):
                return ListConfig(obj)
            return DictConfig()

        @staticmethod
        def to_container(cfg, *a, **k):
            return dict(cfg) if isinstance(cfg, dict) else cfg

        @staticmethod
        def set_struct(cfg, flag):
            pass

        @staticmethod
        def merge(*cfgs):
            out = DictConfig()
            for c in cfgs:
                if isinstance(c, dict):
                    out.update(c)
            return out

        @staticmethod
        def is_missing(cfg, key):
            return getattr(cfg, key, m.MISSING) == m.MISSING

        @staticmethod
        def to_yaml(cfg, *a, **k):
            return str(cfg)

    m.OmegaConf = _OmegaConf
    m.DictConfig = DictConfig
    m.ListConfig = ListConfig
    m.open_dict = lambda cfg: _NullCtx(cfg)
    m.read_write = lambda cfg: _NullCtx(cfg)
    m._utils = _StubModule("omegaconf._utils")
    sys.modules["omegaconf._utils"] = m._utils
    return m


class _NullCtx:
    def __init__(self, value=None):
        self.value = value

    def __enter__(self):
        return self.value

    def __exit__(self, *exc):
        return False


def _make_hydra() -> types.ModuleType:
    hydra = types.ModuleType("hydra")
    hydra.__file__ = "<ofasys_tpu reference_compat hydra>"
    hydra.__path__ = []
    core = types.ModuleType("hydra.core")
    core.__path__ = []
    cs_mod = types.ModuleType("hydra.core.config_store")
    gh_mod = types.ModuleType("hydra.core.global_hydra")

    class ConfigStore:
        _inst = None

        @classmethod
        def instance(cls):
            if cls._inst is None:
                cls._inst = cls()
            return cls._inst

        def store(self, *a, **k):
            pass

    class GlobalHydra:
        _inst = None

        @classmethod
        def instance(cls):
            if cls._inst is None:
                cls._inst = cls()
            return cls._inst

        def is_initialized(self):
            return False

        def clear(self):
            pass

    cs_mod.ConfigStore = ConfigStore
    gh_mod.GlobalHydra = GlobalHydra
    core.config_store = cs_mod
    core.global_hydra = gh_mod
    hydra.core = core
    hydra.initialize_config_dir = lambda *a, **k: _NullCtx()
    hydra.initialize = lambda *a, **k: _NullCtx()
    hydra.compose = lambda *a, **k: None
    hydra.main = lambda *a, **k: (lambda fn: fn)
    sys.modules["hydra.core"] = core
    sys.modules["hydra.core.config_store"] = cs_mod
    sys.modules["hydra.core.global_hydra"] = gh_mod
    return hydra


def _patch_dataclasses_mutable_defaults() -> None:
    """The reference (written for py<=3.10) declares dataclass fields like
    ``common: CommonConfig = CommonConfig()``; python 3.12 raises
    'mutable default ... use default_factory'. Rewrite such defaults into
    default_factory=deepcopy(instance) on the fly (only fires where the
    stdlib would otherwise hard-error)."""
    import copy
    import dataclasses

    if getattr(dataclasses, "_ofasys_tpu_patched", False):
        return
    orig = dataclasses._get_field

    def _get_field(cls, a_name, a_type, default_kw_only):
        default = getattr(cls, a_name, dataclasses.MISSING)
        type_str = str(a_type)
        if "ClassVar" not in type_str and "InitVar" not in type_str:
            if isinstance(default, dataclasses.Field):
                # field(default=<mutable instance>) — same py3.12 error
                inner = default.default
                if (
                    inner is not dataclasses.MISSING
                    and type(inner).__hash__ is None
                    and default.default_factory is dataclasses.MISSING
                ):
                    default.default = dataclasses.MISSING
                    default.default_factory = lambda d=inner: copy.deepcopy(d)
            elif (
                default is not dataclasses.MISSING
                and not callable(default)
                and type(default).__hash__ is None
            ):
                setattr(
                    cls, a_name,
                    dataclasses.field(default_factory=lambda d=default: copy.deepcopy(d)),
                )
        return orig(cls, a_name, a_type, default_kw_only)

    dataclasses._get_field = _get_field
    dataclasses._ofasys_tpu_patched = True


_installed = False


def install_reference_shim(reference_path: str = "/root/reference") -> None:
    """Install import stubs and put the reference repo on sys.path.
    Idempotent; call before ``import ofasys``."""
    global _installed
    if _installed:
        return
    if "omegaconf" not in sys.modules:
        try:
            import omegaconf  # noqa: F401
        except ImportError:
            sys.modules["omegaconf"] = _make_omegaconf()
    if "hydra" not in sys.modules:
        try:
            import hydra  # noqa: F401
        except ImportError:
            sys.modules["hydra"] = _make_hydra()
    sys.meta_path.insert(0, _StubFinder())
    _patch_dataclasses_mutable_defaults()
    if reference_path not in sys.path:
        sys.path.append(reference_path)
    _installed = True


def import_reference():
    """``install_reference_shim()`` then ``import ofasys`` (the reference)."""
    install_reference_shim()
    import ofasys  # noqa: F401

    return ofasys
