from ofasys_tpu.model.config import GeneralistModelConfig, apply_arch

__all__ = ["GeneralistModelConfig", "apply_arch", "GeneralistModel", "GeneralistNet", "EncoderOut"]


def __getattr__(name):
    # lazy: ofa imports the adaptor package, which imports model.config —
    # eager re-export here would create a cycle for adaptor-first imports
    if name in ("GeneralistModel", "GeneralistNet", "EncoderOut"):
        from ofasys_tpu.model import ofa

        return getattr(ofa, name)
    raise AttributeError(name)
