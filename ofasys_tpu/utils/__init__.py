from ofasys_tpu.utils.pytree import SlotBatch
from ofasys_tpu.utils.trie import Trie

__all__ = ["SlotBatch", "Trie"]
