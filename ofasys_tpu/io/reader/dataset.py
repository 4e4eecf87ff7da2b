"""Epoch/batch iteration over readers
(reference ofasys/io/reader/dataset.py:204-468).

Host-side, numpy-only. Differences from the reference, driven by TPU
execution:

  * batches are SHAPE-STABLE: fixed batch_size; the trailing partial batch
    is padded by repeating the last sample (with ``n_valid`` recorded) for
    eval, or dropped for train — jit never retraces on batch shape.
  * update_freq microbatches are stacked on a leading axis for the
    lax.scan gradient-accumulation path.
  * prefetch is a background thread (records -> process -> collate overlap
    with device steps); rank sharding covers the multi-host data axis.
"""

from __future__ import annotations

import itertools
import queue
import re
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

from ofasys_tpu.io.reader.base_reader import BaseReader


def parse_dataset_paths(path: str) -> List[List[str]]:
    """Reference path DSL (io/reader/utils.py:100): ``|||`` separates
    per-epoch groups; ``name[1-3].tsv`` expands to name1..name3."""
    groups = []
    for group in path.split("|||"):
        files: List[str] = []
        for part in group.split(","):
            part = part.strip()
            if not part:
                continue
            m = re.search(r"\[(\d+)-(\d+)\]", part)
            if m:
                lo, hi = int(m.group(1)), int(m.group(2))
                files.extend(part[:m.start()] + str(i) + part[m.end():] for i in range(lo, hi + 1))
            else:
                files.append(part)
        if files:
            groups.append(files)
    return groups


class EpochBatchIterator:
    def __init__(
        self,
        reader: BaseReader,
        process_fn: Callable[[Dict[str, Any], int], Any],
        collate_fn: Callable[[List[Any]], Dict[str, Any]],
        batch_size: int = 8,
        update_freq: int = 1,
        shuffle: bool = True,
        seed: int = 1,
        rank: int = 0,
        world_size: int = 1,
        drop_last: bool = True,
        prefetch: int = 2,
        epoch: int = 1,
    ):
        self.reader = reader
        self.process_fn = process_fn
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.update_freq = update_freq
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = epoch
        self.iterations_in_epoch = 0
        self._cur: Optional[Iterator] = None

    # ----------------------------------------------------------- iteration
    def _epoch_indices(self) -> np.ndarray:
        self.reader.open()
        self.reader.reset(self.epoch)
        n = len(self.reader)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + self.epoch).permutation(n)
        # contiguous rank shard (reference partition_data_size, io/reader/utils.py:54)
        per = n // self.world_size
        return order[self.rank * per:(self.rank + 1) * per] if self.world_size > 1 else order

    def _iter_batches(self):
        idxs = self._epoch_indices()
        bsz = self.batch_size
        samples: List[Any] = []
        consumed = 0
        skipped_batches = self.iterations_in_epoch
        batch_count = 0
        micro: List[Dict[str, Any]] = []
        for i in idxs:
            rec = self.reader.read(int(i))
            out = self.process_fn(rec, int(i))
            if out is None:
                continue
            samples.append(out)
            if len(samples) == bsz:
                batch_count += 1
                if batch_count > skipped_batches:
                    micro.append(self.collate_fn(samples))
                    if len(micro) == self.update_freq:
                        yield self._stack_micro(micro)
                        micro = []
                samples = []
        if samples and not self.drop_last:
            n_valid = len(samples)
            while len(samples) < bsz:
                samples.append(samples[-1])
            batch = self.collate_fn(samples)
            batch["n_valid"] = n_valid
            batch_count += 1
            if batch_count > skipped_batches:
                micro.append(batch)
        if micro:
            # flush an incomplete accumulation group as a single-step batch
            for m in micro:
                yield self._stack_micro([m])

    def _stack_micro(self, micro: List[Dict[str, Any]]):
        if self.update_freq == 1 or len(micro) == 1:
            return micro[0]
        import jax

        return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *micro)

    def next_epoch_itr(self, shuffle: Optional[bool] = None):
        if shuffle is not None:
            self.shuffle = shuffle
        if self.iterations_in_epoch == 0:
            pass  # fresh epoch
        it = self._iter_batches()
        if self.prefetch > 0:
            it = _prefetch_iter(it, self.prefetch)
        self._cur = self._counting(it)
        return self._cur

    def _counting(self, it):
        for batch in it:
            self.iterations_in_epoch += 1
            yield batch
        self.iterations_in_epoch = 0
        self.epoch += 1

    def end_of_epoch(self) -> bool:
        return self.iterations_in_epoch == 0

    def __iter__(self):
        return self.next_epoch_itr()

    # --------------------------------------------------------------- state
    def state_dict(self) -> Dict[str, Any]:
        return {"epoch": self.epoch, "iterations_in_epoch": self.iterations_in_epoch}

    def load_state_dict(self, state: Dict[str, Any]):
        self.epoch = state.get("epoch", 1)
        self.iterations_in_epoch = state.get("iterations_in_epoch", 0)


def _prefetch_iter(it: Iterator, depth: int) -> Iterator:
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # propagate into the consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
