"""Worker for tests/test_multihost.py: one host process of a 2-process
jax.distributed CPU cluster running a real sharded Trainer.fit window."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    import numpy as np

    from ofasys_tpu import GeneralistModel, Task, Trainer
    from ofasys_tpu.configure import TrainerConfig
    from ofasys_tpu.parallel.distributed import distributed_init

    rank, world = distributed_init()
    assert world == 2, f"expected 2 processes, got {world}"
    assert len(jax.devices()) == 8, jax.devices()

    words = ["red", "blue", "green", "bird", "dog", "cat"]
    rng = np.random.default_rng(0)  # identical data on both hosts; iterator shards by rank
    recs = [{"src": " ".join(words[j] for j in rng.integers(0, 6, 4)),
             "tgt": " ".join(words[j] for j in rng.integers(0, 6, 3))}
            for _ in range(64)]
    task = Task(name="mh", instruction="[TEXT:src] -> [TEXT:tgt]")
    task.cfg.dataset.batch_size = 8  # per host -> global 16 over 8 devices
    task.add_dataset(recs, "train")

    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 1
    model.cfg.dropout = 0.0

    cfg = TrainerConfig()
    cfg.checkpoint.no_save = True
    cfg.optimization.lr = (5e-3,)
    trainer = Trainer(cfg)
    state = trainer.fit(model, [task], max_update=3)
    assert trainer.dp_rank == rank and trainer.dp_procs == 2
    assert int(state.step) == 3
    loss = trainer.meters["mh:loss"].avg
    assert np.isfinite(loss), loss
    print(f"MULTIHOST_OK rank={rank} loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
