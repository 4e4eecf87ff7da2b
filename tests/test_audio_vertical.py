"""Audio vertical: fbank features, ASR task forward, TTS train + AR decode."""

import jax
import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, Task, Trainer
from ofasys_tpu.configure import ConfigStore, TrainerConfig
from ofasys_tpu.utils.audio_utils import griffin_lim, load_wav, logmel_fbank, spec_augment


@pytest.fixture(autouse=True)
def _reset():
    yield
    ConfigStore().reset()


def make_wav(freq=440.0, dur=0.3, sr=16000):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_fbank_shapes_and_energy():
    wav = make_wav()
    feats = logmel_fbank(wav, 16000, num_mels=80)
    # 0.3s @10ms shift -> ~28-30 frames
    assert feats.shape[1] == 80 and 25 <= feats.shape[0] <= 31
    assert np.isfinite(feats).all()
    # a 440Hz tone concentrates energy in low mel bins
    assert feats[:, :20].mean() > feats[:, 60:].mean()


def test_spec_augment_masks():
    rng = np.random.default_rng(0)
    feats = np.ones((100, 80), np.float32)
    out = spec_augment(feats, rng)
    assert (out == 0).any() and out.shape == feats.shape


def test_griffin_lim_invertible_shape():
    wav = make_wav()
    feats = logmel_fbank(wav)
    rec = griffin_lim(feats, n_iter=4)
    assert rec.ndim == 1 and len(rec) > len(wav) // 2
    assert np.abs(rec).max() <= 1.0


def test_asr_task_trains():
    rng = np.random.default_rng(0)
    recs = [{"wav": (make_wav(200 + 100 * (i % 4)), 16000), "txt": ["low", "mid", "high", "top"][i % 4]}
            for i in range(16)]
    task = Task(name="asr", instruction="[AUDIO:wav] what is the transcription? -> [TEXT:txt]",
                criterion="speech_to_text_loss")
    ConfigStore().get("ofasys.preprocess", "audio").config.max_frames = 64
    task.cfg.dataset.batch_size = 8
    task.add_dataset(recs, "train")
    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 2
    cfg = TrainerConfig()
    cfg.checkpoint.no_save = True
    trainer = Trainer(cfg)
    trainer.fit(model, [task], max_update=6)
    assert np.isfinite(trainer.meters["asr:loss"].avg)
    assert "audio_fbank" in model.net.active_adaptors


def test_tts_task_trains_and_decodes():
    rng = np.random.default_rng(0)
    recs = [{"txt": ["low tone", "high tone"][i % 2],
             "wav": (make_wav(200 + 400 * (i % 2), dur=0.2), 16000)} for i in range(16)]
    task = Task(
        name="tts",
        instruction="[TEXT:txt] -> [AUDIO:wav,adaptor=audio_tgt_fbank]",
        criterion="ofa_tacotron2",
    )
    ConfigStore().get("ofasys.preprocess", "audio").config.max_frames = 32
    ConfigStore().get("ofasys.preprocess", "audio").config.specaugment = False
    task.cfg.dataset.batch_size = 8
    task.add_dataset(recs, "train")
    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 2
    cfg = TrainerConfig()
    cfg.checkpoint.no_save = True
    trainer = Trainer(cfg)
    trainer.fit(model, [task], max_update=6)
    assert np.isfinite(trainer.meters["tts:loss"].avg)
    assert "audio_tgt_fbank" in model.net.active_adaptors

    # AR speech decode produces mel frames + waveform postprocess
    from ofasys_tpu.generator import AutoRegressiveSpeechGenerator

    it = task.get_batch_iterator("train", fresh=True)
    batch = next(it.next_epoch_itr(shuffle=False))
    gen = AutoRegressiveSpeechGenerator(model, num_mels=80, max_iter=8)
    outs = gen.generate(trainer.state.params, batch)
    assert len(outs) == 8
    assert outs[0].feature.shape[1] == 80
    task.general_preprocess.postprocess(outs, batch)
    assert outs[0].waveform is not None and outs[0].waveform.ndim == 1


def test_asr_extra_encoder_layers_train():
    """Audio-only pre-encoder stack inside the adaptor (reference
    adaptor/audio.py:338): extra_encoder_layers=1 adds params and trains."""
    recs = [{"wav": (make_wav(200 + 100 * (i % 4)), 16000),
             "txt": ["low", "mid", "high", "top"][i % 4]} for i in range(16)]
    task = Task(name="asr_x", instruction="[AUDIO:wav] what is the transcription? -> [TEXT:txt]",
                criterion="speech_to_text_loss")
    ConfigStore().get("ofasys.preprocess", "audio").config.max_frames = 64
    ConfigStore().get("ofasys.adaptor", "audio_fbank").config.extra_encoder_layers = 1
    try:
        task.cfg.dataset.batch_size = 8
        task.add_dataset(recs, "train")
        model = GeneralistModel(arch="tiny")
        model.cfg.encoder.layers = model.cfg.decoder.layers = 1
        cfg = TrainerConfig()
        cfg.checkpoint.no_save = True
        trainer = Trainer(cfg)
        trainer.fit(model, [task], max_update=4)
        assert np.isfinite(trainer.meters["asr_x:loss"].avg)
        flat = jax.tree_util.tree_leaves_with_path(trainer.state.params)
        names = ["/".join(str(k) for k in path) for path, _ in flat]
        assert any("extra_layers_0" in n for n in names), "pre-encoder stack params missing"
    finally:
        ConfigStore().get("ofasys.adaptor", "audio_fbank").config.extra_encoder_layers = 0
