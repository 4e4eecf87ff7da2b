"""text_phone preprocessor + CTC aux loss, global CMVN, audio_embed,
imagepretrain — the round-2 registry close-out (reference
preprocessor/default/{text.py:404-509,audio.py:485-567,phone.py},
engine/criterion/speech_to_text_loss.py:206-260,
generator/speech_generator.py:73-200)."""

import numpy as np
import pytest

from ofasys_tpu import GeneralistModel, Task, Trainer
from ofasys_tpu.configure import ConfigStore, TrainerConfig


@pytest.fixture(autouse=True)
def _reset():
    yield
    ConfigStore().reset()


def make_wav(freq=440.0, dur=0.3, sr=16000):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_registry_has_full_preprocess_inventory():
    import ofasys_tpu.task  # noqa: F401 — triggers registration

    names = set(ConfigStore().names("ofasys.preprocess"))
    required = {
        "text", "phone", "text_phone", "image", "imagenet", "imagepretrain",
        "image_vqgan", "box", "audio", "audio_embed", "video", "motion_6d",
        "struct", "database", "category",
    }
    assert required <= names, f"missing: {required - names}"
    assert len(names) >= 15


def test_text_phone_map_and_collate():
    """Target slots get BPE text targets AND phonemized encoder_target."""
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.preprocessor.general import GeneralPreprocess
    from ofasys_tpu.preprocessor.instruction import Instruction

    d = Dictionary()
    gp = GeneralPreprocess(d, active=["text", "text_phone", "audio"])
    pre = gp.name2pre["text_phone"]
    # hermetic g2p: deterministic letter mapping
    from ofasys_tpu.preprocessor.struct import hermetic_g2p

    assert hermetic_g2p("ab") == ["AH", "B"]

    ists = []
    for txt in ("cab", "bad"):
        ist = Instruction(
            "[AUDIO:wav] transcribe -> [TEXT:txt,preprocess=text_phone]",
            split="train",
        ).format(wav=(make_wav(dur=0.1), 16000), txt=txt)
        ists.append(gp(ist))
    sample = gp.collate(ists)
    assert "encoder_target" in sample
    et = sample["encoder_target"]
    assert et.shape[0] == 2
    start, end = d.get_start_end_idx("<phone>")
    valid = et[et != d.pad()]
    phone_rows = valid[valid != d.eos()]
    assert ((phone_rows >= start) & (phone_rows < end)).all()
    # "cab" -> K AH B: 3 phones + eos
    assert (et[0] != d.pad()).sum() == 4
    # decoder target is ordinary text (decodes back through BPE)
    txt = gp.name2pre["text_phone"].decode(
        np.asarray([t for t in sample["target"][0] if t != d.pad() and t != d.eos()])
    )
    assert "cab" in txt


def test_asr_text_phone_ctc_trains():
    """speech_to_text_loss with ctc_weight>0 over text_phone targets: the
    CE+CTC sum trains and both components log finite."""
    recs = [{"wav": (make_wav(200 + 100 * (i % 4)), 16000),
             "txt": ["low", "mid", "hi", "top"][i % 4]} for i in range(16)]
    task = Task(
        name="asr_ctc",
        instruction="[AUDIO:wav] what is the transcription? -> [TEXT:txt,preprocess=text_phone]",
        criterion="speech_to_text_loss",
    )
    ConfigStore().get("ofasys.preprocess", "audio").config.max_frames = 64
    ConfigStore().get("ofasys.criterion", "speech_to_text_loss").config.ctc_weight = 0.5
    task.cfg.dataset.batch_size = 8
    task.add_dataset(recs, "train")
    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 2
    cfg = TrainerConfig()
    cfg.checkpoint.no_save = True
    trainer = Trainer(cfg)
    trainer.fit(model, [task], max_update=6)
    assert np.isfinite(trainer.meters["asr_ctc:loss"].avg)
    assert "asr_ctc:ctc_loss" in trainer.meters
    assert np.isfinite(trainer.meters["asr_ctc:ctc_loss"].avg)
    assert trainer.meters["asr_ctc:ctc_loss"].avg > 0


def test_global_cmvn_norm_and_denorm(tmp_path):
    """cmvn='global' normalizes with corpus stats; the speech generator
    denormalizes back (reference speech_generator.py:84-200 gcmvn)."""
    from ofasys_tpu.preprocessor.audio import AudioPreprocess, AudioPreprocessConfig
    from ofasys_tpu.preprocessor.dictionary import Dictionary

    mean = np.linspace(-2.0, 2.0, 80).astype(np.float32)
    std = np.linspace(0.5, 1.5, 80).astype(np.float32)
    p = tmp_path / "gcmvn.npz"
    np.savez(p, mean=mean, std=std)

    d = Dictionary()
    cfg = AudioPreprocessConfig(cmvn="global", gcmvn_stats_path=str(p),
                                specaugment=False)
    pre = AudioPreprocess(d, cfg)
    feats = pre.extract((make_wav(), 16000))
    assert feats.shape[1] == 80

    # round-trip through the generator's denorm restores raw fbank
    from ofasys_tpu.generator.speech_generator import AutoRegressiveSpeechGenerator

    gen = AutoRegressiveSpeechGenerator.__new__(AutoRegressiveSpeechGenerator)
    gen.num_mels = 80
    gen.gcmvn_mean, gen.gcmvn_std = pre.gcmvn_stats()
    raw = feats * std[None, :] + mean[None, :]
    np.testing.assert_allclose(gen.gcmvn_denormalize(feats), raw, rtol=1e-5)

    # misconfiguration fails loudly
    with pytest.raises(ValueError):
        AudioPreprocess(d, AudioPreprocessConfig(cmvn="global"))


def test_tts_generator_gets_gcmvn_from_task(tmp_path):
    """TextToSpeechTask.build_generator auto-wires the audio preprocessor's
    gcmvn stats into the generator."""
    mean = np.zeros(80, np.float32) + 3.0
    std = np.ones(80, np.float32) * 2.0
    p = tmp_path / "gcmvn.npz"
    np.savez(p, mean=mean, std=std)

    task = Task(
        name="tts_g",
        instruction="[TEXT:txt] -> [AUDIO:wav,adaptor=audio_tgt_fbank]",
        criterion="ofa_tacotron2",
    )
    node = ConfigStore().get("ofasys.preprocess", "audio")
    node.config.cmvn = "global"
    node.config.gcmvn_stats_path = str(p)
    node.config.max_frames = 16
    recs = [{"txt": "hi", "wav": (make_wav(dur=0.1), 16000)}]
    task.cfg.dataset.batch_size = 1
    task.add_dataset(recs, "train")
    from ofasys_tpu.preprocessor.dictionary import Dictionary

    task.initialize(Dictionary())
    model = GeneralistModel(arch="tiny")
    model.cfg.encoder.layers = model.cfg.decoder.layers = 1
    gen = task.build_generator(model, max_iter=4)
    assert gen.gcmvn_mean is not None
    np.testing.assert_allclose(gen.gcmvn_mean, mean)
    # denorm applies stats
    x = np.zeros((5, 80), np.float32)
    np.testing.assert_allclose(gen.gcmvn_denormalize(x), np.full((5, 80), 3.0))


def test_audio_embed_preprocess():
    """audio_embed: precomputed (T, dim) features cut/padded to a fixed
    window (reference default/audio.py:61-85)."""
    import base64

    from ofasys_tpu.preprocessor.audio import AudioEmbedPreprocess, AudioEmbedPreprocessConfig
    from ofasys_tpu.preprocessor.dictionary import Dictionary
    from ofasys_tpu.preprocessor.instruction import Slot
    from ofasys_tpu import ModalityType

    d = Dictionary()
    cfg = AudioEmbedPreprocessConfig(audio_feature_dim=8, audio_feature_length=6)
    pre = AudioEmbedPreprocess(d, cfg)

    def make_slot(value):
        s = Slot(modality=ModalityType.AUDIO, is_src=True, value=value)
        s.preprocess = "audio_embed"
        return s

    # ndarray form, shorter than window -> zero-padded
    s1 = pre.map(make_slot(np.ones((4, 8), np.float32)))
    assert s1.value["inputs"].shape == (6, 8)
    assert (s1.value["inputs"][4:] == 0).all()

    # base64 big-endian form with start_index (reference parity)
    feats = np.arange(80, dtype=">f4").reshape(10, 8)
    s2 = pre.map(make_slot({"data": base64.b64encode(feats.tobytes()), "start_index": 2}))
    np.testing.assert_allclose(s2.value["inputs"][0], feats[2].astype(np.float32))

    out = pre.collate([s1, s2])
    assert out.net_input_slot.value["inputs"].shape == (2, 6, 8)


def test_hifigan_odd_kernel_rate_fails_loudly():
    """ADVICE r2: odd kernel-minus-rate breaks the SAME-padding parity —
    must assert, not silently misalign."""
    import jax
    import jax.numpy as jnp

    from ofasys_tpu.model.hifigan import HifiGanConfig, HifiGanGenerator

    cfg = HifiGanConfig(upsample_rates=(8,), upsample_kernel_sizes=(15,),
                        upsample_initial_channel=32)
    m = HifiGanGenerator(cfg)
    with pytest.raises(AssertionError, match="must be even"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, cfg.num_mels)))


def test_converted_param_check_catches_truncation(tmp_path):
    """ADVICE r2: a truncated/mismatched converted checkpoint raises with
    leaf names at load time instead of an opaque apply-time error."""
    import jax
    import jax.numpy as jnp

    from ofasys_tpu.model.hifigan import HifiGanConfig, HifiGanGenerator
    from ofasys_tpu.utils.torch_import import check_converted_params

    cfg = HifiGanConfig(upsample_rates=(4,), upsample_kernel_sizes=(8,),
                        upsample_initial_channel=16)
    m = HifiGanGenerator(cfg)
    dummy = jnp.zeros((1, 8, cfg.num_mels))
    good = m.init(jax.random.PRNGKey(0), dummy)["params"]
    check_converted_params(good, m, dummy, "ok")  # passes

    bad = dict(good)
    bad.pop("conv_post")
    with pytest.raises(ValueError, match="conv_post"):
        check_converted_params(bad, m, dummy, "truncated")
