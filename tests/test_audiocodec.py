"""Audio stage tests: stub codec round-trip, filterbank physics, actor
plumbing determinism (mirrors tests/test_imagecodec.py)."""

import numpy as np
import pyarrow as pa
import pytest

from kmcp_ray import audiocodec as ac


def test_pcm_roundtrip_exact():
    x = (np.sin(np.linspace(0, 20, 5000)) * 12345).astype(np.int16)
    assert np.array_equal(ac.decode_pcm(ac.encode_pcm(x)), x)
    with pytest.raises(NotImplementedError):
        ac.decode_pcm(b"RIFF" + b"\x00" * 64)     # real formats refused


def test_mel_filterbank_shape_and_coverage():
    fb = ac.mel_filterbank(512, 16)
    assert fb.shape == (16, 257)
    assert (fb >= 0).all()
    # every filter has support; interior bins covered by some filter
    assert (fb.sum(axis=1) > 0).all()
    assert (fb[:, 5:-5].sum(axis=0) > 0).all()


def _clip(freq, n=8000, amp=0.5):
    t = np.arange(n) / ac.SR
    return ac.encode_pcm(np.round(
        amp * np.sin(2 * np.pi * freq * t) * 32000).astype(np.int16))


def test_audio_features_stage(ray_session):
    import ray.data
    t = pa.table({
        "audio_id": pa.array(["lo", "hi", "silent"], pa.string()),
        "bytes": pa.array([_clip(440.0), _clip(3000.0),
                           ac.encode_pcm(np.zeros(4000, np.int16))],
                          pa.binary()),
        "sr": pa.array([ac.SR] * 3, pa.int32()),
        "n_samples": pa.array([8000, 8000, 4000], pa.int64())})
    out = {r["audio_id"]: r
           for r in ac.audio_features(ray.data.from_arrow(t),
                                      concurrency=2).take_all()}
    n_mels = 16
    assert len(out["lo"]["embedding"]) == 2 * n_mels
    # frame count: 1 + (n - n_fft) // hop
    assert out["lo"]["n_frames"] == 1 + (8000 - 512) // 256
    assert out["silent"]["rms_milli"] == 0
    # a higher tone excites a higher mel band
    lo_peak = int(np.argmax(out["lo"]["embedding"][:n_mels]))
    hi_peak = int(np.argmax(out["hi"]["embedding"][:n_mels]))
    assert hi_peak > lo_peak
    assert out["lo"]["duration_ms"] == 8000 * 1000 // ac.SR


def test_make_audio_corpus_deterministic():
    a = ac.make_audio_corpus(5, seed=3)
    b = ac.make_audio_corpus(5, seed=3)
    assert a.equals(b)
    assert not a.equals(ac.make_audio_corpus(5, seed=4))
