"""Audio actor stages over opaque ``binary`` columns.

Same contract as imagecodec.py: the SANDBOX has no audio codec
libraries (soundfile/librosa absent), so the "codec" is an honest raw
PCM s16le container (4-byte magic + u32 length) behind
:func:`decode_pcm` — swap in a real decoder per actor in
``AudioFeatureStage.__init__`` in production.  Everything Ray-side is
real and tested: the filterbank/window matrices are built ONCE per
actor (the model-load analogue, kmcp's per-worker index load,
kmcp/cmd/search.go:66-83), batches stay small because rows carry wide
binary payloads, and the per-row framing→FFT→mel pipeline is fully
vectorized numpy (public DSP formulas: Hann window, HTK mel scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SR = 16_000               #: fixed sample rate of the synthetic corpus
_MAGIC = b"PCM1"


# ------------------------------------------------------------ stub codec

def encode_pcm(samples: np.ndarray) -> bytes:
    """s16le PCM container: ``PCM1 | u32 n | n*int16``."""
    s = np.ascontiguousarray(np.asarray(samples, dtype=np.int16))
    return _MAGIC + np.uint32(len(s)).tobytes() + s.tobytes()


def decode_pcm(data: bytes) -> np.ndarray:
    """Inverse of :func:`encode_pcm`; raises for real audio formats
    (the sandbox ships no codec libraries — PRODUCTION: decode with
    soundfile here)."""
    data = bytes(data)
    if data[:4] != _MAGIC:
        raise NotImplementedError(
            "only the PCM1 sandbox container is decodable here; real "
            "audio codecs (wav/mp3/flac) need soundfile/librosa, absent "
            "from this environment")
    n = int(np.frombuffer(data[4:8], np.uint32)[0])
    return np.frombuffer(data[8:8 + 2 * n], np.int16).copy()


def make_audio_corpus(n: int, seed: int = 42) -> pa.Table:
    """Deterministic synthetic clips: each row is a 2-sine mixture whose
    frequencies/length derive from a splitmix of the row id — no RNG
    state, reproducible at any scale/partitioning."""
    from kmcp_ray.hashing import splitmix64

    ids = np.arange(n, dtype=np.uint64) + np.uint64(seed) * np.uint64(1_000_003)
    h = splitmix64(ids)
    f1 = 200.0 + (h % np.uint64(2000)).astype(np.float64)          # 200..2199 Hz
    f2 = 300.0 + ((h >> np.uint64(16)) % np.uint64(3000)).astype(np.float64)
    n_samp = (SR // 2 + (h >> np.uint64(32)) % np.uint64(SR)).astype(np.int64)
    blobs = []
    for i in range(n):
        t = np.arange(n_samp[i], dtype=np.float64) / SR
        x = 0.6 * np.sin(2 * np.pi * f1[i] * t) \
            + 0.3 * np.sin(2 * np.pi * f2[i] * t)
        blobs.append(encode_pcm(np.round(x * 20000).astype(np.int16)))
    return pa.table({
        "audio_id": pa.array([f"au{seed}_{i}" for i in range(n)],
                             pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "sr": pa.array(np.full(n, SR, np.int32), pa.int32()),
        "n_samples": pa.array(n_samp, pa.int64())})


# ------------------------------------------------------------ filterbank

def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(n_fft: int, n_mels: int, sr: int = SR) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular HTK-mel filterbank (public
    formula)."""
    n_bins = n_fft // 2 + 1
    freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mpts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2)
    hz = _mel_to_hz(mpts)
    fb = np.zeros((n_mels, n_bins))
    for i in range(n_mels):
        lo, mid, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (freqs - lo) / max(mid - lo, 1e-9)
        down = (hi - freqs) / max(hi - mid, 1e-9)
        fb[i] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


class AudioFeatureStage:
    """Actor-pool audio feature extraction: decode → Hann-windowed
    frames → rFFT power → log-mel filterbank → mean+std pooling.

    ``__init__`` builds the window and filterbank matrices once per
    actor; ``__call__`` is one vectorized framing + one batched rFFT
    per row (frames stack into a matrix — no per-sample Python).
    Emits ``(audio_id, duration_ms, n_frames, rms_milli,
    embedding: list<float32> of 2*n_mels)``.
    """

    def __init__(self, n_fft: int = 512, hop: int = 256, n_mels: int = 16):
        # PRODUCTION: import soundfile here (once per actor)
        self.n_fft, self.hop, self.n_mels = n_fft, hop, n_mels
        self.window = np.hanning(n_fft)
        self.fb = mel_filterbank(n_fft, n_mels)
        self.decode = decode_pcm

    def _embed(self, pcm: np.ndarray) -> np.ndarray:
        x = pcm.astype(np.float64) / 32768.0
        nf = 1 + max(0, (len(x) - self.n_fft)) // self.hop
        if len(x) < self.n_fft:
            x = np.pad(x, (0, self.n_fft - len(x)))
            nf = 1
        idx = (np.arange(nf)[:, None] * self.hop
               + np.arange(self.n_fft)[None, :])
        frames = x[idx] * self.window[None, :]
        power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
        logmel = np.log1p(power @ self.fb.T)          # (nf, n_mels)
        return np.concatenate((logmel.mean(axis=0),
                               logmel.std(axis=0))).astype(np.float32), nf

    def __call__(self, batch):
        bts = batch.column("bytes").to_numpy(zero_copy_only=False)
        srs = batch.column("sr").to_numpy(zero_copy_only=False)
        n = len(bts)
        dur = np.zeros(n, np.int64)
        nfr = np.zeros(n, np.int64)
        rms = np.zeros(n, np.int64)
        embs = np.zeros((n, 2 * self.n_mels), np.float32)
        for i, data in enumerate(bts):       # stub-inherent decode loop
            pcm = self.decode(data)
            dur[i] = len(pcm) * 1000 // int(srs[i])
            rms[i] = int(round(1000.0 * float(
                np.sqrt(np.mean((pcm / 32768.0) ** 2))))) if len(pcm) else 0
            embs[i], nfr[i] = self._embed(pcm)
        return pa.table({
            "audio_id": batch.column("audio_id"),
            "duration_ms": pa.array(dur, pa.int64()),
            "n_frames": pa.array(nfr, pa.int64()),
            "rms_milli": pa.array(rms, pa.int64()),
            "embedding": pa.array(list(embs), pa.list_(pa.float32()))})


def audio_features(ds, concurrency: int = 4, batch_size: int = 128,
                   **stage_kw):
    """Distributed log-mel feature extraction over an audio table —
    small batches (wide binary rows), stateful setup per actor."""
    return ds.map_batches(AudioFeatureStage, batch_format="pyarrow",
                          fn_constructor_kwargs=stage_kw or None,
                          concurrency=concurrency, batch_size=batch_size,
                          num_cpus=1)
