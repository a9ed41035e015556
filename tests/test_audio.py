"""Native audio decoder (WAV + FLAC) round-trip tests."""

import pathlib
import struct

import numpy as np
import pytest

from dphubert_tpu.data.audio import _native_lib, audio_info, load_audio

from tests.flac_encoder import encode_flac

HAVE_NATIVE = _native_lib() is not None


def _write_wav16(path, pcm: np.ndarray, sr=16000):
    """pcm: (channels, time) int16."""
    inter = pcm.T.reshape(-1).astype("<i2").tobytes()
    with open(path, "wb") as f:
        ch = pcm.shape[0]
        f.write(b"RIFF" + struct.pack("<I", 36 + len(inter)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * 2 * ch,
                                      2 * ch, 16))
        f.write(b"data" + struct.pack("<I", len(inter)) + inter)


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32767, size=(1, 12345), dtype=np.int16)
    _write_wav16(tmp_path / "x.wav", pcm)
    wave, sr = load_audio(tmp_path / "x.wav")
    assert sr == 16000 and wave.shape == (1, 12345)
    np.testing.assert_allclose(wave[0], pcm[0] / 32768.0, atol=1e-6)
    n, sr2, ch = audio_info(tmp_path / "x.wav")
    assert (n, sr2, ch) == (12345, 16000, 1)


def test_wav_stereo(tmp_path):
    rng = np.random.default_rng(1)
    pcm = rng.integers(-20000, 20000, size=(2, 5000), dtype=np.int16)
    _write_wav16(tmp_path / "s.wav", pcm)
    wave, sr = load_audio(tmp_path / "s.wav")
    assert wave.shape == (2, 5000)
    np.testing.assert_allclose(wave, pcm / 32768.0, atol=1e-6)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native decoder not built")
@pytest.mark.parametrize(
    "mode,stereo,porder,escape",
    [
        ("constant", "independent", 0, False),
        ("verbatim", "independent", 0, False),
        ("fixed0", "independent", 0, False),
        ("fixed1", "independent", 0, False),
        ("fixed2", "independent", 2, False),
        ("fixed1", "independent", 0, True),   # rice escape
        ("lpc", "independent", 1, False),
        ("fixed1", "left_side", 0, False),
        ("fixed1", "mid_side", 0, False),
    ],
)
def test_flac_roundtrip(tmp_path, mode, stereo, porder, escape):
    rng = np.random.default_rng(42)
    ch = 2 if stereo != "independent" else 1
    n = 4096 * 2 + 1024  # two full blocks + partial tail
    if mode == "constant":
        pcm = np.full((ch, n), 777, dtype=np.int64)
    else:
        # smooth-ish signal so fixed/lpc residuals stay small
        t = np.arange(n)
        base = (3000 * np.sin(t / 50.0) + 200 * rng.standard_normal(n)).astype(
            np.int64
        )
        pcm = np.stack([base + 100 * c for c in range(ch)])
    pcm = np.clip(pcm, -32768, 32767)

    raw = encode_flac(
        pcm,
        subframe_mode=mode,
        stereo_mode=stereo,
        partition_order=porder,
        escape=escape,
    )
    path = tmp_path / "x.flac"
    path.write_bytes(raw)

    n_info, sr, ch_info = audio_info(path)
    assert (n_info, sr, ch_info) == (n, 16000, ch)

    wave, sr = load_audio(path)
    assert wave.shape == (ch, n)
    np.testing.assert_allclose(wave, pcm / 32768.0, atol=1e-7)


@pytest.mark.skipif(not HAVE_NATIVE, reason="native decoder not built")
def test_flac_bad_file(tmp_path):
    p = tmp_path / "bad.flac"
    p.write_bytes(b"fLaC" + b"\x00" * 10)
    with pytest.raises(IOError):
        load_audio(p)


def test_missing_file():
    with pytest.raises(Exception):
        load_audio("/nonexistent/file.wav")
