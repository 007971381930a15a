"""Real-decoder multimodal tests (VERDICT r4 #8).

These tests EXERCISE the real PIL / ffmpeg paths in
``rayenc.stages.multimodal`` when the libraries are present, asserting
the outputs keep the exact schema of the deterministic fake path (the
contract every pipeline builds against). In this container neither
library exists, so both tests skip — in a deployment with PIL/ffmpeg
they run for real.

The PIL test needs no external fixture: a minimal valid grayscale PNG
is built by hand with stdlib zlib/struct, so the expected pooled
feature vector is computable in the test itself. The ffmpeg test
synthesizes its input video with ffmpeg's lavfi testsrc.
"""

from __future__ import annotations

import struct
import subprocess
import zlib

import numpy as np
import pyarrow as pa
import pytest

from rayenc.stages import multimodal as mm


def _tiny_png(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal 8-bit grayscale PNG (color type 0, filter 0 per scanline).

    Valid per the PNG spec; decodable by any compliant reader."""
    assert len(pixels) == width * height

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _media_table(payloads: list[bytes], media_type: str) -> pa.Table:
    n = len(payloads)
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "media_type": pa.array([media_type] * n, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array([16] * n, type=pa.int32()),
            "height": pa.array([16] * n, type=pa.int32()),
            "duration_s": pa.array([2.0] * n, type=pa.float32()),
        }
    )


@pytest.mark.skipif(mm._try_import_pil() is None, reason="PIL not installed")
def test_image_decoder_real_path_decodes_png():
    """With PIL present, ImageDecoder must really decode: a hand-built
    16x16 gradient PNG pools to a known feature vector (pixel mean per
    bucket / 255), which the hash-based fake cannot produce."""
    dim = 16
    pixels = bytes(range(0, 256))  # 16x16 gradient, one value per pixel
    t = _media_table([_tiny_png(16, 16, pixels)], "image/png")

    dec = mm.ImageDecoder(feature_dim=dim)
    assert dec.real
    out = dec(t)
    fake_out = mm.FakeDecoder(dim)(t)
    assert out.schema == fake_out.schema  # the cross-environment contract

    got = np.asarray(out["features"].combine_chunks().values.to_numpy()).reshape(
        -1, dim
    )[0]
    flat = np.frombuffer(pixels, dtype=np.uint8).astype(np.float32) / 255.0
    k = len(flat) // dim
    want = flat.reshape(dim, k).mean(axis=1)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # and it must differ from the fake (proof the real branch executed)
    fake = np.asarray(
        fake_out["features"].combine_chunks().values.to_numpy()
    ).reshape(-1, dim)[0]
    assert not np.allclose(got, fake)


@pytest.mark.skipif(mm._try_import_pil() is None, reason="PIL not installed")
def test_image_decoder_real_path_bad_payload_falls_back_per_row():
    """Undecodable payloads fall back to the fake PER ROW, so one corrupt
    image never poisons the batch."""
    dim = 16
    good = _tiny_png(16, 16, bytes(range(0, 256)))
    bad = b"\x89PNG not actually a png"
    t = _media_table([good, bad], "image/png")
    out = mm.ImageDecoder(feature_dim=dim)(t)
    fake = mm.FakeDecoder(dim)(t)
    assert out.schema == fake.schema
    got = np.asarray(out["features"].combine_chunks().values.to_numpy()).reshape(
        -1, dim
    )
    want_bad = np.asarray(
        fake["features"].combine_chunks().values.to_numpy()
    ).reshape(-1, dim)[1]
    np.testing.assert_allclose(got[1], want_bad)  # row 1: fake fallback
    assert not np.allclose(got[0], got[1])  # row 0: really decoded


@pytest.mark.skipif(not mm.has_ffmpeg(), reason="ffmpeg not on PATH")
def test_frame_sampler_real_path_extracts_frames(tmp_path):
    """With ffmpeg present, FrameSampler must really seek+decode frames
    from a synthesized test video, keeping the fake path's explode
    schema exactly and emitting in-range grayscale pool values."""
    video = tmp_path / "t.mp4"
    subprocess.run(
        [
            "ffmpeg", "-v", "error", "-f", "lavfi", "-i",
            "testsrc=duration=2:size=64x64:rate=8", "-pix_fmt", "yuv420p",
            str(video),
        ],
        check=True,
        timeout=60,
    )
    t = _media_table([video.read_bytes()], "video/mp4")

    fs = mm.FrameSampler(n_frames=4, feature_dim=16)
    assert fs.use_ffmpeg
    got = fs(t)
    want = mm.FakeFrameSampler(n_frames=4, feature_dim=16)(t)
    assert got.schema == want.schema
    assert got.num_rows == 4
    assert got["media_id"].to_pylist() == [0, 0, 0, 0]
    assert got["frame_idx"].to_pylist() == [0, 1, 2, 3]
    feats = np.asarray(got["features"].combine_chunks().values.to_numpy()).reshape(
        -1, 16
    )
    assert np.isfinite(feats).all() and feats.min() >= 0.0 and feats.max() <= 1.0
    # real frames, not the payload hash
    fake_feats = np.asarray(
        want["features"].combine_chunks().values.to_numpy()
    ).reshape(-1, 16)
    assert not np.allclose(feats, fake_feats)
