"""JPEG codec (operators/jpeg.py): roundtrip accuracy against the
known source raster (the PNG/BMP self-encoded-fixture pattern), every
decoder feature path (4:4:4 / 4:2:2 / 4:2:0 upsampling, grayscale,
restart markers, progressive spectral selection + successive
approximation pinned byte-identical to the sequential decode),
dispatch through decode_media, fuzz for clean failure, and honest
NotImplementedError on lossless/hierarchical files. Pure-function
tests — no Spark session needed except the one executor-path check."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mapreduce_kmeans_clustering_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    jpeg_test_pixels,
)
from mapreduce_kmeans_clustering_spark.operators.multimodal import decode_media


def _err(w, h, seed, **kw):
    src = np.frombuffer(jpeg_test_pixels(w, h, seed), dtype=np.uint8).astype(int)
    d = decode_jpeg(encode_jpeg(w, h, seed, **kw))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 3)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).astype(int)
    return np.abs(src - got)


def test_solid_gray_roundtrips_exactly():
    """R=G=B=128 maps to Y=128, Cb=Cr=128: every level-shifted block is
    all-zero coefficients, so the lossy pipeline is exact."""
    solid = bytes([128, 128, 128]) * (16 * 16)
    d = decode_jpeg(encode_jpeg(16, 16, 0, pixels=solid))
    assert set(d["pixels"]) == {128}


@pytest.mark.parametrize("dims", [(24, 17, 3), (8, 8, 0), (33, 9, 7)])
def test_roundtrip_444_tight(dims):
    e = _err(*dims, quality=90, subsampling="444")
    assert e.mean() < 3.0 and e.max() <= 12


@pytest.mark.parametrize("dims", [(24, 17, 3), (33, 9, 7)])
def test_roundtrip_420_bounded(dims):
    """Chroma subsampling is real loss on the gradient channels; the
    bound is loose on purpose (it tests decode correctness, not the
    quality setting)."""
    e = _err(*dims, quality=90, subsampling="420")
    assert e.mean() < 12.0 and e.max() <= 48


def test_grayscale_single_component():
    w, h, seed = 24, 17, 3
    d = decode_jpeg(encode_jpeg(w, h, seed, grayscale=True))
    assert (d["width"], d["height"], d["channels"]) == (w, h, 1)
    src = (
        np.frombuffer(jpeg_test_pixels(w, h, seed), dtype=np.uint8)
        .reshape(h, w, 3)
        .astype(float)
    )
    y = 0.299 * src[:, :, 0] + 0.587 * src[:, :, 1] + 0.114 * src[:, :, 2]
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w).astype(float)
    assert np.abs(y - got).mean() < 3.0


@pytest.mark.parametrize("sub", ["444", "420"])
def test_restart_markers_decode_identically(sub):
    """DRI/RSTn must not change the decoded image: the restarted
    stream resets DC predictors and byte-aligns, nothing else."""
    w, h, seed = 40, 33, 5
    plain = decode_jpeg(encode_jpeg(w, h, seed, subsampling=sub))
    rst = decode_jpeg(encode_jpeg(w, h, seed, subsampling=sub, restart_interval=3))
    assert plain["pixels"] == rst["pixels"]


def test_decode_media_dispatches_jpeg():
    payload = encode_jpeg(12, 10, 1)
    d = decode_media(payload, "image")
    assert (d["width"], d["height"], d["channels"]) == (12, 10, 3)
    assert len(d["pixels"]) == 12 * 10 * 3


def test_lossless_sof_raises_named_not_implemented():
    """Flip the fixture's SOF0 marker to SOF3 (lossless): the decoder
    must name the unsupported coding process, not mis-decode.
    (Progressive SOF2 is genuinely decoded since round 5 — see the
    identity tests below.)"""
    payload = bytearray(encode_jpeg(8, 8, 0))
    i = payload.find(b"\xff\xc0")
    assert i > 0
    payload[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg(bytes(payload))


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_progressive_decodes_identical_to_sequential(sub):
    """The progressive writer emits the SAME quantized coefficients as
    the sequential writer through the two-level scan script (DC Al=1 +
    refinement, AC Al=1 + refinement), so the decoded pixels must be
    BYTE-identical — this exercises spectral selection, successive
    approximation (first + refinement passes for both DC and AC),
    EOBRUN coding, and the non-interleaved AC block geometry, with
    zero tolerance."""
    for dims in ((24, 17, 3), (8, 8, 0), (33, 9, 7)):
        w, h, seed = dims
        base = decode_jpeg(encode_jpeg(w, h, seed, subsampling=sub))
        prog = decode_jpeg(
            encode_jpeg(w, h, seed, subsampling=sub, progressive=True)
        )
        assert prog["pixels"] == base["pixels"], dims


def test_progressive_grayscale_and_restart_identities():
    """Non-interleaved DC scans (grayscale) and restart markers in
    every progressive scan kind (DC-MCU and AC-block intervals) must
    not change a single pixel."""
    g_prog = decode_jpeg(encode_jpeg(24, 17, 3, grayscale=True, progressive=True))
    g_base = decode_jpeg(encode_jpeg(24, 17, 3, grayscale=True))
    assert g_prog["pixels"] == g_base["pixels"] and g_prog["channels"] == 1
    a = decode_jpeg(encode_jpeg(40, 33, 5, subsampling="420", progressive=True))
    b = decode_jpeg(
        encode_jpeg(
            40, 33, 5, subsampling="420", progressive=True, restart_interval=3
        )
    )
    assert a["pixels"] == b["pixels"]


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_truncated_scan_raises():
    payload = encode_jpeg(16, 16, 2)
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(payload[: len(payload) // 2])


def test_quality_monotonic():
    """Lower quality must not reduce error on the same content (sanity
    that the IJG table scaling is wired in)."""
    lo = _err(24, 17, 3, quality=25).mean()
    hi = _err(24, 17, 3, quality=95).mean()
    assert hi < lo


def test_annex_k_tables_at_q50_verbatim():
    """quality=50 must emit Table K.1 verbatim in the DQT segment —
    pins the scaling identity and the zigzag DQT order."""
    from mapreduce_kmeans_clustering_spark.operators.jpeg import QT_LUMA, ZIGZAG

    payload = encode_jpeg(8, 8, 0, quality=50)
    i = payload.find(b"\xff\xdb")
    seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
    assert seglen == 67  # 2 len + 1 id + 64 entries
    zz = list(payload[i + 5 : i + 5 + 64])
    assert zz == [QT_LUMA[z] for z in ZIGZAG]


@pytest.mark.parametrize("dims", [(24, 17, 3), (33, 9, 7)])
def test_roundtrip_422_bounded(dims):
    """4:2:2 sits between 4:4:4 and 4:2:0: chroma halved horizontally
    only — the decoder's asymmetric (2,1) upsampling path."""
    e = _err(*dims, quality=90, subsampling="422")
    assert e.mean() < 8.0 and e.max() <= 30


def test_restart_markers_422():
    plain = decode_jpeg(encode_jpeg(40, 33, 5, subsampling="422"))
    rst = decode_jpeg(encode_jpeg(40, 33, 5, subsampling="422", restart_interval=2))
    assert plain["pixels"] == rst["pixels"]


def test_corrupted_bytes_raise_cleanly_never_hang():
    """Byte-level fuzz over a valid fixture: flipping any single byte
    (and truncating at any point) must either still decode or raise a
    normal exception — never hang or die on a non-Exception. Guards
    the marker-walk against zero segment lengths and the bit reader
    against running off the buffer."""
    base = encode_jpeg(16, 12, 4)
    import random

    rng = random.Random(7)
    for _ in range(120):
        b = bytearray(base)
        i = rng.randrange(len(b))
        b[i] ^= 1 << rng.randrange(8)
        try:
            decode_jpeg(bytes(b))
        except (ValueError, NotImplementedError, IndexError, struct.error, KeyError):
            pass
    for cut in range(0, len(base), 37):
        try:
            decode_jpeg(base[:cut])
        except (ValueError, NotImplementedError, IndexError, struct.error):
            pass


def test_corrupted_progressive_bytes_raise_cleanly():
    """Same fuzz posture for the progressive path: bit flips and
    truncations either decode or raise normally — the multi-scan
    marker walk and EOBRUN state must never hang."""
    import random

    base = encode_jpeg(16, 12, 4, progressive=True)
    rng = random.Random(11)
    for _ in range(120):
        b = bytearray(base)
        i = rng.randrange(len(b))
        b[i] ^= 1 << rng.randrange(8)
        try:
            decode_jpeg(bytes(b))
        except (ValueError, NotImplementedError, IndexError, struct.error, KeyError):
            pass
    for cut in range(0, len(base), 41):
        try:
            decode_jpeg(base[:cut])
        except (ValueError, NotImplementedError, IndexError, struct.error):
            pass
