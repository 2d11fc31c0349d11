"""VP8L (WebP lossless) codec pins: every decoder path is exercised
through spec-valid streams from the module's own encoder, with the
decoded RGBA raster compared byte-exact to the known source pixels —
the same self-encoder strategy as tests/test_jpeg.py."""

from __future__ import annotations

import hashlib

import pytest

from mapreduce_kmeans_clustering_spark.operators.webp import (
    _ct_delta,
    _fwd_color,
    _inv_color,
    decode_webp,
    encode_webp_lossless,
)


def _raster(width: int, height: int, seed: int, alpha: bool = False) -> bytes:
    """Deterministic md5-chain RGBA raster (the house generator
    family)."""
    out = bytearray()
    state = str(seed).encode()
    while len(out) < 4 * width * height:
        state = hashlib.md5(state).digest()
        out += state
    out = out[: 4 * width * height]
    if not alpha:
        for i in range(3, len(out), 4):
            out[i] = 255
    return bytes(out)


def _roundtrip(pixels: bytes, w: int, h: int, **opts) -> None:
    blob = encode_webp_lossless(pixels, w, h, **opts)
    got = decode_webp(blob)
    assert got["width"] == w and got["height"] == h
    assert got["channels"] == 4
    assert got["pixels"] == pixels, f"pixel mismatch under {opts}"


def test_plain_literals_roundtrip():
    _roundtrip(_raster(13, 7, 1), 13, 7)


def test_alpha_channel_roundtrip():
    _roundtrip(_raster(9, 9, 2, alpha=True), 9, 9)


def test_subtract_green_roundtrip():
    _roundtrip(_raster(16, 8, 3), 16, 8, subtract_green=True)


@pytest.mark.parametrize("mode", list(range(14)))
def test_every_predictor_mode_roundtrips(mode):
    # 20x19 spans multiple 16x16 predictor blocks, exercising the
    # block-image lookup as well as all border-forced modes
    _roundtrip(_raster(20, 19, 100 + mode), 20, 19, predictor_mode=mode)


def test_cross_color_transform_roundtrip():
    _roundtrip(
        _raster(17, 6, 4), 17, 6, color_mults=(0x40, 0xC0, 0x15)
    )


def test_color_transform_inverse_matches_forward():
    # direct unit pin of the fixed-point math, independent of streams
    pix = []
    st = b"ct"
    for _ in range(64):
        st = hashlib.md5(st).digest()
        pix.append(int.from_bytes(st[:4], "big") | 0xFF000000)
    mults = (0x7F, 0x80, 0x01)  # max positive, max negative, tiny
    fwd = _fwd_color(list(pix), 8, 8, mults)
    g2r, g2b, r2b = mults
    mpix = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
    back = _inv_color(list(fwd), 8, 8, 4, 1, [mpix])
    assert back == pix
    assert _ct_delta(0x80, 0x80) == (-128 * -128) >> 5


@pytest.mark.parametrize("n_colors", [2, 4, 13, 200])
def test_palette_roundtrip_all_bundle_widths(n_colors):
    # build a raster drawing from exactly n_colors distinct pixels;
    # width 21 is deliberately not a multiple of any bundle factor
    colors = []
    st = str(n_colors).encode()
    while len(colors) < n_colors:
        st = hashlib.md5(st).digest()
        c = st[:3] + b"\xff"
        if c not in colors:
            colors.append(c)
    w, h = 21, 6
    px = bytearray()
    for i in range(w * h):
        px += colors[(i * 7) % n_colors]
    _roundtrip(bytes(px), w, h, palette=True)


def test_color_cache_roundtrip():
    # few distinct colors -> heavy cache-hit traffic
    base = _raster(4, 4, 5)
    px = bytearray()
    for i in range(18 * 11):
        j = (i * 5) % 16
        px += base[4 * j : 4 * j + 4]
    _roundtrip(bytes(px), 18, 11, cache_bits=4)


def test_lz77_runs_roundtrip_plain_and_plane_coded():
    # constant stretches -> distance-1 copies; both distance spellings
    px = bytearray()
    for row in range(9):
        px += bytes((row * 20, 60, 200, 255)) * 24
    _roundtrip(bytes(px), 24, 9, lz77_runs=True)
    _roundtrip(bytes(px), 24, 9, lz77_runs=True, plane_code_dist1=True)
    _roundtrip(bytes(px), 24, 9, lz77_runs=True, cache_bits=3)


def test_meta_prefix_image_roundtrip():
    _roundtrip(_raster(22, 10, 6), 22, 10, meta_trivial=True)


def test_combined_transforms_roundtrip():
    _roundtrip(
        _raster(19, 12, 7), 19, 12, subtract_green=True, predictor_mode=11
    )
    _roundtrip(
        _raster(19, 12, 8),
        19,
        12,
        subtract_green=True,
        color_mults=(0x10, 0xF0, 0x33),
        predictor_mode=12,
        cache_bits=2,
    )


def test_one_pixel_image():
    _roundtrip(b"\x12\x34\x56\xff", 1, 1)


def test_lossy_vp8_refused_by_name():
    blob = (
        b"RIFF"
        + (12).to_bytes(4, "little")
        + b"WEBP"
        + b"VP8 "
        + (4).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
    )
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_webp(blob)


def test_garbage_rejected():
    with pytest.raises(ValueError):
        decode_webp(b"not a webp at all")
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x04\x00\x00\x00WEBP")  # no VP8L chunk
    good = encode_webp_lossless(_raster(5, 5, 9), 5, 5)
    with pytest.raises(ValueError):
        decode_webp(good[:-6])  # truncated bitstream


def test_decode_media_dispatches_webp():
    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        decode_media,
    )

    px = _raster(11, 5, 10)
    got = decode_media(encode_webp_lossless(px, 11, 5), "image")
    assert (got["width"], got["height"], got["channels"]) == (11, 5, 4)
    assert got["pixels"] == px
