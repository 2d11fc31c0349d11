"""Multimodal tests: schema, Arrow batch path, determinism, and the
real stdlib decode (netpbm/PNG/BMP/GIF/TIFF/JPEG/WAV); remaining
compressed formats (MP3/WebP) and video stay a labeled
NotImplementedError (no codec packages in the container)."""

from __future__ import annotations

import pytest

from mapreduce_kmeans_clustering_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} with some text payload", "en", "src", 30 + i) for i in range(12)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    return synthesize_media(docs)


def test_media_schema_and_kinds(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shapes(media):
    out = extract_features(media)
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= v < 1.0 for v in r["features"])
        assert r["n_bytes"] > 0


def test_extract_features_deterministic_and_partitioned(media):
    a = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
    b = {
        r["media_id"]: r["features"]
        for r in extract_features(media.repartition(5)).collect()
    }
    assert a == b  # partitioning must not affect results


def test_extract_features_engines_agree(media):
    """The JVM column-expression digest path (registered) and the
    Arrow mapInPandas path (future real-inference shape) must produce
    identical rows — same md5-byte math, two execution engines."""
    jvm = {
        r["media_id"]: (r["kind"], r["n_bytes"], r["features"])
        for r in extract_features(media, engine="jvm").collect()
    }
    arrow = {
        r["media_id"]: (r["kind"], r["n_bytes"], r["features"])
        for r in extract_features(media, engine="arrow").collect()
    }
    assert jvm == arrow


def test_extract_features_jvm_plan_stays_in_jvm(media):
    """engine='jvm' must not pay a Python/Arrow round-trip; the arrow
    engine must actually use one (it's the real-decode shape)."""
    jvm_plan = extract_features(media, engine="jvm")._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in jvm_plan and "Python" not in jvm_plan
    arrow_plan = extract_features(media, engine="arrow")._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in arrow_plan


def test_extract_features_rejects_unknown_engine(media):
    with pytest.raises(ValueError, match="engine"):
        extract_features(media, engine="gpu")


def test_decode_is_a_clear_stub():
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"bytes", "image")


def test_resize_touches_only_images_and_composes(media):
    out = resize_media(media, 64, 64)
    # composable: names and types preserved (nullability may widen)
    assert out.schema.simpleString() == media.schema.simpleString()
    rows = {r["media_id"]: r for r in out.collect()}
    orig = {r["media_id"]: r for r in media.collect()}
    for mid, r in rows.items():
        if r["kind"] == "image":
            assert (r["meta"]["width"], r["meta"]["height"]) == (64, 64)
            assert r["payload"] != orig[mid]["payload"]
            assert len(r["payload"]) == max(16, 64 * 64 // 256)
        else:
            assert r["payload"] == orig[mid]["payload"]
            assert r["meta"] == orig[mid]["meta"]
    # features run unchanged on the resized table
    assert extract_features(out).count() == media.count()


def test_resize_deterministic(media):
    a = {r["media_id"]: r["payload"] for r in resize_media(media, 32, 32).collect()}
    b = {
        r["media_id"]: r["payload"]
        for r in resize_media(media.repartition(5), 32, 32).collect()
    }
    assert a == b


def test_sample_frames_counts_and_determinism(media):
    out = sample_frames(media, fps=1.0, max_frames=4).collect()
    vids = {r["media_id"]: r["meta"] for r in media.collect() if r["kind"] == "video"}
    assert {r["media_id"] for r in out} <= set(vids)
    by_vid = {}
    for r in out:
        by_vid.setdefault(r["media_id"], []).append(r)
    for mid, frames in by_vid.items():
        expected = min(4, int(vids[mid]["duration_ms"]) // 1000)
        assert len(frames) == expected
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(expected))
        for f in frames:
            assert f["ts_ms"] == f["frame_idx"] * 1000
            assert len(f["payload"]) == 16
    again = sample_frames(media.repartition(3), fps=1.0, max_frames=4).collect()
    assert sorted((r["media_id"], r["frame_idx"], bytes(r["payload"])) for r in again) == sorted(
        (r["media_id"], r["frame_idx"], bytes(r["payload"])) for r in out
    )


def test_real_decode_roundtrip_ppm_and_wav():
    """decode_media genuinely parses what encode_ppm/encode_wav emit
    (pure-stdlib formats — no codec package involved)."""
    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        decode_media,
        encode_ppm,
        encode_wav,
    )

    img = decode_media(encode_ppm(8, 6, seed=3), "image")
    assert (img["width"], img["height"], img["channels"]) == (8, 6, 3)
    assert len(img["pixels"]) == 8 * 6 * 3

    au = decode_media(encode_wav(16000, 480, seed=3), "audio")
    assert au["sample_rate"] == 16000
    assert au["n_frames"] == 480
    assert au["channels"] == 1 and au["sample_width"] == 2
    assert len(au["pcm"]) == 480 * 2


def test_real_decode_rejects_compressed_and_video():
    import struct

    from mapreduce_kmeans_clustering_spark.operators.multimodal import decode_media

    # JPEG and GIF are decoded for real since round 5: garbage bodies
    # are parse errors, not silence; lossless WebP decodes for real
    # since round 7, lossy VP8 carries the honest codec message
    with pytest.raises(ValueError):
        decode_media(b"GIF89agifdata", "image")
    with pytest.raises(NotImplementedError, match="VP8"):
        decode_media(
            b"RIFF\x10\x00\x00\x00WEBP"
            + b"VP8 \x04\x00\x00\x00\x00\x00\x00\x00",
            "image",
        )
    with pytest.raises(ValueError, match="VP8L"):
        # a WebP container with no image chunk at all is malformed
        decode_media(b"RIFF\x04\x00\x00\x00WEBP", "image")
    with pytest.raises((ValueError, IndexError, struct.error)):
        decode_media(b"\xff\xd8\xff\xe0jpegdata", "image")
    with pytest.raises(NotImplementedError, match="codec"):
        decode_media(b"ID3\x04mp3data", "audio")
    with pytest.raises(NotImplementedError, match="video"):
        decode_media(b"anything", "video")
    with pytest.raises(ValueError, match="truncated"):
        decode_media(b"P6\n4 4\n255\nxx", "image")
    # a PNG signature with garbage after it is a bad PNG, not an
    # unsupported format
    with pytest.raises(ValueError, match="IHDR"):
        decode_media(b"\x89PNG\r\n\x1a\n" + b"junk", "image")


def test_png_roundtrip_all_filters_and_color_types():
    """decode_png genuinely reconstructs what encode_png emits — and
    encode_png writes row y with filter type y % 5, so a >=5-row
    image exercises None/Sub/Up/Average/Paeth reconstruction; all
    four encodable color types roundtrip; a foreign-built palette PNG
    expands through PLTE."""
    import struct
    import zlib

    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        _PNG_MAGIC,
        decode_media,
        encode_png,
    )

    for ct, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        img = decode_media(encode_png(7, 9, seed=11, color_type=ct), "image")
        assert (img["width"], img["height"], img["channels"]) == (7, 9, ch)
        assert len(img["pixels"]) == 7 * 9 * ch
        # deterministic: same seed -> same pixels
        again = decode_media(encode_png(7, 9, seed=11, color_type=ct), "image")
        assert again["pixels"] == img["pixels"]

    # hand-built palette (color type 3) PNG: 2x2 indices into a
    # 3-entry palette
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 0, 2, 1])  # two rows, filter 0, indices
    pal = (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", plte)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    img = decode_media(pal, "image")
    assert (img["width"], img["height"], img["channels"]) == (2, 2, 3)
    assert img["pixels"] == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 255, 0]
    )


@pytest.mark.slow  # >=12 s in the idle full run (r13)
def test_decoded_stats_over_synthesized_decodable_media(spark):
    """End-to-end real-decode pass: synthesize valid PPM/WAV payloads
    executor-side, decode them back through the Arrow path, and check
    the stats against a driver-side replay of the same pure functions.
    Repartitioning must not change anything."""
    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        decode_media,
        decoded_stats,
        encode_png,
        encode_ppm,
        encode_wav,
        synthesize_decodable_media,
    )
    import struct

    ids = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    media = synthesize_decodable_media(ids)
    got = {r["media_id"]: r for r in decoded_stats(media).collect()}
    assert len(got) == 20
    for i in range(20):
        r = got[i]
        if i % 2 == 0:
            if i % 8 == 0:
                if (i // 8) % 2 == 1:
                    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
                        encode_tiff,
                    )

                    payload = encode_tiff(
                        8 + i % 8,
                        6 + i % 5,
                        i,
                        big_endian=(i // 16) % 2 == 1,
                        gray=(i // 32) % 2 == 1,
                        packbits=(i // 64) % 2 == 1,
                    )
                else:
                    payload = encode_ppm(8 + i % 8, 6 + i % 5, i)
            elif i % 8 == 4:
                from mapreduce_kmeans_clustering_spark.operators.multimodal import (
                    encode_gif,
                )

                payload = encode_gif(
                    8 + i % 8, 6 + i % 5, i, interlace=(i // 8) % 2 == 1
                )
            elif i % 8 == 2:
                ct = (0, 2, 4, 6)[(i // 4) % 4]
                payload = encode_png(8 + i % 8, 6 + i % 5, i, color_type=ct)
            else:
                from mapreduce_kmeans_clustering_spark.operators.jpeg import (
                    encode_jpeg,
                )

                payload = encode_jpeg(
                    8 + i % 8,
                    6 + i % 5,
                    i,
                    subsampling=("444", "420")[(i // 8) % 2],
                    progressive=(i // 16) % 2 == 1,
                )
            d = decode_media(payload, "image")
            assert (r["width"], r["height"]) == (d["width"], d["height"])
            assert r["mean_value"] == sum(d["pixels"]) / len(d["pixels"])
        else:
            payload = encode_wav(16000, 400 + (i % 7) * 40, i)
            d = decode_media(payload, "audio")
            assert r["sample_rate"] == 16000
            assert r["n_samples"] == d["n_frames"]
            vals = struct.unpack(f"<{len(d['pcm']) // 2}h", d["pcm"])
            assert r["mean_value"] == sum(abs(v) for v in vals) / len(vals)
    again = {
        r["media_id"]: r["mean_value"]
        for r in decoded_stats(media.repartition(7)).collect()
    }
    assert again == {k: v["mean_value"] for k, v in got.items()}


def test_bmp_roundtrip_and_cross_format_consistency():
    """decode_bmp reconstructs encode_bmp exactly (padding, bottom-up
    order, BGR swap all exercised by odd widths); and since encode_ppm
    / encode_png / encode_bmp share the md5-chain generator... each
    format roundtrips to ITS OWN deterministic raster."""
    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        decode_media,
        encode_bmp,
    )

    for w, h in ((5, 4), (7, 3), (1, 1)):  # odd widths force row padding
        img = decode_media(encode_bmp(w, h, seed=9), "image")
        assert (img["width"], img["height"], img["channels"]) == (w, h, 3)
        assert len(img["pixels"]) == w * h * 3
        again = decode_media(encode_bmp(w, h, seed=9), "image")
        assert again["pixels"] == img["pixels"]
    # the raster is the generator output in row-major RGB: check a
    # known prefix against the md5 chain directly
    import hashlib

    img = decode_media(encode_bmp(4, 2, seed=9), "image")
    chain = hashlib.md5(b"bmp:9").digest()
    assert img["pixels"][:16] == chain


def test_dsp_features_image_flat_and_gradient(spark):
    """Real image DSP: a flat gray P6 has contrast 0 / edge 0; a
    horizontal-gradient P5 has edge_energy equal to its step size."""
    from mapreduce_kmeans_clustering_spark.operators.multimodal import dsp_features

    flat = b"P6 4 3 255\n" + bytes([128] * (4 * 3 * 3))
    # P5 gray, one row repeated: 0, 10, 20, 30 -> |diff| mean = 10
    grad = b"P5 4 3 255\n" + bytes([0, 10, 20, 30] * 3)
    media = spark.createDataFrame(
        [(0, "image", bytearray(flat)), (1, "image", bytearray(grad))],
        "media_id LONG, kind STRING, payload BINARY",
    )
    got = {r["media_id"]: r for r in dsp_features(media).collect()}
    assert got[0]["brightness"] == 128.0
    assert got[0]["contrast"] == 0.0
    assert got[0]["edge_energy"] == 0.0
    assert got[1]["brightness"] == 15.0
    assert abs(got[1]["edge_energy"] - 10.0) < 1e-12
    assert got[0]["rms"] is None  # audio columns null for images


def test_dsp_features_audio_triangle_wave(spark):
    """Real audio DSP on the synthesized triangle wave: the dominant
    FFT bin sits at the fundamental (sample_rate / period), the
    zero-crossing rate is ~2 crossings per period, and RMS is near the
    triangle's amp/sqrt(3)."""
    import math

    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        dsp_features,
        encode_wav,
    )

    sr, n, seed = 16000, 800, 20  # period = 20 + 20 % 50 = 40
    period = 20 + seed % 50
    media = spark.createDataFrame(
        [(1, "audio", bytearray(encode_wav(sr, n, seed)))],
        "media_id LONG, kind STRING, payload BINARY",
    )
    r = dsp_features(media).collect()[0]
    assert r["brightness"] is None
    f0 = sr / period
    bin_w = sr / n
    assert abs(r["dominant_hz"] - f0) <= 1.5 * bin_w, (r["dominant_hz"], f0)
    assert abs(r["zcr"] - 2.0 / period) < 0.02
    assert abs(r["rms"] - 15000 / math.sqrt(3)) / (15000 / math.sqrt(3)) < 0.1


def test_dsp_features_over_synthesized_mix(spark):
    """End-to-end over the synthesized decodable table: every row
    decodes, images carry image stats, audio carries audio stats."""
    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        dsp_features,
        synthesize_decodable_media,
    )

    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    out = dsp_features(synthesize_decodable_media(ids)).collect()
    assert len(out) == 24
    for r in out:
        if r["kind"] == "image":
            assert r["brightness"] is not None and r["rms"] is None
            assert 0.0 <= r["brightness"] <= 255.0
        else:
            assert r["rms"] is not None and r["brightness"] is None
            assert r["rms"] > 0.0 and 0.0 < r["zcr"] < 1.0


def test_perceptual_hash_deterministic_and_gradient_sensitive(spark):
    """dHash: identical images hash identically; a horizontal gradient
    and its mirror produce complementary bit patterns (maximally far);
    a lightly perturbed copy stays within a few bits."""
    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        perceptual_hash,
    )

    w, h = 18, 16
    grad = bytes(min(255, 10 + 13 * (i % w)) for i in range(w * h))
    mirror = bytes(min(255, 10 + 13 * (w - 1 - (i % w))) for i in range(w * h))
    # perturb a single row segment slightly: most grid cells unchanged
    pert = bytearray(grad)
    for i in range(w):
        pert[i] = min(255, pert[i] + 4)
    header = f"P5 {w} {h} 255\n".encode()
    media = spark.createDataFrame(
        [
            (0, "image", bytearray(header + grad)),
            (1, "image", bytearray(header + grad)),
            (2, "image", bytearray(header + bytes(pert))),
            (3, "image", bytearray(header + mirror)),
            (4, "audio", None),  # skipped
        ],
        "media_id LONG, kind STRING, payload BINARY",
    )
    from pyspark.sql import functions as F

    media = media.where(F.col("payload").isNotNull())
    got = {r["media_id"]: r["phash"] for r in perceptual_hash(media).collect()}
    assert set(got) == {0, 1, 2, 3}
    assert got[0] == got[1]
    ham = bin((got[0] ^ got[2]) & ((1 << 64) - 1)).count("1")
    assert ham <= 6, ham
    ham_far = bin((got[0] ^ got[3]) & ((1 << 64) - 1)).count("1")
    assert ham_far >= 48, ham_far


def test_image_near_dup_pairs_banded(spark):
    """Near-dup pairing over the perceptual hashes: exact copies pair
    at hamming 0, the light perturbation pairs within the radius, the
    mirrored gradient never pairs."""
    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        image_near_dup_pairs,
    )

    w, h = 18, 16
    grad = bytes(min(255, 10 + 13 * (i % w)) for i in range(w * h))
    mirror = bytes(min(255, 10 + 13 * (w - 1 - (i % w))) for i in range(w * h))
    pert = bytearray(grad)
    for i in range(w):
        pert[i] = min(255, pert[i] + 4)
    header = f"P5 {w} {h} 255\n".encode()
    media = spark.createDataFrame(
        [
            (0, "image", bytearray(header + grad)),
            (1, "image", bytearray(header + grad)),
            (2, "image", bytearray(header + bytes(pert))),
            (3, "image", bytearray(header + mirror)),
        ],
        "media_id LONG, kind STRING, payload BINARY",
    )
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in image_near_dup_pairs(media, max_hamming=6).collect()
    }
    assert got[(0, 1)] == 0
    assert (0, 2) in got and got[(0, 2)] <= 6
    assert (1, 2) in got
    assert all(3 not in k for k in got)


# ---------------------------------------------------------------------------
# GIF codec
# ---------------------------------------------------------------------------

def _gif_expected_raster(width, height, seed):
    """Driver-side replay of encode_gif's generator: palette-mapped
    md5-chain indices."""
    import hashlib

    pal = bytearray()
    block = hashlib.md5(f"gifpal:{seed}".encode()).digest()
    while len(pal) < 768:
        pal += block
        block = hashlib.md5(block).digest()
    need = width * height
    idx = bytearray()
    block = hashlib.md5(f"gif:{seed}".encode()).digest()
    while len(idx) < need:
        idx += block
        block = hashlib.md5(block).digest()
    px = bytearray()
    for c in idx[:need]:
        px += pal[3 * c : 3 * c + 3]
    return bytes(px)


def test_gif_roundtrip_and_interlace():
    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        decode_gif,
        decode_media,
        encode_gif,
    )

    for w, h, seed in ((8, 6, 0), (13, 9, 7), (1, 1, 3), (257, 5, 11)):
        exp = _gif_expected_raster(w, h, seed)
        plain = decode_gif(encode_gif(w, h, seed, interlace=False))
        inter = decode_gif(encode_gif(w, h, seed, interlace=True))
        assert (plain["width"], plain["height"], plain["channels"]) == (w, h, 3)
        assert plain["pixels"] == exp
        # deinterlace must reconstruct the SAME raster byte-for-byte
        assert inter["pixels"] == exp
        assert decode_media(encode_gif(w, h, seed), "image")["pixels"] == exp


def test_gif_frame_count_and_extension_walk():
    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    g = decode_gif(encode_gif(10, 10, 5, n_frames=3))
    assert g["n_frames"] == 3
    assert g["pixels"] == _gif_expected_raster(10, 10, 5)


def test_gif_real_lzw_compression_decodes():
    """The decoder must handle table GROWTH (variable code width),
    which encode_gif's fixed-width literal form never exercises:
    compress with a real GIF LZW encoder and compare rasters."""
    import struct

    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    w, h, seed = 37, 23, 4
    ref = decode_gif(encode_gif(w, h, seed))

    # real LZW compressor (min_code=8, table growth, clear on overflow)
    import hashlib

    need = w * h
    idx = bytearray()
    block = hashlib.md5(f"gif:{seed}".encode()).digest()
    while len(idx) < need:
        idx += block
        block = hashlib.md5(block).digest()
    idx = idx[:need]

    clear, end = 256, 257
    codes = [clear]
    table = {bytes((i,)): i for i in range(256)}
    nxt = 258
    width = 9
    widths = [9]  # width of each emitted code, tracked encoder-side
    cur = b""
    for byte in idx:
        cand = cur + bytes((byte,))
        if cand in table:
            cur = cand
            continue
        codes.append(table[cur])
        widths.append(width)
        table[cand] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        if nxt == 4096:
            codes.append(clear)
            widths.append(width)
            table = {bytes((i,)): i for i in range(256)}
            nxt = 258
            width = 9
        cur = bytes((byte,))
    codes.append(table[cur])
    widths.append(width)
    codes.append(end)
    widths.append(width)

    acc = nbits = 0
    lzw = bytearray()
    for code, cw in zip(codes, widths):
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        lzw.append(acc & 0xFF)

    pal = bytearray()
    block = hashlib.md5(f"gifpal:{seed}".encode()).digest()
    while len(pal) < 768:
        pal += block
        block = hashlib.md5(block).digest()

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x87, 0, 0)
    out += pal[:768]
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    out.append(8)
    for k in range(0, len(lzw), 255):
        chunk = lzw[k : k + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"

    got = decode_gif(bytes(out))
    assert got["pixels"] == ref["pixels"]
    assert (got["width"], got["height"]) == (w, h)


def test_gif_clean_failures():
    import pytest as _pytest

    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    with _pytest.raises(ValueError):
        decode_gif(b"NOTGIF" + b"\x00" * 30)
    with _pytest.raises(ValueError):
        decode_gif(b"GIF89a")  # truncated header
    g = encode_gif(8, 6, 0)
    with _pytest.raises(ValueError):
        decode_gif(g[: len(g) // 2] + b"\x00\x3b")  # truncated raster
    # fuzz: random byte flips either decode or raise ValueError /
    # NotImplementedError — never crash with anything else
    import random

    rng = random.Random(42)
    for _ in range(60):
        b = bytearray(g)
        for _ in range(rng.randint(1, 4)):
            b[rng.randrange(6, len(b))] = rng.randrange(256)
        try:
            decode_gif(bytes(b))
        except (ValueError, NotImplementedError):
            pass


def test_tiff_all_branches_roundtrip_and_edges():
    """decode_tiff parses every branch the self-encoder emits
    (II/MM x gray/RGB x none/PackBits) byte-exactly; WhiteIsZero
    inverts; unsupported compressions raise the labeled error."""
    import hashlib
    import struct

    import pytest

    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        decode_media,
        decode_tiff,
        encode_tiff,
    )

    def chain(n, seed):
        out = bytearray()
        block = hashlib.md5(f"tiff:{seed}".encode()).digest()
        while len(out) < n:
            out += block
            block = hashlib.md5(block).digest()
        return bytes(out[:n])

    for be in (False, True):
        for gray in (False, True):
            for pb in (False, True):
                t = encode_tiff(9, 7, seed=5, big_endian=be, gray=gray, packbits=pb)
                d = decode_media(t, "image")
                spp = 1 if gray else 3
                assert (d["width"], d["height"], d["channels"]) == (9, 7, spp)
                assert d["pixels"] == chain(9 * 7 * spp, 5)

    # WhiteIsZero (photometric 0): same bytes, inverted result. The
    # photometric tag (262) is a SHORT entry; patch its value in place.
    t = encode_tiff(6, 4, seed=9, gray=True)
    (ifd_off,) = struct.unpack_from("<I", t, 4)
    (n_entries,) = struct.unpack_from("<H", t, ifd_off)
    patched = bytearray(t)
    for k in range(n_entries):
        base = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", t, base)
        if tag == 262:
            struct.pack_into("<H", patched, base + 8, 0)
    inv = decode_tiff(bytes(patched))
    ref = decode_tiff(t)
    assert inv["pixels"] == bytes(255 - b for b in ref["pixels"])

    # unsupported compression (5 = LZW) raises the labeled error
    patched = bytearray(t)
    for k in range(n_entries):
        base = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", t, base)
        if tag == 259:
            struct.pack_into("<H", patched, base + 8, 5)
    with pytest.raises(NotImplementedError, match="compression 5"):
        decode_tiff(bytes(patched))

    # a strip pointing past the end of the payload raises cleanly
    # (the IFD sits at the tail in the self-encoder layout, so plain
    # tail truncation is a header parse error, not a strip error)
    patched = bytearray(t)
    for k in range(n_entries):
        base = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", t, base)
        if tag == 273:
            (arr_off,) = struct.unpack_from("<I", t, base + 8)
            struct.pack_into("<I", patched, arr_off, len(t) - 2)
    with pytest.raises(ValueError, match="truncated TIFF strip"):
        decode_tiff(bytes(patched))


def test_tiff_single_strip_and_short_strip_coverage():
    """Regression: a count-1 strip array must be INLINE per TIFF spec
    (an out-of-line pointer decodes as the value itself — caught by
    review, verified corrupt before the fix); and a strip list that
    covers fewer rows than ImageLength must raise, not return short
    pixels."""
    import hashlib
    import struct

    import pytest

    from mapreduce_kmeans_clustering_spark.operators.multimodal import (
        decode_tiff,
        encode_tiff,
    )

    t = encode_tiff(5, 1, seed=3)  # height 1 -> exactly one strip
    d = decode_tiff(t)
    out = bytearray()
    block = hashlib.md5(b"tiff:3").digest()
    while len(out) < 15:
        out += block
        block = hashlib.md5(block).digest()
    assert d["pixels"] == bytes(out[: 5 * 1 * 3])

    # understate ImageLength coverage: patch height (257) UP so the
    # strips no longer cover the image
    t2 = bytearray(encode_tiff(6, 4, seed=7, gray=True))
    (ifd_off,) = struct.unpack_from("<I", t2, 4)
    (n_entries,) = struct.unpack_from("<H", t2, ifd_off)
    for k in range(n_entries):
        base = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from("<HHI", t2, base)
        if tag == 257:
            struct.pack_into("<I", t2, base + 8, 8)
    with pytest.raises(ValueError, match="strips cover"):
        decode_tiff(bytes(t2))
