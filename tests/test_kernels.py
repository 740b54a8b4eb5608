"""Unit tests for the vectorized kernels and scalar functions."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fraudcrawler_spark.config import Prompt
from fraudcrawler_spark.datagen import extract_fields, html_to_text
from fraudcrawler_spark.functions.classify import classify_expr, classify_py
from fraudcrawler_spark.functions.urls import (
    _ref_get_domain,
    canonical_host_expr,
    canonical_host_udf,
    canonical_url_expr,
)

ADVERSARIAL_URLS = [
    "https://www.example.ch/path?q=1",
    "http://example.com/a#frag",
    "www.example.it/x",
    "example.de/x",
    "https://user:pw@example.fr:8443/a",
    "HTTPS://WWW.EXAMPLE.COM/UP",
    "https://x.com.br/deep/.com/path",
    "shop1.ch",
]


def test_ref_get_domain_quirks():
    # mirrors reference test_scraping.py:50-54 style cases (serp.py:50-74)
    assert _ref_get_domain("https://www.google.com/a") == "google.com"
    assert _ref_get_domain("www.google.com/a") == "google.com"
    assert _ref_get_domain("google.com") == "google.com"
    assert _ref_get_domain("https://u:p@x.ch:8080/a") == "x.ch"
    # reference quirk (serp.py:58 is case-sensitive): uppercase scheme →
    # "http://" is prepended, urlparse sees netloc "HTTPS:" → host "https"
    assert _ref_get_domain("HTTPS://WWW.EXAMPLE.COM/UP") == "https"


def test_canonical_host_udf_matches_reference(spark):
    df = spark.createDataFrame(pd.DataFrame({"url": ADVERSARIAL_URLS}))
    got = [r[0] for r in df.select(canonical_host_udf("url")).collect()]
    want = [_ref_get_domain(u) for u in ADVERSARIAL_URLS]
    assert got == want


def test_canonical_host_expr_matches_udf_on_corpus_shapes(spark):
    urls = [
        "https://shop1.ch/p000001",
        "http://shop2.com/p000002",
        "www.shop3.it/p000003",
        "shop4.de/private/p000004",
        "https://www.shop5.fr/p000005",
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    rows = df.select(
        canonical_host_expr(F.col("url")).alias("e"),
        canonical_host_udf("url").alias("u"),
    ).collect()
    for r in rows:
        assert r["e"] == r["u"]


def test_canonical_url_collapses_variants(spark):
    variants = [
        "https://shop1.ch/p000001",
        "http://shop1.ch/p000001",
        "www.shop1.ch/p000001",
        "shop1.ch/p000001",
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": variants}))
    got = {r[0] for r in df.select(canonical_url_expr(F.col("url"))).collect()}
    assert got == {"https://shop1.ch/p000001"}


def test_html_to_text_and_fields_roundtrip():
    html = (
        "<html><head><title>vitamin product 7</title>"
        '<meta name="product:probability" content="0.42"></head><body>'
        "<h1>vitamin product 7</h1>"
        '<span class="price">9.99 CHF</span>'
        '<img class="main" src="https://h/img/main.jpg">'
        '<img src="https://h/img/1.jpg">'
        '<p class="description">desc here</p>'
        '<a href="https://x.ch/p000001">l</a>'
        "</body></html>"
    )
    f = extract_fields(html)
    assert f["product_name"] == "vitamin product 7"
    assert f["product_price"] == "9.99 CHF"
    assert f["product_description"] == "desc here"
    assert f["product_images"] == [
        "https://h/img/main.jpg",
        "https://h/img/1.jpg",
    ]
    assert f["probability"] == 0.42
    txt = html_to_text(html)
    assert "vitamin product 7" in txt and "9.99 CHF" in txt


def test_extract_missing_probability_quirk():
    # missing probability tag: fields still extracted, probability None
    # (reference orchestrator.py:211-235 float(None) path)
    html = "<html><head><title>x</title></head><body><h1>x</h1></body></html>"
    f = extract_fields(html)
    assert f["product_name"] == "x"
    assert f["probability"] is None


def test_extract_listing_kernel_byte_identical_text(spark, corpus_dir):
    from fraudcrawler_spark.functions.extract import extract_listing

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet").limit(200)
    out = pages.select(
        "url", "text", extract_listing(F.col("html")).alias("x")
    ).select("url", "text", "x.extracted_text")
    bad = out.where(F.col("text") != F.col("extracted_text")).count()
    assert bad == 0


PROMPT = Prompt(name="rel", context="ctx", allowed_classes=(0, 1, 2, 3, 4))


def test_classify_expr_matches_py(spark):
    pdf = pd.DataFrame(
        {
            "url": [f"https://x.ch/p{i:06d}" for i in range(50)],
            "name": [f"name {i}" if i % 5 else None for i in range(50)],
            "desc": [f"desc {i}" if i % 7 else None for i in range(50)],
        }
    )
    df = spark.createDataFrame(pdf)
    got = [
        r[0]
        for r in df.select(
            classify_expr(PROMPT, F.col("name"), F.col("desc"))
        ).collect()
    ]
    want = [
        classify_py(PROMPT, u, n, d)
        for u, n, d in zip(pdf["url"], pdf["name"], pdf["desc"])
    ]
    assert got == want


def test_classify_guards():
    assert classify_py(PROMPT, "u", None, "d") == PROMPT.default_if_missing
    assert classify_py(PROMPT, "u", "n", None) == PROMPT.default_if_missing
    narrow = Prompt(name="n", context="c", allowed_classes=(7,))
    # digit almost surely not 7 → default; and if it is 7, it's allowed
    got = classify_py(narrow, "u", "a", "b")
    assert got in (7, narrow.default_if_missing)


def test_multimodal_decode_stub(spark):
    """mapInPandas multimodal plumbing: schema, determinism, empty-payload
    stub path (feat columns null, metadata still real)."""
    import pandas as pd

    from fraudcrawler_spark.functions.multimodal import decode_binary_meta

    df = spark.createDataFrame(
        pd.DataFrame(
            {"url": ["u1", "u2", "u3"],
             "html": [b"payload-bytes-1", b"", None]}
        )
    )
    out = decode_binary_meta(df, "html").toPandas().set_index("url")
    assert out.loc["u1", "n_bytes"] == 15
    assert out.loc["u1", "feat_mean"] is not None
    # empty/None payloads: NotImplementedError stub → null features,
    # byte metadata still populated
    assert out.loc["u2", "n_bytes"] == 0
    assert pd.isna(out.loc["u2", "feat_mean"])
    assert out.loc["u3", "n_bytes"] == 0
    # deterministic
    out2 = decode_binary_meta(df, "html").toPandas().set_index("url")
    assert (out.fillna(0) == out2.fillna(0)).all().all()


def test_multimodal_resize_stub(spark):
    """Resize plumbing: binary in AND out through Arrow, fixed output
    dims, null on the stubbed empty-payload path."""
    import pandas as pd

    from fraudcrawler_spark.functions.multimodal import resize_images

    df = spark.createDataFrame(
        pd.DataFrame({"url": ["u1", "u2"], "html": [bytes(range(256)) * 8, b""]})
    )
    out = resize_images(df, "html", width=16, height=16).toPandas().set_index("url")
    assert len(out.loc["u1", "resized"]) == 16 * 16  # exact target byte shape
    assert out.loc["u1", "width"] == 16 and out.loc["u1", "height"] == 16
    assert out.loc["u2", "resized"] is None  # stub path, row not dropped


def test_multimodal_frame_sampling(spark):
    """Frame-sample plumbing: UDTF-like 1→N fan-out INSIDE the Arrow batch
    (the batch-shape change a real ffmpeg sampler needs), deterministic
    stride and timestamps."""
    import pandas as pd

    from fraudcrawler_spark.functions.multimodal import sample_frames

    df = spark.createDataFrame(
        pd.DataFrame({"url": ["v1", "v2"],
                      "html": [b"x" * (512 * 40), b"y" * 100]})
    )
    out = sample_frames(df, "html", every_n=8, fps=25.0).toPandas()
    v1 = out[out["url"] == "v1"].sort_values("frame_idx")
    assert list(v1["frame_idx"]) == [0, 8, 16, 24, 32]  # 40 frames, stride 8
    assert abs(v1["ts_sec"].iloc[1] - 8 / 25.0) < 1e-9
    assert (v1["frame_bytes"] == 512).all()
    assert len(out[out["url"] == "v2"]) == 0  # sub-frame payload → no rows


def test_enrich_terms_semantics(spark):
    """T1/A1/F5/U1 — union, self-exclusion, max-volume agg, volume-desc
    top-k with STABLE first-seen tie-break (reference enrich.py:292-302)."""
    import pandas as pd

    from fraudcrawler_spark.operators.enrich import enrich_terms

    suggested = spark.createDataFrame(pd.DataFrame({
        "text": ["alpha", "beta", "orig", "gamma"],
        "volume": [10, 30, 99, 30],
        "arrival_idx": [0, 1, 2, 3],
    }))
    related = spark.createDataFrame(pd.DataFrame({
        "text": ["beta", "delta", "epsilon"],
        "volume": [25, 30, 5],
        "arrival_idx": [100, 101, 102],
    }))
    got = [tuple(r) for r in enrich_terms(suggested, related, "orig", 3).collect()]
    # beta: max(30,25)=30 first_seen 1; gamma 30@3; delta 30@101; alpha 10
    # orig excluded; ties on volume keep first-seen order (stable sort)
    assert got == [("beta", 30), ("gamma", 30), ("delta", 30)]


def test_bmp_codec_roundtrip():
    """Pure-Python BMP codec (r3 verdict item 5): encode→decode is
    identity on real pixel arrays, including non-multiple-of-4 row widths
    (padding) and the top-down negative-height variant."""
    import struct

    import numpy as np
    import pytest as _pytest

    from fraudcrawler_spark.functions.bmp import bmp_decode, bmp_encode, resize_nearest

    rng = np.random.RandomState(7)
    for w, h in [(1, 1), (2, 3), (7, 5), (32, 24), (33, 1)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        data = bmp_encode(px)
        assert data[:2] == b"BM"
        # exact container size: 54-byte header + padded rows
        assert len(data) == 54 + ((w * 3 + 3) // 4) * 4 * h
        w2, h2, px2 = bmp_decode(data)
        assert (w2, h2) == (w, h)
        assert np.array_equal(px, px2)

    # top-down variant (negative height in the info header)
    px = rng.randint(0, 256, size=(4, 6, 3)).astype(np.uint8)
    data = bytearray(bmp_encode(px))
    # flip stored rows to top-down and negate height
    stride = ((6 * 3 + 3) // 4) * 4
    body = bytes(data[54:])
    rows = [body[i * stride:(i + 1) * stride] for i in range(4)]
    data[54:] = b"".join(reversed(rows))
    struct.pack_into("<i", data, 22, -4)
    w3, h3, px3 = bmp_decode(bytes(data))
    assert (w3, h3) == (6, 4)
    assert np.array_equal(px, px3)

    # error paths: not-BMP, truncated, unsupported bpp
    with _pytest.raises(ValueError, match="not a BMP"):
        bmp_decode(b"<html>not an image</html>" + b"\x00" * 64)
    with _pytest.raises(ValueError, match="truncated"):
        bmp_decode(bmp_encode(px)[:-8])

    # nearest-neighbor resize: exact floor index map
    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    r = resize_nearest(px, 3, 2)
    assert r.shape == (2, 3, 3)
    assert np.array_equal(r[0, 0], px[0, 0])
    assert np.array_equal(r[1, 2], px[2, 4])  # y: 1*4//2=2, x: 2*6//3=4


def test_image_decode_ignores_metadata(spark, tmp_path):
    """decode_image_meta must recover width/height from the BYTES, not the
    table columns — corrupt metadata on purpose and check the decode."""
    import numpy as np
    import pandas as pd

    from fraudcrawler_spark.functions.bmp import bmp_encode
    from fraudcrawler_spark.functions.multimodal import decode_image_meta

    px = np.zeros((5, 9, 3), dtype=np.uint8)
    px[:, :, 0] = 200  # red block: mean over channels = 200/3
    pdf = pd.DataFrame({"img_id": [0], "width": [999], "height": [999],
                        "img": [bmp_encode(px)]})
    df = spark.createDataFrame(pdf)
    row = decode_image_meta(df.select("img_id", "img")).collect()[0]
    assert (row["width"], row["height"]) == (9, 5)
    assert abs(row["px_mean"] - 200 / 3) < 1e-9


def test_wav_codec_roundtrip():
    """Pure-Python RIFF/PCM16 WAV codec: encode→decode is identity on real
    sample arrays, tolerates extra RIFF chunks, and rejects non-WAV /
    unsupported payloads."""
    import struct

    import numpy as np
    import pytest as _pytest

    from fraudcrawler_spark.functions.wav import wav_decode, wav_encode

    rng = np.random.RandomState(11)
    for n, sr in [(1, 8000), (7, 16000), (800, 8000), (4001, 44100)]:
        samples = rng.randint(-32768, 32768, size=n).astype(np.int16)
        data = wav_encode(samples, sr)
        assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
        # exact container size: 12-byte RIFF hdr + 24-byte fmt + 8 + pcm
        assert len(data) == 44 + 2 * n
        sr2, s2 = wav_decode(data)
        assert sr2 == sr
        assert np.array_equal(samples, s2)

    # an extra LIST chunk between fmt and data must be skipped (real
    # encoders emit INFO metadata); odd-sized chunks are word-aligned
    samples = rng.randint(-32768, 32768, size=5).astype(np.int16)
    data = wav_encode(samples, 8000)
    extra = struct.pack("<4sI", b"LIST", 3) + b"abc\x00"  # padded to even
    patched = data[:36] + extra + data[36:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    sr3, s3 = wav_decode(patched)
    assert sr3 == 8000
    assert np.array_equal(samples, s3)

    with _pytest.raises(ValueError, match="not a WAV"):
        wav_decode(b"<html>not audio</html>" + b"\x00" * 64)
    # stereo is unsupported: patch the channel count in the fmt chunk
    bad = bytearray(wav_encode(samples, 8000))
    struct.pack_into("<H", bad, 22, 2)
    with _pytest.raises(ValueError, match="unsupported WAV"):
        wav_decode(bytes(bad))

    # ADVICE r4: truncation must RAISE, never silently yield fewer
    # samples — mirror avi.py's truncated-frame contract
    whole = wav_encode(samples, 8000)
    with _pytest.raises(ValueError, match="truncated data chunk"):
        wav_decode(whole[:-3])  # data chunk body shorter than declared
    odd = bytearray(whole)
    struct.pack_into("<I", odd, 40, 9)  # declare an odd data size
    with _pytest.raises(ValueError, match="odd data chunk"):
        wav_decode(bytes(odd))


def test_audio_decode_ignores_metadata(spark):
    """decode_audio_meta must recover rate/count from the BYTES, not the
    table columns — corrupt metadata on purpose and check the decode; a
    factor-4 decimation round-trip keeps exactly samples 0, 4, 8, …"""
    import numpy as np
    import pandas as pd

    from fraudcrawler_spark.functions.multimodal import (
        decode_audio_meta,
        resample_audio_wav,
    )
    from fraudcrawler_spark.functions.wav import wav_encode

    samples = np.array([100, -200, 300, -400, 500, -600, 700], dtype=np.int16)
    pdf = pd.DataFrame({"clip_id": [0], "sample_rate": [999999],
                        "n_samples": [999999], "wav": [wav_encode(samples, 8000)]})
    df = spark.createDataFrame(pdf)
    row = decode_audio_meta(df.select("clip_id", "wav")).collect()[0]
    assert (row["sample_rate"], row["n_samples"]) == (8000, 7)
    assert abs(row["duration_s"] - 7 / 8000) < 1e-12
    v = samples.astype(np.int64)
    assert abs(row["amp_mean"] - v.mean()) < 1e-9
    assert abs(row["amp_rms"] - np.sqrt((v * v).mean())) < 1e-9

    resampled = resample_audio_wav(df.select("clip_id", "wav"), factor=4)
    row2 = decode_audio_meta(resampled).collect()[0]
    assert (row2["sample_rate"], row2["n_samples"]) == (2000, 2)
    assert abs(row2["amp_mean"] - (100 + 500) / 2) < 1e-9


def test_avi_codec_roundtrip():
    """Pure-Python AVI/DIB codec: encode→decode is identity on real frame
    stacks (including non-multiple-of-4 row widths), tolerates unknown
    RIFF chunks, and rejects non-AVI / compressed payloads."""
    import struct

    import numpy as np
    import pytest as _pytest

    from fraudcrawler_spark.functions.avi import avi_decode, avi_encode

    rng = np.random.RandomState(13)
    for n, (h, w), fps in [(1, (1, 1), 1), (3, (5, 7), 25), (8, (12, 16), 10)]:
        frames = [rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
                  for _ in range(n)]
        data = avi_encode(frames, fps)
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        fps2, out = avi_decode(data)
        assert fps2 == fps and len(out) == n
        assert all(np.array_equal(a, b) for a, b in zip(frames, out))

    # an unknown top-level chunk (e.g. JUNK padding real muxers emit)
    # must be skipped
    frames = [rng.randint(0, 256, size=(4, 6, 3)).astype(np.uint8)]
    data = avi_encode(frames, 30)
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    patched = data[:12] + junk + data[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    fps3, out3 = avi_decode(patched)
    assert fps3 == 30 and np.array_equal(frames[0], out3[0])

    with _pytest.raises(ValueError, match="not an AVI"):
        avi_decode(b"RIFF\x10\x00\x00\x00WAVE" + b"\x00" * 16)
    # compressed stream is unsupported: patch biCompression in strf
    bad = bytearray(avi_encode(frames, 30))
    pos = bad.find(b"strf")
    struct.pack_into("<I", bad, pos + 24, 1)  # BI_RLE8
    with _pytest.raises(ValueError, match="unsupported AVI"):
        avi_decode(bytes(bad))


def test_video_decode_ignores_metadata(spark):
    """decode_video_meta must recover dims/frames/fps from the BYTES, not
    the table columns — corrupt metadata on purpose; sample_frames_avi
    fans 1 video row out to one row per EVEN frame index."""
    import numpy as np
    import pandas as pd

    from fraudcrawler_spark.functions.avi import avi_encode
    from fraudcrawler_spark.functions.multimodal import (
        decode_video_meta,
        sample_frames_avi,
    )

    frames = [np.full((3, 4, 3), 10 * (t + 1), dtype=np.uint8) for t in range(5)]
    pdf = pd.DataFrame({"video_id": [0], "width": [999], "height": [999],
                        "n_frames": [999], "fps": [999],
                        "avi": [avi_encode(frames, 10)]})
    df = spark.createDataFrame(pdf)
    row = decode_video_meta(df.select("video_id", "avi")).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (4, 3, 5)
    assert row["fps"] == 10.0
    assert abs(row["px_mean"] - 30.0) < 1e-9  # mean of 10,20,30,40,50

    rows = sorted(
        (r["frame_idx"], r["px_mean"])
        for r in sample_frames_avi(df.select("video_id", "avi"), every=2).collect()
    )
    assert rows == [(0, 10.0), (2, 30.0), (4, 50.0)]


def test_charset_sniff_and_decode(spark):
    """decode_text_bytes recovers encoding + clean text from bytes alone;
    the mojibake repair round-trips the classic double-encoding."""
    import pandas as pd

    from fraudcrawler_spark.functions.charset import (
        decode_text_bytes,
        sniff_and_decode,
    )

    text = "Zürich Qualität – Preis 9,90 € für Käse."
    assert sniff_and_decode(text.encode("utf-8")) == ("utf8", text)
    assert sniff_and_decode(text.encode("cp1252")) == ("cp1252", text)
    moji = text.encode("utf-8").decode("cp1252").encode("utf-8")
    assert sniff_and_decode(moji) == ("mojibake", text)
    # pure ASCII stays utf8 and untouched
    assert sniff_and_decode(b"plain ascii") == ("utf8", "plain ascii")

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            # lying charset metadata — must be ignored
            "enc": ["cp1252", "utf8", "utf8"],
            "data": [text.encode("utf-8"), text.encode("cp1252"), moji],
        }
    )
    rows = {r["doc_id"]: r for r in
            decode_text_bytes(spark.createDataFrame(pdf)).collect()}
    assert rows[0]["detected_enc"] == "utf8"
    assert rows[1]["detected_enc"] == "cp1252"
    assert rows[2]["detected_enc"] == "mojibake"
    assert all(rows[i]["text"] == text for i in range(3))
