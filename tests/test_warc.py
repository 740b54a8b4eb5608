"""WARC source (sources/warc.py): writer emits real gzip-member-per-record
WARC/1.0; reader recovers every header from the bytes alone."""

import gzip
import os

import pandas as pd
import pytest

from fraudcrawler_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    uuid_of,
    warc_encode_response,
    write_warc,
)


def _pages(n=7):
    rows = []
    for i in range(n):
        path = "/private/x" if i == 3 else f"/p{i}"
        rows.append(
            {
                "url": f"https://host-{i % 2}.ch{path}",
                "warc_ts": pd.Timestamp("2024-01-02 03:04:05") + pd.Timedelta(minutes=i),
                "html": f"<html>doc {i}</html>".encode(),
            }
        )
    return pd.DataFrame(rows)


def test_warc_writer_deterministic_and_parseable(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    p1 = write_warc(d1, _pages(), n_files=2)
    p2 = write_warc(d2, _pages(), n_files=2)
    assert [os.path.basename(p) for p in p1] == ["crawl-00000.warc.gz",
                                                 "crawl-00001.warc.gz"]
    for a, b in zip(p1, p2):
        assert open(a, "rb").read() == open(b, "rb").read()  # mtime=0

    recs = []
    for p in p1:
        recs += list(iter_warc_records(open(p, "rb").read()))
    types = [h["warc-type"] for h, _ in recs]
    assert types.count("warcinfo") == 2 and types.count("response") == 7
    resp = [(h, b) for h, b in recs if h["warc-type"] == "response"]
    h0, b0 = next((h, b) for h, b in resp if h["warc-target-uri"].endswith("/p0"))
    assert h0["warc-record-id"] == f"<{uuid_of('https://host-0.ch/p0')}>"
    assert h0["warc-date"] == "2024-01-02T03:04:05Z"
    assert b0.startswith(b"HTTP/1.1 200 OK\r\n") and b0.endswith(b"doc 0</html>")
    h3, b3 = next((h, b) for h, b in resp if "/private/" in h["warc-target-uri"])
    assert b3.startswith(b"HTTP/1.1 403 Forbidden\r\n")


def test_warc_record_parser_edges():
    rec = warc_encode_response("https://x.ch/a", "2024-01-01T00:00:00Z",
                               b"<html>a</html>")
    # two records in ONE gzip member (whole-file-gzip variant the spec allows)
    two = gzip.compress(rec + rec, mtime=0)
    assert len(list(iter_warc_records(two))) == 2
    # uncompressed WARC passes through
    assert len(list(iter_warc_records(rec))) == 1
    with pytest.raises(ValueError, match="bad version line"):
        next(iter_warc_records(b"NOTWARC/1.0\r\n\r\n"))
    with pytest.raises(ValueError, match="truncated WARC content"):
        list(iter_warc_records(rec[: len(rec) - 30]))
    with pytest.raises(ValueError, match="truncated gzip"):
        list(iter_warc_records(gzip.compress(rec, mtime=0)[:-5]))


def test_read_warc_spark(spark, tmp_path):
    """Reader output vs the generator's ground truth; a tampered payload
    must surface digest_ok=false (digest recomputed, not trusted)."""
    d = str(tmp_path / "w")
    write_warc(d, _pages(), n_files=2)

    # tamper one payload byte in-place (keep gzip framing valid)
    victim = os.path.join(d, "crawl-00001.warc.gz")
    members = []
    import zlib

    data = open(victim, "rb").read()
    while data:
        o = zlib.decompressobj(wbits=31)
        members.append(o.decompress(data))
        data = o.unused_data
    members[1] = members[1].replace(b"doc 1", b"DOC 1")
    with open(victim, "wb") as f:
        for m in members:
            f.write(gzip.compress(m, 9, mtime=0))

    df = read_warc(spark, d)
    rows = {r["record_id"]: r for r in df.collect()}
    resp = [r for r in rows.values() if r["warc_type"] == "response"]
    assert len(resp) == 7
    assert sum(not r["digest_ok"] for r in resp) == 1
    bad = next(r for r in resp if not r["digest_ok"])
    assert bytes(bad["payload"]) == b"<html>DOC 1</html>"
    ok = rows[uuid_of("https://host-0.ch/p0")]
    assert ok["digest_ok"] and ok["http_status"] == 200
    assert ok["content_type"] == "text/html; charset=utf-8"
    assert ok["content_length"] == len(b"<html>doc 0</html>")
    priv = rows[uuid_of("https://host-1.ch/private/x")]
    assert priv["http_status"] == 403
    info = [r for r in rows.values() if r["warc_type"] == "warcinfo"]
    assert len(info) == 2 and all(r["http_status"] is None for r in info)


def test_read_warc_stream_incremental_exactly_once(spark, tmp_path):
    """Streaming ingest semantics: an availableNow pass drains the
    landing dir; a LATE-arriving segment processed via the SAME
    checkpoint is ingested exactly once (no reprocessing of old files,
    no loss) — the restartable tail-the-directory contract."""
    import os
    import shutil

    from fraudcrawler_spark.sources.warc import read_warc_stream

    src = str(tmp_path / "src")
    write_warc(src, _pages(), n_files=3)
    land = str(tmp_path / "land")
    os.makedirs(land)
    files = sorted(os.listdir(src))
    for f in files[:2]:
        shutil.copy(os.path.join(src, f), os.path.join(land, f))

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            read_warc_stream(spark, land, max_files_per_trigger=1)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    first = spark.read.parquet(out)
    n1 = first.count()
    assert first.where("warc_type = 'response'").count() == 5  # 7 pages, file 3 absent

    shutil.copy(os.path.join(src, files[2]), os.path.join(land, files[2]))
    drain()
    second = spark.read.parquet(out)
    resp = second.where("warc_type = 'response'")
    assert resp.count() == 7  # late file ingested...
    assert resp.select("record_id").distinct().count() == 7  # ...exactly once
    assert second.count() == n1 + (7 - 5) + 1  # + its warcinfo record
