"""WARC/WET ingestion: synthetic archives round-trip through the
binaryFile + mapInPandas parser, gzipped and plain, including the
truncation-tolerance contract."""

import gzip


def _wet_bytes(records):
    out = b""
    for uri, text in records:
        body = text.encode("utf-8")
        out += (
            b"WARC/1.0\r\n"
            b"WARC-Type: conversion\r\n"
            + f"WARC-Target-URI: {uri}\r\n".encode()
            + b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
            + f"Content-Length: {len(body)}\r\n".encode()
            + b"\r\n"
            + body
            + b"\r\n\r\n"
        )
    return out


def _warcinfo_prefix():
    body = b"software: test\r\n"
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
        + b"\r\n"
        + body
        + b"\r\n\r\n"
    )


def test_read_wet_parses_gz_and_plain(spark, tmp_path):
    from simple_data_workflow_spark.sources.crawl import read_warc, read_wet

    d = tmp_path / "crawl"
    d.mkdir()
    recs1 = [("http://a.example/1", "hello world"), ("http://a.example/2", "täxt ünïcode")]
    recs2 = [("http://b.example/1", "second archive")]
    (d / "part1.wet.gz").write_bytes(
        gzip.compress(_warcinfo_prefix() + _wet_bytes(recs1))
    )
    (d / "part2.wet").write_bytes(_wet_bytes(recs2))

    allrecs = read_warc(spark, str(d))
    assert allrecs.count() == 4  # warcinfo + 3 conversions
    wet = read_wet(spark, str(d))
    got = {(r["target_uri"], r["text"]) for r in wet.collect()}
    assert got == {
        ("http://a.example/1", "hello world"),
        ("http://a.example/2", "täxt ünïcode"),
        ("http://b.example/1", "second archive"),
    }
    # glob narrows at listing time
    assert read_wet(spark, str(d), glob="*.gz").count() == 2


def test_read_warc_truncated_archive_yields_prefix(spark, tmp_path):
    from simple_data_workflow_spark.sources.crawl import read_warc

    d = tmp_path / "crawl2"
    d.mkdir()
    full = _wet_bytes([("http://x/1", "complete record")])
    truncated = _wet_bytes([("http://x/2", "this record is cut")])[:-14]
    (d / "t.wet").write_bytes(full + truncated)
    got = read_warc(spark, str(d)).collect()
    # the complete record parses; the truncated tail is dropped
    assert [r["target_uri"] for r in got] == ["http://x/1"]


def test_wet_feeds_llmdata_pipeline(spark, tmp_path):
    """The WET stream composes directly with the curation operators —
    the shape contract that makes it the pipeline entry point."""
    from pyspark.sql import functions as F

    from simple_data_workflow_spark.llmdata.dedup import exact_dedup
    from simple_data_workflow_spark.sources.crawl import read_wet

    d = tmp_path / "crawl3"
    d.mkdir()
    recs = [
        ("http://c/1", "alpha beta gamma"),
        ("http://c/2", "alpha beta gamma"),  # exact dup
        ("http://c/3", "delta epsilon"),
    ]
    (d / "c.wet.gz").write_bytes(gzip.compress(_wet_bytes(recs)))
    docs = read_wet(spark, str(d)).select(
        F.col("target_uri").alias("doc_id"), "text"
    )
    deduped = exact_dedup(docs, key_cols=["text"], id_col="doc_id")
    assert deduped.count() == 2
