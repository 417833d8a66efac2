"""Web-crawl corpus ingestion: WARC/WET record parsing over Spark's
``binaryFile`` source — the Common-Crawl-shaped entry point of an LLM
training-data pipeline, with no external parser libraries (stdlib
``gzip`` + header splitting inside an Arrow-batched ``mapInPandas``).

Scale shape: ``binaryFile`` gives one row per archive file, so the
parallelism unit is the file — exactly the granularity the WARC format
is distributed at (Common Crawl ships ~10⁵ .warc/.wet files per
snapshot; a 1000-executor cluster maps them embarrassingly parallel).
Per-task memory is bounded by one archive (the format's own chunking);
no shuffle happens at all until the caller aggregates. Pushdown still
applies to the binary scan (``pathGlobFilter``, ``modifiedAfter`` via
options).

WARC grammar handled: records delimited by a ``WARC/1.x`` version
line, header block terminated by a blank line, body of exactly
``Content-Length`` bytes, separated by CRLFCRLF. WET files are WARC
files whose records are ``conversion`` type with text/plain bodies —
``read_wet`` keeps those and surfaces the extracted text directly.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "path string, record_type string, target_uri string, warc_date string, "
    "content_length long, text string"
)


def _parse_warc_bytes(path: str, raw: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record. Tolerant: malformed tails stop
    the file's parse rather than raising (a truncated archive yields
    its complete prefix, matching how crawl tooling treats them)."""
    if path.endswith(".gz") or raw[:2] == b"\x1f\x8b":
        try:
            raw = gzip.decompress(raw)
        except OSError:
            return
    buf = io.BytesIO(raw)
    while True:
        # seek the version line (skip inter-record CRLFs)
        line = buf.readline()
        if not line:
            return
        if not line.strip():
            continue
        if not line.startswith(b"WARC/"):
            return  # lost sync: stop at the complete prefix
        headers = {}
        while True:
            h = buf.readline()
            if not h or not h.strip():
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b"0"))
        except ValueError:
            return
        body = buf.read(length)
        if len(body) < length:
            return  # truncated record
        yield {
            "path": path,
            "record_type": headers.get(b"warc-type", b"").decode(
                "utf-8", "replace"
            ),
            "target_uri": headers.get(b"warc-target-uri", b"").decode(
                "utf-8", "replace"
            ),
            "warc_date": headers.get(b"warc-date", b"").decode(
                "utf-8", "replace"
            ),
            "content_length": length,
            "text": body.decode("utf-8", "replace"),
        }


def read_warc(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """All WARC records under ``path`` (``.warc`` / ``.warc.gz`` /
    ``.wet`` / ``.wet.gz``) as one row per record. ``glob`` narrows
    the binary scan with ``pathGlobFilter`` (evaluated at listing
    time — files that don't match are never opened)."""
    import pandas as pd

    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                rec
                for p, c in zip(pdf["path"], pdf["content"])
                for rec in _parse_warc_bytes(p, bytes(c))
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "record_type",
                    "target_uri",
                    "warc_date",
                    "content_length",
                    "text",
                ],
            )

    return files.mapInPandas(parse, WARC_SCHEMA)


def read_wet(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """WET (extracted-text) records: the ``conversion`` records of the
    archives under ``path`` as (target_uri, warc_date, text) — the
    document stream a curation pipeline starts from. Compose directly
    with ``llmdata``: language-ID, quality scoring, dedup, and
    decontamination all take exactly this shape."""
    from pyspark.sql import functions as F

    return (
        read_warc(spark, path, glob=glob)
        .where(F.col("record_type") == "conversion")
        .select("target_uri", "warc_date", "text")
    )
