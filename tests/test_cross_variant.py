"""Cross-variant checks for the raw-hash (rows-only) dedup variants.

The xxhash64-seeded minhash/simhash variants cannot have a DuckDB oracle
(engine-specific hash), so their correctness evidence is (a) brute-force
banding recall on toy data (tests/test_llmdata.py) and (b) these
cross-checks against their md5 twins / their own signatures at the
driver's oracle scale (sf0.01) — shrinking the unverified surface to
genuinely unverifiable internals (VERDICT r5 "Next round" #7).

Measured relations at sf0.01 (2026-08, round 6):
- minhash: raw candidates 25 ⊇ md5-confirmed 25 (exact containment).
  Containment is probabilistic in theory — a jaccard≈0.5 borderline
  pair can miss the raw 32/8 banding with P≈0.6 — so the assertion
  allows a 10% miss fraction: robust to testdata regeneration, still
  fatal for structural banding bugs (which lose everything).
- simhash: raw (64-bit xxhash) and md5 (60-bit) pair sets overlap only
  ~15% — DIFFERENT hash spaces measure hamming in different geometries,
  so containment is not the true claim and is not asserted. The raw
  variant's banding is instead checked exactly against a brute-force
  bit_count(xor) over its OWN signatures at sf0.01 (recall-1-by-
  pigeonhole is a per-hash-space invariant).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from simple_data_workflow_spark.llmdata import dedup
from simple_data_workflow_spark.sources.readers import load_table

SF001 = "/root/testdata/sf0.01"


def test_minhash_md5_confirmed_mostly_within_raw_candidates(spark):
    docs = load_table(spark, SF001, "documents")
    raw = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_candidates(
            docs, num_hashes=32, bands=8
        ).collect()
    }
    confirmed = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_md5_near_dups(
            docs, num_hashes=8, bands=4, threshold=0.5
        ).collect()
    }
    assert confirmed, "oracle-green md5 twin found no near-dups — corpus drifted?"
    assert raw, "raw minhash banding found no candidates at all"
    missing = confirmed - raw
    # exact containment measured (0 of 25); ≤10% tolerated for borderline-
    # jaccard pairs under testdata regeneration
    assert len(missing) <= max(1, len(confirmed) // 10), (
        f"raw 32/8 banding missed {len(missing)}/{len(confirmed)} "
        f"md5-confirmed near-dup pairs: {sorted(missing)[:5]}"
    )


def test_simhash_raw_banding_exact_vs_bruteforce_sf001(spark):
    """At oracle scale, the raw simhash pair set must EQUAL the all-pairs
    bit_count(xor) ≤ 3 set over its own signatures (recall 1 by
    pigeonhole + exact post-filter ⇒ set equality, not just recall)."""
    docs = load_table(spark, SF001, "documents")
    banded = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_dups(docs, max_hamming=3).collect()
    }
    sig = dedup._simhash_sigs(
        docs, "doc_id", "text", lambda t: F.xxhash64(t), 64
    )
    a, b = sig.alias("a"), sig.alias("b")
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("h"),
        )
        .where(F.col("h") <= 3)
        .collect()
    }
    assert banded == brute, (
        f"banding != brute force: banding-only "
        f"{sorted(banded - brute)[:5]}, brute-only {sorted(brute - banded)[:5]}"
    )
