"""[ext] Deduplication operators for training-data pipelines (SURVEY §2.14).

- Exact dedup: fingerprint → min-id-wins groupBy. One shuffle on the hash.
- MinHash-LSH near-dedup: shingle → per-band min-hash signature → band
  bucket join → Jaccard verify. All SQL-expressible: the "hash family" is
  ``md5(shingle || band_seed)``, so signatures are identical in any engine
  (oracle-checkable) and deterministic under task retry.
- SimHash: 64-bit sign-aggregated token hashes (pure SQL bit ops).

Scale notes: the LSH band join shuffles only (band, signature) pairs —
O(docs × bands) tiny rows, never O(docs²). Candidate verification touches
only bucket-colliding pairs. This is the standard web-scale near-dedup
shape (e.g. the C4/RefinedWeb pipelines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qcardia_data_spark.functions.text import doc_fingerprint, shingles, word_tokens


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: canonical-form fingerprint, keep the smallest id per
    fingerprint (deterministic winner, unlike dropDuplicates under retry)."""
    fp = df.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fp"))
    winners = fp.groupBy("fp").agg(F.min(id_col).alias(id_col))
    return df.join(winners.select(id_col), on=id_col, how="left_semi")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_bands: int = 8, shingle_n: int = 3,
) -> DataFrame:
    """Per-band MinHash signature: band b's hash of a doc is
    ``min(md5(shingle || '#' || b))`` over the doc's shingle set.

    Equivalent to one minhash per band (band width r=1) — collision
    probability per band = Jaccard(a,b); P(candidate) = 1-(1-J)^bands.
    Output: (id, band, sig) — long-thin, shuffle-friendly.
    """
    sh = df.select(F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh"))
    bands = F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band")
    with_band = sh.select(id_col, "sh", bands)
    sig = F.array_min(
        F.transform(F.col("sh"), lambda s: F.md5(F.concat(s, F.lit("#"), F.col("band").cast("string"))))
    )
    return with_band.select(id_col, "band", sig.alias("sig")).filter(F.col("sig").isNotNull())


def lsh_candidate_pairs(sigs: DataFrame, id_col: str) -> DataFrame:
    """Band-bucket self-join → distinct candidate pairs (a < b).

    Joins on (band, sig): only docs sharing a band signature meet.
    """
    a = sigs.select(F.col("band"), F.col("sig"), F.col(id_col).alias("a"))
    b = sigs.select(F.col("band"), F.col("sig"), F.col(id_col).alias("b"))
    return (
        a.join(b, on=["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame, docs: DataFrame, id_col: str, text_col: str,
    threshold: float = 0.6, shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs only; keeps pairs ≥ threshold.

    At scale the shingle-set join is two broadcast-or-shuffle hash joins on
    doc id — proportional to candidates, not to the corpus.
    """
    sh = docs.select(F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh"))
    a = sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"))
    joined = candidates.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return joined.select("a", "b", jac.alias("jaccard")).filter(F.col("jaccard") >= threshold)


def near_dedup_minhash(
    df: DataFrame, id_col: str, text_col: str,
    n_bands: int = 8, shingle_n: int = 3, threshold: float = 0.6,
) -> DataFrame:
    """Full near-dedup: LSH candidates → Jaccard verify → greedy keep-min-id.

    Duplicate resolution: a doc is dropped iff it is the larger id of a
    verified pair (min-id representative survives). This is the standard
    single-pass approximation of connected-components dedup; iterate to a
    fixpoint for full transitive closure (cheap: candidate graph is sparse).
    """
    sigs = minhash_signatures(df, id_col, text_col, n_bands, shingle_n)
    cands = lsh_candidate_pairs(sigs, id_col)
    dups = jaccard_verify(cands, df, id_col, text_col, threshold, shingle_n)
    losers = dups.select(F.col("b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def simhash64(text: Column) -> Column:
    """SimHash: 64-bit signature = sign-vector of summed per-token hash bits.

    Pure SQL: token → xxhash64 → per-bit ±1 votes → sign → bit assembly.
    Hamming-close signatures ⇒ similar token multisets.
    """
    toks = word_tokens(text)
    hashes = F.transform(toks, lambda w: F.xxhash64(w))

    def vote(b: int) -> Column:
        # shift amounts must be Python ints → build one expression per bit
        def merge(acc: Column, h: Column) -> Column:
            bit = F.shiftright(h, b).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

        return F.aggregate(hashes, F.lit(0), merge)

    sig = F.lit(0).cast("long")
    for b in range(64):  # two's-complement wraparound at bit 63 is intended
        sig = sig + F.when(vote(b) > 0, F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit simhashes (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash32_md5(text: Column) -> Column:
    """32-bit SimHash with an md5-derived bit source (engine-portable
    variant of :func:`simhash64`: md5 is identical everywhere, so this one
    is DuckDB-oracle-checkable; xxhash64 is the faster scale path).

    Bit b of token t = parity of hex digit b of md5(t). Votes summed over
    tokens; signature bit set where the vote is positive.
    """
    toks = word_tokens(text)
    hashes = F.transform(toks, lambda w: F.md5(w))

    def vote(b: int) -> Column:
        def merge(acc: Column, h: Column) -> Column:
            digit = F.conv(F.substring(h, b + 1, 1), 16, 10).cast("int")
            return acc + F.when(digit % 2 == 1, F.lit(1)).otherwise(F.lit(-1))

        return F.aggregate(hashes, F.lit(0), merge)

    sig = F.lit(0).cast("long")
    for b in range(32):
        sig = sig + F.when(vote(b) > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return sig
