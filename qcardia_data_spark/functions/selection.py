"""[ext] Data selection via importance resampling (DSIR) — SURVEY §2.14.

Implements the hashed n-gram importance-weighting scheme of Xie et al.,
"Data Selection for Language Models via Importance Resampling" (NeurIPS
2023): represent every document as a bag of hashed unigram+bigram features,
fit two bag-of-words models — one on a small TARGET slice (the
distribution you want more of), one on the RAW corpus — and weight each
raw document by its log-likelihood ratio  Σ_f n_f(d)·ln(p_target(f)/p_raw(f)).
High-weight documents "look like" the target; resampling by these weights
steers a 100 TB crawl toward a curated distribution without a classifier.

Scale shape (all Spark SQL, zero Python):
- Feature hashing bounds the model at ``n_buckets`` rows — always
  broadcastable, regardless of corpus vocabulary.
- The corpus side is ONE tokenize+explode pass → per-(doc,bucket) counts
  with map-side combine; the bucket models derive from those same counts
  (no second corpus scan).
- Scalar totals attach via 1-row cross-joins (no driver collect).
- Determinism: the feature hash is md5-based (identical in DuckDB), so
  the whole pipeline is value-checkable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qcardia_data_spark.functions.text import word_tokens


def hashed_gram_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    carry_cols: list[str] | None = None,
    ns: tuple[int, ...] = (1, 2),
    n_buckets: int = 128,
) -> DataFrame:
    """(id, [carry...], bucket) rows — one row per n-gram OCCURRENCE
    (not distinct: importance weighting needs counts).

    bucket = conv(md5(gram)[:8], 16) % n_buckets — cross-engine stable.
    The tokenizer crosses an ``explode(array(...))`` barrier first
    (shingle_rows lesson: no CSE across higher-order-function lambdas).
    """
    reserved = {"toks", "gram", "bucket"}
    clash = ({id_col, *(carry_cols or [])}) & reserved
    if clash:
        raise ValueError(
            f"hashed_gram_rows: column(s) {sorted(clash)} collide with "
            f"internal working names {sorted(reserved)} — rename them "
            "(the carry-clash refusal rule)"
        )
    carry = [F.col(c) for c in (carry_cols or [])]
    tok = df.select(
        F.col(id_col),
        *carry,
        F.explode(F.array(word_tokens(F.col(text_col)))).alias("toks"),
    )
    k = F.size("toks")

    # NB: the lambda must be arity-1 — F.transform treats a two-parameter
    # lambda as (element, index), so a `n=n` default-arg closure would bind
    # n to the index column. Bind n via a factory instead.
    def gram_at(n: int):
        return lambda i: F.array_join(F.slice(F.col("toks"), i + 1, n), " ")

    parts = []
    for n in ns:
        if n == 1:
            grams_n = F.col("toks")  # tokens ARE the unigrams — no rebuild
        elif n == 2:
            # O(k) per row: two whole-array slices + an elementwise zip.
            # The index form (slice at every position) is O(k²) per doc —
            # measured 1.5× slower end-to-end on a 125k-doc corpus.
            grams_n = F.zip_with(
                F.slice(F.col("toks"), 1, k - 1),
                F.slice(F.col("toks"), 2, k - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        else:
            idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
            grams_n = F.transform(idx, gram_at(n))
        parts.append(
            F.when(k >= n, grams_n).otherwise(F.array().cast("array<string>"))
        )
    grams = parts[0] if len(parts) == 1 else F.concat(*parts)
    # THE md5 bucket expression (retrieval.term_bucket) — a verbatim copy
    # here had to never diverge from the index layout's (r10 review)
    from qcardia_data_spark.functions.retrieval import term_bucket

    bucket = term_bucket(F.col("gram"), n_buckets)
    return (
        tok.select(F.col(id_col), *carry, F.explode(grams).alias("gram"))
        .select(F.col(id_col), *carry, bucket.alias("bucket"))
    )


def dsir_log_weights(
    docs: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    ns: tuple[int, ...] = (1, 2),
    n_buckets: int = 128,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document DSIR importance log-weight over hashed n-gram features.

    ``is_target`` is a boolean Column over ``docs`` rows defining the
    target slice (e.g. ``F.col("lang") == "en"`` or a curated-source
    predicate). Both models are Laplace-smoothed with ``alpha``:

        p(b) = (count(b) + α) / (total + α·n_buckets)

    Returns (id_col, dsir_logw) for every document that PRODUCES at
    least one feature gram — with the default ``ns=(1, 2)`` that is every
    document with ≥1 token, but e.g. ``ns=(2,)`` drops single-token
    documents entirely (no bigram exists); left-joining callers must
    treat such docs as unscored, not zero-weighted.

    Plan: ONE tokenize+hash pass over the corpus, checkpointed (the rows
    feed both sides; (id, tgt, bucket) triples are compact) → (a) the
    n_buckets-row models via a map-side-combined agg, (b) per-doc
    Σ logratio(bucket(gram)) via a broadcast join on the model + a
    groupBy(id) whose partials combine over the doc-contiguous scan.
    No shuffle is ever wider than O(docs): an earlier (id, bucket)
    intermediate aggregation shuffled O(docs × buckets) rows and measured
    15% slower end-to-end on a 125k-doc corpus. At cluster scale swap the
    localCheckpoint for a reliable ``checkpoint()`` (same motivation as
    the MinHash signature stage).
    """
    rows = hashed_gram_rows(
        docs.withColumn("_tgt", is_target), id_col, text_col,
        carry_cols=["_tgt"], ns=ns, n_buckets=n_buckets,
    ).localCheckpoint(eager=False)

    bucket_counts = rows.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("_tgt"), F.lit(1)).otherwise(F.lit(0))).alias("ct"),
    )
    totals = bucket_counts.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    model = (
        bucket_counts.crossJoin(F.broadcast(totals))  # 1-row scalar attachment
        .select(
            "bucket",
            (
                F.log((F.col("ct") + alpha) / (F.col("nt") + alpha * n_buckets))
                - F.log((F.col("cr") + alpha) / (F.col("nr") + alpha * n_buckets))
            ).alias("logratio"),
        )
    )
    return (
        rows.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(F.sum("logratio").alias("dsir_logw"))
    )
