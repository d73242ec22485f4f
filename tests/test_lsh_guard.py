"""Hot-bucket guard for LSH candidate generation: adversarial boilerplate
corpus stays bounded, normal corpora are bit-identical to the uncapped path."""

from __future__ import annotations

from pyspark.sql import functions as F

from qcardia_data_spark.functions.dedup import (
    lsh_candidate_pairs,
    near_dedup_minhash,
    oversized_lsh_buckets,
    shingle_rows,
)


def _sigs(spark, df):
    sh = shingle_rows(df, "doc_id", "body", 3)
    banded = sh.select(
        "doc_id", "shingle", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band")
    )
    return (
        banded.select(
            "doc_id", "band",
            F.md5(F.concat("shingle", F.lit("#"), F.col("band").cast("string"))).alias("h"),
        )
        .groupBy("doc_id", "band")
        .agg(F.min("h").alias("sig"))
    )


def _adversarial(spark, n_dupes=300):
    """n identical boilerplate docs + a handful of distinct ones."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(n_dupes)]
    rows += [(10_000 + i, f"unique document number {i} with its own words {i * 7}") for i in range(5)]
    return spark.createDataFrame(rows, "doc_id long, body string")



def _rel_artifact(root, name):
    """reliable_dir artifacts live under per-invocation run_* namespaces
    since r14 (ADVICE r13) — true when any run wrote `name` under root."""
    import glob as _glob
    import os as _os

    return bool(_glob.glob(_os.path.join(str(root), "run_*", name)))

def test_adversarial_corpus_candidates_bounded(spark):
    """300 identical docs × 4 bands: uncapped would emit ~45k distinct pairs;
    the star guard emits exactly n−1 edges, all anchored at the min id."""
    df = _adversarial(spark)
    sigs = _sigs(spark, df)
    capped = lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=50)
    pairs = capped.collect()
    dupe_pairs = [p for p in pairs if p["a"] < 10_000]
    assert len(dupe_pairs) == 299  # star: one edge per non-hub member
    assert all(p["a"] == 0 for p in dupe_pairs)  # hub = bucket min id


def test_adversarial_dedup_still_collapses_to_one(spark):
    df = _adversarial(spark)
    kept = near_dedup_minhash(df, "doc_id", "body", n_bands=4, max_bucket_size=50)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0, 10_000, 10_001, 10_002, 10_003, 10_004]


def test_normal_corpus_capped_equals_uncapped(spark):
    """Buckets under the cap must produce the identical pair set."""
    rows = []
    for g in range(6):  # 6 groups of 3 near-identical docs (bucket size 3 ≪ cap)
        base = f"document group {g} shares this exact boilerplate sentence body"
        for j in range(3):
            rows.append((g * 10 + j, base + ("" if j == 0 else f" tail{j}")))
    df = spark.createDataFrame(rows, "doc_id long, body string")
    sigs = _sigs(spark, df).persist()
    uncapped = {(r["a"], r["b"]) for r in lsh_candidate_pairs(sigs, "doc_id").collect()}
    capped = {
        (r["a"], r["b"])
        for r in lsh_candidate_pairs(sigs, "doc_id", max_bucket_size=100).collect()
    }
    sigs.unpersist()
    assert capped == uncapped and len(uncapped) > 0


def test_oversized_bucket_audit_reports_savings(spark):
    df = _adversarial(spark, n_dupes=100)
    sigs = _sigs(spark, df)
    audit = oversized_lsh_buckets(sigs, max_bucket_size=50).collect()
    assert len(audit) == 4  # one hot bucket per band
    for r in audit:
        assert r["bucket_n"] == 100
        assert r["pairs_saved"] == 100 * 99 // 2 - 99


def test_star_rounds_recover_from_dissimilar_hub(spark):
    """Poisoned-hub corpus: doc 0 (min id) shares the band-0 signature with
    six IDENTICAL docs (its 'alpha beta gamma' shingle minimizes the band
    hash — filler shingles chosen to hash higher) but its Jaccard to them
    is 1/3 < threshold. With one star round the hub mediates every pair,
    all fail verification, and the six identical docs silently survive;
    the second (rotated-hub) round stars on doc 1 and recovers them."""
    from qcardia_data_spark.functions.dedup import near_dedup_minhash

    rows = [(0, "alpha beta gamma w1 w2")] + [
        (i, "alpha beta gamma") for i in range(1, 7)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    one = near_dedup_minhash(
        df, "doc_id", "text", n_bands=1, threshold=0.6,
        max_bucket_size=3, star_rounds=1,
    )
    assert one.count() == 7  # the recall hole: nothing deduped

    two = near_dedup_minhash(
        df, "doc_id", "text", n_bands=1, threshold=0.6,
        max_bucket_size=3, star_rounds=2,
    )
    got = sorted(r["doc_id"] for r in two.collect())
    assert got == [0, 1]  # docs 2-6 deduped against the round-2 hub


def test_star_rounds_noop_when_buckets_small(spark, sf_dir):
    """On a corpus with no capped bucket, star_rounds must not change the
    output (rounds only re-star CAPPED buckets)."""
    from qcardia_data_spark.catalog import load_table
    from qcardia_data_spark.functions.dedup import near_dedup_minhash

    docs = load_table(spark, sf_dir, "documents")
    a = near_dedup_minhash(docs, "doc_id", "text", max_bucket_size=1000, star_rounds=1)
    b = near_dedup_minhash(docs, "doc_id", "text", max_bucket_size=1000, star_rounds=3)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(r["doc_id"] for r in b.collect())


def test_fused_hub_ranks_match_unioned_rounds(spark):
    """hub_ranks=[0..r-1] in one pass ≡ union of per-hub_rank calls."""
    df = _adversarial(spark)
    sigs = _sigs(spark, df)
    fused = {
        (r["a"], r["b"])
        for r in lsh_candidate_pairs(
            sigs, "doc_id", max_bucket_size=50, hub_ranks=[0, 1, 2]
        ).collect()
    }
    unioned = set()
    for rk in (0, 1, 2):
        unioned |= {
            (r["a"], r["b"])
            for r in lsh_candidate_pairs(
                sigs, "doc_id", max_bucket_size=50, hub_rank=rk
            ).collect()
        }
    assert fused == unioned


def test_jaccard_verify_sets_matches_rows(spark):
    """Set-form verify (array_intersect) ≡ row-form verify (shuffle join)
    on the same candidate graph — pairs AND jaccard values."""
    from qcardia_data_spark.functions.dedup import (
        jaccard_verify_rows,
        jaccard_verify_sets,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "alpha beta gamma delta epsilon zeta eta theta"),
        (4, "totally different words in this one here now"),
        (5, "alpha beta gamma delta nothing else in common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, body string")
    sh = shingle_rows(df, "doc_id", "body", 3)
    sigs = _sigs(spark, df)
    cands = lsh_candidate_pairs(sigs, "doc_id")
    got_rows = {
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in jaccard_verify_rows(cands, sh, "doc_id", 0.1).collect()
    }
    got_sets = {
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in jaccard_verify_sets(cands, sh, "doc_id", 0.1).collect()
    }
    assert got_rows == got_sets
    assert got_sets  # nonempty — the near-dup structure was found


def test_jaccard_verify_sets_size_prefilter_identical(spark):
    """The r16 size prefilter (J ≤ min/max, guide §3.2) must be
    result-invisible: pairs AND jaccard values identical with it on/off,
    on a corpus that includes size-mismatched candidate pairs (a long doc
    vs a short doc sharing a band signature) the filter actually prunes."""
    from qcardia_data_spark.functions.dedup import jaccard_verify_sets

    long_tail = " ".join(f"filler{i} pad{i} extra{i}" for i in range(40))
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),
        (3, "alpha beta gamma delta epsilon zeta eta theta " + long_tail),
        (4, "alpha beta gamma " + long_tail),
        (5, "alpha beta gamma delta nothing else in common"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, body string")
    sh = shingle_rows(df, "doc_id", "body", 3)
    sigs = _sigs(spark, df)
    # ALL pairs as candidates: exercises the prefilter on pairs the LSH
    # bucket join may or may not emit, including heavy size mismatches
    ids = [r["doc_id"] for r in df.select("doc_id").collect()]
    cands = spark.createDataFrame(
        [(a, b) for a in ids for b in ids if a < b], "a long, b long"
    )
    for thr in (0.1, 0.5):
        on = {
            (r["a"], r["b"], round(r["jaccard"], 9))
            for r in jaccard_verify_sets(cands, sh, "doc_id", thr).collect()
        }
        off = {
            (r["a"], r["b"], round(r["jaccard"], 9))
            for r in jaccard_verify_sets(
                cands, sh, "doc_id", thr, size_prefilter=False
            ).collect()
        }
        assert on == off
    # the prefilter must actually prune on this corpus (not a vacuous test):
    # doc 1 (8 tokens) vs doc 3 (8 tokens + 120 filler) fails min >= t*max
    # at t=0.5, so the pruned pair count is strictly below the full count
    from pyspark.sql import functions as F

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sized = (
        cands.join(sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb")), "b")
    )
    n_fail = sized.filter(
        F.least("na", "nb") < F.ceil(F.lit(0.5) * F.greatest("na", "nb") - F.lit(1e-9))
    ).count()
    assert n_fail > 0


def test_ngram_jaccard_join_lossless_vs_naive(spark):
    """EXACT prefix-filter Jaccard join (ngram_jaccard_join) must return
    precisely the naive all-pairs result — including a pair engineered to
    sit EXACTLY at the threshold (3 shared / 5 union = 0.6), exact
    duplicates, and docs below the shingle floor (<3 tokens)."""
    import itertools
    import random
    import re

    from qcardia_data_spark.functions.dedup import ngram_jaccard_join

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(30):
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))))
    rows.append((100, "alpha beta gamma delta epsilon zeta"))
    rows.append((101, "alpha beta gamma delta epsilon zeta"))   # exact dup
    rows.append((102, "alpha beta gamma delta epsilon other"))  # jac 3/5 = 0.6 exactly
    rows.append((103, "lone pair"))                             # < 3 tokens: no shingles
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def sh_of(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower().strip()) if t]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: sh_of(t) for i, t in rows}
    naive = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        i = len(sa & sb)
        if i and i / len(sa | sb) >= 0.6:
            naive[(a, b)] = round(i / len(sa | sb), 9)

    got = {
        (r["a"], r["b"]): round(r["jaccard"], 9)
        for r in ngram_jaccard_join(df, "doc_id", "text", 0.6, 3).collect()
    }
    assert got == naive
    assert (100, 101) in got and got[(100, 101)] == 1.0
    assert (100, 102) in got and got[(100, 102)] == 0.6  # boundary INCLUDED


def _naive_jaccard_pairs(rows, threshold, n=3):
    import itertools
    import re

    def sh_of(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower().strip()) if t]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: sh_of(t) for i, t in rows}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        i = len(sa & sb)
        if i and i / len(sa | sb) >= threshold:
            out[(a, b)] = round(i / len(sa | sb), 9)
    return out


def test_ngram_jaccard_join_property_random_corpora(shared_spark):
    """Property: on randomized small-vocab corpora (high collision rate —
    the adversarial regime for prefix filtering) and across thresholds,
    the prefix-filter join equals the naive all-pairs join exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from qcardia_data_spark.functions.dedup import ngram_jaccard_join

    @settings(max_examples=8, deadline=None)
    @given(
        seed=st.integers(0, 10**6),
        vocab_n=st.integers(3, 8),
        n_docs=st.integers(5, 18),
        threshold=st.sampled_from([0.3, 0.5, 0.6, 0.8]),
    )
    def check(seed, vocab_n, n_docs, threshold):
        import random

        rng = random.Random(seed)
        vocab = [f"t{i}" for i in range(vocab_n)]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
            for i in range(n_docs)
        ]
        # plant one near-pair so non-empty results are exercised too
        if n_docs >= 2 and rows[0][1]:
            rows[1] = (1, rows[0][1] + " " + rng.choice(vocab))
        df = shared_spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r["a"], r["b"]): round(r["jaccard"], 9)
            for r in ngram_jaccard_join(
                df, "doc_id", "text", threshold, 3
            ).collect()
        }
        assert got == _naive_jaccard_pairs(rows, threshold)

    check()


def test_simhash_near_pairs_lossless_vs_naive(spark, sf_dir):
    """Manku block-permutation blocking must find EXACTLY the naive
    all-pairs Hamming<=k result — on the sf corpus and on an engineered
    cluster of identical + near-identical docs (hamming 0 pairs included)."""
    import itertools

    from pyspark.sql import functions as F

    from qcardia_data_spark.functions.dedup import (
        simhash32_table,
        simhash_near_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    extra = spark.createDataFrame(
        [
            (9_000_001, "alpha beta gamma delta epsilon zeta eta theta"),
            (9_000_002, "alpha beta gamma delta epsilon zeta eta theta"),
            (9_000_003, "alpha beta gamma delta epsilon zeta eta iota"),
        ],
        ["doc_id", "text"],
    )
    corpus = docs.unionByName(extra)

    for k in (1, 3):
        got = {
            (r["a"], r["b"]): r["hamming"]
            for r in simhash_near_pairs(corpus, "doc_id", "text", k).collect()
        }
        sig = {
            r["doc_id"]: r["simhash"]
            for r in simhash32_table(corpus, "doc_id", "text").collect()
        }
        naive = {
            (a, b): bin(sig[a] ^ sig[b]).count("1")
            for a, b in itertools.combinations(sorted(sig), 2)
            if bin(sig[a] ^ sig[b]).count("1") <= k
        }
        assert got == naive
    assert got[(9_000_001, 9_000_002)] == 0  # identical docs found at ham 0


def test_keep_best_retains_longest_not_min_id(spark):
    """near_dedup_keep_best must keep the LONGEST cluster member even when
    it has the largest id (where min-id greedy would drop it), and default
    to min id on exact ties."""
    from qcardia_data_spark.functions.dedup import (
        near_dedup_keep_best,
        near_dedup_minhash,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base),                                   # truncated copy, low id
        (2, base + " lambda mu nu xi omicron pi"),   # complete copy, high id
        (3, "unrelated words entirely different content here okay then"),
        (10, "tie tie one two three four five six"),
        (11, "tie tie one two three four five six"),  # exact tie -> min id
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    best = {r["doc_id"] for r in near_dedup_keep_best(df, "doc_id", "text", threshold=0.5).collect()}
    assert best == {2, 3, 10}  # longest wins the (1,2) cluster; tie -> 10
    greedy = {r["doc_id"] for r in near_dedup_minhash(df, "doc_id", "text", threshold=0.5).collect()}
    assert 1 in greedy and 2 not in greedy  # the behavior keep_best fixes


def test_simhash_near_pairs64_lossless_and_selective(spark, sf_dir):
    """64-bit blocking equals the naive join, and is strictly more
    selective than 32-bit at the same k on the same corpus."""
    import itertools

    from qcardia_data_spark.functions.dedup import (
        simhash64_md5_table,
        simhash_near_pairs,
        simhash_near_pairs64,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in simhash_near_pairs64(docs, "doc_id", "text", 3).collect()
    }
    sig = {
        r["doc_id"]: (r["lo"], r["hi"])
        for r in simhash64_md5_table(docs, "doc_id", "text").collect()
    }
    naive = {
        (a, b): bin(sig[a][0] ^ sig[b][0]).count("1")
        + bin(sig[a][1] ^ sig[b][1]).count("1")
        for a, b in itertools.combinations(sorted(sig), 2)
    }
    naive = {k: v for k, v in naive.items() if v <= 3}
    assert got == naive
    n32 = simhash_near_pairs(docs, "doc_id", "text", 3).count()
    assert len(got) < n32  # 64-bit is the selective production width

    import pytest

    with pytest.raises(ValueError):
        simhash_near_pairs64(docs, "doc_id", "text", max_hamming=4)


def test_containment_join_lossless_vs_naive(spark):
    """containment_join must equal the naive all-pairs containment result
    on a corpus with: an exact duplicate (containment 1.0 both ways ->
    one oriented pair), a short doc strictly EMBEDDED in a longer one
    (the motivating case: containment 1.0 while jaccard is far below any
    useful threshold), a boundary pair, and sub-floor docs."""
    import itertools
    import random
    import re

    from qcardia_data_spark.functions.dedup import containment_join, ngram_jaccard_join

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for i in range(25):
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 22)))))
    long_toks = [f"u{i}" for i in range(30)]
    rows.append((200, " ".join(long_toks)))            # host doc, unique vocab
    rows.append((201, " ".join(long_toks[9:21])))      # strictly embedded excerpt
    rows.append((202, " ".join(long_toks)))            # exact dup of 200
    rows.append((203, "tiny doc"))                     # < 3 tokens: no shingles

    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def sh_of(text):
        toks = [t for t in re.split(r"[^a-z0-9]+", text.lower().strip()) if t]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: sh_of(t) for i, t in rows}
    naive = {}
    for x, y in itertools.combinations(sorted(sets), 2):
        sx, sy = sets[x], sets[y]
        if not sx or not sy:
            continue
        # orient: a = smaller (|S|, id)
        a, b = (x, y) if (len(sx), x) < (len(sy), y) else (y, x)
        i = len(sx & sy)
        c = i / len(sets[a])
        if i and c >= 0.8:
            naive[(a, b)] = round(c, 9)

    got = {
        (r["a"], r["b"]): round(r["containment"], 9)
        for r in containment_join(df, "doc_id", "text", 0.8, 3).collect()
    }
    assert got == naive
    # embedded excerpt: containment 1.0, oriented excerpt-first
    assert got[(201, 200)] == 1.0
    # exact dup pair: equal sizes -> lower id first
    assert got[(200, 202)] == 1.0
    # the motivating miss: symmetric Jaccard at 0.6 never sees 201 in 200
    jac = {
        (r["a"], r["b"])
        for r in ngram_jaccard_join(df, "doc_id", "text", 0.6, 3).collect()
    }
    assert (200, 201) not in jac and (201, 200) not in jac


def test_containment_join_property_random_corpora(shared_spark):
    """Property sweep: random same-vocab corpora (heavy shingle sharing)
    at two thresholds — prefix-filtered result == naive all-pairs."""
    import itertools
    import random
    import re

    from qcardia_data_spark.functions.dedup import containment_join

    def naive(rows, t):
        def sh_of(text):
            toks = [w for w in re.split(r"[^a-z0-9]+", text.lower().strip()) if w]
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

        sets = {i: sh_of(x) for i, x in rows}
        out = {}
        for x, y in itertools.combinations(sorted(sets), 2):
            sx, sy = sets[x], sets[y]
            if not sx or not sy:
                continue
            a, b = (x, y) if (len(sx), x) < (len(sy), y) else (y, x)
            i = len(sx & sy)
            c = i / len(sets[a])
            if i and c >= t:
                out[(a, b)] = round(c, 9)
        return out

    for seed, t in ((3, 0.8), (4, 0.95), (5, 0.5)):
        rng = random.Random(seed)
        vocab = [f"v{i}" for i in range(8)]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 18))))
            for i in range(40)
        ]
        df = shared_spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r["a"], r["b"]): round(r["containment"], 9)
            for r in containment_join(df, "doc_id", "text", t, 3).collect()
        }
        assert got == naive(rows, t), f"seed={seed} t={t}"


def test_containment_join_property_hypothesis(shared_spark):
    """Property twin of the ngram_jaccard random-corpora test: on
    small-vocab corpora (maximum shingle collision — the adversarial
    regime for the prefix candidate join) and across thresholds,
    containment_join equals naive all-pairs containment exactly.
    (ADVICE r10: renamed — it previously shadowed the deterministic
    three-seed sweep above, which therefore never ran.)"""
    import itertools
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from qcardia_data_spark.functions.dedup import containment_join

    def naive(rows, threshold, n=3):
        def sh_of(text):
            toks = [t for t in re.split(r"[^a-z0-9]+", text.lower().strip()) if t]
            return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

        sets = {i: sh_of(t) for i, t in rows}
        out = {}
        for x, y in itertools.combinations(sorted(sets), 2):
            sx, sy = sets[x], sets[y]
            if not sx or not sy:
                continue
            a, b = (x, y) if (len(sx), x) < (len(sy), y) else (y, x)
            i = len(sx & sy)
            c = i / len(sets[a])
            if i and c >= threshold:
                out[(a, b)] = round(c, 9)
        return out

    @settings(max_examples=8, deadline=None)
    @given(
        seed=st.integers(0, 10**6),
        vocab_n=st.integers(3, 8),
        n_docs=st.integers(5, 18),
        threshold=st.sampled_from([0.5, 0.7, 0.8, 1.0]),
    )
    def check(seed, vocab_n, n_docs, threshold):
        import random

        rng = random.Random(seed)
        vocab = [f"t{i}" for i in range(vocab_n)]
        rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
            for i in range(n_docs)
        ]
        # plant an embedded excerpt so the asymmetric case is exercised
        if n_docs >= 2 and len(rows[0][1].split()) >= 6:
            toks = rows[0][1].split()
            rows[1] = (1, " ".join(toks[1:5]))
        df = shared_spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r["a"], r["b"]): round(r["containment"], 9)
            for r in containment_join(df, "doc_id", "text", threshold, 3).collect()
        }
        assert got == naive(rows, threshold)

    check()


def test_ngram_jaccard_reliable_dir_equals_localcheckpoint_path(spark, tmp_path):
    """VERDICT r11 #8: reliable_dir swaps the eager localCheckpoint for
    persisted parquet dictionary/ranked tables (executor-loss-safe at
    scale) — the results must be identical to the default path, for both
    the Jaccard join and its containment sibling."""
    from qcardia_data_spark.functions.dedup import (
        containment_join,
        ngram_jaccard_join,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "pack my box with five dozen liquor jugs right now"),
        (5, "pack my box with five dozen liquor jugs right here"),
        (6, "sphinx of black quartz judge my vow quickly and well"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    want = sorted(
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_join(df, "doc_id", "text", 0.5).collect()
    )
    got = sorted(
        (r["a"], r["b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_join(
            df, "doc_id", "text", 0.5,
            reliable_dir=str(tmp_path / "rel_j"),
        ).collect()
    )
    assert got == want and want

    want_c = sorted(
        (r["a"], r["b"], round(r["containment"], 9))
        for r in containment_join(df, "doc_id", "text", 0.6).collect()
    )
    got_c = sorted(
        (r["a"], r["b"], round(r["containment"], 9))
        for r in containment_join(
            df, "doc_id", "text", 0.6,
            reliable_dir=str(tmp_path / "rel_c"),
        ).collect()
    )
    assert got_c == want_c and want_c
    # the persisted tables exist where the caller pointed
    import os as _os

    assert _rel_artifact(tmp_path / "rel_j", "shingle_dict")
    assert _rel_artifact(tmp_path / "rel_j", "ranked")


def test_near_dedup_minhash_reliable_dir_equals_default(spark, tmp_path):
    """r12 extension of the reliable-checkpoint option: near_dedup_minhash
    with reliable_dir persists the signature table as parquet and must
    return exactly the default path's survivors; the spec near_dedup /
    ngram_jaccard_dedup ops expose the knob."""
    from qcardia_data_spark.functions.dedup import near_dedup_minhash
    from qcardia_data_spark.plans.spec import compile_pipeline

    rows = [
        (i, "the quick brown fox jumps over the lazy dog %s" % suffix)
        for i, suffix in enumerate(
            ["today", "today", "tonight", "entirely different text here now",
             "today again and again", "tonight"]
        )
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    want = sorted(
        r["doc_id"] for r in near_dedup_minhash(df, "doc_id", "text").collect()
    )
    got = sorted(
        r["doc_id"]
        for r in near_dedup_minhash(
            df, "doc_id", "text", reliable_dir=str(tmp_path / "rel_m")
        ).collect()
    )
    assert got == want
    import os as _os

    assert _rel_artifact(tmp_path / "rel_m", "signatures")

    # spec knob: same result through the dialect
    corpus = str(tmp_path / "docs")
    df.write.parquet(corpus)
    spec_got = sorted(
        r["doc_id"]
        for r in compile_pipeline(
            spark,
            [{"op": "source", "path": corpus},
             {"op": "near_dedup", "id_col": "doc_id", "text_col": "text",
              "reliable_dir": str(tmp_path / "rel_spec")}],
            None,
        ).collect()
    )
    assert spec_got == want


def test_reliable_dir_covers_cc_fixpoint_end_to_end(spark, tmp_path):
    """VERDICT r12 #4: reliable_dir stopped at the materialized tables —
    the CC fixpoint after them still rode localCheckpoint, so executor
    loss past the signature stage killed an end-to-end keep_best job.
    Pins: (a) near_dedup_keep_best(reliable_dir=) == the default path's
    survivors AND persists both the signatures and the CC round frames,
    (b) connected_components(reliable_dir=) == the localCheckpoint path,
    (c) connected_components_star with reliable_dir/reliable_every
    matches the default labeling, (d) the spec knobs reach both."""
    import os as _os

    from qcardia_data_spark.functions.dedup import (
        connected_components,
        near_dedup_keep_best,
    )
    from qcardia_data_spark.functions.graph import connected_components_star
    from qcardia_data_spark.plans.spec import compile_pipeline

    rows = [
        (i, "the quick brown fox jumps over the lazy dog %s" % suffix)
        for i, suffix in enumerate(
            ["today", "today", "tonight", "entirely different text here now",
             "today again and again", "tonight", "today", "unrelated words"]
        )
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # (a) end-to-end keep_best
    want = sorted(
        r["doc_id"] for r in near_dedup_keep_best(df, "doc_id", "text").collect()
    )
    rel = str(tmp_path / "rel_kb")
    got = sorted(
        r["doc_id"]
        for r in near_dedup_keep_best(
            df, "doc_id", "text", reliable_dir=rel
        ).collect()
    )
    assert got == want
    assert _rel_artifact(rel, "signatures")
    assert _rel_artifact(rel, "cc_edges")
    assert _rel_artifact(rel, "cc_labels_*"), _os.listdir(rel)

    # (b) the min-label CC primitive, identical labels
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 1)], ["a", "b"]
    )
    want_cc = sorted(
        map(tuple, connected_components(pairs).collect())
    )
    got_cc = sorted(
        map(tuple, connected_components(
            pairs, reliable_dir=str(tmp_path / "rel_cc")
        ).collect())
    )
    assert got_cc == want_cc

    # (c) the star-alternation CC, including reliable_every > 1
    # (a path graph: worst diameter, several alternation rounds)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["src", "dst"]
    )
    want_star = sorted(
        map(tuple, connected_components_star(edges, "src", "dst").collect())
    )
    for every in (1, 3):
        got_star = sorted(
            map(tuple, connected_components_star(
                edges, "src", "dst",
                reliable_dir=str(tmp_path / f"rel_star_{every}"),
                reliable_every=every,
            ).collect())
        )
        assert got_star == want_star, f"reliable_every={every}"

    # (d) spec knobs: keep_best near_dedup + the graph op
    corpus = str(tmp_path / "docs_kb")
    df.write.parquet(corpus)
    spec_got = sorted(
        r["doc_id"]
        for r in compile_pipeline(
            spark,
            [{"op": "source", "path": corpus},
             {"op": "near_dedup", "id_col": "doc_id", "text_col": "text",
              "keep_best": True,
              "reliable_dir": str(tmp_path / "rel_kb_spec")}],
            None,
        ).collect()
    )
    assert spec_got == want
    assert _rel_artifact(tmp_path / "rel_kb_spec", "cc_edges")
    epath = str(tmp_path / "edges_p")
    edges.write.parquet(epath)
    spec_star = sorted(
        map(tuple, compile_pipeline(
            spark,
            [{"op": "source", "path": epath},
             {"op": "connected_components", "src": "src", "dst": "dst",
              "reliable_dir": str(tmp_path / "rel_star_spec"),
              "reliable_every": 2}],
            None,
        ).collect())
    )
    assert spec_star == want_star


def test_shared_reliable_dir_invocations_do_not_clobber(spark, tmp_path):
    """ADVICE r13: the reliable materializers wrote FIXED subpath names,
    so a second op sharing the reliable_dir overwrote the first's state
    — and the first RESULT is a lazy parquet read, so consuming it after
    the second run returned the second run's data silently. Per-run
    namespaces (run_*) make a shared dir compose; this pins the exact
    hazard: consume run 1's result only AFTER run 2 has written."""
    from qcardia_data_spark.functions.dedup import connected_components

    rel = str(tmp_path / "shared_rel")
    p1 = spark.createDataFrame([(1, 2), (2, 3)], ["a", "b"])
    p2 = spark.createDataFrame([(10, 20)], ["a", "b"])
    lazy1 = connected_components(p1, reliable_dir=rel)
    got2 = sorted(
        map(tuple, connected_components(p2, reliable_dir=rel).collect())
    )
    got1 = sorted(map(tuple, lazy1.collect()))  # AFTER run 2's writes
    assert got1 == [(1, 1), (2, 1), (3, 1)], got1
    assert got2 == [(10, 10), (20, 10)], got2
