"""[ext] Text analysis over document tables (SURVEY §2.14).

Language-ID, quality scoring, token counting, fingerprinting — all as pure
SQL expressions (JVM-side, oracle-checkable). These are the text-pipeline
primitives a 100 TB pretraining-data pipeline runs over every document, so
staying out of Python here matters more than anywhere else.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language ID. Deliberately small + SQL-expressible; a production pipeline
# swaps in fastText — the *plumbing* (score columns → argmax) is identical.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "des", "est"),
    "de": ("der", "die", "und", "das", "ist"),
}


def normalize_ws(text: Column) -> Column:
    """Collapse whitespace runs + trim + lowercase — the canonical text form
    used by fingerprinting and shingling.

    Whitespace is ASCII ``\\s`` BY CONTRACT: Java regex and DuckDB's RE2
    agree on it exactly, which is what makes every fingerprint/shingle
    oracle-checkable. Unicode spaces (NBSP and friends) deliberately
    survive — two crawls differing only in NBSP-vs-space therefore get
    different exact-dedup fingerprints. That recall loss belongs to an
    upstream transliteration pass, NOT here: widening to ``\\p{Zs}``
    would have to be replayed byte-identically by every engine that ever
    re-computes a fingerprint, a much worse contract (r10 review,
    documented-limitation verdict)."""
    return F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))


def doc_fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of the whitespace-normalized lowercase text.
    The exact-dedup key."""
    return F.md5(normalize_ws(text))


def token_count(text: Column) -> Column:
    """Whitespace token count (empty text → 0)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def word_tokens(text: Column) -> Column:
    """Lowercase ``[a-z0-9]`` runs of the normalized text — the corpus
    tokenizer every token-count/shingle/quality signal shares. Symbols
    and NON-ASCII letters are dropped (they are split points, not
    tokens): 'café!' → ['caf'], and a non-Latin-script document yields
    ZERO tokens — by design its ``lang_id`` is 'und' and token-based
    quality gates see n_words=0 (route such docs by language first).
    ASCII-only for the same cross-engine-replay contract as
    :func:`normalize_ws`."""
    return F.filter(
        F.split(normalize_ws(text), r"[^a-z0-9]+"),
        lambda w: F.length(w) > 0,
    )


def quality_scores(text: Column, toks: Column | None = None) -> dict[str, Column]:
    """Quality-scoring signals: length, mean word length, punctuation ratio,
    stopword ratio, alpha ratio. Returned as named expressions so callers
    select only what they need (keeps column pruning effective).

    Pass ``toks`` (a materialized :func:`word_tokens` column, behind an
    ``explode(array(...))`` barrier) to reuse an existing token pass —
    otherwise the tokenizer is built inline from ``text``."""
    t = normalize_ws(text)
    n_chars = F.length(t)
    if toks is None:
        toks = word_tokens(text)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[.,!?;:'\"()\[\]-]", ""))
    n_alpha = n_chars - F.length(F.regexp_replace(t, r"[a-z]", ""))
    n_stop = F.size(F.filter(toks, lambda w: w.isin(*LANG_MARKERS["en"])))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        # true mean token length (Σ len(tok) / n) — the previous
        # alpha-chars/token form was digit-blind: '42 42 42' scored 0.0
        # and numeric-heavy docs failed mean-length bands (r10 review)
        "mean_token_len": F.when(
            n_tokens > 0,
            F.aggregate(
                toks, F.lit(0), lambda acc, w: acc + F.length(w)
            ).cast("double") / n_tokens,
        ).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(F.lit(0.0)),
        "alpha_ratio": F.when(n_chars > 0, n_alpha.cast("double") / n_chars).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(F.lit(0.0)),
    }


def _isin_filter(markers: tuple[str, ...]):
    # NB: must be a 1-arg lambda — F.filter treats 2-arg lambdas (even with
    # defaults) as (element, index) callbacks.
    return lambda w: w.isin(*markers)


# Gopher rules' "must contain 2 of these" stop set (Rae et al. 2021,
# Appendix A1.1 — the MassiveWeb quality filter), distinct from the
# language-ID markers above.
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    toks: Column,
    text: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> dict[str, Column]:
    """[ext] Gopher document-quality rules (Rae et al. 2021, Appendix A1.1)
    as named per-record expressions — the standard rule-based pretraining
    gate: word-count bounds, mean-word-length band, symbol-to-word ratio
    (``#`` and ellipses), minimum fraction of words containing an
    alphabetic character, and a ≥2-distinct-stopwords requirement.

    Documented deviations from the paper: A1.1 applies the 0.1
    symbol-ratio threshold to ``#`` and to ellipses SEPARATELY; this
    implementation pools the two counts into one ratio against the same
    threshold — strictly STRICTER (a doc passing both per-symbol checks
    can fail the pooled one, never the reverse), kept because one
    regexp pass is cheaper and the combined gate is the conservative
    side. The paper's line-format rules (≥90 % lines starting with a
    bullet, ≥30 % ending in an ellipsis) are NOT implemented here —
    :func:`repetition_scores` covers the repetition rule family, so the
    pair approximates (not reproduces) the full Gopher filter.

    ``toks`` is the token ARRAY column — callers should materialize it
    through an ``explode(array(...))`` generator barrier first (the
    :func:`repetition_scores` pattern): these expressions reference the
    array ~5×, and higher-order lambdas get no cross-reference CSE.
    ``text`` is only scanned for symbol counting.

    All metrics are int-arithmetic ratios (exact same IEEE doubles in any
    engine) — every rule and the composite ``keep`` are replayable in
    plain SQL. Map-only: zero exchanges, the gate Catalyst can push
    around freely. At 100 TB this runs beside the scan.
    """
    t = normalize_ws(text)
    n_words = F.size(toks)
    nz = F.nullif(n_words, F.lit(0)).cast("double")
    mean_len = F.coalesce(
        F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w)).cast("double") / nz,
        F.lit(0.0),
    )
    frac_alpha = F.coalesce(
        F.size(F.filter(toks, lambda w: w.rlike("[a-z]"))).cast("double") / nz,
        F.lit(0.0),
    )
    stop_hits = F.size(F.array_distinct(F.filter(toks, _isin_filter(GOPHER_STOPWORDS))))
    n_symbols = (
        F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
        + F.regexp_count(t, F.lit(r"(\.\.\.|…)"))
    )
    symbol_ratio = F.coalesce(n_symbols.cast("double") / nz, F.lit(0.0))
    words_ok = (n_words >= min_words) & (n_words <= max_words)
    mean_len_ok = (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
    symbol_ok = symbol_ratio <= max_symbol_ratio
    alpha_ok = frac_alpha >= min_alpha_frac
    stop_ok = stop_hits >= min_stop_hits
    return {
        "n_words": n_words,
        "mean_word_len": mean_len,
        "frac_alpha_words": frac_alpha,
        "stop_hits": stop_hits,
        "symbol_ratio": symbol_ratio,
        "words_ok": words_ok,
        "mean_len_ok": mean_len_ok,
        "symbol_ok": symbol_ok,
        "alpha_ok": alpha_ok,
        "stop_ok": stop_ok,
        "keep": words_ok & mean_len_ok & symbol_ok & alpha_ok & stop_ok,
    }


def line_format_scores(lines: Column) -> dict[str, Column]:
    """[ext] Gopher line-format rules (Rae et al. 2021, Appendix A1.1) —
    the rule family :func:`gopher_rules` documents as not covered there:
    drop a document if more than 90 % of its lines start with a bullet
    point or more than 30 % end with an ellipsis. ``lines`` is the line
    ARRAY column (pre-split by the caller — newline corpora split on
    ``\\n``; callers should materialize it through an
    ``explode(array(...))`` generator barrier first, the
    :func:`gopher_rules` pattern, since the array is referenced 3× and
    higher-order lambdas get no cross-reference CSE).

    Bullets: ``- ``/``* ``/``• `` prefixes; ellipses: ``...``/``…``
    suffixes. Int-count ratios — replayable in plain SQL; map-only."""
    n = F.size(lines)
    nz = F.nullif(n, F.lit(0)).cast("double")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda ln: ln.startswith("- ")
            | ln.startswith("* ")
            | ln.startswith("• "),
        )
    )
    n_ellipsis = F.size(
        F.filter(
            lines, lambda ln: ln.endswith("...") | ln.endswith("…")
        )
    )
    bullet_frac = F.coalesce(n_bullet.cast("double") / nz, F.lit(0.0))
    ellipsis_frac = F.coalesce(n_ellipsis.cast("double") / nz, F.lit(0.0))
    return {
        "n_lines": n,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "line_format_ok": (bullet_frac <= 0.9) & (ellipsis_frac <= 0.3),
    }


def c4_rules(
    lines: Column,
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> dict[str, Column]:
    """[ext] C4 cleaning rules (Raffel et al. 2020, §2.2) as named
    per-record expressions — the other canonical rule-based pretraining
    gate beside Gopher: retain only lines that end in a terminal
    punctuation mark (``.``/``!``/``?``/closing quote) AND contain at
    least ``min_words_per_line`` words; drop the whole page when fewer
    than ``min_sentences`` lines survive, when it contains
    ``lorem ipsum``, or when it contains ``{`` (the JavaScript/code
    tell). ``lines`` is the line ARRAY column (callers materialize it
    through an ``explode(array(...))`` barrier first — referenced 4×,
    and higher-order lambdas get no cross-reference CSE).

    All predicates are element-local (the word count splits ONE line,
    not an outer expression), so the per-element work is O(line), and
    the whole gate is map-only — int-count comparisons replayable in
    plain SQL. The paper's langdetect and bad-words-list pages are
    separate concerns (:func:`lang_id`, a caller-supplied blocklist)."""
    # word count = non-empty \s+ splits: a single-space split counted
    # empty strings in space runs as words and never split tabs (r10
    # review — raw crawl lines carry both)
    is_sentence = lambda ln: ln.rlike(r"""[.!?"]$""") & (  # noqa: E731
        F.size(F.filter(F.split(ln, r"\s+"), lambda w: F.length(w) > 0))
        >= min_words_per_line
    )
    kept = F.filter(lines, is_sentence)
    n_kept = F.size(kept)
    has_lorem = F.exists(
        lines, lambda ln: F.lower(ln).contains("lorem ipsum")
    )
    has_brace = F.exists(lines, lambda ln: ln.contains("{"))
    return {
        "n_lines": F.size(lines),
        "kept_lines": kept,
        "n_kept_lines": n_kept,
        "has_lorem": has_lorem,
        "has_brace": has_brace,
        "keep": (n_kept >= min_sentences) & ~has_lorem & ~has_brace,
    }


def lang_scores(text: Column, toks: Column | None = None) -> dict[str, Column]:
    """Per-language stopword-hit counts (the scoring half of language ID).

    Pass ``toks`` (a materialized :func:`word_tokens` column behind an
    ``explode(array(...))`` barrier) to reuse an existing token pass —
    inlined, the tokenizer re-runs once PER LANGUAGE (no CSE across HOF
    lambdas, the file's standing rule)."""
    if toks is None:
        toks = word_tokens(text)
    return {
        lang: F.size(F.filter(toks, _isin_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column, toks: Column | None = None) -> Column:
    """Heuristic language ID: argmax of stopword-marker hits, ties broken by
    language code order, 'und' when nothing matches. Pass a materialized
    ``toks`` to avoid one tokenizer pass per language (see
    :func:`lang_scores`)."""
    scores = lang_scores(text, toks)
    pairs = F.array(*[
        F.struct((-s).alias("neg"), F.lit(lang).alias("lang"), s.alias("score"))
        for lang, s in scores.items()
    ])
    # sort ascending by (negated score, lang) → first element is argmax with
    # deterministic tie-break
    best = F.array_sort(pairs)[0]
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle set (distinct) — input to MinHash/Jaccard dedup.

    Column form for per-record use. NOTE: in multi-stage pipelines prefer
    :func:`qcardia_data_spark.functions.dedup.shingle_rows` — this
    expression re-evaluates the tokenizer inside the per-index lambda (no
    cross-lambda subexpression elimination; see PERF.md), which is fine for
    one-off per-record columns but ~30× slower as a pipeline stage.
    """
    toks = word_tokens(text)
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.when(k > 0, F.array(F.array_join(toks, " "))).otherwise(F.array().cast("array<string>"))
    )


def repetition_scores(toks: Column) -> dict[str, Column]:
    """Gopher-style repetition signals, computed per record with NO shuffle.

    A pretraining-corpus repetition gate needs, per document: the count of
    the most frequent token, the distinct-token count, and the count of the
    most frequent bigram. The obvious implementation (explode tokens →
    groupBy(doc, token) → max) shuffles the entire token stream of the
    corpus — at 100 TB that is the single biggest exchange in the pipeline.
    Instead we sort the token array per row and take the longest equal-run
    via one ``aggregate`` fold: O(n log n) per record, embarrassingly
    parallel, zero exchanges. The numbers are identical to the
    unnest+GROUP BY definition (the DuckDB oracle computes them that way).

    Reference analog: corpus-quality gates sit alongside the reference's
    intake validation (`setup/reformat/utils.py` checks); the metric set is
    from the public Gopher/MassiveText filtering rules.

    ``toks`` is a token *array* column (:func:`word_tokens` output) —
    materialize it in a prior projection so the tokenizer runs once per row
    (lambda bodies block Spark's common-subexpression elimination).
    """
    n_tokens = F.size(toks)
    bigrams = F.when(
        n_tokens >= 2,
        F.transform(
            F.sequence(F.lit(0), n_tokens - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def _run_stats(arr: Column) -> Column:
        """struct(best=longest equal run, ndist=distinct count) of a sorted
        array, via a single left fold. Nulls and empty strings are dropped
        defensively first — '' would match the fold's '' initial 'prev' and
        a null element would reset runs while inflating ndist — so the
        stats are over real tokens whatever array the caller passes."""
        s = F.array_sort(F.filter(arr, lambda w: w.isNotNull() & (F.length(w) > 0)))
        return F.aggregate(
            s,
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
                F.lit(0).alias("ndist"),
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
                F.greatest(
                    acc["best"],
                    F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
                ).alias("best"),
                (acc["ndist"] + F.when(x == acc["prev"], F.lit(0)).otherwise(F.lit(1))).alias(
                    "ndist"
                ),
            ),
        )

    tok_stats = _run_stats(toks)
    big_stats = _run_stats(bigrams)
    return {
        "n_tokens": n_tokens,
        "max_tok_count": tok_stats["best"],
        "n_distinct": tok_stats["ndist"],
        "top_bigram_count": big_stats["best"],
    }


def rolling_fingerprint(text: Column, window: int = 8) -> Column:
    """Document fingerprint via min-of-rolling-window hashes (winnowing-lite):
    md5 each ``window``-token shingle, keep the minimum — robust to small
    edits, SQL-expressible, constant output size."""
    sh = shingles(text, window)
    hashed = F.transform(sh, lambda s: F.md5(s))
    return F.array_min(hashed)


_WINNOW_POS_CEIL = 10_000_000  # packed-key position bound (grams per doc)


def winnow_fingerprints(
    df, id_col: str = "doc_id", text_col: str = "text",
    k: int = 3, w: int = 4,
):
    """[ext] MOSS winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash
    every k-token gram, slide a window over w consecutive hashes, select
    each window's MINIMUM hash (rightmost occurrence on ties). The
    guarantee rolling_fingerprint lacks: any token run of length
    >= w + k - 1 shared by two documents shares at least one SELECTED
    fingerprint, at an expected index size of 2/(w+1) of the grams
    (measured 0.39 at w=4 on the testdata corpus).

    Returns one row per selected gram occurrence: (id, pos, fp).

    Plan shape: ZERO exchanges — a document's selection depends only on
    its own grams, so the whole op stays in the array domain behind the
    explode(array()) tokenizer barrier (the no-CSE-in-HOF rule): packed
    (hash, reversed-position) sort keys are materialized ONCE as a
    projected column, each window start takes array_min over its
    w-slice (the rightmost-tie rule rides the pack — no nested
    window/no window at all), array_distinct dedups within the doc, one
    explode emits the selections. The original formulation shuffled
    every gram row for a per-doc window sort; this one ships only the
    ~2/(w+1) selected rows to whatever comes next. Windows that would
    run past the last gram are dropped (start <= n_grams - w), except
    start 0 when the doc is shorter than one window — slice() truncates,
    so that single window selects the doc's global rightmost min.
    100 TB: O(tokens·w) map work per doc, no shuffle, no data x data.
    """
    if k < 1 or w < 1:
        raise ValueError("winnow_fingerprints: k and w must be >= 1")
    tok = df.select(
        F.col(id_col),
        F.explode(F.array(word_tokens(F.col(text_col)))).alias("toks"),
    )
    n_g = F.size("toks") - k + 1
    # packed-key bound made real: past _WINNOW_POS_CEIL grams the
    # (CEIL - i) suffix goes negative, breaking the rightmost-tie sort
    # order and the pos-recovery cast — refuse loudly per row instead
    # of silently mis-selecting (r10 review)
    n_g = F.when(
        n_g <= _WINNOW_POS_CEIL, n_g
    ).otherwise(
        F.raise_error(F.concat(
            F.lit("winnow_fingerprints: document has "),
            n_g.cast("string"),
            F.lit(f" grams > position bound {_WINNOW_POS_CEIL} — "
                  "split the document before fingerprinting"),
        )).cast("int")
    )
    keys = F.transform(
        F.sequence(F.lit(0), n_g - 1),
        lambda i: F.concat(
            F.md5(F.array_join(F.slice(F.col("toks"), i + 1, k), " ")),
            F.lpad((F.lit(_WINNOW_POS_CEIL) - i).cast("string"), 8, "0"),
        ),
    )
    guarded = F.when(n_g > 0, keys).otherwise(F.array().cast("array<string>"))
    # keys becomes a real attribute here, so the per-start lambda below
    # reads it instead of re-running the tokenizer+md5 per window (the
    # shingle_rows CSE lesson)
    with_keys = tok.select(F.col(id_col), n_g.alias("ng"),
                           guarded.alias("_keys"))
    starts = F.sequence(F.lit(0), F.greatest(F.col("ng") - w, F.lit(0)))
    sel = F.array_distinct(
        F.transform(starts, lambda i: F.array_min(F.slice("_keys", i + 1, w)))
    )
    picked = with_keys.select(
        F.col(id_col),
        F.explode(
            F.when(F.col("ng") > 0, sel).otherwise(
                F.array().cast("array<string>")
            )
        ).alias("skey"),
    )
    return picked.select(
        F.col(id_col),
        (F.lit(_WINNOW_POS_CEIL) - F.substring("skey", 33, 8).cast("int"))
        .cast("long")
        .alias("pos"),
        F.substring("skey", 1, 32).alias("fp"),
    )


# PII patterns kept to syntax shared by Java regex (Spark) and RE2 (DuckDB),
# so every count/scrub is oracle-checkable. The phone pattern requires a
# leading '+' so it cannot swallow IPv4 digit runs; scrub order is
# email -> ipv4 -> phone for the same reason.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # each separator must be followed by a digit, so one match can never span
    # across unrelated adjacent digit groups ('+1 234 555 0101 1999' stops
    # after the number; the years survive)
    "phone": (r"\+\d(?:[\- ]?\d){7,}", "<PHONE>"),
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category PII match counts (emails, IPv4s, phone numbers) — the
    audit half of a corpus PII pass, pure JVM regex, no Python."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for name, (pat, _) in PII_PATTERNS.items()
    }


def pii_scrub(text: Column) -> Column:
    """Redact all PII categories with typed placeholder tokens. Chained
    ``regexp_replace`` stays inside whole-stage codegen — at 100 TB this is
    a pure map stage with zero exchanges."""
    out = text
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


URL_PATTERN = r"https?://[^\s]+"


def extract_urls(text: Column) -> Column:
    """All http(s) URLs in a document, in order."""
    return F.regexp_extract_all(text, F.lit(URL_PATTERN), F.lit(0))


def url_domain(url: Column) -> Column:
    """Hostname of a URL ('' when malformed) — the key for the domain-level
    quality/mix statistics every pretraining corpus tracks. Userinfo
    ('user:pass@') and port (':8080') are stripped: the optional non-capturing
    group consumes through '@' and the host class stops at ':' or '/'."""
    # userinfo and host classes exclude '?' and '#' too: an '@' inside a
    # query/fragment ('?email=a@b.org') otherwise parses as userinfo and
    # the domain comes out as 'b.org' (r10 review, reproduced)
    return F.regexp_extract(url, r"https?://(?:[^/?#@\s]+@)?([^/:?#\s]+)", 1)


# tracking params dropped by canonical_url — shared Java/RE2 syntax (the
# PII_PATTERNS lesson) so the oracle replays the same regex
TRACKING_PARAM_RE = r"^(utm_[a-z0-9_]+|gclid|fbclid|msclkid|ref)="


def canonical_url(url: Column) -> Column:
    """[ext] URL canonicalization — the key for URL-level dedup of a crawl
    (the CommonCrawl/CCNet first pass: most re-crawled duplicates are the
    SAME url in a different surface form). Collapses, in order: fragment
    (#...), scheme+host case, userinfo (u:pw@), default ports (https:443,
    http:80), trailing path slashes, tracking params (utm_*, gclid,
    fbclid, msclkid, ref), and query-param order (sorted). Path case and
    non-tracking params are preserved — they are semantically load-
    bearing. Pure-expression (JVM regex + array ops, map-only), regexes
    in shared Java/RE2 syntax so the whole form is oracle-checkable."""
    u = F.regexp_replace(url, r"#.*$", "")
    _pre_re = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"
    pre = F.lower(F.regexp_extract(u, _pre_re, 0))
    pre = F.regexp_replace(pre, r"://[^/@]*@", "://")
    pre = F.regexp_replace(pre, r"^(https://[^/:]+):443$", "$1")
    pre = F.regexp_replace(pre, r"^(http://[^/:]+):80$", "$1")
    rest = F.regexp_replace(u, _pre_re, "")
    path = F.regexp_replace(F.regexp_extract(rest, r"^[^?]*", 0), r"/+$", "")
    qs = F.regexp_extract(rest, r"\?(.*)$", 1)

    def _keep(p: Column) -> Column:
        return (F.length(p) > 0) & (~p.rlike(TRACKING_PARAM_RE))

    q2 = F.array_join(F.array_sort(F.filter(F.split(qs, "&"), _keep)), "&")
    return F.concat(
        pre, path,
        F.when(F.length(q2) > 0, F.concat(F.lit("?"), q2)).otherwise(F.lit("")),
    )


def pack_sequences(
    df, token_col: str, seq_len: int, by: str, order: str,
):
    """[ext] Sequence packing — assign each document to the fixed-length
    training sequence (pack) its tokens start in, under the standard
    concat-then-chunk scheme pretraining pipelines use: documents are
    concatenated in ``order`` within each ``by`` partition and the stream is
    chunked every ``seq_len`` tokens.

    Emitted per doc: ``pack_id`` (chunk index of the doc's first token),
    ``pack_offset`` (position of that token within its chunk), and
    ``n_spans`` (how many chunk boundaries the doc crosses + 1 — a doc
    larger than the remaining room spills into the next chunk(s)).

    ``order`` must be unique within each ``by`` partition (doc ids are);
    a non-unique ordering would make the running sum — and therefore the
    pack assignment — nondeterministic across retries.

    100 TB design: the only exchange is the hash partition on ``by`` for
    the running-sum window — pack ids are derived per partition stream, so
    packing shards embarrassingly by source/shard key. No Python, no
    collect; the cumulative sum is one window frame. (A true first-fit bin
    packer is inherently sequential; concat-then-chunk is what large
    pretraining corpora actually run, because it is streaming and loses at
    most seq_len-1 tokens of padding per shard, not per doc.)
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(by).orderBy(order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_after = F.sum(token_col).over(w)
    cum_before = cum_after - F.col(token_col)
    pack_id = F.floor(cum_before / seq_len)
    return (
        df.withColumn("pack_id", pack_id.cast("long"))
        .withColumn("pack_offset", (cum_before % seq_len).cast("long"))
        .withColumn(
            "n_spans",
            F.when(F.col(token_col) == 0, F.lit(1).cast("long")).otherwise(
                (F.floor((cum_after - 1) / seq_len) - pack_id + 1).cast("long")
            ),
        )
    )


def chunk_documents(
    df, id_col: str = "doc_id", text_col: str = "text",
    chunk_tokens: int = 32, overlap: int = 8,
):
    """[ext] Sliding token-window chunking — split each document into
    fixed-size, optionally overlapping token windows, the preprocessing
    step every embedding / retrieval pipeline runs before vectorizing
    (reference analog: fixed-size window extraction from larger records,
    `src/qcardia_data/pipeline/transforms/resampler.py:12` RandResample2Dd
    — this is the text-modality counterpart, deterministic rather than
    randomized).

    Chunk starts are every ``stride = chunk_tokens - overlap`` tokens
    while ``start < n_tokens``, so every token belongs to at least one
    chunk and consecutive chunks share ``overlap`` tokens; the final
    chunk may be shorter. Text is whitespace-normalized + lowercased
    (:func:`normalize_ws`) so chunk text is canonical; whitespace-only
    documents yield zero chunks.

    Emitted per chunk: ``chunk_id`` (0-based, = start // stride),
    ``chunk_n_tokens``, ``chunk_text``.

    100 TB design: map-only — one narrow generator (posexplode over the
    start sequence), zero exchanges, no Python. The token array crosses
    the generator barrier once (HOF-CSE rule, PERF.md lesson #1), and
    per-chunk work is one O(chunk_tokens) slice, so cost is
    O(n_tokens / stride * chunk_tokens) per document regardless of
    corpus size. Chunk ids derive from the doc's own token offsets, so
    the op shards embarrassingly and is retry-deterministic.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens, got overlap={overlap}, "
            f"chunk_tokens={chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    norm = normalize_ws(F.col(text_col))
    base = df.filter(F.length(norm) > 0).select(
        id_col, F.explode(F.array(F.split(norm, " "))).alias("_toks")
    )
    starts = base.select(
        id_col,
        "_toks",
        F.posexplode(
            F.sequence(F.lit(0), F.size("_toks") - 1, F.lit(stride))
        ).alias("chunk_id", "_start"),
    )
    piece = F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens)
    return starts.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).alias("chunk_n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def token_entropy_stats(df, id_col: str = "doc_id", text_col: str = "text"):
    """[ext] Vocabulary-entropy quality signals per document: token count,
    distinct-token count (types), type/token ratio, and Shannon entropy of
    the token distribution — the lexical-diversity gate that catches
    keyword-stuffed / template / low-diversity pages which pass
    length-based filters (used alongside the Gopher and C4 rule families).

    Entropy is computed in the shuffle-friendly algebraic form
    ``H = ln(n) - sum(cnt * ln(cnt)) / n`` so one pass over the per-type
    counts suffices; the oracle replays the identical formula so the
    float path matches term-for-term (cross-engine fold rule, PERF.md
    lesson — only unordered sums of irrational terms remain, which
    round(6) absorbs). Documents with zero tokens are dropped (no
    distribution to measure).

    100 TB design: explode -> groupBy(id, token) with map-side partial
    count (shuffle volume = per-doc *distinct* tokens, not tokens), then
    a second, strictly smaller groupBy(id). No Python, no collect, no
    per-doc quadratic HOF scan — the two-exchange shape beats a map-only
    O(types x tokens) nested-lambda scan as soon as documents exceed a
    few hundred tokens, and the second exchange carries one row per
    (doc, type).
    """
    toks = word_tokens(F.col(text_col))
    per_type = (
        df.select(id_col, F.explode(toks).alias("_tok"))
        .groupBy(id_col, "_tok")
        .agg(F.count("*").alias("_cnt"))
    )
    cnt = F.col("_cnt").cast("double")
    agg = per_type.groupBy(id_col).agg(
        F.sum("_cnt").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(cnt * F.log(cnt)).alias("_s"),
    )
    n = F.col("n_tokens").cast("double")
    return agg.select(
        id_col,
        "n_tokens",
        "n_types",
        F.round(F.col("n_types").cast("double") / n, 6).alias("type_token_ratio"),
        F.round(F.log(n) - F.col("_s") / n, 6).alias("token_entropy"),
    )


def _check_mix_reserved(df, who: str) -> None:
    """Refuse frames whose columns collide with the mix family's working
    names — withColumn/join would silently overwrite them and the final
    drop would delete the user's column (r12 review; the cdc
    _check_reserved / carry-clash rule)."""
    clash = {"_budget", "_cum_before", "_n"} & set(df.columns)
    if clash:
        raise ValueError(
            f"{who}: column(s) {sorted(clash)} collide with the corpus-mix "
            "machinery's working names — rename them upstream"
        )


def corpus_mix(
    df, token_col: str, key_col: str, by: str,
    weights: dict[str, float], total_budget: int, seed: int = 0,
):
    """[ext] Weighted corpus mixing — sample each source down to its share
    of a total token budget (``weights[source] * total_budget`` tokens),
    keeping a deterministic pseudo-random subset: docs are ranked inside
    each source by keyed md5 'randomness' (retry-safe, engine-agnostic —
    operators/windows.keyed_rand's scheme) and kept while the running token
    count stays within the source's budget; the first doc to cross the
    budget is kept too (ceil semantics) so every source with weight > 0
    contributes at least one doc.

    100 TB design: one window over the ``by`` hash partition — no
    collect, no iterative trimming. Small weight maps (≤64 sources) become
    plan literals via a CASE expression; larger maps become a broadcast
    inner join against a tiny weights frame — same semantics (unlisted
    sources drop), but the plan stays O(1) in expression size however many
    sources a real corpus mix declares.
    """
    _check_mix_reserved(df, "corpus_mix")
    if len(weights) <= 64:
        budget = None
        for src, wgt in weights.items():
            b = F.lit(float(wgt) * total_budget)
            # eqNullSafe (r13 review): plain == makes an explicitly-listed
            # NULL source unreachable (the comparison is NULL, never true)
            # — "unlisted sources drop" must not silently extend to a
            # LISTED NULL group
            cond = F.col(by).eqNullSafe(F.lit(src))
            budget = F.when(cond, b) if budget is None else budget.when(cond, b)
        budget = budget.otherwise(F.lit(0.0))
        df = df.withColumn("_budget", budget).filter(F.col("_budget") > 0)
    else:
        spark = df.sparkSession
        # explicit schema, the unimax_mix lesson: the group column must
        # keep the SOURCE column's type — inferring from Python values
        # would make a non-string `by` key join by implicit cast (r10)
        from pyspark.sql.types import DoubleType, StructField, StructType

        wdf = spark.createDataFrame(
            [(k, float(v) * total_budget) for k, v in weights.items() if v > 0],
            StructType([
                StructField(by, df.schema[by].dataType, True),
                StructField("_budget", DoubleType(), False),
            ]),
        )
        # null-safe (r13 review): same reason as the CASE path — a listed
        # NULL source must match its NULL rows; unlisted sources still
        # drop (inner join semantics preserved for non-NULL keys)
        from qcardia_data_spark.operators.joins import null_safe_equi_join

        df = null_safe_equi_join(
            df, wdf, nullsafe_keys=[by], carry=["_budget"],
            broadcast_right=True,
        )
    return _budget_ranked_sample(df, token_col, key_col, by, seed)


def _budget_ranked_sample(df, token_col: str, key_col: str, by: str, seed: int):
    """Shared corpus_mix/alpha_mix tail: inside each ``by`` group, rank docs
    by keyed-md5 'randomness' and keep while the running token count stays
    within the group's ``_budget`` column (first doc to cross kept too —
    ceil semantics). One window over the ``by`` hash partition."""
    from pyspark.sql.window import Window

    rnd = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(key_col).cast("string")))
    w = Window.partitionBy(by).orderBy(rnd, key_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(token_col).over(w)
    cum_before = cum - F.col(token_col)
    return (
        df.withColumn("_cum_before", cum_before)
        .filter(F.col("_cum_before") < F.col("_budget"))
        .drop("_budget", "_cum_before")
    )


def alpha_mix(
    df, token_col: str, key_col: str, by: str,
    alpha: float, total_budget: int, seed: int = 0,
):
    """[ext] Temperature-based (alpha) multilingual/source sampling — the
    mixing rule of multilingual pretraining (Conneau et al. XLM-R;
    exponentiated-count sampling): group g's share of the token budget is

        p_g = n_g^alpha / Σ_h n_h^alpha

    where n_g is the group's total token count. alpha=1 keeps natural
    proportions, alpha=0 makes groups uniform, 0<alpha<1 up-samples
    low-resource groups. Selection inside each group is the same
    deterministic keyed-md5 ranked budget walk as :func:`corpus_mix`.

    100 TB design: the group-count table is bounded by the number of
    groups (languages/sources) → broadcast; budgets are computed plan-side
    (1-row Σ attached by cross-join — no driver collect). Two corpus
    passes: one map-side-combined count agg, one windowed walk.

    Cross-engine note: alpha=0.5 is computed with ``sqrt`` (IEEE
    correctly-rounded, bit-identical in Spark and DuckDB) rather than
    ``pow``, whose libm implementations may differ in the last ulp.
    """
    _check_mix_reserved(df, "alpha_mix")
    n = F.col("_n")
    powered = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(float(alpha)))
    counts = df.groupBy(by).agg(F.sum(token_col).cast("double").alias("_n"))
    z = counts.agg(F.sum(powered).alias("_z"))
    wdf = counts.crossJoin(F.broadcast(z)).select(
        by, (powered / F.col("_z") * total_budget).alias("_budget")
    )
    # null-safe join-back (r13 review): alpha_mix has no weights dict —
    # EVERY group in the data earns a budget share, including a NULL
    # group (lang-ID failures are a real corpus slice). The old plain
    # inner join silently dropped the NULL group's rows while its count
    # still deflated every other group's normalized share through _z —
    # doubly wrong.
    from qcardia_data_spark.operators.joins import null_safe_equi_join

    joined = null_safe_equi_join(
        df, wdf, nullsafe_keys=[by], carry=["_budget"], broadcast_right=True
    )
    return _budget_ranked_sample(joined, token_col, key_col, by, seed)


def decontaminate(
    docs, eval_docs, id_col: str, text_col: str, n: int = 13,
):
    """[ext] Train-test decontamination: flag every training document that
    shares at least one word ``n``-gram with an evaluation/benchmark set —
    the standard pre-training hygiene pass (13-gram overlap is the common
    production setting; tune ``n`` to corpus vocabulary).

    Returns ``docs`` + boolean ``contaminated``.

    100 TB design: the corpus side explodes to (id, gram) rows ONCE and the
    eval side reduces to a distinct-gram set that is broadcast — benchmark
    suites are tiny relative to the corpus, so the contamination check is a
    broadcast semi-join touching each corpus gram exactly once, with NO
    shuffle of corpus data. (If the eval set ever outgrew broadcast range,
    the same plan degrades to a shuffled semi-join on the gram hash.)
    """
    from pyspark.sql.functions import broadcast

    from qcardia_data_spark.functions.dedup import shingle_rows

    doc_grams = shingle_rows(docs.select(id_col, text_col), id_col, text_col, n)
    eval_grams = (
        shingle_rows(
            eval_docs.selectExpr(f"{id_col} as _eid", text_col), "_eid", text_col, n
        )
        .select("shingle")
        .distinct()
    )
    contaminated_ids = (
        doc_grams.join(broadcast(eval_grams), "shingle", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return docs.join(contaminated_ids, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )


def bloom_build(grams, gram_col: str, m_bits: int = 1 << 16, k: int = 3) -> list[int]:
    """Build a Bloom filter over a (small-ish, e.g. benchmark) gram set:
    k md5-derived bit positions per gram, OR-ed into ``m_bits`` bits packed
    as ``m_bits/32`` long words (32 payload bits per word — the packing
    the probe's conv()-based reader needs). Collected to the driver — the
    filter is ``m_bits/32`` 8-byte words, 16 KiB at the 2^16 default:
    it rides into every task as ONE plan literal no matter how large the
    eval set grows.

    Position i of gram g = first 8 hex digits of md5(g + '#' + i) mod
    m_bits — reproducible in any engine with md5 (DuckDB oracle replays
    the identical filter bit-for-bit).
    """
    if m_bits % 32:
        raise ValueError("m_bits must be a multiple of 32")
    pos = (
        grams.select(F.col(gram_col).alias("_g"))
        .select("_g", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i"))
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("_g"), F.lit("#"), F.col("_i").cast("string"))),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long") % m_bits
            ).alias("_p")
        )
        .select(
            # 32-bit packing (bits 0-31 of a BIGINT word): DuckDB's checked
            # left shift overflows at 1<<63, and sub-32 shifts replay
            # identically in every engine — the filter is the same m_bits,
            # just across twice the words
            (F.col("_p") / 32).cast("long").alias("_w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 32 AS INT))").alias("_m"),
        )
        .groupBy("_w")
        .agg(F.expr("bit_or(_m)").alias("_bits"))
        .collect()
    )
    words = [0] * (m_bits // 32)
    for r in pos:
        words[int(r["_w"])] = int(r["_bits"])
    return words


def bloom_hit(
    df, gram_col: str, words: list[int], m_bits: int, k: int = 3,
    out: str = "bloom_hit",
):
    """``df`` + boolean column ``out``: True iff ALL k bloom bits for
    ``gram_col`` are set in ``words`` (attached as ONE nested plan
    literal). False-positive rate ~(1 - e^(-k·n/m))^k; false negatives
    impossible — the property that makes it a safe prefilter."""
    arr = F.lit(words)
    test = None
    pcols = [f"_bp{i}" for i in range(k)]
    for i in range(k):
        df = df.withColumn(
            pcols[i],
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col(gram_col), F.lit(f"#{i}"))), 1, 8
                ),
                16, 10,
            ).cast("long") % m_bits,
        )
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pcols[i]} % 32 AS INT))")
        bit = F.element_at(arr, (F.col(pcols[i]) / 32).cast("int") + 1).bitwiseAND(mask) != 0
        test = bit if test is None else (test & bit)
    return df.withColumn(out, test).drop(*pcols)


def decontaminate_bloom(
    docs, eval_docs, id_col: str, text_col: str, n: int = 13,
    m_bits: int = 1 << 16, k: int = 3,
):
    """Bloom-prefiltered train-test decontamination — EXACT result, 100 TB
    shape. Same contract as :func:`decontaminate` (docs + ``contaminated``
    boolean), different scaling: instead of broadcasting the full distinct
    eval-gram set (which grows with the benchmark suite), every corpus
    gram first tests k bits of a 16 KiB Bloom literal JVM-side; only the
    bloom-POSITIVE grams (true overlaps + ~(1-e^(-kn/m))^k false
    positives) reach the exact semi-join against the eval grams. The
    exact join's input is bounded by the true overlap, not the corpus.
    """
    from pyspark.sql.functions import broadcast

    from qcardia_data_spark.functions.dedup import shingle_rows

    doc_grams = shingle_rows(docs.select(id_col, text_col), id_col, text_col, n)
    eval_grams = (
        shingle_rows(
            eval_docs.selectExpr(f"{id_col} as _eid", text_col), "_eid", text_col, n
        )
        .select("shingle")
        .distinct()
    )
    words = bloom_build(eval_grams, "shingle", m_bits, k)
    cand = (
        bloom_hit(doc_grams, "shingle", words, m_bits, k, out="_hit")
        .filter(F.col("_hit"))
        .drop("_hit")
    )
    contaminated_ids = (
        cand.join(broadcast(eval_grams), "shingle", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return docs.join(contaminated_ids, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )


def char_trigram_lm_score(
    docs, ref_docs, id_col: str, text_col: str, smooth_v: int = 100,
):
    """CCNet-style language-model quality score: mean log-probability of a
    document's character trigrams under a Laplace-smoothed trigram model
    counted from a REFERENCE slice (the "clean corpus" — e.g. curated
    sources). Low scores mark gibberish / OCR noise / wrong-alphabet text;
    the standard perplexity-bucket filter uses exactly this signal (CCNet
    uses a KenLM 5-gram; the plumbing — score under reference counts,
    filter by bucket — is identical and the trigram variant is
    oracle-expressible in any SQL engine).

    score(doc) = mean over positions p of
        ln( (count_ref[tri(p)] + 1) / (count_ref[big(p)] + smooth_v) )

    Returns (id_col, lm_score) for every doc with at least one trigram.

    100 TB shape: the reference model is two count tables whose size is
    bounded by the CHARACTER-trigram space (≤ alphabet³ rows — KBs), both
    broadcast; the corpus side explodes to (doc, position) rows once and
    aggregates straight back to one row per doc. One corpus shuffle
    (the per-doc mean), zero Python.

    Gram extraction works on a per-doc CHAR ARRAY (split once, O(1)
    element_at per position) — NOT per-position ``substring``:
    UTF8String.substring scans from the string head to find the char
    offset, making the substring form O(len²) per document (measured 7×
    slower end-to-end on a 125k-doc corpus).
    """
    t = normalize_ws(F.col(text_col))

    def grams(frame):
        p = F.col("_p")
        return (
            frame.select(F.col(id_col), F.explode(F.array(F.split(t, ""))).alias("_c"))
            .filter(F.size("_c") >= 3)
            .select(
                id_col,
                "_c",
                F.posexplode(F.sequence(F.lit(1), F.size("_c") - 2)).alias("_i", "_p"),
            )
            .select(
                id_col,
                F.concat(
                    F.element_at("_c", p),
                    F.element_at("_c", p + 1),
                    F.element_at("_c", p + 2),
                ).alias("tri"),
                F.concat(F.element_at("_c", p), F.element_at("_c", p + 1)).alias("big"),
            )
        )

    ref = grams(ref_docs)
    tri_counts = ref.groupBy("tri").agg(F.count(F.lit(1)).alias("n3"))
    big_counts = ref.groupBy("big").agg(F.count(F.lit(1)).alias("n2"))
    scored = (
        grams(docs)
        .join(F.broadcast(tri_counts), "tri", "left")
        .join(F.broadcast(big_counts), "big", "left")
        .select(
            id_col,
            F.log(
                (F.coalesce(F.col("n3"), F.lit(0)) + 1).cast("double")
                / (F.coalesce(F.col("n2"), F.lit(0)) + smooth_v)
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(F.avg("_lp").alias("lm_score"))


def unimax_budgets(
    counts: dict[str, float], total_budget: float, max_epochs: float = 1.0
) -> dict[str, float]:
    """UniMax waterfill (Chung et al. 2023): languages ascending by size
    each take min(fair share of what remains, max_epochs × their tokens);
    whatever a capped language leaves behind is redistributed to the
    larger ones. Pure driver-side float math over the bounded per-group
    count table — deterministic, and replayable in SQL as a recursive CTE
    (the oracle for text_unimax_mix does exactly that, so the arithmetic
    ORDER here is contractual: share first, then min, then subtract).

    A ``None`` group key (lang-ID failure slice) is legitimate: it sorts
    AFTER every named group at the same count — replaying the oracle's
    ``ORDER BY n, lang`` NULLS LAST tie-break — instead of raising
    ``TypeError`` from a ``None < str`` comparison. The tie-break's third
    element is the key itself (NOT ``g or ""``, which coerced falsy keys
    like 0/False/"" to the empty string — a numeric ``by`` column with a
    count tie between 0 and another key then compared str vs int): the
    ``g is None`` element guarantees the single None entry never reaches
    a cross-type comparison."""
    langs = sorted(counts, key=lambda g: (counts[g], g is None, g))
    remaining = float(total_budget)
    out: dict[str, float] = {}
    for idx, g in enumerate(langs):
        share = remaining / (len(langs) - idx)
        b = min(share, max_epochs * float(counts[g]))
        out[g] = b
        remaining -= b
    return out


def unimax_mix(
    df, token_col: str, key_col: str, by: str,
    total_budget: int, max_epochs: float = 1.0, seed: int = 0,
):
    """[ext] UniMax corpus mixing: epoch-capped uniform budget allocation
    (fairer than alpha sampling for low-resource groups — no group is ever
    asked for more than ``max_epochs`` passes over its data, and the
    budget a capped group cannot absorb flows to the rest instead of being
    dropped). Selection inside each group is the shared deterministic
    keyed-md5 budget walk.

    The per-group count table is bounded by the number of groups → the
    waterfill runs driver-side on a collected dict (same boundary class as
    the split-dict collect, documented in PERF.md); budgets join back as a
    broadcast table.
    """
    _check_mix_reserved(df, "unimax_mix")
    counts_rows = df.groupBy(by).agg(F.sum(token_col).alias("_n")).collect()
    counts = {r[by]: float(r["_n"]) for r in counts_rows if r["_n"] is not None}
    budgets = unimax_budgets(counts, float(total_budget), max_epochs)
    positive = [(g, b) for g, b in budgets.items() if b > 0]
    if not positive:  # empty input / all-null tokens: empty result, typed
        return df.filter(F.lit(False))
    spark = df.sparkSession
    # explicit schema: the group column must keep the SOURCE column's type
    # — letting Spark infer from collected Python values (Decimal, None)
    # can mismatch and break or implicitly cast the join below
    from pyspark.sql.types import DoubleType, StructField, StructType

    wdf = spark.createDataFrame(
        positive,
        StructType(
            [
                StructField(by, df.schema[by].dataType, True),
                StructField("_budget", DoubleType(), False),
            ]
        ),
    )
    # null-safe join-back (r14 review — the alpha_mix/corpus_mix twin):
    # the waterfill allocates a budget to EVERY group in the data,
    # including a NULL group (the collected counts dict keeps key None),
    # but the old plain inner join silently dropped the NULL group's rows
    # — its allocated share was simply lost instead of flowing to anyone.
    from qcardia_data_spark.operators.joins import null_safe_equi_join

    joined = null_safe_equi_join(
        df, wdf, nullsafe_keys=[by], carry=["_budget"], broadcast_right=True
    )
    return _budget_ranked_sample(joined, token_col, key_col, by, seed)
