"""Text analysis for training-data pipelines: token counting, quality
scoring, language identification, and document fingerprinting — all pure
expression trees (JVM-side, codegen'd; zero Python in the hot path) with
bit-identical DuckDB oracles.

Per-row doubles (ratios, scores) are single IEEE operations on integers —
deterministic across engines; only cross-row aggregation would need the
decimal policy, and these queries emit per-document rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qucosa_fcrepo_reportingdb_spark.functions import hashing as H
from qucosa_fcrepo_reportingdb_spark.memo import cut_lineage
from qucosa_fcrepo_reportingdb_spark.plans.common import t

# small stopword sets per language for lang-ID scoring; matching is over the
# extracted token array so punctuation/case are already normalized.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "des", "un"],
    "es": ["el", "la", "los", "de", "que", "un"],
}

EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]


def _array_count_in(arr: str, words: list[str], dialect: str) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    if dialect == "spark":
        return f"size(filter({arr}, x -> x IN ({lst})))"
    return f"len(list_filter({arr}, x -> x IN ({lst})))"


# --- token counting -----------------------------------------------------------
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens, BPE-ish subword count (alpha runs / digit runs /
    single other chars), and distinct-token ratio."""
    docs = t(spark, sf_dir, "documents")
    return docs.selectExpr(
        "doc_id",
        "size(split(trim(text), '\\\\s+')) AS n_ws_tokens",
        "size(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))"
        " AS n_bpeish_tokens",
        f"size(array_distinct({H.tokens('text', 'spark')})) AS n_distinct_tokens",
        f"CAST(size(array_distinct({H.tokens('text', 'spark')})) AS DOUBLE)"
        # NULLIF: a zero-token doc must yield NULL, not abort the job
        # (ANSI Spark raises DIVIDE_BY_ZERO even for double 0/0)
        f" / CAST(nullif(size({H.tokens('text', 'spark')}), 0) AS DOUBLE)"
        " AS distinct_ratio",
    ).orderBy("doc_id")


TOKEN_STATS_SQL = rf"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
         AS n_bpeish_tokens,
       len(list_distinct({H.tokens('text', 'duck')})) AS n_distinct_tokens,
       CAST(len(list_distinct({H.tokens('text', 'duck')})) AS DOUBLE)
         / CAST(NULLIF(len({H.tokens('text', 'duck')}), 0) AS DOUBLE)
         AS distinct_ratio
FROM documents
ORDER BY doc_id
"""


# --- quality scoring ----------------------------------------------------------
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / mean-word-length / stopword-ratio heuristic quality score
    (the usual pretraining-corpus filters)."""
    docs = t(spark, sf_dir, "documents")
    toks = H.tokens("text", "spark")
    n_stop = _array_count_in(toks, EN_STOPWORDS, "spark")
    return docs.selectExpr(
        "doc_id",
        "length(text) AS n_chars_actual",
        f"size({toks}) AS n_tokens",
        # NULLIF: zero-token docs -> NULL ratios, not an ANSI
        # DIVIDE_BY_ZERO abort of the whole query
        f"CAST(length(replace(text, ' ', '')) AS DOUBLE)"
        f" / CAST(nullif(size({toks}), 0) AS DOUBLE) AS mean_word_len",
        f"CAST({n_stop} AS DOUBLE) / CAST(nullif(size({toks}), 0) AS DOUBLE)"
        " AS stopword_ratio",
        f"CASE WHEN size({toks}) >= 10 AND length(text) >= 50"
        " THEN 1 ELSE 0 END AS passes_length_gate",
    ).orderBy("doc_id")


def _quality_oracle() -> str:
    toks = H.tokens("text", "duck")
    n_stop = _array_count_in(toks, EN_STOPWORDS, "duck")
    return f"""
SELECT doc_id,
       length(text) AS n_chars_actual,
       len({toks}) AS n_tokens,
       CAST(length(replace(text, ' ', '')) AS DOUBLE)
         / CAST(NULLIF(len({toks}), 0) AS DOUBLE) AS mean_word_len,
       CAST({n_stop} AS DOUBLE) / CAST(NULLIF(len({toks}), 0) AS DOUBLE)
         AS stopword_ratio,
       CASE WHEN len({toks}) >= 10 AND length(text) >= 50
            THEN 1 ELSE 0 END AS passes_length_gate
FROM documents
ORDER BY doc_id
"""


# --- language identification --------------------------------------------------
def _langid_case(langs: list[str]) -> tuple[str, str]:
    """Arg-max CASE + total-hits guard over ALREADY-COMPUTED score_<lg>
    columns. Staging matters: inlining the token expression into every
    score reference multiplies the regexp scan ~32x per row (each score
    appears in the guard, ~2(n-1) CASE comparisons, and its own output
    column) and bloats Catalyst compile time the same way."""
    best = " ".join(
        "WHEN " + (" AND ".join(f"score_{lg} >= score_{o}"
                                for o in langs if o != lg) or "TRUE")
        + f" THEN '{lg}'"
        for lg in langs
    )
    any_hit = " + ".join(f"score_{lg}" for lg in langs)
    return best, any_hit


def lang_prediction_frame(docs: DataFrame) -> DataFrame:
    """(labeled_lang, predicted_lang) over any (lang, text) frame — the
    scan-local marker scoring shared by the batch confusion matrix and
    the streaming content-drift monitor (identical expressions, so the
    streamed fold equals the batch matrix bit-for-bit)."""
    langs = list(LANG_MARKERS)
    best, any_hit = _langid_case(langs)
    return (
        docs.selectExpr("lang", f"{H.tokens('text', 'spark')} AS toks")
        .selectExpr(
            "lang",
            *[f"{_array_count_in('toks', words, 'spark')} AS score_{lg}"
              for lg, words in LANG_MARKERS.items()],
        )
        .selectExpr(
            "lang AS labeled_lang",
            f"CASE WHEN ({any_hit}) = 0 THEN 'unknown' {best} "
            "ELSE 'unknown' END AS predicted_lang")
    )


def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language scoring with deterministic arg-max (ties break
    by fixed language order), compared against the labeled lang column."""
    docs = t(spark, sf_dir, "documents")
    langs = list(LANG_MARKERS)
    best, any_hit = _langid_case(langs)
    return (
        docs.selectExpr("doc_id", "lang",
                        f"{H.tokens('text', 'spark')} AS toks")
        .selectExpr(
            "doc_id", "lang",
            *[f"{_array_count_in('toks', words, 'spark')} AS score_{lg}"
              for lg, words in LANG_MARKERS.items()],
        )
        .selectExpr(
            "doc_id", "lang AS labeled_lang",
            f"CASE WHEN ({any_hit}) = 0 THEN 'unknown' {best} "
            "ELSE 'unknown' END AS predicted_lang",
            *[f"score_{lg}" for lg in langs],
        )
        .orderBy("doc_id")
    )


def _langid_oracle() -> str:
    langs = list(LANG_MARKERS)
    best, any_hit = _langid_case(langs)
    score_cols = ",\n         ".join(
        f"{_array_count_in('toks', words, 'duck')} AS score_{lg}"
        for lg, words in LANG_MARKERS.items())
    return f"""
WITH toks AS (SELECT doc_id, lang, {H.tokens('text', 'duck')} AS toks
              FROM documents),
scores AS (
  SELECT doc_id, lang,
         {score_cols}
  FROM toks)
SELECT doc_id, lang AS labeled_lang,
       CASE WHEN ({any_hit}) = 0 THEN 'unknown' {best} ELSE 'unknown' END
         AS predicted_lang,
       {', '.join(f'score_{lg}' for lg in langs)}
FROM scores
ORDER BY doc_id
"""


# --- document fingerprinting --------------------------------------------------
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprint + content hash — the
    cheap document-identity pair (exact identity + token-stream identity)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.selectExpr("doc_id", f"{H.tokens('text', 'spark')} AS toks")
        .selectExpr("doc_id", "toks",
                    f"{H.token_hashes('toks', 'spark')} AS th")
        .selectExpr(
            "doc_id",
            f"{H.fingerprint('th', 'spark')} AS fingerprint",
            "md5(concat_ws(' ', toks)) AS content_hash",
            "size(th) AS n_tokens",
        )
        .orderBy("doc_id")
    )


FINGERPRINT_SQL = f"""
WITH toks AS (SELECT doc_id, {H.tokens('text', 'duck')} AS toks FROM documents),
th AS (SELECT doc_id, toks, {H.token_hashes('toks', 'duck')} AS th FROM toks)
SELECT doc_id,
       {H.fingerprint('th', 'duck')} AS fingerprint,
       md5(coalesce(list_aggregate(toks, 'string_agg', ' '), ''))
         AS content_hash,
       len(th) AS n_tokens
FROM th
ORDER BY doc_id
"""


# --- PII redaction ------------------------------------------------------------
# Patterns avoid backslash escapes entirely ([.] instead of \.) so the SAME
# literal is valid in Spark SQL (backslash-escaping string parser) and
# DuckDB (standard SQL literals), and behaves identically in Java regex
# and RE2.
PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
PII_URL = "https?://[^ ]+"
PII_ID = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


def _pii_augmented(dialect: str) -> str:
    """Deterministically inject synthetic PII (emails / URLs / SSN-like
    ids keyed off doc_id) so the redaction path has guaranteed matches in
    any corpus — both engines build the identical augmented string."""
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    return (
        "text"
        " || CASE WHEN doc_id % 3 = 0 THEN ' contact user'"
        f" || CAST(doc_id % 97 AS {cast}) || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 4 = 0 THEN ' see https://ex'"
        f" || CAST(doc_id % 53 AS {cast}) || '.example.org/p'"
        f" || CAST(doc_id % 7 AS {cast}) ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' ref 123-45-'"
        f" || lpad(CAST(doc_id % 10000 AS {cast}), 4, '0') ELSE '' END"
    )


def _char_hash(col: str, dialect: str) -> str:
    """Arithmetic polynomial hash over the code points of a string —
    pins the exact redacted text cross-engine. Delegates to the ONE
    canonical fold (hashing.token_hash_scalar): a second copy of a
    bit-exactness-critical hash could silently drift from the shingle
    pipeline's definition."""
    return H.token_hash_scalar(col, dialect)


# The staged redaction chain, defined ONCE: (count column, pattern,
# replacement token), applied in order so counts are unambiguous even
# if patterns could nest. Both engines and both consumers
# (pii_redaction, pii_rate_by_source) are generated from this list —
# adding a PII kind or reordering stages lands everywhere at once.
_PII_STAGES = [
    ("n_urls", PII_URL, "<URL>"),
    ("n_emails", PII_EMAIL, "<EMAIL>"),
    ("n_ids", PII_ID, "<ID>"),
]
_PII_COUNT_COLS = [c for c, _, _ in _PII_STAGES]


def _pii_chain(df: DataFrame, carry: "list[str]") -> DataFrame:
    """Apply the staged count+replace chain to a frame that already has
    the ``aug`` column; returns carry + aug + count columns + ``red``.
    Staged selects so each intermediate redaction is computed once; no
    shuffle, no UDF — at 100 TB a map-only pass fused into the scan."""
    cur = "aug"
    counts: "list[str]" = []
    for i, (cnt, pat, tok) in enumerate(_PII_STAGES):
        nxt = "red" if i == len(_PII_STAGES) - 1 else f"_r{i}"
        df = df.selectExpr(
            *carry, "aug", *counts,
            f"size(regexp_extract_all({cur}, '{pat}', 0)) AS {cnt}",
            f"regexp_replace({cur}, '{pat}', '{tok}') AS {nxt}",
        )
        counts.append(cnt)
        cur = nxt
    return df


def _pii_chain_ctes(carry_sql: str) -> str:
    """The DuckDB twin of _pii_chain: CTE chain from ``documents`` to a
    final ``red`` CTE exposing carry + aug + count columns + red."""
    ctes = [f"aug AS (SELECT {carry_sql}, {_pii_augmented('duck')} AS aug"
            " FROM documents)"]
    cur_cte, cur_col = "aug", "aug"
    counts: "list[str]" = []
    for i, (cnt, pat, tok) in enumerate(_PII_STAGES):
        last = i == len(_PII_STAGES) - 1
        cte = "red" if last else f"r{i}"
        nxt_col = "red" if last else f"_r{i}"
        ctes.append(
            f"{cte} AS (SELECT {carry_sql}, aug, "
            + "".join(f"{c}, " for c in counts)
            + f"len(regexp_extract_all({cur_col}, '{pat}')) AS {cnt}, "
            f"regexp_replace({cur_col}, '{pat}', '{tok}', 'g')"
            f" AS {nxt_col} FROM {cur_cte})")
        counts.append(cnt)
        cur_cte, cur_col = cte, nxt_col
    return ",\n".join(ctes)


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: URL -> email -> id redaction
    (the _PII_STAGES order, so counts are unambiguous even if patterns
    could nest), with per-document match counts, removed-character
    accounting, and an arithmetic hash pinning the exact redacted
    output. See _pii_chain for the one chain definition and its scale
    shape."""
    docs = t(spark, sf_dir, "documents")
    return (
        _pii_chain(
            docs.selectExpr("doc_id", f"{_pii_augmented('spark')} AS aug"),
            ["doc_id"])
        .selectExpr(
            "doc_id", *_PII_COUNT_COLS,
            "length(aug) - length(red) AS chars_removed",
            f"{_char_hash('red', 'spark')} AS redacted_hash",
        )
        .orderBy("doc_id")
    )


def _pii_oracle() -> str:
    cols = ", ".join(_PII_COUNT_COLS)
    return f"""
WITH {_pii_chain_ctes('doc_id')}
SELECT doc_id, {cols},
       length(aug) - length(red) AS chars_removed,
       {_char_hash('red', 'duck')} AS redacted_hash
FROM red
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# HTML/markup stripping (web-corpus normalization)
# ---------------------------------------------------------------------------
_TAG_RE = "<[^>]*>"


def _markup_augmented(dialect: str) -> str:
    """Deterministically wrap each document in markup keyed off doc_id
    (tags, attributes, a self-closing break, HTML entities) so the strip
    path has guaranteed matches in any corpus — the same
    drive-the-real-code trick as _pii_augmented and the WAV roundtrip."""
    cast = "STRING" if dialect == "spark" else "VARCHAR"
    return (
        f"'<!DOCTYPE html><p id=\"d' || CAST(doc_id AS {cast}) || '\">'"
        " || CASE WHEN doc_id % 3 = 0"
        " THEN 'Q &amp; A &lt;raw&gt; ' ELSE '' END"
        " || text"
        " || CASE WHEN doc_id % 4 = 0"
        " THEN '<br/><span>tail &quot;quoted&quot;</span>' ELSE '' END"
        " || '</p>'"
    )


def _entity_decode(col: str) -> str:
    """Chained replace(): named entities first, &amp; LAST so a literal
    '&amp;lt;' decodes to '&lt;' (one level), not '<'. Identical builtin
    in both engines."""
    s = col
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "''"), ("&amp;", "&")):
        s = f"replace({s}, '{ent}', '{ch}')"
    return s


def markup_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus markup normalization: tag removal (replaced by spaces
    so adjacent words never fuse) -> entity decode -> whitespace
    collapse, with per-document tag counts, removed-character accounting,
    and an arithmetic hash pinning the exact cleaned output.

    Scale shape: pure scan-local regexp/replace expression tree — the
    same map-only fused pass as pii_redaction; no shuffle, no UDF."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.selectExpr("doc_id", f"{_markup_augmented('spark')} AS aug")
        .selectExpr(
            "doc_id", "aug",
            f"size(regexp_extract_all(aug, '{_TAG_RE}', 0)) AS n_tags",
            f"regexp_replace(aug, '{_TAG_RE}', ' ') AS untagged",
        )
        .selectExpr(
            "doc_id", "aug", "n_tags",
            f"trim(regexp_replace({_entity_decode('untagged')}, ' +', ' '))"
            " AS clean",
        )
        .selectExpr(
            "doc_id", "n_tags",
            "length(aug) - length(clean) AS chars_removed",
            f"{_char_hash('clean', 'spark')} AS clean_hash",
        )
        .orderBy("doc_id")
    )


def _markup_oracle() -> str:
    return f"""
WITH aug AS (SELECT doc_id, {_markup_augmented('duck')} AS aug
             FROM documents),
un AS (SELECT doc_id, aug,
              len(regexp_extract_all(aug, '{_TAG_RE}')) AS n_tags,
              regexp_replace(aug, '{_TAG_RE}', ' ', 'g') AS untagged
       FROM aug),
cl AS (SELECT doc_id, aug, n_tags,
              trim(regexp_replace({_entity_decode('untagged')},
                                  ' +', ' ', 'g')) AS clean
       FROM un)
SELECT doc_id, CAST(n_tags AS BIGINT) AS n_tags,
       length(aug) - length(clean) AS chars_removed,
       {_char_hash('clean', 'duck')} AS clean_hash
FROM cl
ORDER BY doc_id
"""


def pii_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII incidence by PROVENANCE — the triage view over the redaction
    pass: which ingest source ships identifying material, by kind, and
    how much text scrubbing costs it. Per source: docs, docs with any
    PII, per-kind match totals, characters removed, and the any-PII
    rate. Generated from the SAME _PII_STAGES chain as pii_redaction
    (one definition in each engine), so the report cannot disagree
    with the row-level scrub.

    Scale shape: the scan-local redaction pass plus one source-keyed
    aggregation — no joins beyond the two-column provenance
    projection."""
    docs = t(spark, sf_dir, "documents")
    any_pii = " + ".join(_PII_COUNT_COLS)
    per_doc = _pii_chain(
        docs.selectExpr("doc_id", "source",
                        f"{_pii_augmented('spark')} AS aug"),
        ["doc_id", "source"],
    ).selectExpr("source", *_PII_COUNT_COLS,
                 "length(aug) - length(red) AS chars_removed")
    return (
        per_doc.groupBy("source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum(F.when(F.expr(any_pii) > 0, 1).otherwise(0))
             .cast("long").alias("n_docs_with_pii"),
             *[F.sum(c).cast("long").alias(c) for c in _PII_COUNT_COLS],
             F.sum("chars_removed").cast("long").alias("chars_removed"))
        .selectExpr(
            "source", "n_docs", "n_docs_with_pii", *_PII_COUNT_COLS,
            "chars_removed",
            "CAST(n_docs_with_pii AS DOUBLE) / CAST(n_docs AS DOUBLE)"
            " AS pii_rate")
        .orderBy("source")
    )


def _pii_rate_by_source_oracle() -> str:
    cols = ", ".join(_PII_COUNT_COLS)
    sums = ",\n       ".join(
        f"CAST(SUM({c}) AS BIGINT) AS {c}" for c in _PII_COUNT_COLS)
    any_pii = " + ".join(_PII_COUNT_COLS)
    return f"""
WITH {_pii_chain_ctes('doc_id, source')},
per_doc AS (
  SELECT source, {cols},
         length(aug) - length(red) AS chars_removed
  FROM red)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN {any_pii} > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_with_pii,
       {sums},
       CAST(SUM(chars_removed) AS BIGINT) AS chars_removed,
       CAST(SUM(CASE WHEN {any_pii} > 0 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS pii_rate
FROM per_doc
GROUP BY source
ORDER BY source
"""


PII_RATE_BY_SOURCE_SQL = _pii_rate_by_source_oracle()


QUERIES = {
    "text_token_stats": text_token_stats,
    "text_quality_score": text_quality_score,
    "text_language_id": text_language_id,
    "text_fingerprint": text_fingerprint,
    "pii_redaction": pii_redaction,
    "pii_rate_by_source": pii_rate_by_source,
    "markup_strip": markup_strip,
}

ORACLES = {
    "text_token_stats": TOKEN_STATS_SQL,
    "text_quality_score": _quality_oracle(),
    "text_language_id": _langid_oracle(),
    "text_fingerprint": FINGERPRINT_SQL,
    "pii_redaction": _pii_oracle(),
    "pii_rate_by_source": PII_RATE_BY_SOURCE_SQL,
    "markup_strip": _markup_oracle(),
}


# --- quality-filter threshold calibration --------------------------------------
SWEEP_STEPS = 20     # thresholds 0.00, 0.05, ..., 1.00


def quality_binned_frame(docs: DataFrame) -> DataFrame:
    """(n_tokens, b) stopword-ratio buckets over any (text) frame —
    the single source of the binning arithmetic, shared by the batch
    sweep and the streaming content-drift monitor (so their folds can
    be compared bit-for-bit). NULL b = unscorable (zero/NULL tokens)."""
    toks = H.tokens("text", "spark")
    n_stop = _array_count_in(toks, EN_STOPWORDS, "spark")
    return (
        docs.selectExpr(
            f"size({toks}) AS n_tokens",
            f"CAST({n_stop} AS BIGINT) AS n_stop")
        .selectExpr(
            "n_tokens",
            # integer binning: (n_stop*STEPS) DIV n_tokens == the exact
            # floor of ratio*STEPS with zero FP rounding; n_stop <=
            # n_tokens bounds it at STEPS without a clamp
            f"CASE WHEN n_tokens IS NULL OR n_tokens = 0 "
            f"THEN CAST(NULL AS INT) "
            f"ELSE CAST((n_stop * {SWEEP_STEPS}) DIV n_tokens AS INT) "
            f"END AS b")
    )


def sweep_output(spark: SparkSession, per_bucket: DataFrame,
                 total: DataFrame) -> DataFrame:
    """Grid + DESC-cumulate tail of the threshold sweep, factored so the
    streaming drift monitor's folded bucket state produces the IDENTICAL
    21-row table (same BIGINT sums -> same derived doubles).
    ``per_bucket``: (b, n, tok) for non-NULL buckets; ``total``: 1-row
    (n_total) counting every doc including unscorable ones."""
    grid = spark.range(0, SWEEP_STEPS + 1).select(
        F.col("id").cast("int").alias("b"))
    w = (Window.orderBy(F.col("b").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        grid.join(per_bucket, "b", "left")
        .select("b", F.coalesce("n", F.lit(0)).alias("n"),
                F.coalesce("tok", F.lit(0)).alias("tok"))
        .withColumn("n_kept", F.sum("n").over(w).cast("long"))
        .withColumn("tok_kept", F.sum("tok").over(w).cast("long"))
        .crossJoin(F.broadcast(total))      # 1-row scalar, not a collect
        .selectExpr(
            f"CAST(b AS DOUBLE) / {SWEEP_STEPS} AS threshold",
            "n_kept",
            # nullif: an empty corpus reads NULL fractions, not a
            # 0.0/0.0 NaN the engines could disagree on
            "CAST(n_kept AS DOUBLE) / CAST(nullif(n_total, 0) AS DOUBLE)"
            " AS frac_kept",
            "CAST(tok_kept AS DOUBLE) / CAST(nullif(n_kept, 0) AS DOUBLE)"
            " AS mean_tokens_kept")
        .orderBy("threshold")
    )


def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve for the stopword-ratio quality filter: for each
    threshold t in a 0.05 grid, how many documents survive `ratio >= t`,
    what corpus fraction that is, and the mean token count of the
    survivors — the table a curator reads to PICK the threshold instead
    of guessing it (Gopher-style rules are exactly this knob).

    Scale shape: one corpus scan bins every doc into its bucket
    b = (n_stop * STEPS) DIV n_tokens — INTEGER arithmetic, so a doc in
    bucket b has ratio >= b/STEPS exactly, including docs landing
    exactly on a grid boundary (7/20 bins to bucket 7, never one off;
    the earlier floor(ratio*STEPS) form could mis-bin boundary ratios
    through double rounding) — then a DESC running sum over the
    ~21-row bucket table turns bins into >=-threshold cumulative counts.
    The window state is O(STEPS), never O(corpus) — the standard
    histogram-then-cumulate shape for threshold sweeps; a naive
    grid-cross-join would scan the corpus once per threshold."""
    docs = t(spark, sf_dir, "documents")
    binned = quality_binned_frame(docs) \
        .transform(cut_lineage)   # two consumers, one corpus scan
    total = binned.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"))  # 1-row scalar
    per_bucket = (binned.filter(F.col("b").isNotNull())
                  .groupBy("b")
                  .agg(F.count(F.lit(1)).alias("n"),
                       F.sum("n_tokens").alias("tok")))
    return sweep_output(spark, per_bucket, total)


def _sweep_oracle() -> str:
    toks = H.tokens("text", "duck")
    n_stop = _array_count_in(toks, EN_STOPWORDS, "duck")
    return f"""
WITH binned AS (
  SELECT n_tokens,
         CASE WHEN n_tokens IS NULL OR n_tokens = 0 THEN CAST(NULL AS INT)
              ELSE CAST((n_stop * {SWEEP_STEPS}) // n_tokens AS INT)
              END AS b
  FROM (SELECT len({toks}) AS n_tokens,
               CAST({n_stop} AS BIGINT) AS n_stop
        FROM documents)),
total AS (SELECT COUNT(*) AS n_total FROM binned),
per_bucket AS (
  SELECT b, COUNT(*) AS n, SUM(n_tokens) AS tok FROM binned
  WHERE b IS NOT NULL GROUP BY b),
grid AS (SELECT unnest(range(0, {SWEEP_STEPS} + 1)) AS b),
cum AS (
  SELECT g.b, COALESCE(p.n, 0) AS n, COALESCE(p.tok, 0) AS tok
  FROM grid g LEFT JOIN per_bucket p ON p.b = g.b)
SELECT CAST(b AS DOUBLE) / {SWEEP_STEPS} AS threshold,
       CAST(SUM(n) OVER (ORDER BY b DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n_kept,
       CAST(SUM(n) OVER (ORDER BY b DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / (SELECT NULLIF(n_total, 0) FROM total) AS frac_kept,
       CAST(SUM(tok) OVER (ORDER BY b DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         / CAST(NULLIF(SUM(n) OVER (ORDER BY b DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
            AS DOUBLE) AS mean_tokens_kept
FROM cum
ORDER BY threshold
"""


QUERIES["quality_threshold_sweep"] = quality_threshold_sweep
ORACLES["quality_threshold_sweep"] = _sweep_oracle()


# --- language-ID confusion matrix ----------------------------------------------
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeled-vs-predicted confusion counts for the marker-word
    language identifier — the evaluation table that decides whether the
    heuristic is good enough to route documents (a heavy off-diagonal
    cell names the language pair that needs more markers; a heavy
    'unknown' column says the marker lists are too small).

    Scale shape: text_language_id's scan-local scoring followed by one
    map-side-combinable count over a (langs+1)^2-bounded key space."""
    pred = text_language_id(spark, sf_dir)
    return (pred.groupBy("labeled_lang", "predicted_lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("labeled_lang", "predicted_lang"))


def _confusion_oracle() -> str:
    return f"""
SELECT labeled_lang, predicted_lang, COUNT(*) AS n_docs
FROM ({_langid_oracle()})
GROUP BY labeled_lang, predicted_lang
ORDER BY labeled_lang, predicted_lang
"""


QUERIES["lang_confusion_matrix"] = lang_confusion_matrix
ORACLES["lang_confusion_matrix"] = _confusion_oracle()
