"""Text analysis for LLM training-data pipelines (extension scope,
SURVEY.md §7 step 8): language-ID, quality scoring, token counting,
document fingerprinting — over the `documents` fixture table.

Everything stays JVM-side (built-in string/array/lambda functions in
whole-stage codegen); no Python UDFs. At 100 TB these are pure
map-side transforms: no shuffle at all, so they scale linearly with
input splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from propensity_spark.io import load_table

# Tiny per-language stopword lists for the n-gram/stopword heuristic.
# (A real pipeline ships fastText or CLD3; this is the deterministic,
# dependency-free heuristic the container permits.)
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "de", "que", "los"),
    "fr": ("le", "la", "les", "et", "des"),
}

_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def _words(col: str = "text"):
    return F.split(F.col(col), " ")


# Word-bigram list over a pre-split `__words` column (map-only). Spark
# sequence() is DESCENDING when stop < start, so the <2-word case must
# be guarded explicitly. Same hoist as dedup._SHINGLES_FROM_WORDS:
# evaluating split(text) inside the lambda re-tokenizes the document
# once per bigram — O(words^2) char work per doc.
_BIGRAMS_FROM_WORDS = (
    "CASE WHEN size(__words) < 2 THEN array()"
    " ELSE transform(sequence(1, size(__words) - 1),"
    " i -> concat(element_at(__words, i), ' ',"
    " element_at(__words, i + 1))) END"
)


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring features: length, word stats, stopword ratio,
    unique-word ratio, Gopher-style repetition signals (duplicate-bigram
    fraction, symbol-to-word ratio — the published heuristic family from
    Rae et al. 2021 'Scaling Language Models' §A1.1), and a composite
    keep flag. All built-ins, map-only. split(text) and the bigram list
    are hoisted into their own projections (multi-referenced aliases
    survive CollapseProject) so each evaluates once per row, not once
    per use site."""
    docs = load_table(spark, sf_dir, "documents")
    stop_list = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    staged = docs.select(
        "doc_id", "n_chars", "text", F.split("text", " ").alias("__words")
    ).select("doc_id", "n_chars", "text", "__words", F.expr(_BIGRAMS_FROM_WORDS).alias("__bigrams"))
    return staged.select(
        "doc_id",
        "n_chars",
        F.size("__words").alias("word_count"),
        F.expr("round(1e-9 + n_chars / size(__words), 6)").alias("avg_word_len"),
        F.expr(
            f"round(1e-9 + size(filter(__words, w -> w IN ({stop_list})))"
            " / size(__words), 6)"
        ).alias("stopword_ratio"),
        F.expr(
            "round(1e-9 + size(array_distinct(__words)) / size(__words), 6)"
        ).alias("uniq_word_ratio"),
        F.expr(
            "CASE WHEN size(__bigrams) = 0 THEN 0.0"
            " ELSE round(1e-9 + 1.0 - size(array_distinct(__bigrams))"
            " / size(__bigrams), 6) END"
        ).alias("dup_bigram_frac"),
        F.expr(
            "round(1e-9 + (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '')))"
            " / size(__words), 6)"
        ).alias("symbol_word_ratio"),
        F.expr(
            "CASE WHEN size(__words) BETWEEN 10 AND 1000"
            "      AND size(array_distinct(__words)) / size(__words) > 0.2"
            " THEN 1 ELSE 0 END"
        ).cast("int").alias("quality_keep"),
    )


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish regex token
    count (letters / digits / punctuation as separate tokens) and the
    chars-per-token ratio LLM data work keys on."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_words()).alias("ws_tokens"),
        F.regexp_count("text", F.lit(_TOKEN_RE)).alias("re_tokens"),
        F.expr(f"round(1e-9 + n_chars / regexp_count(text, '{_TOKEN_RE}'), 6)").alias(
            "chars_per_token"
        ),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID with deterministic tie-break (first
    language in score order wins via greatest+CASE chain)."""
    docs = load_table(spark, sf_dir, "documents")
    scores = [
        F.expr(
            "size(filter(split(text, ' '), w -> w IN ({})))".format(
                ", ".join(f"'{w}'" for w in words)
            )
        ).alias(f"score_{lang}")
        for lang, words in LANG_STOPWORDS.items()
    ]
    scored = docs.select("doc_id", "lang", *scores)
    langs = list(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best == 0, F.lit("unknown"))
    for lang in langs:  # fixed order => deterministic tie-break
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id",
        F.col("lang").alias("lang_declared"),
        *[F.col(f"score_{lang}") for lang in langs],
        pred.alias("lang_pred"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: order-insensitive content fingerprint
    (md5 of the sorted distinct token set) + a positional rolling-style
    fingerprint (md5 of the raw text) for exact matching."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("exact_fp"),
        F.expr(
            "md5(cast(concat_ws(' ', array_sort(array_distinct(split(lower(text), ' '))))"
            " as binary))"
        ).alias("bag_fp"),
    )


def q_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four per-document map-only analyses — quality scoring, token
    counting, language-ID, fingerprinting — joined at doc_id grain into
    one gate entry. All four are pure projections of the same row, so
    the 'join' is a single select: one scan, zero shuffles, identical
    plan at 100 TB."""
    quality = q_text_quality(spark, sf_dir)
    tokens = q_token_count(spark, sf_dir).drop("ws_tokens")  # == word_count
    lang = q_lang_id(spark, sf_dir)
    fp = q_doc_fingerprint(spark, sf_dir)
    return quality.join(tokens, "doc_id").join(lang, "doc_id").join(fp, "doc_id")


_EN = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])

# DuckDB twin of _BIGRAMS_SPARK: range(1, n) is end-exclusive and empty
# when n <= 1, so no explicit short-doc guard is needed.
_BIGRAMS_DUCK = (
    "list_transform(range(1, len(string_split(text, ' '))),"
    " i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])"
)

_score_cols = ",\n               ".join(
    "len(list_filter(string_split(text, ' '), w -> w IN ({})))::INT AS score_{}".format(
        ", ".join(f"'{w}'" for w in words), lang
    )
    for lang, words in LANG_STOPWORDS.items()
)
_langs = list(LANG_STOPWORDS)
_best = "greatest({})".format(", ".join(f"score_{lang}" for lang in _langs))
_pred_chain = " ".join(
    f"WHEN score_{lang} = {_best} THEN '{lang}'" for lang in _langs
)

ORACLES = {
    "doc_profile": f"""
        WITH scored AS (
            SELECT doc_id, lang AS lang_declared,
                   {_score_cols}
            FROM documents
        )
        SELECT d.doc_id, d.n_chars,
               CAST(len(string_split(text, ' ')) AS INT) AS word_count,
               round(1e-9 + n_chars / len(string_split(text, ' ')), 6) AS avg_word_len,
               round(1e-9 + CAST(len(list_filter(string_split(text, ' '),
                     w -> w IN ({_EN}))) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS stopword_ratio,
               round(1e-9 + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS uniq_word_ratio,
               CASE WHEN len({_BIGRAMS_DUCK}) = 0 THEN 0.0
                    ELSE round(1e-9 + 1.0 - CAST(len(list_distinct({_BIGRAMS_DUCK})) AS DOUBLE)
                         / len({_BIGRAMS_DUCK}), 6) END AS dup_bigram_frac,
               round(1e-9 + CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                     / len(string_split(text, ' ')), 6) AS symbol_word_ratio,
               CAST(CASE WHEN len(string_split(text, ' ')) BETWEEN 10 AND 1000
                          AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                              / len(string_split(text, ' ')) > 0.2
                    THEN 1 ELSE 0 END AS INT) AS quality_keep,
               CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS INT) AS re_tokens,
               round(1e-9 + n_chars / len(regexp_extract_all(text, '{_TOKEN_RE}')), 6)
                   AS chars_per_token,
               s.lang_declared, {", ".join(f"s.score_{lang}" for lang in _langs)},
               CASE WHEN {_best} = 0 THEN 'unknown' {_pred_chain} END AS lang_pred,
               md5(text) AS exact_fp,
               md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' '))
                   AS bag_fp
        FROM documents d JOIN scored s ON d.doc_id = s.doc_id
    """,
}

QUERIES = {
    "doc_profile": q_doc_profile,
}


# PII patterns kept dialect-portable (no \d / \b shorthands — Spark SQL
# string literals and RE2 treat backslashes differently).
_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}"
_PHONE_RE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII filtering for training-data pipelines: count + scrub email
    and phone patterns; emits the scrubbed-text digest so the oracle
    can verify the rewrite byte-for-byte. Map-only at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = (
        f"regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>'),"
        f" '{_PHONE_RE}', '<PHONE>')"
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE_RE)).alias("n_phones"),
        F.expr(f"md5(cast({scrubbed} as binary))").alias("scrubbed_fp"),
    )


ORACLES["pii_scrub"] = f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INT) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_fp
    FROM documents
"""

QUERIES["pii_scrub"] = q_pii_scrub


CHUNK_SIZE = 50  # words per chunk
CHUNK_STRIDE = 40  # 10-word overlap


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking for LLM ingestion: fixed-size word windows
    with overlap (CHUNK_SIZE/CHUNK_STRIDE), emitted as (doc_id,
    chunk_idx, n_words, chunk_fp). Map-side explode — no shuffle at any
    scale; short docs yield exactly one chunk. The digest (not the
    text) is emitted so the oracle pins the exact chunk content without
    megabyte rows."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.split("text", " ").alias("words"))
    starts = (
        f"CASE WHEN size(words) <= {CHUNK_SIZE} THEN array(1) "
        f"ELSE sequence(1, size(words) - {CHUNK_SIZE - CHUNK_STRIDE}, {CHUNK_STRIDE}) END"
    )
    chunks = words.select(
        "doc_id",
        "words",
        F.posexplode(F.expr(starts)).alias("chunk_idx", "start"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.expr(f"size(slice(words, start, {CHUNK_SIZE}))").alias("n_words"),
        F.expr(
            f"md5(cast(concat_ws(' ', slice(words, start, {CHUNK_SIZE})) as binary))"
        ).alias("chunk_fp"),
    )


ORACLES["chunk_documents"] = f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         starts AS (
             SELECT doc_id, words,
                    unnest(CASE WHEN len(words) <= {CHUNK_SIZE} THEN [1]
                           ELSE range(1, len(words) - {CHUNK_SIZE - CHUNK_STRIDE} + 1,
                                      {CHUNK_STRIDE}) END) AS start,
                    generate_subscripts(CASE WHEN len(words) <= {CHUNK_SIZE} THEN [1]
                           ELSE range(1, len(words) - {CHUNK_SIZE - CHUNK_STRIDE} + 1,
                                      {CHUNK_STRIDE}) END, 1) - 1 AS chunk_idx
             FROM w
         )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(words[start:start + {CHUNK_SIZE} - 1]) AS INT) AS n_words,
           md5(array_to_string(words[start:start + {CHUNK_SIZE} - 1], ' ')) AS chunk_fp
    FROM starts
"""

QUERIES["chunk_documents"] = q_chunk_documents


TFIDF_TOP_K = 5
_MIN_TERM_LEN = 3


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction (top-K terms per document): explode ->
    per-(doc, term) TF -> per-term DF -> score tf*ln(N/df) -> window
    top-K with term tie-break. Shuffle profile at 100 TB: TF shuffles
    on (doc_id, term) — high cardinality, balanced; DF shuffles on term
    with map-side partial distinct. The DF->TF join carries NO
    broadcast hint: on this fixture AQE broadcasts it anyway (plan-
    pinned), but a web-scale corpus's distinct-token set (typos, URLs,
    code tokens) can run into the billions, where a forced hint OOMs
    the driver — unhinted, AQE measures the built side at runtime and
    falls back to a shuffled hash join exactly when it must. Ranking
    is rounded before ordering so the result is engine-portable."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("term"),
    ).where(
        (F.length("term") >= _MIN_TERM_LEN) & ~F.col("term").isin(*LANG_STOPWORDS["en"])
    )
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tokens.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")) + 1e-9, 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "score", F.col("rnk").cast("int").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# Domain mixing: deterministic weighted sampling per source — the data-
# mixing step of every LLM pretraining pipeline (per-domain rates a la
# The Pile / DoReMi mixture weights). Sampling must be DETERMINISTIC
# (reproducible dataset builds, no rand()): a doc is kept iff
# uniform(md5(doc_id)) < rate(source). Map-side filter + one tiny
# groupBy(source) shuffle; at 100 TB the filter prunes at the scan and
# the aggregate is |sources|-sized.
# ---------------------------------------------------------------------------

# Mixing config: source name -> target sampling rate. Generated, fixed,
# and embedded in both engines' SQL.
MIX_RATES = {f"src{i}": round(0.15 + 0.04 * i, 2) for i in range(20)}

_MIX_CASE = "CASE source {} ELSE 0.0 END".format(
    " ".join(f"WHEN '{s}' THEN {r}" for s, r in MIX_RATES.items())
)
# uniform in [0, 1): first 8 md5 hex chars of the doc_id string -> int.
_U_SPARK = (
    "(cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 8), 16, 10)"
    " as bigint) % 1000000) / 1000000.0"
)
_U_DUCK = (
    "(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 1000000) / 1000000.0"
)


def q_source_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted domain-mixing sample: keep each doc iff its md5-uniform
    < its source's configured rate, then report the per-source audit
    (docs in/out, sampled whitespace tokens) every dataset build logs."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("rate", F.expr(_MIX_CASE))
        .withColumn("u", F.expr(_U_SPARK))
        .groupBy("source", "rate")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("u") < F.col("rate"), 1).otherwise(0)).alias("n_sampled"),
            F.sum(
                F.when(F.col("u") < F.col("rate"), F.size(_words())).otherwise(0)
            ).cast("bigint").alias("sampled_tokens"),
        )
    )


_MIX_SAMPLE_SQL = f"""
    SELECT source, {_MIX_CASE} AS rate,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN {_U_DUCK} < {_MIX_CASE} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_sampled,
           CAST(sum(CASE WHEN {_U_DUCK} < {_MIX_CASE}
                    THEN len(string_split(text, ' ')) ELSE 0 END) AS BIGINT)
               AS sampled_tokens
    FROM documents
    GROUP BY source
"""


def split_by_hash(
    df: DataFrame, key: str, fractions: dict[str, float]
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket = where the
    md5-uniform of the key falls in the cumulative fraction ladder.
    Properties a training pipeline needs that `randomSplit` lacks:
    stable across runs/partitionings, stable under appends (a doc's
    split never changes when other docs arrive), and join-free for
    incremental builds. Map-only — adds a `split` column, no shuffle.

    `fractions` values must sum to 1.0 (e.g. {"train": .9,
    "val": .05, "test": .05})."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    u_expr = (
        f"(cast(conv(substr(md5(cast(cast({key} as string) as binary)), 1, 8), 16, 10)"
        " as bigint) % 1000000) / 1000000.0"
    )
    expr = None
    cum = 0.0
    last = list(fractions)[-1]
    u = F.expr(u_expr)
    for name, frac in fractions.items():
        cum += frac
        cond = F.lit(True) if name == last else (u < F.lit(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


ORACLES["tfidf_keywords"] = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
        FROM documents
    ),
    tok2 AS (
        SELECT * FROM tok
        WHERE len(term) >= {_MIN_TERM_LEN} AND term NOT IN ({_EN})
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY 1, 2),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, term, tf, df,
               round(tf * ln(CAST(n_docs AS DOUBLE) / df) + 1e-9, 6) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score, CAST(rnk AS INT) AS rnk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, term ASC) AS rnk
        FROM scored
    ) WHERE rnk <= {TFIDF_TOP_K}
"""

QUERIES["tfidf_keywords"] = q_tfidf_keywords


# ---------------------------------------------------------------------------
# sampling_suite: the deterministic-sampling family in ONE tagged-union
# gate entry (round-3 consolidation — `source_mix_sample` plus the
# previously pytest-only `split_by_hash`). Sections share
# (grp, rate, n_docs, n_sel, tokens):
#   mix:<source>  — the weighted domain-mixing audit rows
#   split:<name>  — per-split doc/token counts from the append-stable
#                   md5 train/val/test assignment
# The split ladder's cumulative bounds are Python floats embedded via
# repr() into BOTH engines' predicates, so 0.8 + 0.1 compares as the
# same 0.9000000000000001 double on each side.
# ---------------------------------------------------------------------------

SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _split_ladder_sql() -> str:
    parts, cum = [], 0.0
    names = list(SPLIT_FRACTIONS)
    for name in names[:-1]:
        cum += SPLIT_FRACTIONS[name]
        parts.append(f"WHEN {_U_DUCK} < {cum!r} THEN 'split:{name}'")
    return "CASE " + " ".join(parts) + f" ELSE 'split:{names[-1]}' END"


def q_sampling_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mix = q_source_mix_sample(spark, sf_dir).select(
        F.concat(F.lit("mix:"), F.col("source")).alias("grp"),
        # the CASE literals are DECIMAL; normalize so the union with the
        # split sections (python-float DOUBLEs) types/format identically
        F.col("rate").cast("double").alias("rate"),
        "n_docs",
        F.col("n_sampled").alias("n_sel"),
        F.col("sampled_tokens").alias("tokens"),
    )
    frac_map = F.create_map(
        *[F.lit(x) for kv in SPLIT_FRACTIONS.items() for x in kv]
    )
    split = (
        split_by_hash(docs, "doc_id", SPLIT_FRACTIONS)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(_words())).cast("bigint").alias("tokens"),
        )
        .select(
            F.concat(F.lit("split:"), F.col("split")).alias("grp"),
            F.element_at(frac_map, F.col("split")).alias("rate"),
            "n_docs",
            F.col("n_docs").alias("n_sel"),
            "tokens",
        )
    )
    return mix.unionByName(split)


_SPLIT_RATE_CASE = "CASE " + " ".join(
    f"WHEN s = 'split:{name}' THEN {frac!r}" for name, frac in SPLIT_FRACTIONS.items()
) + " END"

ORACLES["sampling_suite"] = f"""
    SELECT 'mix:' || source AS grp, CAST(rate AS DOUBLE) AS rate,
           n_docs, n_sampled AS n_sel, sampled_tokens AS tokens
    FROM ({_MIX_SAMPLE_SQL}) m
    UNION ALL
    SELECT grp, CAST({_SPLIT_RATE_CASE.replace("s = ", "grp = ")} AS DOUBLE) AS rate,
           n_docs, n_docs AS n_sel, tokens
    FROM (
        SELECT {_split_ladder_sql()} AS grp,
               count(*) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents
        GROUP BY 1
    ) sp
"""

QUERIES["sampling_suite"] = q_sampling_suite


def pack_documents(
    spark: SparkSession,
    sf_dir: str,
    max_tokens: int = 512,
    n_blocks: int | None = None,
) -> DataFrame:
    """Sequence packing for training-batch assembly: group documents
    into bins whose whitespace-token totals stay <= max_tokens
    (first-fit-decreasing). A globally optimal packing is inherently
    sequential, so the operator packs PER BLOCK: docs hash-partition
    into `n_blocks` independent blocks (default: the session's shuffle
    parallelism) and FFD runs inside each via an Arrow-batched
    applyInPandas — linear scale-out, with waste bounded by the open
    bins of each block (FFD is a 11/9-OPT + 1 heuristic per block).
    Docs longer than max_tokens get a single-doc overflow bin,
    flagged. Deterministic: block = crc32(doc_id), FFD order =
    (tokens desc, doc_id asc).

    Returns (doc_id, tokens, bin_id, oversize) with bin_id globally
    unique (block * 2^32 + local bin index)."""
    import pandas as pd

    n_blocks = n_blocks or int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("tokens"),
        (F.crc32(F.col("doc_id").cast("string")) % n_blocks).alias("block"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["tokens", "doc_id"], ascending=[False, True])
        block = int(pdf["block"].iloc[0]) if len(pdf) else 0
        bins: list[int] = []  # remaining capacity per local bin
        out_bin, out_over = [], []
        for t in pdf["tokens"]:
            t = int(t)
            if t > max_tokens:
                bins.append(-1)  # closed overflow bin
                out_bin.append(len(bins) - 1)
                out_over.append(True)
                continue
            for i, cap in enumerate(bins):
                if cap >= t:
                    bins[i] = cap - t
                    out_bin.append(i)
                    out_over.append(False)
                    break
            else:
                bins.append(max_tokens - t)
                out_bin.append(len(bins) - 1)
                out_over.append(False)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "tokens": pdf["tokens"].values,
                "bin_id": [(block << 32) + b for b in out_bin],
                "oversize": out_over,
            }
        )

    return docs.groupBy("block").applyInPandas(
        pack, "doc_id bigint, tokens int, bin_id bigint, oversize boolean"
    )


# ---------------------------------------------------------------------------
# Vocabulary heavy hitters — the corpus term-frequency step of tokenizer
# (BPE/unigram) vocabulary construction. Scale architecture: counting
# EVERY distinct token shuffles the whole token stream (web corpora:
# 10^9+ distinct tokens, massively skewed); instead phase 1 counts only
# a deterministic md5-uniform document sample to nominate candidates
# (a token with global support above the floor appears in the sample
# with overwhelming probability at these counts), and phase 2 exact-
# counts ONLY the nominated candidates via a broadcast join — the full
# corpus is scanned once more but the shuffle carries just |candidates|
# groups. Both phases are plain SQL, so the whole operator oracle-
# checks. The sketch alternative for one-pass regimes (true streams)
# is misra_gries_topk below, pytest-pinned to contain the true top-k.
# ---------------------------------------------------------------------------

HH_SAMPLE_RATE = 0.2  # phase-1 document sample
HH_CAND_MIN = 5  # min sample count to nominate a candidate
HH_TOP_K = 50


def q_vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).where(F.length("token") >= 1)
    sampled = toks.where(F.expr(_U_SPARK) < HH_SAMPLE_RATE)
    cand = (
        sampled.groupBy("token")
        .agg(F.count(F.lit(1)).alias("sample_cnt"))
        .where(F.col("sample_cnt") >= HH_CAND_MIN)
    )
    exact = (
        toks.join(F.broadcast(cand), "token")
        .groupBy("token", "sample_cnt")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        exact.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= HH_TOP_K)
        .select("token", "cnt", "sample_cnt", "rnk")
    )


VOCAB_HEAVY_HITTERS_SQL = f"""
    WITH toks AS (
        SELECT doc_id, t.token
        FROM documents, unnest(string_split(lower(text), ' ')) AS t(token)
        WHERE len(t.token) >= 1
    ),
    cand AS (
        SELECT token, CAST(count(*) AS BIGINT) AS sample_cnt
        FROM toks WHERE {_U_DUCK} < {HH_SAMPLE_RATE}
        GROUP BY token HAVING count(*) >= {HH_CAND_MIN}
    ),
    exact AS (
        SELECT t.token, c.sample_cnt, CAST(count(*) AS BIGINT) AS cnt
        FROM toks t JOIN cand c ON t.token = c.token
        GROUP BY 1, 2
    )
    SELECT token, cnt, sample_cnt,
           CAST(row_number() OVER (ORDER BY cnt DESC, token ASC) AS INT) AS rnk
    FROM exact
    QUALIFY rnk <= {HH_TOP_K}
"""


def misra_gries_topk(
    toks: DataFrame, col: str, k: int, capacity: int = 0
) -> DataFrame:
    """One-pass distributed Misra-Gries heavy hitters: each partition
    maintains a `capacity`-counter MG summary (Arrow-batched
    mapInPandas — vectorized pandas value_counts per batch folded into
    the running summary, never a Python loop per row), the per-
    partition summaries (tiny: <= capacity rows each) are merged by a
    single groupBy, and the merged overestimate-bounded counts rank the
    candidates. MG guarantee: any item with true frequency
    > n/(capacity+1) survives; merged counts undercount by at most
    n_partition/(capacity+1) summed — so with capacity >> k the true
    top-k is contained in the reported top-`capacity` set. This is the
    one-pass regime's answer (true streams / IO-bound scans) where the
    two-pass candidate+verify of q_vocab_heavy_hitters can't re-scan."""
    import pandas as pd

    capacity = capacity or 8 * k

    def summarize(batches):
        counts: dict = {}
        for pdf in batches:
            for tok, c in pdf[col].value_counts().items():
                counts[tok] = counts.get(tok, 0) + int(c)
            if len(counts) > capacity:
                # MG decrement: subtract the (capacity+1)-th largest
                # count from everyone, drop non-positive — the batched
                # equivalent of per-item decrements, same guarantee.
                cut = sorted(counts.values(), reverse=True)[capacity]
                counts = {t: c - cut for t, c in counts.items() if c > cut}
        yield pd.DataFrame(
            {"token": list(counts), "mg_cnt": list(counts.values())}
        )

    summaries = toks.mapInPandas(summarize, "token string, mg_cnt long")
    merged = summaries.groupBy("token").agg(F.sum("mg_cnt").alias("mg_cnt"))
    w = Window.orderBy(F.desc("mg_cnt"), F.asc("token"))
    return (
        merged.withColumn("rnk", F.row_number().over(w).cast("int"))
        .where(F.col("rnk") <= k)
        .select("token", "mg_cnt", "rnk")
    )


# ---------------------------------------------------------------------------
# Perplexity filtering (CCNet, Wenzek et al. 2020): score each document
# by an n-gram language model trained ON THE CORPUS ITSELF and drop the
# high-perplexity tail (boilerplate-free gibberish, encoding noise,
# keyword stuffing). CCNet uses a pretrained KenLM 5-gram; the
# container-permitted, dependency-free equivalent is an add-one-
# smoothed BIGRAM model built from the same tables — the pipeline
# shape (train counts -> join scores -> threshold) is identical and
# every step is relational, so the whole operator oracle-checks.
#
# Scale: unigram/bigram count tables are vocabulary-bounded (<< corpus)
# and shuffle once each; scoring is the doc-bigram explode joined to
# the count tables (hash join on the bigram key; AQE broadcasts the
# count side when it fits, falls back to shuffle when a web-scale
# vocabulary doesn't — same rationale as the TF-IDF unhint).
# ---------------------------------------------------------------------------

PPL_SMOOTH_K = 1.0  # add-k (Laplace) smoothing
PPL_KEEP_MAX = 500.0  # keep docs with perplexity at or below this


def q_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.split(F.lower("text"), " ").alias("__words")
    ).select(
        "doc_id",
        F.expr("filter(__words, w -> length(w) >= 1)").alias("__words"),
    )
    bigrams = words.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(__words) < 2 THEN array()"
                " ELSE transform(sequence(1, size(__words) - 1),"
                " i -> struct(element_at(__words, i) AS a,"
                " element_at(__words, i + 1) AS b)) END"
            )
        ).alias("p"),
    ).select("doc_id", "p.a", "p.b")
    uni = (
        words.select(F.explode("__words").alias("a"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("ca"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    bi = bigrams.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab"))
    scored = (
        bigrams.join(bi, ["a", "b"])
        .join(uni, "a")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            (
                F.log2(
                    (F.col("cab") + F.lit(PPL_SMOOTH_K))
                    / (F.col("ca") + F.lit(PPL_SMOOTH_K) * F.col("v"))
                )
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.lit(1e-9) + F.pow(F.lit(2.0), -F.avg("lp")), 2).alias("ppl"),
        (F.pow(F.lit(2.0), -F.avg("lp")) <= PPL_KEEP_MAX).cast("int").alias("keep"),
    )


PERPLEXITY_SQL = f"""
    WITH words AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), w -> len(w) >= 1) AS ws
        FROM documents
    ),
    bigrams AS (
        SELECT doc_id, ws[i] AS a, ws[i + 1] AS b
        FROM words, unnest(range(1, len(ws))) AS t(i)
        WHERE len(ws) >= 2
    ),
    uni AS (
        SELECT ws_w AS a, CAST(count(*) AS BIGINT) AS ca
        FROM words, unnest(ws) AS u(ws_w) GROUP BY 1
    ),
    vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM uni),
    bi AS (
        SELECT a, b, CAST(count(*) AS BIGINT) AS cab FROM bigrams GROUP BY 1, 2
    ),
    scored AS (
        SELECT g.doc_id,
               log2((c.cab + {PPL_SMOOTH_K}) / (u.ca + {PPL_SMOOTH_K} * v.v)) AS lp
        FROM bigrams g
        JOIN bi c ON g.a = c.a AND g.b = c.b
        JOIN uni u ON g.a = u.a, vocab v
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           round(1e-9 + pow(2.0, -avg(lp)), 2) AS ppl,
           CAST(pow(2.0, -avg(lp)) <= {PPL_KEEP_MAX} AS INT) AS keep
    FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# BM25 ranked retrieval — the lexical-search half of every RAG /
# training-data curation stack (Robertson-Sparck Jones probabilistic
# ranking; the reference pipeline has no search operator, this is part
# of the LLM-data extension surface). For a FIXED query-term set the
# classic explode -> (doc, term) TF -> term DF pipeline is overkill:
# with |query| literals the per-term TFs are map-side array
# expressions over the tokenized doc (no explode, no (doc, term)
# shuffle AT ALL), corpus statistics (N, avgdl, per-term df) collapse
# to ONE 1-row broadcast aggregate, scoring is map-side arithmetic,
# and the final top-k is a rounded-score TakeOrdered. At 100 TB the
# only data movement is the 1-row stats broadcast and k result rows.
# (The inverted-index regime — millions of ad-hoc queries — is the
# q_tfidf_keywords shape instead: (doc, term) TF + term DF joins.)
# ---------------------------------------------------------------------------

BM25_QUERY = ("spark", "join", "vector")  # fixed literal query terms
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 20


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from propensity_spark.io import scan_floor_target

    docs = load_table(spark, sf_dir, "documents")
    terms = list(BM25_QUERY)
    src = docs.select("doc_id", "text")
    target = scan_floor_target(spark, sf_dir, "documents")
    if target:
        # Row-group-starved layout: tokenization (split + one filter
        # per query term) is the CPU and would otherwise run fused
        # above a one-row-group scan on a single core (guide §2.5).
        src = src.repartition(target, F.xxhash64("doc_id"))
    toked = src.select(
        "doc_id",
        F.expr(
            "filter(split(lower(text), ' '), w -> length(w) >= 1)"
        ).alias("__ws"),
    )
    tf_cols = [
        F.expr(f"size(filter(__ws, w -> w = '{t}'))").alias(f"tf{i}")
        for i, t in enumerate(terms)
    ]
    pertf = toked.select("doc_id", F.size("__ws").alias("dl"), *tf_cols)
    if target:
        # Reuse point (guide §2.4 "two operations keyed the same way
        # can share one exchange"): `pertf` feeds BOTH the corpus-stats
        # agg and the scored projection, and Catalyst does not dedupe
        # common subtrees — without this exchange the whole tokenize
        # chain runs twice (once under the broadcast build, once under
        # the probe). An identical Exchange node in both branches is
        # deduped by ReuseExchange, so tokenization happens ONCE and
        # the exchange carries only (doc_id, dl, tf0..tfN) ints.
        pertf = pertf.repartition(target, F.xxhash64("doc_id"))
    stats = pertf.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int")).alias(f"df{i}")
            for i in range(len(terms))
        ],
    )
    scored = pertf.crossJoin(F.broadcast(stats))
    contrib = [
        (
            F.log(
                F.lit(1.0)
                + (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5)
            )
            * (F.col(f"tf{i}") * (BM25_K1 + 1))
            / (
                F.col(f"tf{i}")
                + BM25_K1
                * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
            )
        )
        for i in range(len(terms))
    ]
    matched = sum(
        (F.col(f"tf{i}") > 0).cast("int") for i in range(len(terms))
    )
    ranked = scored.select(
        "doc_id",
        F.col("dl").cast("int").alias("dl"),
        matched.alias("matched"),
        F.round(sum(contrib) + 1e-9, 6).alias("score"),
    ).where(F.col("matched") > 0)
    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps, no global sort), then rank the <= K survivors with a
    # trivial window — a global row_number over ALL matched docs would
    # funnel the whole corpus through one reducer at scale.
    topk = ranked.orderBy(F.desc("score"), F.asc("doc_id")).limit(BM25_TOP_K)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        "doc_id", "dl", "matched", "score",
        F.row_number().over(w).cast("int").alias("rnk"),
    )


def _bm25_sql() -> str:
    terms = list(BM25_QUERY)
    tf_sel = ", ".join(
        f"len(list_filter(ws, w -> w = '{t}')) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_sel = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(terms))
    )
    contrib = " + ".join(
        f"ln(1.0 + (s.n - s.df{i} + 0.5) / (s.df{i} + 0.5))"
        f" * (t.tf{i} * ({BM25_K1} + 1))"
        f" / (t.tf{i} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * t.dl / s.avgdl))"
        for i in range(len(terms))
    )
    matched = " + ".join(
        f"CASE WHEN t.tf{i} > 0 THEN 1 ELSE 0 END" for i in range(len(terms))
    )
    return f"""
    WITH toked AS (
        SELECT doc_id,
               list_filter(string_split(lower(text), ' '), w -> len(w) >= 1) AS ws
        FROM documents
    ),
    t AS (SELECT doc_id, len(ws) AS dl, {tf_sel} FROM toked),
    s AS (SELECT count(*) AS n, avg(dl) AS avgdl, {df_sel} FROM t),
    ranked AS (
        SELECT t.doc_id, CAST(t.dl AS INT) AS dl,
               CAST({matched} AS INT) AS matched,
               round({contrib} + 1e-9, 6) AS score
        FROM t, s
        WHERE {matched} > 0
    )
    SELECT doc_id, dl, matched, score,
           CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rnk
    FROM ranked
    QUALIFY rnk <= {BM25_TOP_K}
    """


BM25_SQL = _bm25_sql()


# ---------------------------------------------------------------------------
# Gopher repetition filters (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", Table A1): remove
# docs where (a) the most frequent {2,3,4}-gram covers too many
# characters, or (b) duplicated {5..10}-grams cover too many
# characters. q_text_quality carries the cheap dup-bigram signal; this
# is the full published grid with Gopher's exact thresholds.
#
# All nine signals are WITHIN-ROW array expressions (no explode, no
# shuffle — each doc computes its own n-gram counts via nested
# higher-order functions, JVM-side). Per-row cost is O(L^2) in the
# doc's word count, the same bound as any per-doc hash-count; docs are
# length-bounded upstream (quality_keep caps at 1000 words). Char
# fractions use the count-weighted form (sum of count x gram-chars
# over gram-chars), the standard relational simplification of Gopher's
# positional spans; ties for the most frequent gram break to the
# lexicographically smallest so both engines agree.
# ---------------------------------------------------------------------------

# threshold: max allowed char fraction (Gopher Table A1)
GOPHER_TOP_NGRAM = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
_GOPHER_NS = (*GOPHER_TOP_NGRAM, *GOPHER_DUP_NGRAM)


def _grams_spark(n: int) -> str:
    return (
        f"CASE WHEN size(__ws) < {n} THEN array()"
        f" ELSE transform(sequence(1, size(__ws) - {n} + 1),"
        f" i -> concat_ws(' ', slice(__ws, i, {n}))) END"
    )


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-gram counts via run-length over array_sort (r09): the old
    shape counted each distinct gram with its own filter() pass —
    O(|distinct| x L) per document per n, noop-measured 13.3 s at
    sf0.1 (the bench's count() hid it behind aggregate pruning). A
    sorted array yields every count as a run length in one O(L log L)
    pass, and the lexicographic order makes the Gopher tie-break (most
    frequent gram, ties to smallest) fall out of a strictly-greater
    update. Counts are identical — run length over sorted == count —
    so values are bit-identical to the unchanged DuckDB oracle."""
    from propensity_spark.io import scan_floor_target

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", "text"
    )
    target = scan_floor_target(spark, sf_dir, "documents")
    if target:
        # Row-group-starved layout (guide §2.5): this is the engine's
        # most CPU-dense per-row text path (8 n-gram families per doc).
        docs = docs.repartition(target, F.xxhash64("doc_id"))
    staged = docs.select(
        "doc_id",
        "n_chars",
        F.expr("filter(split(lower(text), ' '), w -> length(w) >= 1)").alias("__ws"),
    ).select(
        "doc_id",
        "n_chars",
        *[F.expr(f"array_sort({_grams_spark(n)})").alias(f"__g{n}") for n in _GOPHER_NS],
    )
    sel = [F.col("doc_id"), F.col("n_chars")]
    for n in GOPHER_TOP_NGRAM:
        # scan the sorted grams once: run = current run length, (bc,
        # bg) = best count and its gram. `>` (not `>=`) keeps the
        # FIRST gram reaching a count, i.e. the lexicographically
        # smallest — exactly array_min over (-cnt, gg). Empty array
        # falls through to the init struct -> (nc=0, gg='').
        sel.append(
            F.expr(
                f"aggregate(__g{n},"
                " struct('' AS prev, CAST(0 AS INT) AS run, CAST(0 AS INT) AS bc, '' AS bg),"
                " (a, x) -> struct("
                "   x AS prev,"
                "   IF(x = a.prev, a.run + 1, 1) AS run,"
                "   IF(IF(x = a.prev, a.run + 1, 1) > a.bc,"
                "      IF(x = a.prev, a.run + 1, 1), a.bc) AS bc,"
                "   IF(IF(x = a.prev, a.run + 1, 1) > a.bc, x, a.bg) AS bg),"
                " a -> struct(-a.bc AS nc, a.bg AS gg))"
            ).alias(f"__t{n}")
        )
    for n in GOPHER_DUP_NGRAM:
        # same sorted scan; a run is folded into (dup, tot) when the
        # gram changes, and the finish lambda folds the last run. The
        # init's prev='' run-0 folds to +0, so empty arrays yield
        # (0, 0) like the old empty-list aggregate.
        sel.append(
            F.expr(
                f"aggregate(__g{n},"
                " struct('' AS prev, CAST(0 AS BIGINT) AS run,"
                "        CAST(0 AS BIGINT) AS dup, CAST(0 AS BIGINT) AS tot),"
                " (a, x) -> IF(x = a.prev,"
                "   struct(x AS prev, a.run + 1 AS run, a.dup AS dup, a.tot AS tot),"
                "   struct(x AS prev, CAST(1 AS BIGINT) AS run,"
                "          a.dup + IF(a.run >= 2, a.run * length(a.prev), CAST(0 AS BIGINT)) AS dup,"
                "          a.tot + a.run * length(a.prev) AS tot)),"
                " a -> struct("
                "   a.dup + IF(a.run >= 2, a.run * length(a.prev), CAST(0 AS BIGINT)) AS dup,"
                "   a.tot + a.run * length(a.prev) AS tot))"
            ).alias(f"__d{n}")
        )
    reduced = staged.select(*sel)
    fracs = reduced.select(
        "doc_id",
        *[
            F.expr(
                f"CASE WHEN __t{n}.nc = 0 THEN 0.0"
                f" ELSE round(1e-9 + (-__t{n}.nc) * length(__t{n}.gg) / n_chars, 6) END"
            ).alias(f"rep{n}")
            for n in GOPHER_TOP_NGRAM
        ],
        *[
            F.expr(
                f"CASE WHEN __d{n}.tot = 0 THEN 0.0"
                f" ELSE round(1e-9 + __d{n}.dup / __d{n}.tot, 6) END"
            ).alias(f"dup{n}")
            for n in GOPHER_DUP_NGRAM
        ],
    )
    keep = " AND ".join(
        [f"rep{n} <= {t}" for n, t in GOPHER_TOP_NGRAM.items()]
        + [f"dup{n} <= {t}" for n, t in GOPHER_DUP_NGRAM.items()]
    )
    return fracs.select("*", F.expr(keep).cast("int").alias("gopher_keep"))


def _grams_duck(n: int) -> str:
    return (
        f"CASE WHEN len(ws) < {n} THEN []"
        f" ELSE list_transform(range(1, len(ws) - {n} + 2),"
        f" i -> array_to_string(ws[i:i + {n} - 1], ' ')) END"
    )


def _repetition_sql() -> str:
    gram_defs = ", ".join(f"{_grams_duck(n)} AS g{n}" for n in _GOPHER_NS)
    count_defs = ", ".join(
        f"list_transform(list_distinct(g{n}),"
        f" gg -> {{'cnt': len(list_filter(g{n}, x -> x = gg)), 'gg': gg}}) AS c{n}"
        for n in _GOPHER_NS
    )
    top_defs = ", ".join(
        f"list_max(list_transform(c{n}, s -> s.cnt)) AS top{n},"
        f" coalesce(list_sum(list_transform(c{n}, s -> s.cnt * len(s.gg))), 0) AS tot{n}"
        for n in GOPHER_TOP_NGRAM
    )
    # tie-break: among grams at the max count, the lexicographically
    # least; the max-count recompute inside the filter is O(|distinct|)
    topg_defs = ", ".join(
        f"list_aggregate(list_transform(list_filter(c{n},"
        f" s -> s.cnt = list_max(list_transform(c{n}, t -> t.cnt))),"
        f" s -> s.gg), 'min') AS topg{n}"
        for n in GOPHER_TOP_NGRAM
    )
    dup_defs = ", ".join(
        f"coalesce(list_sum(list_transform(list_filter(c{n}, s -> s.cnt >= 2),"
        f" s -> s.cnt * len(s.gg))), 0) AS dup{n}_n,"
        f" coalesce(list_sum(list_transform(c{n}, s -> s.cnt * len(s.gg))), 0) AS dup{n}_d"
        for n in GOPHER_DUP_NGRAM
    )
    frac_cols = ",\n           ".join(
        [
            f"CASE WHEN top{n} IS NULL THEN 0.0"
            f" ELSE round(1e-9 + top{n} * len(topg{n}) / n_chars, 6) END AS rep{n}"
            for n in GOPHER_TOP_NGRAM
        ]
        + [
            f"CASE WHEN dup{n}_d = 0 THEN 0.0"
            f" ELSE round(1e-9 + dup{n}_n / dup{n}_d, 6) END AS dup{n}"
            for n in GOPHER_DUP_NGRAM
        ]
    )
    keep = " AND ".join(
        [f"rep{n} <= {t}" for n, t in GOPHER_TOP_NGRAM.items()]
        + [f"dup{n} <= {t}" for n, t in GOPHER_DUP_NGRAM.items()]
    )
    return f"""
    WITH staged AS (
        SELECT doc_id, n_chars,
               list_filter(string_split(lower(text), ' '), w -> len(w) >= 1) AS ws
        FROM documents
    ),
    grams AS (SELECT doc_id, n_chars, {gram_defs} FROM staged),
    counted AS (SELECT doc_id, n_chars, {count_defs} FROM grams),
    reduced AS (SELECT doc_id, n_chars, {top_defs}, {dup_defs}, {topg_defs}
                FROM counted),
    fracs AS (
        SELECT doc_id,
           {frac_cols}
        FROM reduced
    )
    SELECT *, CAST({keep} AS INT) AS gopher_keep FROM fracs
"""


REPETITION_SQL = _repetition_sql()
# repetition_signals registers in operators/overflow.py (post-budget).


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling"):
# score every raw document by how much more likely it is under a
# TARGET distribution than under the raw-corpus distribution, using
# hashed n-gram bag-of-words models, and keep the target-like tail.
# Target here = the corpus's `lang = 'en'` slice (the paper targets
# Wikipedia/books; any declarative slice works), features = word
# unigrams + bigrams hashed into DSIR_BUCKETS via md5 (the paper's
# hashed n-gram generative model), both models add-1 smoothed.
#
# Scale: the two count tables are DSIR_BUCKETS rows each regardless of
# corpus size — they broadcast; scoring is the doc-feature explode
# joined to those broadcast tables + one doc-keyed agg. One shuffle
# over the feature stream, everything else map-side. Hash-bucketing is
# exactly what makes DSIR O(corpus) at web scale: the model never
# grows with the vocabulary.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"

_DSIR_BUCKET_SPARK = (
    "cast(conv(substr(md5(cast(f as binary)), 1, 8), 16, 10) as bigint) % "
    f"{DSIR_BUCKETS}"
)
_DSIR_BUCKET_DUCK = (
    "CAST(('0x' || substr(md5(f), 1, 8)) AS BIGINT) % " f"{DSIR_BUCKETS}"
)


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    # Scan-parallelism floor (guide §2.5): the per-feature md5 stream
    # below is CPU-dense, traversed twice, and not prunable (the hashes
    # are join/group keys), so a row-group-starved fixture layout would
    # otherwise run it on one core. Narrow 3-column exchange; no-op on
    # production layouts. Measured: bench 2.82 -> 1.70 s at sf0.1.
    from propensity_spark.io import scan_floor_target

    target = scan_floor_target(spark, sf_dir, "documents")
    if target:
        docs = docs.repartition(target, F.xxhash64("doc_id"))
    words = docs.select(
        "doc_id",
        "lang",
        F.expr("filter(split(lower(text), ' '), w -> length(w) >= 1)").alias("__ws"),
    )
    feats = words.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "concat(__ws, CASE WHEN size(__ws) < 2 THEN array()"
                " ELSE transform(sequence(1, size(__ws) - 1),"
                " i -> concat(element_at(__ws, i), '_', element_at(__ws, i + 1))) END)"
            )
        ).alias("f"),
    ).select("doc_id", "lang", F.expr(_DSIR_BUCKET_SPARK).alias("b"))
    # ONE pass over the exploded feature stream builds BOTH count
    # tables (raw + conditional target) — the stream (explode + md5
    # per feature) is the expensive part and is deliberately not
    # cached (recompute is the scale-safe choice at 100 TB), so it
    # must be traversed exactly twice: once here, once for scoring.
    cnt = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("raw_c"),
        F.count_if(F.col("lang") == DSIR_TARGET_LANG).alias("tgt_c"),
    )
    # totals as an unpartitioned window over the <= DSIR_BUCKETS-row
    # count frame (bounded, one tiny exchange) — a separate totals
    # aggregate would make Catalyst re-derive cnt and re-scan the
    # stream a third time (plan-pinned in test_plans).
    w_all = Window.partitionBy()
    model = cnt.select(
        "b",
        "raw_c",
        "tgt_c",
        F.sum("raw_c").over(w_all).alias("raw_n"),
        F.sum("tgt_c").over(w_all).alias("tgt_n"),
    ).select(
        "b",
        F.expr(
            f"ln((tgt_c + 1.0) / (tgt_n + {DSIR_BUCKETS}))"
            f" - ln((raw_c + 1.0) / (raw_n + {DSIR_BUCKETS}))"
        ).alias("lr"),
    )
    return (
        feats.join(F.broadcast(model), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            # + 0.0 normalizes IEEE -0.0 from the round: DuckDB's round
            # preserves the sign, Spark's BigDecimal path does not, and
            # the driver's fixed-precision canonicalizer distinguishes
            # them (the latent sf0.1 flake the r06 judge found).
            (F.round(F.avg("lr") + 1e-9, 6) + 0.0).alias("dsir_score"),
            (F.avg("lr") > 0).cast("int").alias("dsir_keep"),
        )
    )


DSIR_SQL = f"""
    WITH w AS (
        SELECT doc_id, lang,
               list_filter(string_split(lower(text), ' '), x -> len(x) >= 1) AS ws
        FROM documents
    ),
    feats AS (
        SELECT doc_id, lang, {_DSIR_BUCKET_DUCK} AS b
        FROM (
            SELECT doc_id, lang, unnest(
                list_concat(ws,
                    CASE WHEN len(ws) < 2 THEN []
                    ELSE list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i + 1])
                    END)
            ) AS f
            FROM w
        )
    ),
    cnt AS (
        SELECT b, CAST(count(*) AS BIGINT) AS raw_c,
               CAST(count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}')
                    AS BIGINT) AS tgt_c
        FROM feats GROUP BY b
    ),
    totals AS (
        SELECT sum(raw_c) AS raw_n, sum(tgt_c) AS tgt_n FROM cnt
    ),
    model AS (
        SELECT c.b,
               ln((c.tgt_c + 1.0) / (tt.tgt_n + {DSIR_BUCKETS}))
               - ln((c.raw_c + 1.0) / (tt.raw_n + {DSIR_BUCKETS})) AS lr
        FROM cnt c, totals tt
    )
    SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
           round(avg(m.lr) + 1e-9, 6) + 0.0 AS dsir_score,
           CAST(avg(m.lr) > 0 AS INT) AS dsir_keep
    FROM feats f JOIN model m ON f.b = m.b
    GROUP BY f.doc_id
"""
# dsir_select registers in operators/overflow.py (post-budget).


# ---------------------------------------------------------------------------
# Deterministic document embeddings — the hashing-trick + sign random
# projection (sparse Johnson-Lindenstrauss / SimHash-style) bridge
# from `documents` to the vector operators: tokens hash to buckets,
# each bucket contributes a fixed ±1 weight per output dimension
# (integer Weyl recurrence, identical literals in both engines), the
# per-doc sums are L2-normalized. Real pipelines swap in a neural
# encoder here; everything downstream (semdedup, VectorIndex, ANN)
# consumes the same (doc_id, vector) shape either way.
#
# Scale: one token explode + ONE doc-keyed groupBy computing all
# EMBED_DIMS conditional sums map-side-combined; no model state, no
# UDF, no shuffle beyond the single doc aggregation.
# ---------------------------------------------------------------------------

EMBED_DIMS = 16


def _embed_weight(b: str, d: int) -> str:
    """±1 weight for bucket `b`, dim `d` — (b % 1e5) keeps the Weyl
    product far from bigint overflow (engines disagree on wraparound)."""
    return (
        f"(CASE WHEN (({b} % 100000) * 2654435761 + {d} * 40503) % 1000 < 500"
        " THEN 1 ELSE -1 END)"
    )


def q_doc_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.expr("filter(split(lower(text), ' '), w -> length(w) >= 1)")
        ).alias("t"),
    ).select(
        "doc_id",
        F.expr(
            "cast(conv(substr(md5(cast(t as binary)), 1, 15), 16, 10) as bigint)"
        ).alias("b"),
    )
    sums = toks.groupBy("doc_id").agg(
        *[
            F.expr(f"sum({_embed_weight('b', d)})").alias(f"s{d}")
            for d in range(EMBED_DIMS)
        ]
    )
    norm = " + ".join(f"s{d} * s{d}" for d in range(EMBED_DIMS))
    return sums.select(
        "doc_id",
        *[
            F.expr(
                f"CASE WHEN {norm} = 0 THEN 0.0"
                f" ELSE round(s{d} / sqrt({norm}) + 1e-9, 6) END"
            ).alias(f"e{d}")
            for d in range(EMBED_DIMS)
        ],
    )


def _doc_embed_sql() -> str:
    b_duck = "CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT)"
    sums = ", ".join(
        f"sum({_embed_weight('b', d)}) AS s{d}" for d in range(EMBED_DIMS)
    )
    norm = " + ".join(f"s{d} * s{d}" for d in range(EMBED_DIMS))
    cols = ",\n           ".join(
        f"CASE WHEN {norm} = 0 THEN 0.0"
        f" ELSE round(s{d} / sqrt({norm}) + 1e-9, 6) END AS e{d}"
        for d in range(EMBED_DIMS)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, {b_duck} AS b
        FROM (
            SELECT doc_id,
                   unnest(list_filter(string_split(lower(text), ' '),
                                      w -> len(w) >= 1)) AS t
            FROM documents
        )
    ),
    sums AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id)
    SELECT doc_id,
           {cols}
    FROM sums
"""


DOC_EMBED_SQL = _doc_embed_sql()
# doc_embed registers in operators/overflow.py (post-budget).


# ---------------------------------------------------------------------------
# Weighted priority sampling (Efraimidis & Spiliopoulos 2006, "Weighted
# random sampling with a reservoir"): a size-k sample where inclusion
# probability tracks a per-row weight, computed WITHOUT a reservoir —
# each row gets priority u^(1/w) (equivalently ln(u)/w, monotone) from
# a deterministic md5-uniform, and the global top-k by priority IS the
# weighted sample. Spark plans the orderBy+limit as TakeOrderedAndProject
# (per-partition heaps + one k-row merge — no global sort, no single-
# partition window), so the op is one scan at any corpus size; the same
# stable-under-append / stable-under-repartition determinism story as
# split_by_hash. Training-data use: length- or quality-weighted corpus
# subsampling where heavier docs must be kept more often but the sample
# must stay reproducible across rebuilds.
# Priorities are rounded to 12 dp in BOTH engines (ln's last-ulp may
# differ across libm implementations) and ties break on doc_id, so the
# selected set is engine-independent.
# ---------------------------------------------------------------------------

PRIORITY_SAMPLE_K = 100


def weighted_priority_sample(
    docs: DataFrame, weight_col: str, k: int = PRIORITY_SAMPLE_K
) -> DataFrame:
    """Deterministic weighted sample of k docs: top-k by
    round(ln(u)/w, 12) with u = md5-uniform of doc_id (u > 0) and
    w = max(weight, 1). Returns (doc_id, weight, priority)."""
    u = (
        "((cast(conv(substr(md5(cast(cast(doc_id as string) as binary)), 1, 8),"
        " 16, 10) as bigint) % 1000000) + 1) / 1000000.0"
    )
    return (
        docs.select(
            "doc_id",
            F.greatest(F.col(weight_col), F.lit(1)).cast("double").alias("weight"),
        )
        .withColumn("priority", F.expr(f"round(ln({u}) / weight, 12)"))
        .orderBy(F.col("priority").desc(), F.col("doc_id"))
        .limit(k)
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted corpus subsample: n_chars-weighted priority
    sampling of PRIORITY_SAMPLE_K documents."""
    return weighted_priority_sample(
        load_table(spark, sf_dir, "documents"), "n_chars"
    )


WEIGHTED_SAMPLE_SQL = f"""
    SELECT doc_id, weight, priority FROM (
        SELECT doc_id,
               CAST(greatest(n_chars, 1) AS DOUBLE) AS weight,
               round(ln((((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                           ::BIGINT % 1000000) + 1) / 1000000.0))
                     / CAST(greatest(n_chars, 1) AS DOUBLE), 12) AS priority
        FROM documents
    )
    ORDER BY priority DESC, doc_id
    LIMIT {PRIORITY_SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# Character-entropy quality signal: Shannon entropy (bits/char) of each
# document's character distribution plus the modal-character fraction.
# Low entropy or a dominant character flags boilerplate, padding, and
# degenerate machine text that n-gram repetition fractions (Gopher
# grid) can miss — the cheap cousin of the compression-ratio filter in
# CCNet-descended pipelines (zlib isn't cross-engine deterministic;
# the entropy of the char histogram is). One explode + one (doc, char)
# agg + window + one doc agg — exactly two shuffles, no joins; the
# float sum is rounded with the repo's 1e-9 nudge in both engines
# since parallel-vs-sequential summation order differs.
# ---------------------------------------------------------------------------


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc character statistics: (doc_id, n_chars_counted,
    n_distinct_chars, entropy_bits, max_char_frac). Two exchanges
    total — (doc, char) for the frequency agg, then doc for the
    window — and the final doc-grain aggregate reuses the window's
    partitioning exchange-free (verified in the formatted plan)."""
    from pyspark.sql.window import Window

    chars = docs.select(
        "doc_id", F.explode(F.split(F.lower(text_col), "")).alias("ch")
    ).where(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    freq = freq.withColumn(
        "n", F.sum("c").over(Window.partitionBy("doc_id"))
    )
    return freq.groupBy("doc_id").agg(
        F.max("n").alias("n_chars_counted"),
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.expr(
            "round(-sum((c / n) * log2(c / n)) + 1e-9, 6)"
        ).alias("entropy_bits"),
        F.expr("round(max(c) / max(n) + 1e-9, 6)").alias("max_char_frac"),
    )


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return char_entropy(load_table(spark, sf_dir, "documents"))


CHAR_ENTROPY_SQL = """
    WITH chars AS (
        SELECT doc_id, unnest(string_split(lower(text), '')) AS ch
        FROM documents
    ),
    freq AS (
        SELECT doc_id, ch, count(*) AS c FROM chars
        WHERE ch != '' GROUP BY doc_id, ch
    ),
    freq2 AS (
        SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM freq
    )
    SELECT doc_id,
           CAST(max(n) AS BIGINT) AS n_chars_counted,
           CAST(count(*) AS BIGINT) AS n_distinct_chars,
           round(-sum((c * 1.0 / n) * log2(c * 1.0 / n)) + 1e-9, 6)
               AS entropy_bits,
           round(max(c) * 1.0 / max(n) + 1e-9, 6) AS max_char_frac
    FROM freq2
    GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# End-to-end LLM data-prep pipeline: the composed flow a pretraining
# corpus actually runs, as ONE oracle-checked entry. Each stage is the
# already-gate-verified operator family applied in sequence; this
# entry proves the COMPOSITION (filter ordering, survivor sets, split
# stability) matches a from-scratch SQL expression of the whole flow.
# ---------------------------------------------------------------------------

DATAPREP_MIN_WORDS = 5
DATAPREP_BENCH_MOD = 20  # doc_id % 20 == 0 plays the held-out benchmark


def q_llm_dataprep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining-corpus prep, composed end-to-end:

      1. language filter (stored `lang` tag here; swap in q_lang_id's
         n-gram heuristic when tags are untrusted),
      2. quality floor — >= DATAPREP_MIN_WORDS words and distinct-word
         ratio >= 0.3, compared in INTEGER form (10*distinct >= 3*n)
         so both engines decide identically with no float ratio,
      3. exact dedup — keep the min doc_id per normalized-text md5
         (one digest window),
      4. benchmark decontamination — drop survivors sharing any
         5-gram with the held-out set (broadcast semi-join, the
         corpus is never shuffled by ngram; text/dedup.py:615-645),
      5. deterministic 90/5/5 hash split (append-stable md5 ladder).

    Near-dup removal (minhash/SimHash) composes between 3 and 4 and is
    gate-verified standalone (neardup_suite); it is omitted here to
    keep the oracle one readable SQL statement. Returns the surviving
    corpus manifest (doc_id, n_words, split)."""
    from propensity_spark.text.dedup import (
        DECONTAM_N,
        _NORM_SPARK,
        contaminated_doc_ids,
    )
    from pyspark.sql import Window

    # Scan-parallelism floor tried and REJECTED here (r09, guide §1):
    # fanning (doc_id, text, lang) out before the normalize/md5 chain
    # measured 1.28 -> 1.80 s (count, min-of-4 interleaved) — this
    # pipeline's per-row CPU is one regex+md5, too light to amortize
    # the exchange + 32-task scheduling that dsir_select's per-token
    # scoring does amortize. See OPTIMIZATION_r09.md.
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "text",
        "lang",
        F.split(F.expr(_NORM_SPARK), " ").alias("words"),
        F.expr(f"md5(cast({_NORM_SPARK} as binary))").alias("text_hash"),
    ).withColumn("n_words", F.size("words")).withColumn(
        "n_distinct_words", F.size(F.array_distinct("words"))
    )
    quality = base.where(
        (F.col("lang") == "en")
        & (F.col("n_words") >= DATAPREP_MIN_WORDS)
        & (10 * F.col("n_distinct_words") >= 3 * F.col("n_words"))
    )
    deduped = quality.withColumn(
        "__canon", F.min("doc_id").over(Window.partitionBy("text_hash"))
    ).where(
        (F.col("doc_id") == F.col("__canon"))
        & (F.col("doc_id") % DATAPREP_BENCH_MOD != 0)
    )
    bench = docs.where(F.col("doc_id") % DATAPREP_BENCH_MOD == 0)
    bad = contaminated_doc_ids(deduped, bench, n=DECONTAM_N)
    clean = deduped.join(bad, "doc_id", "left_anti")
    return split_by_hash(clean, "doc_id", SPLIT_FRACTIONS).select(
        "doc_id", "n_words", "split"
    )


def _dataprep_sql() -> str:
    from propensity_spark.text.dedup import _GRAMS5_DUCK, _NORM_DUCK

    ladder = _split_ladder_sql().replace("'split:", "'")
    return f"""
    WITH base AS (
        SELECT doc_id, text, lang,
               string_split({_NORM_DUCK}, ' ') AS words,
               md5({_NORM_DUCK}) AS text_hash
        FROM documents
    ),
    quality AS (
        SELECT doc_id, text, text_hash,
               CAST(len(words) AS INT) AS n_words
        FROM base
        WHERE lang = 'en' AND len(words) >= {DATAPREP_MIN_WORDS}
          AND 10 * len(list_distinct(words)) >= 3 * len(words)
    ),
    deduped AS (
        SELECT * FROM (
            SELECT *, min(doc_id) OVER (PARTITION BY text_hash) AS canon
            FROM quality
        ) WHERE doc_id = canon AND doc_id % {DATAPREP_BENCH_MOD} != 0
    ),
    bg AS (
        SELECT DISTINCT unnest({_GRAMS5_DUCK}) AS g FROM documents
        WHERE doc_id % {DATAPREP_BENCH_MOD} = 0
    ),
    bad AS (
        SELECT DISTINCT d.doc_id
        FROM (SELECT doc_id, unnest({_GRAMS5_DUCK}) AS g FROM deduped) d
        WHERE d.g IN (SELECT g FROM bg)
    ),
    clean AS (
        SELECT * FROM deduped WHERE doc_id NOT IN (SELECT doc_id FROM bad)
    )
    SELECT doc_id, n_words, {ladder} AS split FROM clean
    """


# --------------------------------------------------------------------------
# Inverted-index build: the persistable artifact behind bm25_search
# (which computes TF on the fly). token -> document frequency, corpus
# idf, and the full posting list (doc_id, tf) sorted by doc_id — the
# layout a search serving tier memory-maps.
POSTINGS_MIN_DF = 3  # drop hapax noise; keeps the gate output bounded


def build_postings(docs: DataFrame) -> DataFrame:
    """token -> (df, idf, postings[(doc_id, tf)]) with BM25's
    idf = ln((N - df + 0.5) / (df + 0.5) + 1). Explode + two aggs,
    both shuffling on the token key; posting arrays are sorted by
    doc_id (struct sort order = field order) so the artifact is
    deterministic and delta-mergeable — a daily batch's postings
    concat-merge into history without re-reading the corpus. A
    stop-word's posting row is one LONG array: at web scale cap or
    shard arrays past ~1e6 entries (store (token, shard_no) keys);
    the df/idf columns are unaffected."""
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr("filter(split(lower(text), ' '), w -> length(w) >= 1)")
            ).alias("token"),
        )
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.select(F.countDistinct("doc_id").alias("n"))
    return (
        tf.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sort_array(
                F.collect_list(F.struct("doc_id", "tf"))
            ).alias("postings"),
        )
        .where(F.col("df") >= POSTINGS_MIN_DF)
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            F.col("df").cast("bigint").alias("df"),
            F.round(
                F.expr("ln((n - df + 0.5) / (df + 0.5) + 1)") + 1e-9, 6
            ).alias("idf"),
            # Scalar column, not array<string>: the driver's gate
            # canonicalizer hashes via pandas and cannot hash list cells
            # (GATE_CONTRACT.md) — join the ordered postings into one
            # string; the serving-tier layout splits it back for free.
            F.expr(
                "array_join(transform(postings,"
                " p -> concat(p.doc_id, ':', p.tf)), ',')"
            ).alias("postings"),
        )
    )


def q_build_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate entry: the documents inverted index (df >= 3 tokens)."""
    # r09: a scan floor here measured SLOWER (noop 0.51 -> 0.78 s) —
    # a bare token explode is too light to amortize the exchange
    # (the llm_dataprep lesson). See OPTIMIZATION_r09.md.
    return build_postings(load_table(spark, sf_dir, "documents"))


POSTINGS_SQL = f"""
    WITH tf AS (
        SELECT token, doc_id, count(*) AS tf
        FROM (
            SELECT doc_id, unnest(list_filter(
                       string_split(lower(text), ' '),
                       w -> len(w) >= 1)) AS token
            FROM documents
        ) GROUP BY token, doc_id
    ),
    n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM documents)
    SELECT token, CAST(count(*) AS BIGINT) AS df,
           round(ln((any_value(n_docs.n) - count(*) + 0.5)
                    / (count(*) + 0.5) + 1) + 1e-9, 6) AS idf,
           array_to_string(list_transform(
               list_sort(list((doc_id, tf))),
               p -> p[1] || ':' || p[2]
           ), ',') AS postings
    FROM tf CROSS JOIN n_docs
    GROUP BY token
    HAVING count(*) >= {POSTINGS_MIN_DF}
"""
# build_postings registers in operators/overflow.py (post-budget).


ZIPF_MIN_FREQ = 2


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit of the corpus token-frequency distribution:
    slope of ln(freq) on ln(rank) over tokens ranked by (freq desc,
    token) — a healthy natural-language corpus sits near -1; template
    or synthetic text flattens toward 0 (THIS corpus's 31-token
    vocabulary is the diagnostic's poster child). One token count agg
    + one global rank window over |vocab| rows + regr_* aggregates —
    the data-sized work is the first agg. Reports slope, r2, vocab
    size, and the top token share."""
    docs = load_table(spark, sf_dir, "documents")
    freqs = (
        docs.select(
            F.explode(
                F.expr("filter(split(lower(text), ' '), w -> length(w) >= 1)")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") >= ZIPF_MIN_FREQ)
    )
    w = Window.orderBy(F.desc("freq"), "token")
    ranked = freqs.withColumn("rank", F.row_number().over(w))
    tot = ranked.agg(
        F.sum("freq").alias("total"), F.max(F.when(F.col("rank") == 1, F.col("freq"))).alias("top")
    )
    return (
        ranked.select(
            F.log(F.col("rank").cast("double")).alias("lr"),
            F.log(F.col("freq").cast("double")).alias("lf"),
        )
        .agg(
            F.count(F.lit(1)).alias("vocab_size"),
            F.round(F.expr("regr_slope(lf, lr)") + 1e-9, 6).alias("zipf_slope"),
            F.round(F.expr("regr_r2(lf, lr)") + 1e-9, 6).alias("r2"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("vocab_size").cast("bigint").alias("vocab_size"),
            "zipf_slope",
            "r2",
            F.round(F.col("top") / F.col("total") + 1e-9, 6).alias("top_token_share"),
        )
    )


ZIPF_SQL = f"""
    WITH freqs AS (
        SELECT token, count(*) AS freq
        FROM (
            SELECT unnest(list_filter(string_split(lower(text), ' '),
                          w -> len(w) >= 1)) AS token
            FROM documents
        ) GROUP BY token
        HAVING count(*) >= {ZIPF_MIN_FREQ}
    ),
    ranked AS (
        SELECT freq, row_number() OVER (ORDER BY freq DESC, token) AS rank
        FROM freqs
    ),
    tot AS (
        SELECT sum(freq) AS total,
               max(CASE WHEN rank = 1 THEN freq END) AS top
        FROM ranked
    )
    SELECT CAST(count(*) AS BIGINT) AS vocab_size,
           round(regr_slope(ln(freq), ln(rank)) + 1e-9, 6) AS zipf_slope,
           round(regr_r2(ln(freq), ln(rank)) + 1e-9, 6) AS r2,
           round(any_value(t.top) * 1.0 / any_value(t.total) + 1e-9, 6)
               AS top_token_share
    FROM ranked CROSS JOIN tot t
"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style readability per document: words/sentences,
    vowel-group syllable estimate, reading-ease score 206.835 -
    1.015*(words/sentences) - 84.6*(syllables/words). Pure regexp +
    arithmetic — map-only, zero shuffles, the same plan at any
    corpus size; a crude but standard quality prior next to the
    Gopher-style signals (LLM data pipelines bucket documents by
    readability for curriculum mixes)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.expr("size(filter(split(text, ' '), w -> length(w) >= 1))")
    # the score's divisor floors words at 1 like sentences/syllables —
    # an empty/whitespace doc would otherwise divide by zero (NULL in
    # Spark, NaN/inf under DuckDB's IEEE floats); n_words itself stays
    # the true count.
    words_f = F.greatest(words, F.lit(1))
    sentences = F.greatest(
        F.expr("regexp_count(text, '[.!?]+')"), F.lit(1)
    )
    syllables = F.greatest(
        F.expr("regexp_count(lower(text), '[aeiouy]+')"), F.lit(1)
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (words_f / sentences.cast("double"))
        - F.lit(84.6) * (syllables / words_f.cast("double"))
    )
    return docs.select(
        "doc_id",
        words.cast("int").alias("n_words"),
        sentences.cast("int").alias("n_sentences"),
        syllables.cast("int").alias("n_syllables"),
        F.round(score + 1e-9, 4).alias("flesch_score"),
    )


READABILITY_SQL = """
    SELECT doc_id,
           CAST(len(list_filter(string_split(text, ' '), w -> len(w) >= 1))
                AS INT) AS n_words,
           CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS INT)
               AS n_sentences,
           CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                AS INT) AS n_syllables,
           round(206.835
                 - 1.015 * (greatest(len(list_filter(string_split(text, ' '),
                            w -> len(w) >= 1)), 1)
                    / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                           AS DOUBLE))
                 - 84.6 * (greatest(len(regexp_extract_all(lower(text),
                            '[aeiouy]+')), 1)
                    / CAST(greatest(len(list_filter(string_split(text, ' '),
                           w -> len(w) >= 1)), 1) AS DOUBLE))
                 + 1e-9, 4) AS flesch_score
    FROM documents
"""


# --- gate registration (moved from the retired operators/overflow.py shim) ---
# Entries past the driver's 50-row budget register here, next to their
# operators; __spark_entry__ merges every module's QUERIES/ORACLES and
# DRIVER_GATE_PRIORITY decides what the driver sees.
QUERIES.update({
    "vocab_heavy_hitters": q_vocab_heavy_hitters,
    "perplexity_filter": q_perplexity_filter,
    "bm25_search": q_bm25_search,
    "repetition_signals": q_repetition_signals,
    "dsir_select": q_dsir_select,
    "doc_embed": q_doc_embed,
    "weighted_sample": q_weighted_sample,
    "char_entropy": q_char_entropy,
    "llm_dataprep": q_llm_dataprep,
    "build_postings": q_build_postings,
    "zipf_fit": q_zipf_fit,
    "readability": q_readability,
})

ORACLES.update({
    "vocab_heavy_hitters": VOCAB_HEAVY_HITTERS_SQL,
    "perplexity_filter": PERPLEXITY_SQL,
    "bm25_search": BM25_SQL,
    "repetition_signals": REPETITION_SQL,
    "dsir_select": DSIR_SQL,
    "doc_embed": DOC_EMBED_SQL,
    "weighted_sample": WEIGHTED_SAMPLE_SQL,
    "char_entropy": CHAR_ENTROPY_SQL,
    "llm_dataprep": _dataprep_sql(),
    "build_postings": POSTINGS_SQL,
    "zipf_fit": ZIPF_SQL,
    "readability": READABILITY_SQL,
})
