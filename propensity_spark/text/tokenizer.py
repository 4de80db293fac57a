"""Distributed BPE merge training — the tokenizer-construction step of
an LLM data pipeline (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units").

Scale architecture (what makes this 100 TB-shaped):

* The corpus is collapsed to a WORD-FREQUENCY table first (one shuffle
  at word grain): BPE statistics depend only on (word, count), so a
  10^11-token corpus becomes ~10^8 weighted rows and every later round
  works on that compressed frame. This is the same compression the
  original implementation does in-memory, done as a DataFrame agg.
* Each merge round is ONE distributed aggregation (adjacent-pair
  explode -> weighted count -> top-1) plus ONE map-side array rewrite.
  The only driver data is the single winning pair per round (a bounded
  ≤1-row collect, matching the repo's C4 control-plane discipline).
* The pair merge runs JVM-side as an `aggregate()` left fold over the
  symbol array (no Python in the loop); the winning pair enters the
  plan as a 1-row broadcast, not a string-interpolated literal, so
  arbitrary symbols (quotes, backslashes) are safe.
* Lineage is truncated every round with localCheckpoint — N rounds stay
  O(1) plan depth instead of O(N); a cluster deployment would point
  this at a reliable checkpoint dir.

No SQL oracle: the algorithm is inherently iterative (each round's
input depends on the previous round's argmax), which is exactly the
"genuinely non-SQL-expressible" carve-out — correctness is pinned by
pytest against a pure-Python reference BPE on the same word-frequency
table, bit-identical merge lists under the same deterministic
tie-break (count desc, then pair lexicographic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker (standard BPE)

# Adjacent-pair list over the symbol array: [(s1,s2), (s2,s3), ...]
_PAIRS = (
    "CASE WHEN size(symbols) < 2 THEN array()"
    " ELSE transform(sequence(1, size(symbols) - 1),"
    " i -> struct(element_at(symbols, i) AS a, element_at(symbols, i + 1) AS b)) END"
)

# Left fold merging every non-overlapping (a, b) occurrence left-to-right:
# push x, unless the top of the accumulator is `a` and x is `b` — then
# replace the top with the merged symbol. `a`/`b`/`ab` are COLUMNS from
# the broadcast winner row, never interpolated literals.
_MERGE = (
    "aggregate(symbols, cast(array() as array<string>), (acc, x) ->"
    " CASE WHEN size(acc) > 0 AND element_at(acc, -1) = a AND x = b"
    " THEN concat(slice(acc, 1, size(acc) - 1), array(ab))"
    " ELSE concat(acc, array(x)) END)"
)


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq): the one corpus-sized shuffle."""
    return (
        docs.select(F.explode(F.split(F.lower(text_col), " ")).alias("word"))
        .where(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(word_freqs: DataFrame) -> DataFrame:
    """word -> its character symbols + the end-of-word marker."""
    return word_freqs.select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""),  # chars
            F.array(F.lit(END)),
        ).alias("symbols"),
    )


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges; returns [(a, b, weighted_count)] in
    merge order. Stops early when no pair clears `min_pair_count`."""
    sym = _initial_symbols(word_frequencies(docs, text_col)).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            sym.select("freq", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()  # bounded: exactly one control row per round
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merges.append((a, b, cnt))
        winner = spark.createDataFrame([(a, b, a + b)], "a string, b string, ab string")
        sym = (
            sym.crossJoin(F.broadcast(winner))
            .select("freq", F.expr(_MERGE).alias("symbols"))
            .localCheckpoint(eager=True)  # O(1) plan depth across rounds
        )
    return merges


def bpe_vocab(merges: list[tuple[str, str, int]]) -> list[str]:
    """The learned subword units, in merge order."""
    return [a + b for a, b, _ in merges]


def bpe_encode(
    docs: DataFrame, merges: list[tuple[str, str, int]], text_col: str = "text"
) -> DataFrame:
    """Tokenize a corpus with learned merges. Spark-first shape:

    1. The per-word BPE encode (rank-priority merge loop — inherently
       sequential per word) runs over the DISTINCT-WORD table only,
       via an Arrow-batched pandas UDF: the same word-grain compression
       bpe_train uses, so Python cost is O(|vocab|) not O(corpus).
    2. Documents explode to (doc_id, pos, word), join the tiny
       word->tokens mapping (broadcast at sane vocab sizes, AQE's call
       otherwise), and reassemble IN ORDER via sort_array over
       (pos, tokens) structs + flatten — no Python touches corpus-sized
       data.

    Returns (doc_id, tokens array<string>, n_tokens)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # `from __future__ import annotations` turns hints into strings and
    # pandas is function-local, so pandas_udf's hint inference can't
    # resolve them — annotate with live objects via a closure-level def.

    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    def _encode_series(words):
        def enc(w):
            syms = list(w) + [END]
            while len(syms) > 1:
                best, best_rank = None, None
                for i in range(len(syms) - 1):
                    r = ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best, best_rank = i, r
                if best is None:
                    break
                a, b = syms[best], syms[best + 1]
                out, i = [], 0
                while i < len(syms):  # merge ALL occurrences of this pair
                    if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        memo: dict = {}
        return words.map(lambda w: memo.setdefault(w, enc(w)))

    _encode_series.__annotations__ = {"words": pd.Series, "return": pd.Series}
    encode_word = pandas_udf(_encode_series, "array<string>")

    words = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(text_col), " ")).alias("pos", "word"),
    ).where(F.length("word") >= 1)
    mapping = (
        words.select("word").distinct().withColumn("word_tokens", encode_word("word"))
    )
    return (
        words.join(mapping, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.expr(
                    "transform(sort_array(collect_list(struct(pos, word_tokens))),"
                    " s -> s.word_tokens)"
                )
            ).alias("tokens")
        )
        .select("doc_id", "tokens", F.size("tokens").alias("n_tokens"))
    )
