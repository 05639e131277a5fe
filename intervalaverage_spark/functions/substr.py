"""Exact substring duplication: per-doc coverage by word n-grams that
repeat across documents.

The ExactSubstr signal of Lee et al. 2022 ("Deduplicating Training Data
Makes Language Models Better"): a training document whose text is
largely covered by spans that appear verbatim in OTHER documents is
boilerplate/template mass — the per-doc duplicated-token fraction is
the filter signal. The paper builds a suffix array; the Spark-native
shape is n-gram spans + a distributed duplicate-gram join, with the
span UNION computed by this engine's own interval operator:

1. tokenize (lowercased whitespace — the same token domain as
   decontamination) and posexplode word ``n``-grams to
   ``(doc, pos, gram)`` rows;
2. grams seen in ≥ ``min_docs`` DISTINCT docs form the duplicate set
   (one groupBy on an md5 gram key — 16 hashed bytes shuffle instead of
   the n-word string; md5 rather than xxhash64 so the DuckDB oracle
   replays it bit-for-bit);
3. join spans back on the gram key: each surviving row is a CLOSED
   token-position interval ``[pos, pos+n−1]``;
4. the per-doc duplicated-token count is the UNION size of those
   overlapping intervals —
   :func:`~intervalaverage_spark.operators.coalesce.interval_coalesce`
   over (doc, pos-interval), exactly the operator the engine runs over
   time intervals, pointed at token positions (`covered` sums to the
   true union, overlaps never double-count).

Scale shape: the gram groupBy and the gram join are the irreducible
shuffles of the operator (both keyed on the 16-byte hash, partial-agg
combined map-side); the coalesce window and per-doc sum then cluster by
doc id. Hot grams don't fan out: the duplicate set is DISTINCT grams,
so the join-back never multiplies span rows.

Reference parity context: the reference (kaufman-lab/intervalaverage)
has no text surface — web-text payload extension (SURVEY.md §2.4, E46);
its interval-union semantics are the reference's isolateoverlaps
coverage arithmetic (ref R/intervalaverage.R interval bookkeeping)
re-aimed at token positions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from intervalaverage_spark.functions.decontam import _gram_tokens
from intervalaverage_spark.functions.textstats import bind_once
from intervalaverage_spark.operators.coalesce import interval_coalesce


def _pos_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """``(id, pos, gkey)`` — one row per word n-gram occurrence; ``pos``
    is the 1-based token index of the gram's first word, ``gkey`` the
    md5 of the space-joined gram."""
    def body(tk):
        return F.when(
            F.size(tk) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - (n - 1)),
                lambda i: F.struct(
                    i.alias("pos"),
                    F.md5(F.array_join(F.slice(tk, i, n), " ")).alias("gkey"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,gkey:string>>"))

    # let-bound so tokenization runs once per doc, not once per gram
    grams = bind_once(_gram_tokens(text_col), body)
    return (
        df.select(F.col(id_col), F.explode(grams).alias("g"))
        .select(id_col, F.col("g.pos").alias("pos"), F.col("g.gkey").alias("gkey"))
    )


def duplicated_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-doc exact-substring duplication stats.

    Returns one row per input doc: ``(id, n_tokens, dup_tokens,
    dup_fraction)`` where ``dup_tokens`` is the number of token
    positions covered by at least one word ``n``-gram that occurs in
    ≥ ``min_docs`` distinct docs (union of overlapping spans — never
    double-counted), and ``dup_fraction`` = dup_tokens / n_tokens
    (rounded 6 dp; 0.0 for docs shorter than ``n`` tokens).
    """
    pg = _pos_grams(df, id_col, text_col, n)
    dup = (
        pg.groupBy("gkey")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gkey")
    )
    spans = pg.join(dup, "gkey").select(
        id_col,
        F.col("pos").cast("long").alias("s"),
        (F.col("pos") + (n - 1)).cast("long").alias("e"),
    )
    covered = (
        interval_coalesce(spans, ["s", "e"], [id_col])
        .groupBy(id_col)
        .agg(F.sum("covered").alias("dup_tokens"))
    )
    base = df.select(
        F.col(id_col), F.size(_gram_tokens(text_col)).cast("long").alias("n_tokens")
    )
    return (
        base.join(covered, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            F.when(F.col("n_tokens") > 0,
                   F.round(F.coalesce(F.col("dup_tokens"), F.lit(0))
                           / F.col("n_tokens"), 6))
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )
