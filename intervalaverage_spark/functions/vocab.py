"""Corpus vocabulary statistics: per-term frequencies, document
frequency, idf, and top-k terms per group.

The vocabulary pass every web-text pipeline runs at least once:
collection frequency (how often a term occurs), document frequency
(how many docs carry it), smoothed idf — the inputs to stopword
discovery, tf-idf quality features, and tokenizer-vocab audits.

Scale shape: one ``explode`` of lowercased whitespace tokens, then
hash aggregation on (group, term). The hot keys are exactly the
stopwords — and partial aggregation (map-side combine) absorbs them:
each task emits ONE row per distinct (group, term) it saw, so the
shuffle carries vocabulary-sized traffic, not token-sized (the same
reason word-count scales). ``countDistinct(doc)`` plans as the
standard two-phase expand/agg — still keyed by (group, term), no
row explosion beyond the distinct pairs. The top-k rank windows over
per-group VOCABULARIES (bounded by Heaps' law, ~10^6 terms at web
scale), never over token instances.

Reference parity context: no counterpart in the reference
(kaufman-lab/intervalaverage) — a web-text payload extension
(SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from intervalaverage_spark.functions.textstats import tokens


def term_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
) -> DataFrame:
    """Per-term statistics, optionally per group (e.g. language).

    Returns one row per (group,) term: ``(group?, term, cf, df,
    n_docs, idf)`` where ``cf`` is total occurrences, ``df`` the
    distinct docs containing the term, ``n_docs`` the group's doc
    count, and ``idf = round(ln((n_docs+1)/(df+1)) + 1, 6)`` (the
    sklearn-style smoothed idf — never negative, defined for unseen
    terms). Tokenisation is lowercased whitespace (textstats.tokens).
    """
    gcols = [group_col] if group_col else []
    words = df.select(
        *gcols,
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    per_term = words.groupBy(*gcols, "term").agg(
        F.count(F.lit(1)).alias("cf"),
        F.countDistinct(id_col).alias("df"),
    )
    if gcols:
        ndocs = df.groupBy(*gcols).agg(
            F.countDistinct(id_col).alias("n_docs")
        )
        per_term = per_term.join(F.broadcast(ndocs), gcols)
    else:
        ndocs = df.agg(F.countDistinct(id_col).alias("n_docs"))
        per_term = per_term.crossJoin(F.broadcast(ndocs))
    idf = F.round(
        F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1, 6
    ).alias("idf")
    return per_term.select(*gcols, "term", "cf", "df", "n_docs", idf)


def top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "lang",
    k: int = 20,
) -> DataFrame:
    """Top-``k`` terms per group by collection frequency.

    Deterministic total order: cf desc, then term asc (row_number, so
    exactly ``k`` rows per group that has ≥ k distinct terms). The
    rank window partitions by group over the group's VOCABULARY —
    bounded rows per partition regardless of corpus size.
    """
    stats = term_stats(df, id_col, text_col, group_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col("cf").desc(), F.col("term").asc()
    )
    return (
        stats.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(group_col, "term", "cf", "df", "n_docs", "idf", "rnk")
    )
