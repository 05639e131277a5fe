"""Deterministic synthetic web-text corpus at dedup-bench scale.

The sf* ``documents`` fixture tops out at 5 000 rows — enough to pin the
dedup family's SEMANTICS against the DuckDB oracle, far too small to
evidence its SCALE story. This generator produces the round-5 evidence
corpus (default 100k docs; any size): seeded, distributed (``spark.range``
+ JVM xxhash64-derived expressions — no driver loop, no Python UDF, no
external data), with exactly the two structures a web-scale dedup workload
is hard for:

* **planted near-duplicate families** — the first ``clustered_frac`` of
  doc ids form families of ``family_size`` consecutive ids sharing one
  family-derived token sequence; member 0 is the pristine base, members
  >0 each resample ``edit_pct`` % of token positions (doc-specific
  edits). Pairwise shingle Jaccard is therefore graded: base↔member ≈
  ``((1−p)²)ⁿ``-ish, member↔member lower — a realistic recall target, and
  ``family_id`` is carried as ground truth so recall is MEASURED, not
  assumed.
* **Zipf + boilerplate shingle skew** — body token ids follow
  ``floor(V·u^2.5)`` (mass on low ids), and ``boilerplate_frac`` of docs
  share one verbatim 20-token footer: its shingles appear in ~60 % of the
  corpus, which is precisely the stop-shingle blowup ``max_df`` exists
  for (functions/dedup.py). Candidate-pair counts with and without the
  cap are the BENCH/NOTES.md table.

Reference n/a: the reference engine has no dedup surface (SURVEY §2.3);
this corpus evidences the web-text extension at the brief's scale axis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: the shared footer every boilerplate-bearing doc appends verbatim
BOILERPLATE = (
    "all rights reserved copyright terms of service privacy policy "
    "contact us about us sitemap newsletter subscribe follow share "
    "cookie notice"
)


def _u(*cols) -> Column:
    """Deterministic pseudo-uniform in [0, 1)."""
    return F.pmod(F.xxhash64(*cols), F.lit(10**9)) / F.lit(10**9.0)


def synth_corpus(
    spark: SparkSession,
    n_docs: int = 100_000,
    family_size: int = 4,
    clustered_frac: float = 0.2,
    boilerplate_frac: float = 0.6,
    vocab: int = 50_000,
    edit_pct: int = 4,
    doc_len_min: int = 30,
    doc_len_span: int = 170,
    seed: int = 7,
) -> DataFrame:
    """Deterministic corpus: ``(doc_id, family_id, text)``.

    ``family_id`` is the ground-truth near-dup component (== doc_id for
    singletons); drop it before handing the table to a detector, join it
    back to measure recall. Token positions are family-derived, so family
    members share one base sequence; edits are doc-derived, so every
    member diverges independently. Everything is a pure function of
    (seed, ids) — any run, any partitioning, any engine ordering produces
    the identical corpus."""
    n_clustered = (int(n_docs * clustered_frac) // family_size) * family_size
    d = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    clustered = F.col("doc_id") < n_clustered
    fam = F.when(
        clustered, F.col("doc_id") - F.pmod(F.col("doc_id"), F.lit(family_size))
    ).otherwise(F.col("doc_id"))
    member = F.when(clustered, F.pmod(F.col("doc_id"), F.lit(family_size))).otherwise(
        F.lit(0)
    )
    d = d.select("doc_id", fam.alias("family_id"), member.alias("__m"))

    # per-FAMILY length so members share their base sequence end-to-end
    length = (
        F.lit(doc_len_min)
        + F.pmod(F.xxhash64("family_id", F.lit(seed)), F.lit(doc_len_span))
    ).cast("int")
    # Zipf-ish body vocabulary: u^2.5 concentrates mass on low word ids
    wid = lambda i: F.floor(  # noqa: E731
        F.lit(float(vocab)) * F.pow(_u(F.col("family_id"), i, F.lit(seed + 1)), F.lit(2.5))
    ).cast("long")
    edited = lambda i: (  # noqa: E731
        (F.col("__m") > 0)
        & (F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(seed + 2)), F.lit(100))
           < F.lit(edit_pct))
    )
    tok = lambda i: F.when(  # noqa: E731
        edited(i),
        F.concat(F.lit("e"), F.pmod(
            F.xxhash64(F.col("doc_id"), i, F.lit(seed + 3)), F.lit(10**9)
        ).cast("string")),
    ).otherwise(F.concat(F.lit("w"), wid(i).cast("string")))
    body = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), length - 1), tok)
    )
    # family-derived, not doc-derived: members of one near-dup family share
    # their template (mirrors real web near-dups), so the footer never
    # erodes planted-pair Jaccard below the detection threshold — the
    # ground-truth recall target stays meaningful
    boiler = F.pmod(F.xxhash64("family_id", F.lit(seed + 4)), F.lit(100)) < F.lit(
        int(boilerplate_frac * 100)
    )
    text = F.when(boiler, F.concat(body, F.lit(" " + BOILERPLATE))).otherwise(body)
    return d.select("doc_id", "family_id", text.alias("text"))


def family_pairs(corpus: DataFrame) -> DataFrame:
    """Ground-truth near-dup pairs (id1 < id2 within one planted family) —
    join a detector's output against this to measure recall."""
    fams = corpus.select("doc_id", "family_id")
    a, b = fams.alias("a"), fams.alias("b")
    return (
        a.join(b, (F.col("a.family_id") == F.col("b.family_id"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
    )


def synth_embeddings(
    spark: SparkSession,
    n_vecs: int = 200_000,
    dims: int = 64,
    n_concepts: int = 32,
    noise: float = 0.25,
    seed: int = 7,
) -> DataFrame:
    """Deterministic embedding table ``(vec_id, concept, embedding)`` with
    real cluster structure: each vector = its concept's base direction
    (uniform [-0.5, 0.5) per dim) + per-vector uniform noise scaled by
    ``noise`` — same-concept cosines land ~0.95+, cross-concept ~0, so
    IVF cells and SRP buckets separate meaningfully at bench scale."""
    d = spark.range(n_vecs).withColumnRenamed("id", "vec_id")
    concept = F.pmod(F.xxhash64("vec_id", F.lit(seed)), F.lit(n_concepts))
    d = d.select("vec_id", concept.alias("concept"))
    comp = lambda i: (  # noqa: E731
        (_u(F.col("concept"), i, F.lit(seed + 1)) - F.lit(0.5))
        + (_u(F.col("vec_id"), i, F.lit(seed + 2)) - F.lit(0.5)) * F.lit(noise)
    )
    emb = F.transform(F.sequence(F.lit(0), F.lit(dims - 1)), comp)
    return d.select("vec_id", "concept",
                    emb.cast("array<float>").alias("embedding"))
