"""Search / filter / projection operators (SURVEY §2.2).

The reference's "search engine" is a dynamically assembled SQL string:
case-insensitive ``ILIKE '%q%'`` over (title, description, content_summary),
optional equality filters, ``ORDER BY ingested_at DESC LIMIT k``
(``ethical_crawler.py:968-1004``). FTS is explicitly disabled
(``ethical_crawler.py:888``) so substring match IS the semantics.

Spark-first shape: build a predicate `Column` and let Catalyst push it into
the parquet scan. ``ilike`` stays JVM-side (whole-stage codegen); the top-k
plans as ``TakeOrderedAndProject`` — a true distributed top-k, no global
sort, which is the property that survives 100 TB.

Determinism note: the reference orders by ``ingested_at`` alone; with ties
the returned set is engine-dependent. All entry-point queries here take an
explicit unique tie-break column so results are set-deterministic and
oracle-comparable (SURVEY §7.5 risk 4).
"""

from __future__ import annotations

from functools import reduce
from operator import and_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ilike_any(df: DataFrame, query: str, columns: list[str]) -> Column:
    """``(c1 ILIKE '%q%' OR c2 ILIKE '%q%' OR ...)`` — multi-column
    case-insensitive substring match (``ethical_crawler.py:978-985``).

    ``Column.ilike`` does not treat its argument as regex but ``%``/``_``
    are SQL wildcards; callers doing literal-text search should escape them.
    """
    pat = f"%{query}%"
    preds = [df[c].ilike(pat) for c in columns]
    return reduce(lambda a, b: a | b, preds)


def equality_filters(df: DataFrame, **eq: object) -> DataFrame:
    """Dynamic AND of optional equality predicates
    (``ethical_crawler.py:987-995``): ``None`` values are skipped, mirroring
    the reference's "append WHERE clause only when the CLI flag is present".
    """
    preds = [df[k] == F.lit(v) for k, v in eq.items() if v is not None]
    if not preds:
        return df
    return df.filter(reduce(and_, preds))


def where_expr(df: DataFrame, predicate: str | None) -> DataFrame:
    """Raw SQL predicate pass-through (``ethical_crawler.py:1078-1080``).

    The reference appends the user string to its SQL verbatim; ``F.expr``
    gives the same capability inside Spark's own parser (still pushed down
    by Catalyst when the expression allows).
    """
    return df.filter(F.expr(predicate)) if predicate else df


def search(
    df: DataFrame,
    query: str | None,
    search_columns: list[str],
    order_col: str,
    tiebreak_col: str,
    limit: int,
    **eq: object,
) -> DataFrame:
    """Full search path (``ethical_crawler.py:968-1004``):
    substring match → optional equality filters → top-k by recency.

    Descending on ``order_col`` with a unique ``tiebreak_col`` so the
    returned *set* is deterministic.
    """
    out = df
    if query:
        out = out.filter(ilike_any(out, query, search_columns))
    out = equality_filters(out, **eq)
    return out.orderBy(F.desc(order_col), F.desc(tiebreak_col)).limit(limit)


def distinct_values(df: DataFrame, column: str) -> DataFrame:
    """``SELECT DISTINCT col`` (``ethical_crawler.py:1383-1388``) — partial
    aggregation map-side, so the shuffle carries only distinct keys.
    """
    return df.select(column).distinct()


def top_k(df: DataFrame, order_col: str, tiebreak_col: str, k: int) -> DataFrame:
    """``ORDER BY x DESC LIMIT k`` (``ethical_crawler.py:997-1004``).

    Plans as ``TakeOrderedAndProject``: each partition keeps a k-heap, the
    driver merges — O(n) scan, no shuffle of the full relation.
    """
    return df.orderBy(F.desc(order_col), F.desc(tiebreak_col)).limit(k)


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25-ranked full-text search — the real engine behind the surface
    the reference advertises but disables ("Full-text search: Built-in",
    README.txt:235, vs FTS skipped at ethical_crawler.py:888; what actually
    ships is ``ILIKE %q%``, :978-985).

    Fully relational: term frequencies and document lengths from one
    explode+groupBy over the corpus (shuffle keyed on doc — linear);
    document frequencies, N, and avgdl are a handful of scalar aggregates
    broadcast back via crossJoin (no driver collect in the plan). Per-term
    partial scores round to 6 decimals and sum in DECIMAL so the final
    score is independent of term-row order — the property that keeps the
    ranking hash-stable across engines and partitionings.
    """
    from .text import tokens

    corpus = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    doclen = corpus.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    globals_df = doclen.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    terms = F.array(*[F.lit(t) for t in query_terms])
    tf = (
        corpus.filter(F.array_contains(terms, F.col("term")))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("dft"))
    scored = (
        tf.join(F.broadcast(dft), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(globals_df))
        .withColumn(
            "idf", F.log((F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5) + 1.0)
        )
        .withColumn(
            "part",
            F.round(
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
                6,
            ).cast("decimal(18,6)"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("part").cast("double"), 4).alias("score"))
    )
    w_order = [F.desc("score"), F.col(id_col)]
    return (
        scored.orderBy(*w_order)
        .limit(k)
        .select(id_col, "score")
    )
