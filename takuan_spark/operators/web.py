"""Web-corpus domain operators: URL → registrable-domain extraction,
per-domain rollups, and suffix-aware blocklist filtering.

Domain-level curation is a standard stage of a web-scale training
pipeline (a domain's aggregate quality/spam signal gates all its
documents), and blocklists match by DNS *suffix* — "badsite.net" must
block "cdn.badsite.net". The Spark-first shape for suffix matching at
100 TB is NOT a `endswith` theta-join (that is a cross product): a
hostname has a bounded label count, so each doc emits its ≤ ~6 domain
suffixes and the match becomes an equi-join — or, for a small literal
blocklist, a fully-codegen'd ``arrays_overlap`` with no join at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: host part of a URL: scheme://HOST[/...]
_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/:?#]+)"


def url_host(url: Column | str) -> Column:
    """The hostname of a URL as a native regexp projection (no UDF);
    empty string when the URL has no scheme://host shape."""
    return F.regexp_extract(url, _HOST_RE, 1)


def host_suffixes(host: Column | str) -> Column:
    """All dot-suffixes of a hostname, most-specific first:
    ``a.b.c`` → [``a.b.c``, ``b.c``, ``c``]. Bounded by the label
    count, so exploding it is O(labels) per row — the device that
    turns suffix matching into an equi-join."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(labels, i + 1, n - i), "."),
    )


def domain_blocked(host: Column | str, blocklist: list[str]) -> Column:
    """True iff any dot-suffix of ``host`` is in the literal
    ``blocklist`` — whole-stage-codegen expression, zero joins. For a
    blocklist table instead of a literal, explode
    :func:`host_suffixes` and broadcast-semi-join."""
    return F.arrays_overlap(
        host_suffixes(host), F.array(*[F.lit(b) for b in blocklist])
    )


def domain_stats(
    docs: DataFrame,
    *,
    url_col: str = "url",
    blocklist: list[str] | None = None,
) -> DataFrame:
    """Per-domain corpus rollup: document count, char volume, distinct
    languages, and (when a blocklist is given) the blocked flag. One
    hash aggregation keyed by domain — partial aggregation collapses
    per-domain state map-side, so the shuffle carries domains, not
    documents."""
    host = url_host(F.col(url_col))
    base = docs.withColumn("_domain", host)
    agg = base.groupBy(F.col("_domain").alias("domain")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
    )
    if blocklist is not None:
        agg = agg.withColumn(
            "blocked", domain_blocked(F.col("domain"), blocklist)
        )
    return agg


def blocklist_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    *,
    url_col: str = "url",
    id_col: str = "doc_id",
    domain_col: str = "domain",
) -> DataFrame:
    """Drop documents whose URL host matches any blocklist domain by
    DNS suffix. The docs side explodes its bounded suffix set and
    broadcast-SEMI-joins the blocklist to find hit ids — an equi-join,
    never a theta-join; the blocklist ships once per executor — then
    anti-joins the hits back out."""
    hits = (
        docs.select(
            id_col,
            F.explode(host_suffixes(url_host(F.col(url_col)))).alias("_sfx"),
        )
        .join(
            F.broadcast(blocklist.select(F.col(domain_col).alias("_sfx"))),
            "_sfx",
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    return docs.join(hits, id_col, "left_anti")
