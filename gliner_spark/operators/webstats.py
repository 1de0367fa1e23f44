"""Per-host web-corpus operators — the domain-level curation layer a
Common-Crawl-style pipeline runs (per-domain quality profiling,
domain caps, blocklists) that document-level operators cannot express.

No reference counterpart (SURVEY.md §2.3 target-side breadth): the
reference processes documents one at a time; domain-level statistics
and caps only exist for a corpus engine.

All pure Catalyst. Host extraction uses the same regex on both engines
(Spark and the DuckDB twin in tests) so the pytest oracle is
value-exact; Spark's ``parse_url`` agrees on these URL shapes but has
no DuckDB equivalent, and a shared RE2∩Java pattern is the repo's
standard trick for cross-engine parity (textstats.pii_scrub).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# scheme://HOST[:port][/...?...#...] — host = authority up to the first
# '/', ':', '?' or '#' (r6 ADVICE: the old [^/]+ capture swallowed
# ports and, for path-less URLs, the query/fragment into ``host``,
# corrupting host_stats grouping and cap_per_host keys for those
# shapes). RE2 ∩ Java-regex subset (no lookaround) so DuckDB runs it
# verbatim.
_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"
# full authority up to the first slash — what path extraction strips
# (keeps ':8080' or '?q=1' out of the path segments)
_AUTH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*"


def url_host(url_col):
    """Lower-cased host of a URL (expression form)."""
    return F.lower(F.regexp_extract(url_col, _HOST_RE, 1))


def with_url_parts(
    pages: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Add (host, tld, path_depth) columns. path_depth counts the
    non-empty path segments after the authority."""
    u = F.col(url_col)
    path = F.regexp_replace(u, _AUTH_RE, "")
    return pages.withColumns({
        "host": url_host(u),
        "tld": F.regexp_extract(url_host(u), r"\.([^.]+)$", 1),
        "path_depth": F.size(
            F.filter(F.split(path, "/"), lambda s: s != "")
        ).cast("long"),
    })


def host_stats(
    pages: DataFrame, url_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """(host, n_pages, n_chars, mean_quality, n_langs): the per-domain
    profile driving domain-level curation decisions (cap, drop, boost).

    One shuffle (groupBy host, all aggregates map-side partial); hosts
    are the natural unit of skew in web corpora, and count/sum/avg
    aggregation absorbs hot hosts in the partial-agg stage — the
    salted form is unnecessary here (operators/skew.py discussion)."""
    from .textstats import quality_expr

    return (
        pages.select(
            url_host(F.col(url_col)).alias("host"),
            F.length(F.col(text_col)).cast("long").alias("chars"),
            quality_expr(F.col(text_col)).alias("q"),
            F.col("lang"),
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("chars").alias("n_chars"),
            F.round(F.avg("q"), 4).alias("mean_quality"),
            F.count_distinct("lang").cast("long").alias("n_langs"),
        )
    )


def cap_per_host(
    pages: DataFrame,
    cap: int,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Keep at most ``cap`` pages per host — the best ones by quality
    (ties broken by url, so the result is deterministic). The standard
    Common-Crawl curation step against boilerplate-heavy mega-domains.

    Skew-aware shape: a plain row_number window would sort EVERY
    host's pages, and the hottest host — exactly the one being capped —
    lands in one task's sort. Instead the per-host counts (one
    partial-agg shuffle) split the corpus: hosts already within the
    cap bypass ranking entirely (broadcast of the small over-cap host
    list decides the split when it fits, hash join otherwise via
    AQE), and only the over-cap hosts' rows enter the window — at web
    scale that is the long tail's worth of data REMOVED from the sort,
    with AQE's skew-split dividing what remains."""
    from pyspark.sql import Window

    # collision-safe internal key: the input may already carry a
    # "host" column (e.g. with_url_parts output) — a bare "host" here
    # would make the groupBy/joins ambiguous and the final drop would
    # eat the caller's column
    hk = "_cap_host"
    tagged = pages.select("*", url_host(F.col(url_col)).alias(hk))
    counts = tagged.groupBy(hk).agg(F.count(F.lit(1)).alias("_n"))
    over = counts.where(F.col("_n") > cap).select(hk)

    small = tagged.join(over, hk, "left_anti")
    w = Window.partitionBy(hk).orderBy(
        F.desc(_quality(text_col)), F.col(url_col)
    )
    big = (
        tagged.join(over, hk)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return small.unionByName(big).drop(hk)


def _quality(text_col: str):
    from .textstats import quality_expr

    return quality_expr(F.col(text_col))
