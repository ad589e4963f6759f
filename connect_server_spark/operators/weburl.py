"""URL-level curation: the filters a crawl pipeline applies between
WARC parsing and text gating (C4 / RefinedWeb practice) — blocklists,
per-domain caps, and URL canonicalization + dedup.

All scan-stage or narrow-key by design:

* host/path parsing is Spark's built-in ``try_parse_url`` (JVM expression,
  whole-stage codegen — no Python);
* the blocklist gate is a broadcast anti-join on the host (blocklists
  are list-sized, corpora are not);
* the per-domain cap is ONE hash partition by host carrying (id, host)
  rows — a deterministic md5 rank, not ``rand()``, so retries and
  reruns keep the identical sample;
* URL dedup groups by the canonical URL's 16-byte md5 — the same
  narrow-digest discipline as exact text dedup.

Domain grouping uses the last two host labels (``a.b.c.example.com`` →
``example.com``) — the standard approximation when no public-suffix
table ships with the job; a deployment swaps in the PSL behind the
same column contract (documented limitation: two-level ccTLD suffixes
like ``.co.uk`` group one label too coarse).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from connect_server_spark.functions.expr import let_col

__all__ = [
    "url_host",
    "url_domain",
    "canonical_url",
    "filter_blocked_domains",
    "cap_per_domain",
    "url_dedup",
]


def url_host(url: Column) -> Column:
    """Lowercased host of a URL (JVM ``try_parse_url`` — a malformed
    URL is data, not a task failure); NULL for unparseable input."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def url_domain(url: Column) -> Column:
    """Registrable-domain approximation: the last two labels of the
    host (see module docstring for the PSL caveat). The host parse is
    let-bound — it is referenced three times, and inlining would
    re-parse the URL per reference."""

    def build(host: Column) -> Column:
        parts = F.split(host, r"\.")
        return (
            F.when(host.isNull() | (host == ""), F.lit(None).cast("string"))
            .when(F.size(parts) <= 2, host)
            .otherwise(
                F.concat_ws(
                    ".", F.element_at(parts, -2), F.element_at(parts, -1)
                )
            )
        )

    return let_col(url_host(url), build)


def canonical_url(url: Column) -> Column:
    """Canonical form for URL dedup: lowercase scheme + AUTHORITY
    (userinfo, host, AND port — ``example.com:8080`` is a different
    page from ``example.com``), drop the fragment, drop
    utm_*/fbclid/gclid tracking params, strip a trailing slash from
    the path. Pure let-bound expressions — evaluated in the scan
    stage. NULL for host-less input: unparseable garbage must NOT
    share one canonical form (url_dedup falls back to a per-row key)."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

    def with_path(raw_path: Column) -> Column:
        # one trailing slash strips — including the bare root, so
        # example.com/ and example.com canonicalize together
        path = F.when(
            raw_path.endswith("/"),
            F.substring(raw_path, F.lit(1), F.length(raw_path) - 1),
        ).otherwise(raw_path)
        query = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
        kept = F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("fbclid=")
            & ~p.startswith("gclid="),
        )

        def with_qs(qs: Column) -> Column:
            def build(authority: Column) -> Column:
                return F.when(
                    authority.isNotNull() & (authority != ""),
                    F.concat(
                        scheme,
                        F.lit("://"),
                        F.lower(authority),
                        path,
                        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(
                            F.lit("")
                        ),
                    ),
                )

            return let_col(F.try_parse_url(url, F.lit("AUTHORITY")), build)

        return let_col(F.array_join(kept, "&"), with_qs)

    return let_col(
        F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")), with_path
    )


def filter_blocked_domains(
    df: DataFrame, url_col: str, blocklist: DataFrame
) -> DataFrame:
    """Drop rows whose registrable domain appears in ``blocklist``
    (one ``domain`` string column). Broadcast LEFT ANTI on the domain —
    the corpus never shuffles; subdomains of a blocked domain are
    blocked with it (the C4 blocklist semantic)."""
    tagged = df.withColumn("_dom", url_domain(F.col(url_col)))
    block = blocklist.select(F.lower(F.col("domain")).alias("_dom")).distinct()
    return tagged.join(F.broadcast(block), "_dom", "left_anti").drop("_dom")


def cap_per_domain(
    df: DataFrame,
    url_col: str,
    id_col: str,
    max_docs: int,
    seed: str = "",
    domain_col: str | None = None,
    salt: int | None = None,
) -> DataFrame:
    """Keep at most ``max_docs`` documents per registrable domain — the
    anti-monoculture cap (RefinedWeb-style): without it one
    mega-domain's boilerplate dominates a crawl snapshot.

    The kept subset is a deterministic md5 rank over (seed, id) inside
    each domain — stable under retries/reruns (no ``rand()``), and
    changing ``seed`` resamples without re-reading anything upstream.
    One hash-partition-by-domain Exchange carrying (id, url) rows.
    Pass ``domain_col`` to partition on an already-projected domain
    column so a downstream groupBy on the same column can reuse the
    Exchange instead of re-deriving the expression.

    NULL-domain rows (unparseable URLs) BYPASS the cap — they are one
    pseudo-group, not one domain, so capping them would drop unbounded
    data (1M unparseable docs → max_docs survivors). They stay in the
    ONE window (no union — a two-branch union would duplicate the
    upstream subtree) but partition on a SALTED pseudo-key
    (1024 buckets off the id hash) so they never form a hot partition,
    and the filter exempts them; the text gates decide their fate.

    ``salt``: the 100 TB skew path. One window partitioned by domain
    means ONE task ranks a mega-domain's every row — a third of a real
    crawl snapshot can be one host. ``salt=S`` runs the cap in two
    exact phases: phase 1 ranks within (domain, id-hash % S) and keeps
    only local rank ≤ max_docs (every global top-max_docs row ranks ≤
    max_docs inside its own bucket, so nothing kept is lost); phase 2
    re-ranks the ≤ S·max_docs survivors per domain in the same total
    order, which therefore selects exactly the unsalted winners.
    Output is pinned row-identical to ``salt=None`` in
    ``tests/test_weburl.py``. Cost: one extra Exchange whose per-domain
    volume is bounded by S·max_docs rows — at crawl scale set S ≈ the
    executor count; locally the single window is faster, so None is
    the default."""
    if max_docs <= 0:
        raise ValueError("max_docs must be positive")
    if salt is not None and salt <= 0:
        raise ValueError("salt must be positive when given")
    key = F.col(domain_col) if domain_col else url_domain(F.col(url_col))
    with_domain = df.withColumn("_capdom", key)
    part = F.coalesce(
        F.col("_capdom"),
        F.concat(
            F.lit("\x00null:"),
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(1024)).cast("string"),
        ),
    )
    order = [
        F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))),
        F.col(id_col),
    ]
    exempt = F.col("_capdom").isNull()
    if salt is not None and salt > 1:
        pre = Window.partitionBy(
            part, F.pmod(F.xxhash64(F.col(id_col), F.lit(salt)), F.lit(salt))
        ).orderBy(*order)
        with_domain = with_domain.withColumn(
            "_r1", F.row_number().over(pre)
        ).filter(exempt | (F.col("_r1") <= max_docs)).drop("_r1")
    w = Window.partitionBy(part).orderBy(*order)
    return (
        with_domain.withColumn("_r", F.row_number().over(w))
        .filter(exempt | (F.col("_r") <= max_docs))
        .drop("_r", "_capdom")
    )


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """One row per canonical URL (min id wins) — crawls re-fetch the
    same page across snapshots and mirrors; URL dedup is the cheap
    first pass before any content dedup. Groups by the canonical URL's
    16-byte md5 digest (narrow shuffle, the exact-text-dedup
    discipline); ties break on the id so reruns are identical.
    Unparseable URLs key on their raw string and NULL urls on their
    row id — distinct garbage stays distinct, and NULL-url rows (e.g.
    WARC error rows joined in) are never collapsed into one."""
    digest = F.md5(
        F.coalesce(
            canonical_url(F.col(url_col)),
            F.col(url_col),
            F.concat(F.lit("\x00null-url:"), F.col(id_col).cast("string")),
        )
    )
    w_min = F.min(F.col(id_col)).over(Window.partitionBy(digest))
    return df.withColumn("_m", w_min).filter(
        F.col(id_col) == F.col("_m")
    ).drop("_m")
