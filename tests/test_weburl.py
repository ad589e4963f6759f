"""Oracles for the URL-curation family (weburl.py): python mirrors via
urllib/hashlib, semantics pins, and the composed query."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from connect_server_spark.operators.weburl import (
    canonical_url,
    cap_per_domain,
    filter_blocked_domains,
    url_dedup,
    url_domain,
    url_host,
)

URL_ZOO = [
    (1, "https://WWW.Example.COM/a/b/?utm_source=x&q=1#frag"),
    (2, "https://www.example.com/a/b?q=1"),
    (3, "http://sub.deep.blocked.org/page"),
    (4, "https://news.example.com/c/"),
    (5, "not a url"),
    (6, "https://example.com"),
    (7, "https://example.com/?utm_source=a&utm_medium=b&fbclid=z"),
    (8, "https://host.co/x?gclid=1&keep=2&utm_campaign=c"),
]


def _py_canonical(url: str) -> str | None:
    from urllib.parse import urlsplit

    try:
        s = urlsplit(url)
    except ValueError:
        return None
    if not s.netloc:
        return None
    path = s.path
    if path.endswith("/"):
        path = path[:-1]
    kept = [
        p
        for p in s.query.split("&")
        if p
        and not p.startswith("utm_")
        and not p.startswith("fbclid=")
        and not p.startswith("gclid=")
    ]
    out = f"{s.scheme.lower()}://{s.netloc.lower()}{path}"
    if kept:
        out += "?" + "&".join(kept)
    return out


def _py_domain(url: str) -> str | None:
    from urllib.parse import urlsplit

    try:
        host = urlsplit(url).hostname
    except ValueError:
        return None
    if not host:
        return None
    parts = host.lower().split(".")
    return host.lower() if len(parts) <= 2 else ".".join(parts[-2:])


def test_canonical_and_domain_match_urllib_mirror(spark):
    df = spark.createDataFrame(URL_ZOO, ["id", "url"])
    got = {
        r.id: (r.c, r.d)
        for r in df.select(
            "id",
            canonical_url(F.col("url")).alias("c"),
            url_domain(F.col("url")).alias("d"),
        ).collect()
    }
    for i, u in URL_ZOO:
        assert got[i] == (_py_canonical(u), _py_domain(u)), (i, u, got[i])
    # the zoo exercises the interesting equivalence: 1 == 2 after canon
    assert got[1][0] == got[2][0]
    assert got[5] == (None, None)


def test_blocklist_blocks_subdomains_and_keeps_null_domains(spark):
    df = spark.createDataFrame(URL_ZOO, ["id", "url"])
    block = spark.createDataFrame([("blocked.org",), ("HOST.CO",)], ["domain"])
    kept = sorted(r.id for r in filter_blocked_domains(df, "url", block).collect())
    assert 3 not in kept  # sub.deep.blocked.org blocked via its domain
    assert 8 not in kept  # blocklist casing normalized
    assert 5 in kept      # unparseable rows pass through (text gates decide)
    assert kept == [1, 2, 4, 5, 6, 7]


def test_url_dedup_min_id_and_garbage_stays_distinct(spark):
    rows = URL_ZOO + [(9, "also not a url"), (10, "not a url")]
    df = spark.createDataFrame(rows, ["id", "url"])
    kept = sorted(r.id for r in url_dedup(df, "url", "id").collect())
    # 2 collapses into 1 (canonical equal); 7 collapses into 6 (tracking
    # params stripped, bare host path "" == ""); 10 collapses into 5
    # (IDENTICAL raw garbage); 9 is distinct garbage and survives
    assert kept == [1, 3, 4, 5, 6, 8, 9]


def test_cap_per_domain_mirror_and_seed_semantics(spark):
    rows = [(i, f"https://d{i % 3}.example/p/{i}") for i in range(60)]
    df = spark.createDataFrame(rows, ["id", "url"])
    out = sorted(r.id for r in cap_per_domain(df, "url", "id", 5, seed="s:").collect())
    # python mirror: md5 rank within each domain
    by_dom: dict[str, list[int]] = {}
    for i, u in rows:
        by_dom.setdefault(_py_domain(u), []).append(i)
    want = sorted(
        i
        for ids in by_dom.values()
        for i in sorted(ids, key=lambda x: (hashlib.md5(f"s:{x}".encode()).hexdigest(), x))[:5]
    )
    assert out == want and len(out) == 15
    # determinism + reseed changes the sample but not its size
    again = sorted(r.id for r in cap_per_domain(df, "url", "id", 5, seed="s:").collect())
    other = sorted(r.id for r in cap_per_domain(df, "url", "id", 5, seed="t:").collect())
    assert again == out and len(other) == 15 and other != out


def test_cap_per_domain_salted_is_exact(spark):
    """The two-phase skew path must select EXACTLY the unsalted winners
    — every global top-k row ranks ≤ k inside its own salt bucket, so
    phase 1 cannot drop a winner, and phase 2 re-ranks survivors in the
    same total order. Skewed fixture: one mega-domain holds 80% of the
    rows; NULL-domain (unparseable) rows must still bypass the cap in
    both phases."""
    rows = [(i, f"https://mega.example/p/{i}") for i in range(160)] + [
        (200 + i, f"https://d{i % 4}.example/p/{i}") for i in range(40)
    ] + [(300 + i, "not a url") for i in range(9)]
    df = spark.createDataFrame(rows, ["id", "url"])
    base = sorted(r.id for r in cap_per_domain(df, "url", "id", 7, seed="s:").collect())
    assert len(base) == 7 + 4 * 7 + 9  # mega + 4 small + exempt garbage
    for s in (1, 2, 8, 64):  # 1 = degenerate (no pre-phase), 64 > rows/bucket
        salted = sorted(
            r.id
            for r in cap_per_domain(df, "url", "id", 7, seed="s:", salt=s).collect()
        )
        assert salted == base, f"salt={s} diverged"
    with pytest.raises(ValueError):
        cap_per_domain(df, "url", "id", 7, salt=0)


def test_corpus_url_filter_query_semantics(spark, sf_dir):
    from connect_server_spark.queries.curation_queries import (
        _URL_BLOCKLIST,
        _URL_DOMAIN_CAP,
        corpus_url_filter,
    )

    rows = corpus_url_filter(spark, sf_dir).collect()
    domains = [r.domain for r in rows]
    assert not set(domains) & set(_URL_BLOCKLIST)
    assert all(r.n_docs <= _URL_DOMAIN_CAP for r in rows)
    assert len(rows) >= 10
    again = corpus_url_filter(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]


def test_weburl_expressions_are_scan_stage(spark):
    df = spark.createDataFrame(URL_ZOO, ["id", "url"])
    plan = (
        df.select(url_host(F.col("url")), canonical_url(F.col("url")))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "Python" not in plan


def test_canonical_keeps_port_and_userinfo(spark):
    """example.com:8080 is a DIFFERENT page from example.com — the
    authority (userinfo, host, port) survives canonicalization, and the
    urllib mirror agrees."""
    zoo = [
        (11, "https://Example.com:8080/a"),
        (12, "https://example.com/a"),
        (13, "https://User:Pw@Example.com:8443/b/"),
    ]
    df = spark.createDataFrame(zoo, ["id", "url"])
    got = {
        r.id: r.c
        for r in df.select("id", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, u in zoo:
        assert got[i] == _py_canonical(u), (i, u, got[i])
    assert got[11] != got[12]
    kept = sorted(r.id for r in url_dedup(df, "url", "id").collect())
    assert kept == [11, 12, 13]


def test_null_urls_and_null_domains_pass_through(spark):
    """NULL urls must never collapse in url_dedup, and NULL-domain rows
    bypass the per-domain cap (one pseudo-group is not one domain)."""
    rows = [(i, None) for i in range(1, 6)] + [
        (10 + i, f"https://only.example/p{i}") for i in range(10)
    ] + [(50 + i, f"garbage {i}") for i in range(8)]
    df = spark.createDataFrame(rows, "id long, url string")
    deduped = sorted(r.id for r in url_dedup(df, "url", "id").collect())
    assert deduped == sorted(i for i, _ in rows)  # nothing collapses
    capped = sorted(r.id for r in cap_per_domain(df, "url", "id", 3).collect())
    # only.example capped to 3; every NULL/garbage-domain row kept
    assert len([i for i in capped if 10 <= i < 20]) == 3
    assert all(i in capped for i in range(1, 6))
    assert all(50 + i in capped for i in range(8))


def test_corpus_from_crawl_funnel_invariants(spark, sf_dir):
    """The crawl-head composite: per-domain funnel is monotone
    (parsed >= url_ok >= gated), blocked domains report parsed traffic
    but zero survivors, the per-domain cap binds, and the drill is
    deterministic."""
    from connect_server_spark.queries.curation_queries import (
        _URL_BLOCKLIST,
        _URL_DOMAIN_CAP,
        corpus_from_crawl,
    )

    rows = corpus_from_crawl(spark, sf_dir).collect()
    assert len(rows) >= 10
    by_dom = {r.domain: r for r in rows}
    for r in rows:
        assert r.n_parsed >= r.n_url_ok >= r.n_gated >= 0, r
        assert r.n_url_ok <= _URL_DOMAIN_CAP, r
    for blocked in _URL_BLOCKLIST:
        assert by_dom[blocked].n_parsed > 0
        assert by_dom[blocked].n_url_ok == 0
        assert by_dom[blocked].n_gated == 0
    assert any(r.n_url_ok > 0 for r in rows)
    again = corpus_from_crawl(spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
