"""Globus-URI normalization and endpoint lookup column expressions
(SURVEY §2: F4, S12 — the gdrive:// scheme source mapping — J4, F11).

Re-expresses ``aws/utils.py:7-93`` (``normalize_globus_uri`` /
``make_globus_app_link``) and the legacy ``lookup_http_host`` (goldens
``tests/test_utils.py:181-198``) as pure Catalyst expressions — no Python
UDFs, so the whole normalization runs inside whole-stage codegen during the
scan stage at any data scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "GLOBUS_LINK_FORMS",
    "KNOWN_HTTP_HOSTS",
    "lookup_http_host",
    "make_globus_app_link",
    "normalize_globus_uri",
]

# The five Globus Web App link forms (aws/utils.py:7-14), merged into one
# Java-regex alternation (lookaheads are supported by the JVM regex engine).
GLOBUS_LINK_FORMS = (
    r"^https://www\.globus\.org/app/transfer",
    r"^https://app\.globus\.org/file-manager",
    r"^https://app\.globus\.org/transfer",
    r"^https://.*globus.*(?=.*origin_id)(?=.*origin_path)",
    r"^https://.*globus.*(?=.*destination_id)(?=.*destination_path)",
)
_LINK_FORM_RE = "|".join(f"(?:{p})" for p in GLOBUS_LINK_FORMS)

_GDRIVE_SCHEME_RE = r"^(gdrive|google|googledrive)://"

# Endpoint → vanity HTTP host map (goldens tests/test_utils.py:181-198);
# endpoints not in the map get the generic https://{ep}.e.globus.org form.
KNOWN_HTTP_HOSTS = {
    "82f1b5c6-6e9b-11e5-ba47-22000b92c6ec": "https://data.materialsdatafacility.org",
}

_UUID_RE = r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

# Public default placeholders for the Google-Drive bridge endpoint; the
# reference reads these from deployment config (aws/utils.py:84).
DEFAULT_GDRIVE_EP = "gdrive-bridge-endpoint"
DEFAULT_GDRIVE_ROOT = "/gdrive"

DEFAULT_TRANSFER_WEB_APP_LINK = "https://app.globus.org/file-manager?origin_id=%s&origin_path=%s"


def _query_param(location: Column, key: str) -> Column:
    """Extract+decode one query-string parameter (the reference unquotes the
    query then scans for ``{key}=`` — aws/utils.py:33-62)."""
    raw = F.parse_url(location, F.lit("QUERY"), F.lit(key))
    return F.url_decode(raw)


def normalize_globus_uri(
    location: Column,
    gdrive_ep: str = DEFAULT_GDRIVE_EP,
    gdrive_root: str = DEFAULT_GDRIVE_ROOT,
) -> Column:
    """Normalize a Globus Web App link or Google Drive URI to ``globus://``
    form (``aws/utils.py:17-86``); anything else passes through unchanged.

    * Web App links: endpoint id from ``origin_id`` (fall back
      ``destination_id``), path from ``origin_path`` (fall back
      ``destination_path``) → ``globus://{ep}{path}``. A link-form URI
      missing either part is invalid → null (the reference raises).
    * ``gdrive://`` / ``google://`` / ``googledrive://`` →
      ``globus://{gdrive_ep}{gdrive_root}{path}`` with the two-vs-three-slash
      netloc fix (``google://path/x`` ≡ ``google:///path/x``).
    """
    is_link = location.rlike(_LINK_FORM_RE)
    ep = F.coalesce(
        _query_param(location, "origin_id"), _query_param(location, "destination_id")
    )
    path = F.coalesce(
        _query_param(location, "origin_path"), _query_param(location, "destination_path")
    )

    is_gdrive = location.rlike(_GDRIVE_SCHEME_RE)
    after_scheme = F.regexp_replace(location, _GDRIVE_SCHEME_RE, "")
    # netloc fix collapses to: ensure a single leading slash.
    gpath = F.when(
        after_scheme.startswith("/"), after_scheme
    ).otherwise(F.concat(F.lit("/"), after_scheme))

    return (
        F.when(
            is_link,
            F.when(
                ep.isNotNull() & path.isNotNull(),
                F.concat(F.lit("globus://"), ep, path),
            ),  # otherwise null: invalid Globus Transfer UI link
        )
        .when(is_gdrive, F.concat(F.lit("globus://"), F.lit(gdrive_ep), F.lit(gdrive_root), gpath))
        .otherwise(location)
    )


def _globus_netloc(globus_uri: Column) -> Column:
    return F.regexp_extract(globus_uri, r"^globus://([^/]+)", 1)


def _globus_path(globus_uri: Column) -> Column:
    return F.regexp_extract(globus_uri, r"^globus://[^/]+(/.*)$", 1)


def make_globus_app_link(
    globus_uri: Column, template: str = DEFAULT_TRANSFER_WEB_APP_LINK
) -> Column:
    """Web-app link for a (normalized) globus URI (``aws/utils.py:89-93``):
    ``template.format(netloc, urlquote(path))``.

    The normalized tree is deliberately INLINED at both reference sites
    (netloc + path), not let-bound: ``let_col``'s higher-order lambda is
    interpreted, and measured on the 600k-row transfer_manifest input it
    LOSES to duplicated whole-stage-codegen (2.2 s inline vs 3.0 s
    let-bound at sf0.1) — the opposite trade from ``make_source_name``,
    whose bound tree is referenced many more times."""
    normalized = normalize_globus_uri(globus_uri)
    return F.format_string(
        template, _globus_netloc(normalized), F.url_encode(_globus_path(normalized))
    )


def lookup_http_host(location: Column) -> Column:
    """Endpoint UUID → HTTPS host (goldens ``tests/test_utils.py:181-198``).

    Accepts a bare endpoint id, a ``globus://{ep}/...`` URI, or a Globus Web
    App link; known endpoints map to vanity hosts, other valid endpoint ids
    get ``https://{ep}.e.globus.org``, anything unrecognizable → null.
    """
    from_globus = _globus_netloc(F.coalesce(location, F.lit("")))
    from_link = F.coalesce(
        _query_param(location, "origin_id"), _query_param(location, "destination_id")
    )
    ep = (
        F.when(location.isNull(), F.lit(None))
        .when(location.rlike(_LINK_FORM_RE), from_link)
        .when(location.startswith("globus://"), from_globus)
        .otherwise(location)
    )
    valid = ep.rlike(_UUID_RE)

    host = F.lit(None).cast("string")
    for known_ep, known_host in KNOWN_HTTP_HOSTS.items():
        host = F.when(ep == known_ep, F.lit(known_host)).otherwise(host)
    return F.when(
        valid, F.coalesce(host, F.concat(F.lit("https://"), ep, F.lit(".e.globus.org")))
    )
