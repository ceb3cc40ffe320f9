"""URL canonicalization and URL-level dedup — stage 1 of a web-crawl
curation pipeline (CommonCrawl-derived corpora dedup by canonical URL
before any content pass; see the CCNet/RefinedWeb processing orders).

Beyond-reference layer (no exon counterpart).

Scale: pure JVM expressions — ``parse_url`` (built-in) + HOF query-param
filtering — so canonicalization is map-only, and the dedup groupBy
shuffles a 16-byte digest of the canonical form, not the URL string.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# tracking parameters stripped by default: the ad/analytics click ids
# that make one page infinite URLs (Google/Facebook/Microsoft/Mailchimp
# conventions)
TRACKING_PARAMS = (
    "utm_source utm_medium utm_campaign utm_term utm_content utm_id "
    "gclid gbraid wbraid fbclid msclkid mc_cid mc_eid igshid ref_src"
).split()


def _pct_normalize(c: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization as a pure Column:
    uppercase every escape's hex digits (``%2f`` == ``%2F``) and decode
    escapes of UNRESERVED characters (``%7Euser`` == ``~user``) —
    the two spellings crawlers actually mix for one identity. Reserved
    characters stay encoded (decoding ``%26`` in a query would change
    its structure), and malformed escapes (``%zz``, trailing ``%``)
    pass through untouched. Split-on-'%' + transform: every array piece
    after the first begins with the escape's two hex digits."""
    pieces = F.split(c, "%", -1)

    def norm(p: Column) -> Column:
        hex2 = F.upper(F.substring(p, 1, 2))
        code = F.conv(hex2, 16, 10).cast("int")
        unreserved = (
            ((code >= 0x41) & (code <= 0x5A))
            | ((code >= 0x61) & (code <= 0x7A))
            | ((code >= 0x30) & (code <= 0x39))
            | code.isin(0x2D, 0x2E, 0x5F, 0x7E)
        )
        rest = F.substring(p, 3, 0x7FFFFFFF)
        return (
            F.when(~p.rlike("^[0-9A-Fa-f]{2}"), F.concat(F.lit("%"), p))
            .when(unreserved, F.concat(F.char(code), rest))
            .otherwise(F.concat(F.lit("%"), hex2, rest))
        )

    return F.concat(
        F.element_at(pieces, 1),
        F.array_join(
            F.transform(
                F.slice(pieces, 2, F.greatest(F.size(pieces) - 1, F.lit(0))),
                norm,
            ),
            "",
        ),
    )


def canonicalize_url(
    url: Column | str, strip_params: tuple[str, ...] | None = None
) -> Column:
    """Canonical form of an http(s) URL as a pure Column:

      * scheme + host lowercased; leading ``www.`` and default ports
        (``:80``/``:443``) dropped from the host
      * fragment dropped
      * tracking query params (``strip_params``, default
        ``TRACKING_PARAMS``) removed; the survivors sorted by name so
        param order never splits a URL into two identities
      * trailing ``/`` dropped from non-root paths; empty path becomes
        ``/``
      * percent-encoding normalized in path and query (RFC 3986
        §6.2.2): escape hex uppercased, escapes of unreserved
        characters decoded — ``/a%2fb?x=%7Ey`` == ``/a%2Fb?x=~y``

    Non-URL strings (no host) canonicalize to NULL — callers treat that
    as "not a web document". This is identity-normalization for dedup,
    not resolution: no redirects, no IDN/punycode folding. Userinfo
    (``user@host``) is DROPPED — ``https://user@example.com/x`` and
    ``https://example.com/x`` are the same fetch identity, and keeping
    it split bare-host twins apart (r8 advice, urls.py:49).
    """
    u = F.col(url) if isinstance(url, str) else url
    strip = TRACKING_PARAMS if strip_params is None else list(strip_params)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1))
    # HOST is the bare hostname (no userinfo, no port) — parsing
    # AUTHORITY for the name broke ^www\. stripping and lowercased the
    # case-sensitive userinfo on 'user@host' URLs. The port is
    # re-extracted from AUTHORITY's tail (digits after the LAST ':' —
    # never matches inside userinfo or a bracketed IPv6 literal);
    # default ports are scheme-specific — :443 on plain http is NOT
    # redundant.
    hostname = F.lower(F.try_parse_url(u, F.lit("HOST")))
    auth = F.try_parse_url(u, F.lit("AUTHORITY"))
    port = F.regexp_extract(F.coalesce(auth, F.lit("")), r":(\d+)$", 1)
    host1 = F.regexp_replace(hostname, r"^www\.", "")
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    host = F.when(
        keep_port, F.concat(host1, F.lit(":"), port)
    ).otherwise(host1)
    path0 = _pct_normalize(
        F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    )
    path = F.when(path0 == "", F.lit("/")).otherwise(
        F.when(
            (F.length(path0) > 1) & path0.endswith("/"),
            F.substring(path0, 1, F.length(path0) - 1),
        ).otherwise(path0)
    )
    query0 = _pct_normalize(F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit("")))
    pairs = F.filter(
        F.split(query0, "&"),
        lambda kv: (kv != "")
        & ~F.lower(F.split(kv, "=", 2).getItem(0)).isin(
            [p.lower() for p in strip]
        ),
    )
    query = F.array_join(F.array_sort(pairs), "&")
    base = F.concat(
        F.when(scheme == "", F.lit("http")).otherwise(scheme),
        F.lit("://"),
        host,
        path,
    )
    out = F.when(
        query == "", base
    ).otherwise(F.concat(base, F.lit("?"), query))
    return F.when(
        hostname.isNull() | (hostname == ""), F.lit(None)
    ).otherwise(out)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep-min-id dedup by canonical URL. Output:
    ``(canonical_url, keep_id, n_copies)`` — rows whose URL does not
    canonicalize (NULL) are dropped (they cannot collide by URL).

    Scale: groupBy on ``md5(canonical)`` semantics via the canonical
    string itself (Spark hashes the key map-side; at petabyte scale
    pre-hash with ``h32`` if URL strings dominate shuffle bytes)."""
    canon = canonicalize_url(F.col(url_col))
    return (
        df.select(F.col(id_col).alias("doc_id"), canon.alias("canonical_url"))
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
