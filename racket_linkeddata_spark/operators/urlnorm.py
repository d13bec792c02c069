"""URL canonicalization — the crawl-dedup primitive that runs BEFORE
content dedup: mirrored/tracked variants of one resource collapse to a
single canonical key.

Rules (the standard safe subset — semantics-preserving per RFC 3986
plus the universal tracking-param convention):

- scheme and host lowercased (RFC 3986 §6.2.2.1);
- userinfo kept, default ports dropped (http:80 / https:443);
- fragment stripped (never sent to the server);
- query parameters: tracking params removed (``utm_*``, ``gclid``,
  ``fbclid``, ``msclkid``, ``mc_eid``), the rest SORTED byte-wise and
  re-joined (param order is almost never semantic; sorting makes the
  key order-insensitive);
- empty path becomes ``/`` (https://h == https://h/);
- a query left empty after filtering drops its ``?``.

Everything is JVM column algebra (regexp + higher-order array
functions, whole-stage codegen) — no UDF, no shuffle; at 100 TB this
runs inside the scan projection. Not a full WHATWG URL parser by
design: inputs are urls a crawler already fetched (hence parseable),
and the DuckDB oracle pins the exact string semantics cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def canonical_url(c: Column) -> Column:
    c = F.split(c, "#", 2).getItem(0)  # strip fragment
    scheme = F.lower(F.regexp_extract(c, _SCHEME_RE, 1))
    rest = F.regexp_replace(c, _SCHEME_RE, "")
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    pathq = F.substring(rest, F.length(authority) + 1, 1 << 30)
    # authority = [userinfo@]host[:port]; host lowercases, the port
    # drops only when it is the scheme default. IPv6 literals keep
    # their brackets (the colons inside are NOT a port separator), and
    # anything that is not cleanly host[:digits] is preserved verbatim
    # (lowercased) — a malformed authority must never collapse two
    # distinct servers into one canonical key.
    userinfo = F.regexp_extract(authority, r"^(.*@)", 1)
    hostport = F.regexp_replace(authority, r"^.*@", "")
    bracket_host = F.regexp_extract(hostport, r"^(\[[^\]]*\])", 1)
    plain_host = F.regexp_extract(hostport, r"^([^:\[]*)", 1)
    host = F.lower(F.when(bracket_host != "", bracket_host)
                   .otherwise(plain_host))
    port_rest = F.when(
        bracket_host != "",
        F.substring(hostport, F.length(bracket_host) + 1, 1 << 30)
    ).otherwise(F.substring(hostport, F.length(plain_host) + 1, 1 << 30))
    port = F.regexp_extract(port_rest, r"^:(\d+)$", 1)
    well_formed = (port_rest == "") | (port != "")
    default_port = ((scheme == "http") & (port == "80")) | \
        ((scheme == "https") & (port == "443")) | (port == "")
    port_part = F.when(~well_formed, F.lower(port_rest)) \
        .when(default_port, F.lit("")) \
        .otherwise(F.concat(F.lit(":"), port))
    # an unterminated '[' authority: keep it verbatim, lowercased
    host = F.when(hostport.startswith("[") & (bracket_host == ""),
                  F.lower(hostport)).otherwise(host)
    port_part = F.when(hostport.startswith("[") & (bracket_host == ""),
                       F.lit("")).otherwise(port_part)

    path = F.split(pathq, r"\?", 2).getItem(0)
    query = F.when(pathq.contains("?"),
                   F.split(pathq, r"\?", 2).getItem(1)).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE))
    q2 = F.array_join(F.array_sort(params), "&")
    path2 = F.when(path == "", F.lit("/")).otherwise(path)

    return F.concat(
        scheme, F.lit("://"), userinfo, host, port_part, path2,
        F.when(q2 != "", F.concat(F.lit("?"), q2)).otherwise(F.lit("")))


def dedup_by_canonical_url(pages, url_col: str = "url"):
    """(canonical_url, keep_url, n_variants): one keeper per canonical
    key — min original url for determinism. One map-side-combinable
    hash aggregate. ensure_parallelism: the canonicalization regex
    chain is the CPU-heavy map side and a small corpus scan packs into
    one split (no-op at production scale)."""
    from .util import ensure_parallelism

    return (ensure_parallelism(pages)
            .withColumn("canon_url", canonical_url(F.col(url_col)))
            .groupBy("canon_url")
            .agg(F.min(url_col).alias("keep_url"),
                 F.count(F.lit(1)).alias("n_variants")))
