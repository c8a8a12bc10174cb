"""URL column functions: canonicalization, host/TLD extraction, uuid stripping.

All native Column expressions (JVM-side; no Python in the hot path).

Reference parity targets:
- X1 ``extract_top_level_domain`` — Project_Scripts/03_extract_text.py:25-35
- X2 ``extract_tld``              — Project_Scripts/08_sqlite_setup.py:21-26
- X3 two-level-aware TLD          — ner_content.py:19-25
- X6 ``strip_uuid``               — Project_Scripts/08_sqlite_setup.py:15-19

The three TLD variants are deliberately distinct (they apply at different
stages in the reference); do not merge them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def host_of(url: Column) -> Column:
    """Hostname of a URL (no port, no userinfo)."""
    return F.parse_url(url, F.lit("HOST"))


def canonicalize_url(url: Column) -> Column:
    """Frontier URL canonicalization: lowercase scheme+host, drop the
    fragment, drop default ports (:80 http, :443 https).

    The reference dedups at file-basename granularity
    (01_download_newscrawl.py:88-90); an explicit canonical form is required
    once the URL-seen set is keyed on the url itself (north_rule).
    """
    no_frag = F.regexp_replace(url, r"#.*$", "")
    scheme_host = F.lower(F.regexp_extract(no_frag, r"^([a-zA-Z]+://[^/]+)", 1))
    # Default ports are scheme-specific: https://host:80 is NOT https://host
    # (a genuinely different origin), so strip :80 only for http and :443
    # only for https.
    scheme = F.regexp_extract(scheme_host, r"^([a-z]+)://", 1)
    scheme_host = (
        F.when(scheme == "http", F.regexp_replace(scheme_host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(scheme_host, r":443$", ""))
        .otherwise(scheme_host)
    )
    rest = F.regexp_replace(no_frag, r"^[a-zA-Z]+://[^/]+", "")
    return F.concat(scheme_host, rest)


def url_hash(canonical_url: Column) -> Column:
    """Murmur3 (Spark's built-in ``hash``) of the canonical URL — the
    frontier's URL-seen key (north_star: 'canonicalized+murmur3-hashed URLs')."""
    return F.hash(canonical_url).cast("long")


def extract_top_level_domain(url: Column) -> Column:
    """X1 (03_extract_text.py:25-35): netloc last label, dot-prefixed when the
    netloc contains a dot, else the bare netloc."""
    host = host_of(url)
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(host.contains("."), F.concat(F.lit("."), F.substring_index(host, ".", -1)))
        .otherwise(host)
    )


def extract_tld(hostname: Column) -> Column:
    """X2 (08_sqlite_setup.py:21-26): hostname.split('.')[-1] — no dot prefix."""
    return F.substring_index(hostname, ".", -1)


def extract_tld_two_level(hostname: Column) -> Column:
    """X3 (ner_content.py:19-25): keep last two labels for .uk/.au/.nz."""
    last = F.substring_index(hostname, ".", -1)
    return F.when(
        last.isin("uk", "au", "nz"), F.substring_index(hostname, ".", -2)
    ).otherwise(last)


def strip_uuid(uuid_col: Column) -> Column:
    """X6 (08_sqlite_setup.py:15-19): '<urn:uuid:X>' -> 'X'; pass through otherwise."""
    return F.when(
        uuid_col.startswith("<urn:uuid:") & uuid_col.endswith(">"),
        uuid_col.substr(F.lit(11), F.length(uuid_col) - 11),
    ).otherwise(uuid_col)
