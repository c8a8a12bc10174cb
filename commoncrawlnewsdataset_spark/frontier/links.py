"""Link discovery from fetched HTML — the real web-crawl loop.

The reference's frontier is closed (the Common Crawl seed list is the whole
universe, 01_download_newscrawl.py:80-81); a live crawler grows its frontier
from the pages it fetches.  ``extract_links`` pulls <a href> targets out of
raw html with pure column regexp in the scan stage (the binary column never
shuffles — same rule as extraction), and ``make_html_link_expander`` adapts
it to WaveRunner.link_expander so wave N's fetched pages seed wave N+1's
pending set, gated by the same URL-seen filter as everything else.

Resolution policy (column-expression-friendly, covers the news-page cases):
absolute http(s) kept as-is; protocol-relative (//host/x) take the source
scheme; root-relative (/x) resolve against the source origin; path-relative
and non-http schemes (mailto:, javascript:) are dropped.  Fragments are cut
by the capture regex itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# href value up to a quote or fragment; (?is) = case-insensitive, dotall
LINK_RE = r"""(?is)<a\s[^>]*href\s*=\s*["']([^"'#]+)["']"""


def extract_links(
    pages: DataFrame, src_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src, dst) absolute http(s) link edges from raw html."""
    # cast, not decode: ANSI F.decode RAISES on invalid UTF-8 and one mojibake
    # page would kill the whole link-discovery job — real crawl bytes are
    # routinely malformed.  binary->string cast wraps the bytes unvalidated
    # (identical result on valid UTF-8, best-effort regex match on the rest).
    hrefs = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(LINK_RE), 1
    )
    exploded = pages.select(
        F.col(src_col).alias("src"), F.explode(hrefs).alias("href")
    )
    scheme = F.regexp_extract("src", r"^(https?):", 1)
    origin = F.regexp_extract("src", r"^(https?://[^/]+)", 1)
    # relative branches are guarded on a non-empty scheme/origin extraction:
    # a src url that isn't http(s) would otherwise concat '' and emit a
    # malformed '://host/x' that passes the not-null filter into the frontier
    dst: Column = (
        F.when(F.col("href").rlike(r"^https?://"), F.col("href"))
        .when(
            F.col("href").startswith("//") & (scheme != F.lit("")),
            F.concat(scheme, F.lit(":"), F.col("href")),
        )
        .when(
            F.col("href").startswith("/")
            & ~F.col("href").startswith("//")
            & (origin != F.lit("")),
            F.concat(origin, F.col("href")),
        )
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        exploded.select("src", dst.alias("dst"))
        .filter(F.col("dst").isNotNull())
        .filter(F.col("dst") != F.col("src"))
    )


def make_html_link_expander(priority: float = 0.25):
    """WaveRunner.link_expander over REAL page content: requires a page sink
    (the expander needs the html column, which only the sink-backed fetch
    results carry).  Discovered urls inherit the source row's discovered_ts
    and enter the frontier at ``priority``; the wave loop's URL-seen gate +
    deterministic representative selection handle duplicates."""

    def expander(fetched: DataFrame) -> DataFrame:
        if "html" not in fetched.columns:
            raise ValueError(
                "html link expansion needs the page sink: construct WaveRunner "
                "with page_sink_dir (and a payload-returning fetcher) so fetched "
                "rows carry the html column."
            )
        links = extract_links(fetched.select("url", "html"))
        src_ts = fetched.select(F.col("url").alias("src"), F.col("discovered_ts"))
        return (
            links.join(src_ts, "src")
            .select(
                F.col("dst").alias("url"),
                F.lit(float(priority)).alias("priority"),
                "discovered_ts",
            )
        )

    return expander
