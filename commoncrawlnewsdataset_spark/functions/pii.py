"""PII redaction — a staple pre-training corpus stage the reference lacks
(beyond-reference, SURVEY training-pipeline axis): emails, phone numbers,
and IPv4 literals are replaced with typed placeholder tokens, with per-doc
match counts for audit.

All pure column expressions (JVM regex, whole-stage codegen — no UDF).
The patterns avoid lookarounds/boundaries so Java regex (Spark) and RE2
(DuckDB) match identically; replacement order (email -> phone -> ip) is
fixed, so the composed output is deterministic and cross-engine
oracle-checkable (DuckDB needs the 'g' flag — its regexp_replace is
first-match-only by default, the classic parity trap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}[-.]\d{3}[-.]\d{4}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def redact_pii(text: Column) -> Column:
    """Emails, then phones, then IPv4s replaced by placeholder tokens.
    Order matters (an email's host can contain digits-and-dots runs), and
    is mirrored exactly by the SQL oracle."""
    out = F.regexp_replace(text, EMAIL_RE, EMAIL_TOKEN)
    out = F.regexp_replace(out, PHONE_RE, PHONE_TOKEN)
    return F.regexp_replace(out, IPV4_RE, IP_TOKEN)


def with_pii_redacted(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``redacted`` plus per-doc audit counts (n_emails, n_phones,
    n_ips).  Counts are taken on the ORIGINAL text (phone/ip counts on the
    partially-redacted text would depend on replacement order twice)."""
    t = F.col(text_col)
    return (
        df.withColumn("n_emails", F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).cast("long"))
        .withColumn("n_phones", F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).cast("long"))
        .withColumn("n_ips", F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), 0)).cast("long"))
        .withColumn("redacted", redact_pii(t))
    )
