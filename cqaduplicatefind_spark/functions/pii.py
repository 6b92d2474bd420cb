"""PII redaction for web-crawl text — pure Catalyst, no UDFs.

A training-data pipeline over crawled pages scrubs contact-style PII (email
addresses, phone numbers, IPv4 addresses) before export. Like the URL tier
(``functions/urls.py``) this is a free map at 10^12 rows: every rewrite is a
built-in ``regexp_replace`` evaluated inside whole-stage codegen on the scan
projection — no shuffle, no Python round-trip, composable with the
normalize/signature stages.

The reference has no PII layer (its corpus is forum questions with no
redaction pass); this is a forward-path operator for the Common-Crawl-shaped
input (BASELINE.json ``input_hint``).

Pattern notes (the part that has to be thought through, not the regex
trivia):

- patterns are kept to the common dialect of Java regex (Spark) and RE2
  (DuckDB / most SQL oracles): character classes, bounded repetition, ``\\b``
  word boundaries — no lookarounds, no backreferences — so the exact same
  strings match in both engines and the redaction is oracle-checkable
  byte-for-byte;
- order matters and is fixed: emails first (their domain part would
  otherwise leave dotted fragments that look like hosts), then IPv4, then
  phones (digit runs; must run after IPv4 so octets are not half-eaten);
- placeholders are stable tokens (``<EMAIL>``/``<IP>``/``<PHONE>``), so
  redacted text stays deterministic for downstream exact/near dedup —
  two pages differing only in contact lines become byte-identical, which is
  the desired behavior for a dedup-centric pipeline (boilerplate contact
  rows collapse instead of blocking exact-hash grouping);
- redaction is conservative by construction (simple shapes, word-bounded):
  the goal at corpus scale is bulk scrubbing, not perfect NER recall, and
  the count columns exist precisely so a pipeline can route high-PII pages
  to quarantine instead of trusting the regexes blindly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# common Java-regex / RE2 dialect; see module docstring
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# NANP-style separated forms: 555-0123, 555 0123, 415-555-0123
PHONE_RE = r"\b\d{3}[- ](\d{3}[- ])?\d{4}\b"

_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def redact_pii(text: Column) -> Column:
    """Text with emails, IPv4s, and phone-shaped numbers replaced by stable
    placeholder tokens, in that fixed order."""
    out = text
    for _, pattern, token in _RULES:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII kind, CHAINED in redaction order: each kind is
    counted on the text with the prior rules already applied, so
    ``n_<kind>`` equals exactly the number of ``<KIND>`` placeholders in the
    redacted output. Counting every kind on the raw text instead would
    double-count nested shapes — an IPv4-looking domain inside an email
    (``user@10.1.2.3.example.net``) is redacted as ONE ``<EMAIL>`` yet would
    report ``n_ip=1``, so a quarantine router thresholding on ``n_ip`` flags
    pages whose redacted text contains no IP at all and the audit counts can
    never be reconciled against the placeholders."""
    out: dict[str, Column] = {}
    cur = text
    for name, pattern, token in _RULES:
        out[f"n_{name}"] = F.regexp_count(cur, F.lit(pattern))
        cur = F.regexp_replace(cur, pattern, token)
    return out


def with_pii_redacted(
    docs: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """``docs`` plus ``out_col`` (redacted text) and ``n_email``/``n_ip``/
    ``n_phone`` audit counts — one narrow projection, shuffle-free."""
    counts = pii_counts(F.col(text_col))
    return docs.select(
        "*",
        redact_pii(F.col(text_col)).alias(out_col),
        *(expr.alias(name) for name, expr in counts.items()),
    )
