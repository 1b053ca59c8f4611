"""PII detection + scrubbing for training-data pipelines: emails, SSNs,
credit-card numbers, IPv4 addresses and phone numbers found by regex,
counted per category and replaced by typed placeholder tokens.

This is the pre-training scrub pass every large text pipeline runs before
a corpus leaves the crawl store. There is no Nutch analogue (the reference
indexes raw text); the operator exists for the LLM-pipeline surface, next
to dedup/quality/decontamination in this package.

Everything is a chain of regexp expressions over one string column —
pure Catalyst, codegen-friendly, ZERO Exchange nodes: at 100 TB the scrub
composes with the parquet scan like any other map pass, and the category
counts aggregate map-side. No UDF, no HOF (so no interpreted-projection
CSE trap, PLANS.md §6.25).

Pattern dialect is deliberately the common subset of Java regex (Spark)
and RE2 (DuckDB oracle): ASCII classes, non-capturing groups, \\b — no
backreferences, no lookaround — so the oracle runs the IDENTICAL pattern
strings. Counts are per-pattern over the ORIGINAL text (categories are
disjoint by construction: phone separators exclude '.', so IPv4 never
overlaps; SSN digit grouping 3-2-4 is disjoint from phone 3-3-4 and
card 4-4-4-4). Scrub order is fixed (email, ssn, cc, ipv4, phone) so the
placeholder output is deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# (name, pattern, placeholder) — order is the scrub order.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CC>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{1,2}[- ]\(?\d{3}\)?[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
]


def pii_count(text: Column, pattern: str) -> Column:
    """Occurrences of one PII pattern (int, 0 for null text)."""
    return F.coalesce(
        F.size(F.regexp_extract_all(text, F.lit(pattern), 0)), F.lit(0)
    ).cast("int")


def pii_counts(text: Column) -> Column:
    """struct(n_email, n_ssn, n_cc, n_ipv4, n_phone, n_pii) — counts per
    category over the original text, plus the total."""
    counts = [pii_count(text, pat).alias(f"n_{name}") for name, pat, _ in PII_RULES]
    total = None
    for c in counts:
        total = c if total is None else total + c
    return F.struct(*counts, total.alias("n_pii"))


def scrub_pii(text: Column) -> Column:
    """Replace every PII match with its typed placeholder, in PII_RULES
    order. Null-safe (null text stays null)."""
    out = text
    for _name, pat, token in PII_RULES:
        out = F.regexp_replace(out, pat, token)
    return out
