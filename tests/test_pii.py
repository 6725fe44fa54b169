"""Planted-PII redaction semantics (closes the round-9 vacuous-gate
finding): run the exact redaction expression both engines use on
strings with KNOWN PII and assert the redacted text — not just a hash —
matches the expected placeholders, and that both dialects produce
byte-identical output. Reference behavior: CartoDB-style PII scrub
pass (emails/phones/cards → typed placeholders)."""

from __future__ import annotations

import duckdb
import pytest

from raquet_spark.queries import _pii_redact_expr

CASES = [
    # (input, expected redaction)
    ("contact alice.smith@example.com now", "contact <EMAIL> now"),
    ("two: a@b.co and c_d%e@sub.domain.org.", "two: <EMAIL> and <EMAIL>."),
    ("call 415-555-0199 or 212.555.0142", "call <PHONE> or <PHONE>"),
    ("space phone 650 555 0123 ok", "space phone <PHONE> ok"),
    ("card 4111111111111111 on file", "card <CARD> on file"),
    # dot-LESS email-like span must NOT match: pins the \. escaping
    # (the r09 bug redacted this in Spark because the backslash was
    # consumed by the SQL string literal, turning \. into bare .)
    ("a@b_cc is not an email", "a@b_cc is not an email"),
    ("15 digits 411111111111111 stay", "15 digits 411111111111111 stay"),
    ("mixed eve@x.org 555-123-4567 4000001234567899",
     "mixed <EMAIL> <PHONE> <CARD>"),
    ("no pii here at all", "no pii here at all"),
]


def test_redact_spark_semantics(spark):
    df = spark.createDataFrame([(t,) for t, _ in CASES], ["text"])
    df.createOrReplaceTempView("pii_cases")
    got = [
        r.red
        for r in spark.sql(
            f"SELECT {_pii_redact_expr('text', 'spark')} AS red FROM pii_cases"
        ).collect()
    ]
    assert got == [want for _, want in CASES]


def test_redact_duckdb_matches_spark():
    con = duckdb.connect()
    expr = _pii_redact_expr("text", "duckdb")
    for text, want in CASES:
        (got,) = con.execute(
            f"SELECT {expr} AS red FROM (SELECT ? AS text)", [text]
        ).fetchone()
        assert got == want, text


def test_redact_gate_is_not_vacuous():
    """The driver-gate query must return rows even on a PII-free corpus
    (the planted VALUES rows guarantee it) — guards against the r01-r09
    regression where the hash compared two empty sets."""
    from raquet_spark.queries import pii_redact

    con = duckdb.connect()
    for t in ["documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    rows = con.execute(pii_redact("duckdb")).fetchall()
    assert len(rows) >= 4
    by_id = {r[0]: r for r in rows}
    assert by_id[9000001][2] == 2  # two emails
    assert by_id[9000002][3] == 2  # two phones
    assert by_id[9000003][4] == 1  # one card, a@b_cc NOT an email
    assert by_id[9000003][2] == 0
