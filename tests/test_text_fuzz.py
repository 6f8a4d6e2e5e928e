"""Differential fuzz: ``scrub_pii`` (Spark / Java regex) vs the DuckDB
(RE2) oracle chain on adversarial strings.

The contract row ``doc_pii_scrub`` compares the two engines only on the
sf0.01 documents corpus plus a fixed seeded suffix; this fuzz hammers the
regex-engine boundary itself — malformed emails, out-of-range IPs, digit
runs abutting word characters, unicode letters next to ASCII patterns —
where Java regex and RE2 could plausibly disagree on ``\\b``, ``\\d`` or
char-class semantics.  Any disagreement is a real portability bug in
``PII_PATTERNS`` (the patterns must stay in the common subset).
"""

import random

import duckdb
import pytest

from jena_geo_spark.pipelines.text import PII_PATTERNS, scrub_pii

FRAGMENTS = [
    "hello", "world", "x", "a@b", "@x.com", "a@@b.example.com",
    "bob@mail.example.org", "A.b-c_d%e+f@h-i.j.kl", "mail@x.c",
    "1.2.3.4", "999.999.999.999", "1.2.3", "1.2.3.4.5", "10.0.0.1.",
    ".1.2.3.4", "a1.2.3.4", "1.2.3.4b", "é1.2.3.4", "ümlaut@host.de",
    "123-456-7890", "+49-555-123-4567", "12-345-6789", "1-234-567-8901",
    "123-456-78901", "0123-456-7890", "-123-456-7890", "x123-456-7890",
    "...", "@", "-", "+", "%", "_", "v1.2", "3.14159", "a.b.c.d",
    "42", "0", "tel:", ";", "(", ")", "word.word@", "@@",
]


def _oracle_rows(con, rows):
    con.execute("DROP TABLE IF EXISTS fuzz_docs")
    con.execute("CREATE TABLE fuzz_docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fuzz_docs VALUES (?, ?)", rows)
    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    q = (
        f"WITH s1 AS (SELECT doc_id, len(regexp_extract_all(text, '{pats['email']}'))::BIGINT AS n_email, "
        f"regexp_replace(text, '{pats['email']}', '<EMAIL>', 'g') AS t1 FROM fuzz_docs), "
        f"s2 AS (SELECT doc_id, n_email, len(regexp_extract_all(t1, '{pats['phone']}'))::BIGINT AS n_phone, "
        f"regexp_replace(t1, '{pats['phone']}', '<PHONE>', 'g') AS t2 FROM s1) "
        f"SELECT doc_id, regexp_replace(t2, '{pats['ipv4']}', '<IP>', 'g') AS text_redacted, "
        f"n_email, n_phone, len(regexp_extract_all(t2, '{pats['ipv4']}'))::BIGINT AS n_ipv4 FROM s2"
    )
    return {tuple(r) for r in con.execute(q).fetchall()}


@pytest.mark.parametrize("seed", [11, 23])
def test_scrub_pii_matches_duckdb_on_adversarial_text(spark, seed):
    rng = random.Random(seed)
    rows = []
    for i in range(300):
        n = rng.randint(0, 12)
        # vary the joiner: spaces, empty (fragments ABUT), commas
        joiner = rng.choice([" ", " ", " ", "", ","])
        rows.append((i, joiner.join(rng.choice(FRAGMENTS) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {tuple(r) for r in scrub_pii(df).collect()}
    con = duckdb.connect()
    want = _oracle_rows(con, rows)
    assert got == want


@pytest.mark.parametrize("seed", [5])
def test_subword_tokens_match_duckdb_on_adversarial_text(spark, seed):
    """Same engine-boundary treatment for the BPE-ish pre-tokenizer: the
    doc_subword_tokens contract row only sees corpus text, this fuzz
    feeds punctuation/digit/unicode boundaries to both engines."""
    from jena_geo_spark.pipelines.text import BPE_ISH_PATTERN, subword_token_stats

    rng = random.Random(seed)
    rows = []
    for i in range(300):
        n = rng.randint(0, 12)
        joiner = rng.choice([" ", " ", "", ","])
        rows.append((i, joiner.join(rng.choice(FRAGMENTS) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.n_subword, r.n_whitespace)
           for r in subword_token_stats(df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE fz(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO fz VALUES (?, ?)", rows)
    want = set(con.execute(
        f"SELECT doc_id, len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))::BIGINT, "
        "len(string_split(text, ' '))::BIGINT FROM fz"
    ).fetchall())
    assert got == want


@pytest.mark.parametrize("seed", [17])
def test_curate_matches_duckdb_on_adversarial_text(spark, seed):
    """End-to-end differential gate for the COMPOSED curation chain:
    regex scrub + quality + tagged-gram repetition + window-min dedup
    + rounding + boolean gates, all replayed by the contract oracle on
    adversarial text (the sf0.01 corpus never exercises unicode/PII/
    short-doc edges together)."""
    from jena_geo_spark.contract import o_doc_curate
    from jena_geo_spark.pipelines.curate import curate_documents

    rng = random.Random(seed)
    rows = []
    for i in range(250):
        n = rng.randint(0, 30)
        joiner = rng.choice([" ", " ", " ", "", ","])
        rows.append((i, joiner.join(rng.choice(FRAGMENTS) for _ in range(n))))
    # seed exact dups (same fragments re-joined) and short docs
    for i in range(250, 280):
        rows.append((i, rows[i - 250][1]))
    rows += [(300, ""), (301, "x"), (302, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {tuple(r) for r in curate_documents(
        df, min_quality=0.65, max_top_bigram=0.2, max_dup_trigram=0.2
    ).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = {tuple(r) for r in con.execute(o_doc_curate()).fetchall()}
    assert got == want
