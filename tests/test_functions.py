"""Unit tests for the scalar function library (SURVEY.md §5.1).

Each test pins the Spark expression against an inline pure-Python oracle
implementing the reference semantics (the reference functions are pure,
so the oracles are small re-statements of their documented behavior —
extract/commoncrawl_scraper.py:25-67, transform/data_cleaning.py:31-75).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

import firmable_company_data_pipeline_spark.functions as lib


def _run(spark, values, colfn, in_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {in_type}")
    return [r[0] for r in df.select(colfn(F.col("v")).alias("out")).collect()]


# ---- F1 clean_text -------------------------------------------------------
def test_clean_text(spark):
    vals = ["  a \t b\n\nc  ", "one", "", "x   y"]
    got = _run(spark, vals, lib.clean_text)
    assert got == [" ".join(v.split()) for v in vals]


# ---- F3 extract_company_name --------------------------------------------
def test_extract_company_name(spark):
    vals = ["acme-corp.com.au", "foo_bar.net", "baz.org.au", "plain.au", "noext"]

    def oracle(domain):
        name = domain
        for suffix in [".com.au", ".net.au", ".org.au", ".au", ".com", ".net", ".org"]:
            if name.endswith(suffix):
                name = name[: -len(suffix)]
                break
        return name.replace("-", " ").replace("_", " ").title()

    assert _run(spark, vals, lib.extract_company_name) == [oracle(v) for v in vals]


# ---- F4 validate_abn -----------------------------------------------------
def _py_validate_abn(abn):
    if not abn:
        return False
    abn_clean = re.sub(r"[\s\-]", "", abn)
    if not re.match(r"^\d{11}$", abn_clean):
        return False
    weights = [10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19]
    total = sum(
        (int(d) - 1 if i == 0 else int(d)) * w
        for i, (d, w) in enumerate(zip(abn_clean, weights))
    )
    return total % 89 == 0


def test_validate_abn(spark):
    # 51824753556 is the well-known published valid example ABN.
    vals = ["51824753556", "51 824 753 556", "51-824-753-556", "51824753557",
            "12345678901", "123", "", None, "abcdefghijk"]
    got = _run(spark, vals, lib.validate_abn)
    assert got == [_py_validate_abn(v) for v in vals]


def test_extract_abn(spark):
    vals = [
        "Contact us ABN: 51 824 753 556 today",
        "our abn 51824753556.",
        "random 51 824 753 556 inline",
        "invalid ABN: 12345678901",
        "nothing here",
    ]

    def oracle(text):
        for pattern in [r"ABN[:\s]*([0-9 ]{11,20})", r"\b(\d{2}\s?\d{3}\s?\d{3}\s?\d{3})\b"]:
            m = re.search(pattern, text, re.IGNORECASE)
            if m:
                abn = re.sub(r"\s+", "", m.group(1))
                if _py_validate_abn(abn):
                    return abn
        return None

    assert _run(spark, vals, lib.extract_abn) == [oracle(v) for v in vals]


# ---- F6/F7/F8 extractors -------------------------------------------------
def test_extract_emails_phones_postcode(spark):
    text = "mail a@b.com or c.d+x@e.org.au, call +61 2 123 456 or (02) 9999 8888, NSW 2000"
    emails = _run(spark, [text], lib.extract_emails)[0]
    assert emails == re.findall(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", text)
    phones = _run(spark, [text], lib.extract_phones)[0]
    assert phones == re.findall(
        r"(\+61\s?\d{1,2}\s?\d{3}\s?\d{3}|\(0\d\)\s?\d{4}\s?\d{4}|\d{4}\s?\d{3}\s?\d{3})", text
    )
    def pc_oracle(t):
        m = re.search(r"\b(0[289][0-9]{2}|[1-9][0-9]{3})\b", t)
        return m.group(1) if m else None

    # note: "9999" from the phone is the first postcode-shaped hit — the
    # reference behaves identically (search order, not address-awareness).
    vals = [text, "no pc", "Sydney NSW 2000"]
    assert _run(spark, vals, lib.extract_postcode) == [pc_oracle(v) for v in vals]


# ---- F9 standardize_state ------------------------------------------------
def test_standardize_state(spark):
    cases = {
        "nsw": "NSW",
        " New South Wales ": "NSW",
        "N.S.W.": "NSW",  # collapses dots to space →"N S W" → fuzzy → NSW
        "Victoria": "VIC",
        "QLD": "QLD",
        "queensland": "QLD",
        "Western Australia": "WA",
        "TAS.": "TAS",
        "Northern  Territory": "NT",
        "zzz": None,
        None: None,
    }
    got = _run(spark, list(cases.keys()), lib.standardize_state)
    assert got == list(cases.values())


# ---- F10/F11/F12 cleaners -----------------------------------------------
def test_clean_company_name(spark):
    vals = ["Acme, Pty. Ltd!", "a  &  b", "", None, "ok name"]

    def oracle(name):
        if not name:
            return None
        name = re.sub(r"[^A-Za-z0-9 &]", " ", name)
        name = re.sub(r"\s+", " ", name).strip()
        return name.title()

    assert _run(spark, vals, lib.clean_company_name) == [oracle(v) for v in vals]


def test_clean_postcode_abn(spark):
    assert _run(spark, ["20-00", "abc", "", None, " 3000 "], lib.clean_postcode) == [
        "2000", None, None, None, "3000"]
    assert _run(spark, ["51 824 753 556", "51-824-753-556", "123", None],
                lib.clean_abn) == ["51824753556", "51824753556", None, None]


# ---- F17 token_sort_ratio ------------------------------------------------
def test_token_sort_ratio(spark):
    df = spark.createDataFrame(
        [("acme holdings pty", "pty acme holdings"), ("abc", "abd"), ("same", "same")],
        "a string, b string",
    )
    got = [r[0] for r in df.select(lib.token_sort_ratio(F.col("a"), F.col("b"))).collect()]
    assert got[0] == 100.0  # same tokens, different order
    assert got[2] == 100.0
    assert 0 < got[1] < 100


def test_extract_domain(spark):
    vals = ["https://www.acme.com.au/about", "http://foo.net/x?y=1", "https://www.x.org"]
    got = _run(spark, vals, lib.extract_domain)
    assert got == ["acme.com.au", "foo.net", "x.org"]
