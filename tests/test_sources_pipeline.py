"""End-to-end source + cleaning + pipeline tests (SURVEY.md §7 Phase 2/4).

XML fixture → staging schema; CC index fixture → stub fetch → parse →
fields; cleaning dedup; full five-stage run_pipeline with the offline
fetch client.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from firmable_company_data_pipeline_spark.pipeline.cleaning import (
    clean_abr_data,
    clean_commoncrawl_data,
    jsonify_for_flat_sink,
)
from firmable_company_data_pipeline_spark.pipeline.run import run_pipeline
from firmable_company_data_pipeline_spark.sources.commoncrawl import (
    StubFetchClient,
    _checksum_valid_abn,
    fetch_warc_html,
    parse_pages,
    read_cc_index,
)
from firmable_company_data_pipeline_spark.sources.xml_abr import read_abr_xml

SLUGS = ["acme-books", "bravo-builders", "cedar-farms"]


def _abr_xml_record(abn, status, from_date, etype, name, state, postcode):
    return f"""<ABR recordLastUpdatedDate="20240101">
  <ABN status="{status}" ABNStatusFromDate="{from_date}">{abn}</ABN>
  <EntityType><EntityTypeInd>PRV</EntityTypeInd><EntityTypeText>{etype}</EntityTypeText></EntityType>
  <MainEntity>
    <NonIndividualName type="MN"><NonIndividualNameText>{name}</NonIndividualNameText></NonIndividualName>
    <BusinessAddress><AddressDetails><State>{state}</State><Postcode>{postcode}</Postcode></AddressDetails></BusinessAddress>
  </MainEntity>
</ABR>"""


@pytest.fixture(scope="module")
def abr_xml_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("abrxml")
    records = []
    for i, slug in enumerate(SLUGS):
        num = sum(ord(c) for c in slug)
        abn = _checksum_valid_abn(num)
        name = slug.replace("-", " ").title()
        records.append(
            _abr_xml_record(abn, "ACT", "20200101", "Australian Private Company",
                            name, "NSW", str(2000 + num % 999))
        )
    # one record with missing optional fields (NULL tolerance)
    records.append("<ABR><ABN status=\"CAN\">99999999999</ABN></ABR>")
    (d / "part1.xml").write_text(
        "<Transfer>" + "\n".join(records) + "</Transfer>"
    )
    return str(d / "part1.xml")


@pytest.fixture(scope="module")
def cc_index_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("ccindex")
    lines = [
        json.dumps(
            {
                "url": f"https://www.{slug}.com.au/",
                "filename": f"crawl-data/seg/{i}.warc.gz",
                "offset": str(1000 * i),
                "length": "500",
                "status": "200",
                "mime": "text/html",
            }
        )
        for i, slug in enumerate(SLUGS)
    ]
    # a record missing fetch coordinates → filtered by the P8 guard
    lines.append(json.dumps({"url": "https://www.skip-me.com.au/"}))
    (d / "index.json").write_text("\n".join(lines))
    return str(d / "index.json")


def test_read_abr_xml(spark, abr_xml_path):
    df = read_abr_xml(spark, abr_xml_path)
    rows = {r.abn: r for r in df.collect()}
    assert len(rows) == 4
    num = sum(ord(c) for c in SLUGS[0])
    abn0 = _checksum_valid_abn(num)
    r = rows[abn0]
    assert r.entity_name == "Acme Books"
    assert r.entity_type == "Australian Private Company"
    assert r.entity_status == "ACT"
    assert r.state == "NSW"
    assert r.address == f"NSW {2000 + num % 999}"
    assert str(r.start_date) == "2020-01-01"
    # NULL tolerance for sparse record
    sparse = rows["99999999999"]
    assert sparse.entity_name is None and sparse.address is None and sparse.start_date is None


def test_cc_index_and_fetch_parse(spark, cc_index_path):
    idx = read_cc_index(spark, cc_index_path)
    assert idx.count() == len(SLUGS)  # P8 guard dropped the sparse record
    parsed = parse_pages(fetch_warc_html(idx, client=StubFetchClient()))
    rows = {r.domain: r for r in parsed.collect()}
    assert set(rows) == {f"{slug}.com.au" for slug in SLUGS}
    r = rows["acme-books.com.au"]
    num = sum(ord(c) for c in "acme-books")
    assert r.company_name == "Acme Books"
    assert r.abn == _checksum_valid_abn(num)
    assert r.title == "Acme-Books — Home"
    assert "info@acme-books.com.au" in r.emails
    assert any(p.startswith("(02)") for p in r.phones)
    assert r.postcode == str(2000 + num % 999)
    assert json.loads(r.structured_data)[0]["@type"] == "Organization"
    assert len(r.snippet) <= 500 and "<" not in r.snippet


def test_cleaning_dedup(spark):
    abr = spark.createDataFrame(
        [
            ("51 824 753 556", "Acme, Pty!", "new south wales", "20-00", "x"),
            ("51-824-753-556", "Acme  Pty", "NSW", "2000", "y"),  # same after clean
            ("123", "Other Co", "vicx", "3000", "z"),
        ],
        "abn string, entity_name string, state string, postcode string, extra string",
    )
    out = clean_abr_data(abr)
    rows = out.collect()
    assert len(rows) == 2  # first two collapse to one
    clean = {r.entity_name: r for r in rows}
    assert clean["Acme Pty"].abn == "51824753556"
    assert clean["Acme Pty"].state == "NSW"
    assert clean["Acme Pty"].postcode == "2000"
    assert clean["Other Co"].abn is None  # len != 11
    assert clean["Other Co"].state is None  # 'vicx' misses the 85 bar


def test_jsonify_for_flat_sink(spark):
    df = spark.createDataFrame(
        [(["a@b.com"], "x")], "emails array<string>, name string"
    )
    out = jsonify_for_flat_sink(df).collect()[0]
    assert out.emails == '["a@b.com"]'
    assert out.name == "x"


def test_run_pipeline_end_to_end(spark, cc_index_path, abr_xml_path):
    out = run_pipeline(
        spark,
        cc_index_path,
        abr_xml_path,
        fetch_client=StubFetchClient(),
        enable_llm=False,
    ).cache()
    rows = out.collect()
    # every stub page carries its entity's exact ABN → all rule-based
    assert len(rows) == len(SLUGS)
    for r in rows:
        assert r.match_method == "rule_based_abn"
        assert r.match_score == 100.0
        assert r.cc_abn == r.abr_abn
        assert r.creation_dt is not None
    assert {r.entity_name for r in rows} == {
        s.replace("-", " ").title() for s in SLUGS
    }


def test_run_pipeline_ccfetch_arm_matches_default(spark, cc_index_path, abr_xml_path):
    """PIPELINE-level arm equality (round 13; the round-12 pin was
    frame-level only): run_pipeline(source='ccfetch') produces the
    identical matched dimension to the default mapInPandas arm — the
    DataSource twin is a drop-in extraction replacement end-to-end."""
    import pyspark.sql.functions as F

    def norm(df):
        drop = [c for c in ("creation_dt",) if c in df.columns]  # now()
        return {
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in df.drop(*drop).collect()
        }

    want = norm(
        run_pipeline(
            spark, cc_index_path, abr_xml_path, fetch_client=StubFetchClient()
        )
    )
    got = norm(
        run_pipeline(spark, cc_index_path, abr_xml_path, source="ccfetch")
    )
    assert got == want and len(got) == len(SLUGS)
    # a client OBJECT cannot cross the DataSource boundary — loud refusal
    import pytest as _pytest

    from firmable_company_data_pipeline_spark.pipeline.run import (
        run_commoncrawl_extraction,
    )

    with _pytest.raises(ValueError, match="ccfetch"):
        run_commoncrawl_extraction(
            spark, cc_index_path, client=StubFetchClient(), source="ccfetch"
        )


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key join without an Exchange —
    the co-located-join layout claimed in README's scale design."""
    import contextlib
    import io as _io

    from firmable_company_data_pipeline_spark.session import load_tables
    from firmable_company_data_pipeline_spark.sources.io import write_bucketed

    t = load_tables(spark, sf_dir, "orders", "customer")
    write_bucketed(
        t["orders"].select("o_orderkey", "o_custkey", "o_totalprice"),
        "bkt_orders", ["o_custkey"], n_buckets=8, sort_cols=["o_custkey"],
    )
    write_bucketed(
        t["customer"].select("c_custkey", "c_mktsegment"),
        "bkt_customer", ["c_custkey"], n_buckets=8, sort_cols=["c_custkey"],
    )
    try:
        a = spark.table("bkt_orders")
        b = spark.table("bkt_customer")
        joined = a.join(
            b.hint("merge"), a["o_custkey"] == b["c_custkey"]
        )  # force SMJ so neither side broadcasts
        buf = _io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaces the shuffle
        assert joined.count() == t["orders"].count()
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
        spark.sql("DROP TABLE IF EXISTS bkt_customer")


def test_register_views_sql_passthrough(spark, sf_dir):
    """Reference users' raw-SQL workflows run unchanged once the views
    are registered."""
    from firmable_company_data_pipeline_spark.session import register_views

    register_views(spark, sf_dir, "orders", "customer")
    out = spark.sql(
        """SELECT c_mktsegment, count(*) AS n
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment"""
    )
    assert out.count() > 0


def test_read_json_lenient_captures_corrupt_records(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from firmable_company_data_pipeline_spark.sources.io import read_json_lenient

    p = tmp_path / "index.jsonl"
    p.write_text(
        '{"url": "a.com.au", "offset": 10}\n'
        "this is not json at all\n"
        '{"url": "b.com.au", "offset": 20}\n'
    )
    schema = StructType(
        [StructField("url", StringType()), StructField("offset", LongType())]
    )
    df = read_json_lenient(spark, str(p), schema).cache()
    assert df.count() == 3
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert bad.count() == 1
    assert "not json" in bad.first()["_corrupt_record"]
    good = df.filter("_corrupt_record IS NULL")
    assert {r.url for r in good.collect()} == {"a.com.au", "b.com.au"}
    df.unpersist()


def test_run_pipeline_observed_metrics(spark, cc_index_path, abr_xml_path):
    """Observation metrics ride the real pass — counts match the data
    without any extra count() jobs (A7 modernization)."""
    from firmable_company_data_pipeline_spark.pipeline.run import run_pipeline_observed

    df, obs = run_pipeline_observed(
        spark, cc_index_path, abr_xml_path, fetch_client=StubFetchClient()
    )
    n_out = df.count()  # terminal action materializes the observations
    cc = obs["cleaned_cc"].get
    abr = obs["cleaned_abr"].get
    assert cc["n_rows"] == len(SLUGS) == n_out
    assert cc["n_with_abn"] == len(SLUGS)  # every stub page carries an ABN
    assert abr["n_rows"] >= len(SLUGS)


def test_strip_html_pathological_cases():
    """Tokenizer-fidelity cases the old regex pull got wrong: attributes
    containing '>', comments, entities, script bodies containing markup,
    and unclosed tags (reference parity: bs4 parse_html outputs)."""
    from firmable_company_data_pipeline_spark.sources.commoncrawl import _strip_html

    html = (
        "<html><head><title>T &amp; Co</title>"
        '<script type="application/ld+json">{"@type": "Organization", "name": "T"}'
        "</script></head>"
        '<body><div data-x="a > b">visible</div>'
        "<!-- <p>comment markup</p> -->"
        "<script>var s = '<div>not text</div>';</script>"
        "<style>p > span { color: red }</style>"
        "<p>café &copy; 2024<p>unclosed paragraphs"
        "</body></html>"
    )
    title, text, sd = _strip_html(html)
    assert title == "T & Co"  # entity decoded
    assert "visible" in text and "café" in text and "unclosed paragraphs" in text
    # none of these leak into visible text
    assert "not text" not in text      # script body with markup inside
    assert "comment markup" not in text  # comment content
    assert "color" not in text         # style body with '>' in selector
    assert "a > b" not in text         # attribute value containing '>'
    import json

    assert json.loads(sd) == [{"@type": "Organization", "name": "T"}]


def test_strip_html_jsonld_list_normalization():
    from firmable_company_data_pipeline_spark.sources.commoncrawl import _strip_html

    html = (
        '<script type="application/ld+json">[{"a": 1}, {"b": 2}]</script>'
        '<script type="application/ld+json">{"c": 3}</script>'
        '<script type="application/ld+json">not json</script>'
    )
    import json

    _, _, sd = _strip_html(html)
    assert json.loads(sd) == [{"a": 1}, {"b": 2}, {"c": 3}]


def test_strip_html_nested_script_and_malformed_jsonld():
    """Reference-derived edge fixtures (extract/commoncrawl_scraper.py
    183-197): a script body containing a nested '</div>'-style closer,
    a JSON-LD block that is valid JSON but truncated mid-list (malformed
    → skipped, not fatal), and a JSON-LD block whose payload nests
    markup-looking strings.  Both parse arms must survive; the stdlib
    arm's outputs are pinned here (always runnable)."""
    import json

    from firmable_company_data_pipeline_spark.sources.commoncrawl import _strip_html

    html = (
        "<html><head><title>Edge</title></head><body>"
        "<script>document.write('</span><div>fake</div>');</script>"
        '<script type="application/ld+json">[{"name": "A"}, {"name": </script>'
        '<script type="application/ld+json">{"desc": "<b>bold</b> text"}</script>'
        "<p>real body</p></body></html>"
    )
    title, text, sd = _strip_html(html)
    assert title == "Edge"
    assert "real body" in text
    assert "fake" not in text  # nested closer inside script stays dead
    # the malformed block is skipped; the valid one survives intact
    assert json.loads(sd) == [{"desc": "<b>bold</b> text"}]


def test_strip_html_bs4_arm_matches_reference_shape():
    """Green only where bs4 exists (absent in this sandbox — same gate
    pattern as the PIL/PyAV arms): the bs4 arm must mirror the
    reference's parse_html observables — title, JSON-LD list
    normalization with malformed blocks skipped, and get_text over the
    whole soup."""
    import json

    import pytest

    pytest.importorskip("bs4")
    from firmable_company_data_pipeline_spark.sources.commoncrawl import (
        _html_parser,
        _strip_html_bs4,
    )

    assert _html_parser() is _strip_html_bs4  # gate selects the real arm
    html = (
        "<html><head><title> T &amp; Co </title>"
        '<script type="application/ld+json">[{"a": 1}, {"b": 2}]</script>'
        '<script type="application/ld+json">not json</script></head>'
        "<body><p>visible text</p></body></html>"
    )
    title, text, sd = _strip_html_bs4(html)
    assert title == "T & Co"  # strip=True + entity decode
    assert "visible text" in text
    assert json.loads(sd) == [{"a": 1}, {"b": 2}]


# ---------------------------------------------------------------------------
# ccfetch custom DataSource (round 12): the Spark 4 Python DataSource
# arm must produce EXACTLY the pandas pipeline's staging frame.
def test_ccfetch_datasource_matches_pipeline(spark, cc_index_path):
    from firmable_company_data_pipeline_spark.sources.commoncrawl import (
        derive_staging_fields,
        fetch_warc_html,
        parse_pages,
    )
    from firmable_company_data_pipeline_spark.sources.datasource import (
        register_cc_datasource,
    )

    register_cc_datasource(spark)
    ds = (
        spark.read.format("ccfetch")
        .option("path", cc_index_path)
        .option("partitions", "3")
        .load()
    )
    got = derive_staging_fields(ds)
    want = parse_pages(fetch_warc_html(read_cc_index(spark, cc_index_path)))
    def norm(rows):
        return {
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in rows
        }

    g = norm(got.collect())
    w = norm(want.collect())
    assert g == w and len(g) == len(SLUGS)  # P8 guard drops the bad record


def test_ccfetch_partition_planning_owns_each_line_once(spark, cc_index_path):
    """Byte-range splits with line-ownership resolution: however many
    partitions are requested (including more than there are lines), each
    index record is read exactly once."""
    from firmable_company_data_pipeline_spark.sources.datasource import (
        register_cc_datasource,
    )

    register_cc_datasource(spark)
    for n in (1, 2, 7, 64):
        ds = (
            spark.read.format("ccfetch")
            .option("path", cc_index_path)
            .option("partitions", str(n))
            .load()
        )
        urls = [r.url for r in ds.select("url").collect()]
        assert len(urls) == len(set(urls)) == len(SLUGS), f"partitions={n}"


def test_ccfetch_boundary_aligned_lines_read_exactly_once(spark, tmp_path):
    """Fixed-width records whose length divides the file size land
    every partition boundary ON a line start — the case where the old
    ownership rule dropped the boundary line from both readers
    (review r12)."""
    from firmable_company_data_pipeline_spark.sources.datasource import (
        register_cc_datasource,
    )

    recs = []
    for i in range(4):
        r = json.dumps(
            {
                "url": f"https://www.x{i}.com.au/",
                "filename": f"seg/{i}.warc.gz",
                "offset": str(i),
                "length": "500",
            }
        )
        recs.append(r)
    width = max(len(r) for r in recs) + 1
    # pad inside the JSON (trailing spaces after the closing brace are
    # stripped by the reader's line.strip) -> pad the filename instead
    recs = [
        json.dumps(
            {
                "url": f"https://www.x{i}.com.au/",
                "filename": f"seg/{i}.warc.gz".ljust(30, "_"),
                "offset": str(i).rjust(6, "0"),
                "length": "500",
            }
        )
        for i in range(4)
    ]
    assert len({len(r) for r in recs}) == 1  # truly fixed width
    path = str(tmp_path / "fixed.json")
    with open(path, "w") as fh:
        fh.write("\n".join(recs) + "\n")

    register_cc_datasource(spark)
    for n in (1, 2, 4, 8):
        got = (
            spark.read.format("ccfetch")
            .option("path", path)
            .option("partitions", str(n))
            .load()
            .select("url")
            .collect()
        )
        urls = [r.url for r in got]
        assert sorted(urls) == sorted(
            f"https://www.x{i}.com.au/" for i in range(4)
        ), f"partitions={n}: {urls}"


def test_ccfetch_survives_foreign_cwd_workers(tmp_path):
    """The reader executes on Python workers: from a driver running in
    a FOREIGN cwd (no package on the workers' path), the by-value
    registration must ship the fetch client + parser inside the pickle
    (review r12 — lazy in-read imports ModuleNotFoundError'd here)."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    idx = tmp_path / "idx.json"
    with open(idx, "w") as fh:
        for i in range(5):
            fh.write(
                json.dumps(
                    {
                        "url": f"https://www.a{i}.com.au/",
                        "filename": f"s/{i}.warc.gz",
                        "offset": str(i),
                        "length": "500",
                    }
                )
                + "\n"
            )
    script = (
        "import sys; sys.path.insert(0, %r)\n"
        "from pyspark.sql import SparkSession\n"
        "s = SparkSession.builder.master('local[2]').getOrCreate()\n"
        "from firmable_company_data_pipeline_spark.sources.datasource import register_cc_datasource\n"
        "register_cc_datasource(s)\n"
        "out = s.read.format('ccfetch').option('path', %r).option('partitions', '3').load()\n"
        "print('CCFETCH_ROWS', out.count())\n" % (repo, str(idx))
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    r = subprocess.run(
        [_sys.executable, "-c", script],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert "CCFETCH_ROWS 5" in r.stdout, r.stderr[-2000:]
