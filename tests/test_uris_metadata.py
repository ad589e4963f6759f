"""Golden tests for URI normalization (``aws/utils.py:17-93``) and metadata
enrichment expressions (``aws/submit.py:139-162``, ``aws/submissions.py:10-52``)."""

from pyspark.sql import functions as F

from connect_server_spark.functions import (
    creators_join,
    default_resource_type,
    lookup_http_host,
    make_globus_app_link,
    normalize_globus_uri,
    status_code_letter,
    status_message,
    tags_to_subjects,
)


def _one(spark, expr):
    return spark.range(1).select(expr.alias("out")).collect()[0].out


def test_normalize_globus_uri_link_forms(spark):
    link = (
        "https://app.globus.org/file-manager?origin_id="
        "82f1b5c6-6e9b-11e5-ba47-22000b92c6ec&origin_path=%2Fmdf-test2%2Fpublished%2F"
    )
    assert _one(spark, normalize_globus_uri(F.lit(link))) == (
        "globus://82f1b5c6-6e9b-11e5-ba47-22000b92c6ec/mdf-test2/published/"
    )
    dest = (
        "https://www.globus.org/app/transfer?destination_id=abc-123"
        "&destination_path=%2Fdata%2F"
    )
    assert _one(spark, normalize_globus_uri(F.lit(dest))) == "globus://abc-123/data/"


def test_normalize_globus_uri_invalid_link(spark):
    # link form without a path → reference raises; column form → null
    bad = "https://app.globus.org/transfer?origin_id=abc-123"
    assert _one(spark, normalize_globus_uri(F.lit(bad))) is None


def test_normalize_globus_uri_gdrive(spark):
    # three-slash (correct) and two-slash (netloc fix) forms agree
    for uri in ("google:///path/file.dat", "google://path/file.dat"):
        assert _one(
            spark, normalize_globus_uri(F.lit(uri), gdrive_ep="EP", gdrive_root="/root")
        ) == "globus://EP/root/path/file.dat"
    assert _one(
        spark, normalize_globus_uri(F.lit("gdrive:///x.csv"), gdrive_ep="EP", gdrive_root="/g")
    ) == "globus://EP/g/x.csv"


def test_normalize_globus_uri_passthrough(spark):
    for uri in ("globus://ep123/already/fine", "https://example.com/data.csv", "plain"):
        assert _one(spark, normalize_globus_uri(F.lit(uri))) == uri


def test_make_globus_app_link(spark):
    out = _one(spark, make_globus_app_link(F.lit("globus://ep-1/some dir/file.txt")))
    assert out == (
        "https://app.globus.org/file-manager?origin_id=ep-1"
        "&origin_path=%2Fsome+dir%2Ffile.txt"
    )


def test_lookup_http_host_goldens(spark):
    # tests/test_utils.py:181-198
    cases = {
        "e38ee745-6d04-11e5-ba46-22000b92c6ec":
            "https://e38ee745-6d04-11e5-ba46-22000b92c6ec.e.globus.org",
        "82f1b5c6-6e9b-11e5-ba47-22000b92c6ec":
            "https://data.materialsdatafacility.org",
        "globus://e38ee745-6d04-11e5-ba46-22000b92c6ec/abc":
            "https://e38ee745-6d04-11e5-ba46-22000b92c6ec.e.globus.org",
        ("https://app.globus.org/file-manager?origin_id="
         "82f1b5c6-6e9b-11e5-ba47-22000b92c6ec&origin_path=%2Fmdf-test2%2Fpublished%2F"):
            "https://data.materialsdatafacility.org",
        "NotAnEndpoint": None,
    }
    for loc, expect in cases.items():
        assert _one(spark, lookup_http_host(F.lit(loc))) == expect, loc
    assert _one(spark, lookup_http_host(F.lit(None).cast("string"))) is None


def test_status_code_letter(spark):
    for status, letter in [("SUCCEEDED", "S"), ("ACTIVE", "P"), ("FAILED", "F"),
                           ("UNKNOWN", "U"), ("whatever", "U")]:
        assert _one(spark, status_code_letter(F.lit(status))) == letter


def test_status_message(spark):
    out = _one(
        spark,
        status_message(
            F.lit(True), F.lit("src_v1.1"), F.lit("My Data"), F.lit("Ann"),
            F.lit("2020-01-01T00:00:00Z"),
        ),
    )
    assert out == (
        "Status of TEST submission src_v1.1 (My Data)\n"
        "Submitted by Ann at 2020-01-01T00:00:00Z\n\n"
    )


def test_default_resource_type(spark):
    df = spark.createDataFrame(
        [(("Thing", "Software"),), (None,)],
        "rt struct<resourceTypeGeneral:string,resourceType:string>",
    )
    rows = df.select(default_resource_type(F.col("rt")).alias("out")).collect()
    assert rows[0].out.asDict() == {"resourceTypeGeneral": "Thing", "resourceType": "Software"}
    assert rows[1].out.asDict() == {"resourceTypeGeneral": "Dataset", "resourceType": "Dataset"}


def test_tags_to_subjects(spark):
    df = spark.createDataFrame(
        [(["a", "b"], [("zero",)]), (None, None)],
        "tags array<string>, subjects array<struct<subject:string>>",
    )
    rows = df.select(
        tags_to_subjects(F.col("tags"), F.col("subjects")).alias("out")
    ).collect()
    assert [s.subject for s in rows[0].out] == ["zero", "a", "b"]
    assert rows[1].out == []


def test_creators_join(spark):
    df = spark.createDataFrame(
        [([("Curie, M.",), ("Noether, E.",)],)],
        "creators array<struct<creatorName:string>>",
    )
    assert df.select(creators_join(F.col("creators")).alias("o")).collect()[0].o == (
        "Curie, M., Noether, E."
    )
