"""File source/sink parity with the reference's converter fixtures
(FIXTURES.md §5: employees CSV incl. BOM + quoted fields, greetings JSON
array, names lines)."""

from __future__ import annotations

from pyspark.sql import functions as F

from caterpillar_spark.sources import (
    read_csv_records,
    read_files,
    read_json_array,
    write_records,
)

EMPLOYEES_CSV = (
    'Name 1,"Age 1","Salary 1",Department 1\n'
    '"Alice",30,5000.5,"Eng"\n'
    '"Bob",41,7000,"Sales, EU"\n'
)


def test_csv_slugified_headers_and_numeric(spark, tmp_path):
    p = tmp_path / "employees.csv"
    p.write_text(EMPLOYEES_CSV)
    df = read_csv_records(
        spark, str(p), numeric_columns=["age_1", "salary_1"]
    )
    assert df.columns == ["name_1", "age_1", "salary_1", "department_1"]
    rows = {r["name_1"]: r for r in df.collect()}
    assert rows["Alice"]["age_1"] == 30  # long
    assert rows["Alice"]["salary_1"] == 5000.5  # fell back to double
    assert rows["Bob"]["department_1"] == "Sales, EU"  # quoted comma survives


def test_csv_bom_stripped(spark, tmp_path):
    p = tmp_path / "bom.csv"
    p.write_bytes("﻿name,age\nx,1\n".encode("utf-8"))
    df = read_csv_records(spark, str(p))
    assert df.columns == ["name", "age"]


def test_csv_explicit_columns(spark, tmp_path):
    p = tmp_path / "noheader.csv"
    p.write_text("a,1\nb,2\n")
    df = read_csv_records(spark, str(p), columns=["k", "v"])
    assert {(r["k"], r["v"]) for r in df.collect()} == {("a", "1"), ("b", "2")}


def test_json_array_multiline(spark, tmp_path):
    p = tmp_path / "greetings.json"
    p.write_text('[{"language":"fr","greeting":"bonjour"},{"language":"jp","greeting":"こんにちは"}]')
    df = read_json_array(spark, str(p))
    got = {r["language"]: r["greeting"] for r in df.collect()}
    assert got == {"fr": "bonjour", "jp": "こんにちは"}  # UTF-8 byte equality


def test_read_files_lineage_column(spark, tmp_path):
    (tmp_path / "names_a.txt").write_text("ana\nbob\n")
    (tmp_path / "names_b.txt").write_text("cyd\n")
    df = read_files(spark, str(tmp_path / "names_*.txt"))
    assert df.count() == 3
    files = {r["_source_file"].split("/")[-1] for r in df.collect()}
    assert files == {"names_a.txt", "names_b.txt"}


def test_write_partitioned_with_success_marker(spark, tmp_path):
    df = spark.range(20).select(
        F.col("id"), (F.col("id") % 2).alias("par")
    )
    out = str(tmp_path / "out")
    write_records(df, out, partition_cols=["par"], compression="snappy")
    import os

    assert os.path.exists(f"{out}/_SUCCESS")
    assert sorted(d for d in os.listdir(out) if d.startswith("par=")) == [
        "par=0",
        "par=1",
    ]
    back = spark.read.parquet(out)
    assert back.count() == 20
