"""I/O edges: CSV reader round-trip, ZIP export package contents (VERDICT r1 #9)."""

import io
import json
import zipfile

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

from registry_address_matcher_ray.sources import io as rio
from registry_address_matcher_ray.sources import synth


@pytest.fixture(scope="module")
def registries(tmp_path_factory):
    t = synth.synth_registries(120, seed=5)
    d = tmp_path_factory.mktemp("io")
    return t, d


def test_csv_reader_roundtrip(registries):
    t, d = registries
    csv_path = str(d / "spr.csv")
    with open(csv_path, "wb") as f:
        buf = pa.BufferOutputStream()
        pacsv.write_csv(t["registry_spr"], buf)
        f.write(buf.getvalue().to_pybytes())
    ds = rio.read_registry_csv(csv_path, "SPR")
    got = ds.to_pandas().sort_values("ADDRESS_ID").reset_index(drop=True)
    exp = t["registry_spr"].to_pandas().sort_values("ADDRESS_ID").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["STREET_NAME"].fillna("") == exp["STREET_NAME"].fillna("")).all()
    # CSV type inference may parse numeric-looking HOUSE values as numbers
    # (reference-faithful: pd.read_csv infers too); compare as numbers-or-strings
    def canon(s):
        def one(v):
            if v is None or (isinstance(v, float) and v != v):
                return ""
            try:
                return str(int(float(v)))
            except (TypeError, ValueError):
                return str(v)
        return s.map(one)

    assert (canon(got["HOUSE"]) == canon(exp["HOUSE"])).all()


def test_csv_reader_validates_schema(registries):
    t, d = registries
    bad_path = str(d / "bad.csv")
    buf = pa.BufferOutputStream()
    pacsv.write_csv(t["registry_spr"].drop_columns(["BUILDING"]), buf)
    with open(bad_path, "wb") as f:
        f.write(buf.getvalue().to_pybytes())
    with pytest.raises(rio.SchemaValidationError):
        rio.read_registry_csv(bad_path, "SPR")


def test_export_package_contents(registries):
    t, d = registries
    matched = t["registry_spr"].slice(0, 10)
    unmatched = t["registry_spr"].slice(10, 5)
    pq.write_table(matched, str(d / "matched.parquet"))
    pq.write_table(unmatched, str(d / "unmatched.parquet"))
    quality = {"total_records": 120, "avg_completeness": 1.0}
    stats = {"match_rate": 0.5}
    out = rio.create_export_package(
        str(d / "matched.parquet"), str(d / "unmatched.parquet"),
        quality, stats, str(d / "pkg.zip"))
    with zipfile.ZipFile(out) as zf:
        names = set(zf.namelist())
        assert names == {"matched_addresses.csv", "unmatched_addresses.csv",
                         "quality_metrics.json", "match_statistics.json"}
        m = pacsv.read_csv(io.BytesIO(zf.read("matched_addresses.csv")))
        assert m.num_rows == 10
        assert set(("ADDRESS_ID", "STREET_NAME", "HOUSE", "BUILDING")) <= set(m.column_names)
        u = pacsv.read_csv(io.BytesIO(zf.read("unmatched_addresses.csv")))
        assert u.num_rows == 5
        assert json.loads(zf.read("quality_metrics.json")) == quality
        assert json.loads(zf.read("match_statistics.json")) == stats


def test_jsonl_reader_roundtrip_and_schema(registries):
    t, d = registries
    spr = t["registry_spr"].to_pandas()
    jl = str(d / "spr.jsonl")
    spr.to_json(jl, orient="records", lines=True)
    ds = rio.read_registry_jsonl(jl, "SPR")
    got = ds.to_pandas().sort_values("ADDRESS_ID").reset_index(drop=True)
    exp = spr.sort_values("ADDRESS_ID").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["STREET_NAME"].fillna("") == exp["STREET_NAME"].fillna("")).all()

    bad = str(d / "bad.jsonl")
    spr.drop(columns=["BUILDING"]).to_json(bad, orient="records", lines=True)
    with pytest.raises(rio.SchemaValidationError):
        rio.read_registry_jsonl(bad, "SPR")


def test_jsonl_sink_roundtrip(registries):
    import ray.data

    t, d = registries
    ds = ray.data.from_arrow(t["registry_cad"]).repartition(3)
    out = rio.write_jsonl_dataset(ds, str(d / "jsonl_out"))
    back = rio.read_jsonl(out, columns=["ADDRESS_ID", "STREET_NAME"]).to_pandas()
    assert len(back) == t["registry_cad"].num_rows
    assert set(back.columns) == {"ADDRESS_ID", "STREET_NAME"}
    exp = t["registry_cad"].to_pandas()
    assert sorted(back["ADDRESS_ID"]) == sorted(exp["ADDRESS_ID"])


def test_csv_sink_roundtrip(registries):
    import ray.data

    from registry_address_matcher_ray.sources.io import write_csv_dataset

    t, d = registries
    ds = ray.data.from_arrow(t["registry_cad"]).repartition(3)
    out = write_csv_dataset(ds, str(d / "csv_out"))
    back = ray.data.read_csv(out).to_pandas()
    assert len(back) == t["registry_cad"].num_rows
    exp = t["registry_cad"].to_pandas()
    assert sorted(back["ADDRESS_ID"]) == sorted(exp["ADDRESS_ID"])


def test_partitioned_resumable_write(tmp_path, ray_session):
    import os
    import shutil

    import pandas as pd
    import ray.data

    df = pd.DataFrame({"k": [f"key{i}" for i in range(300)],
                       "v": range(300)})
    ds = ray.data.from_pandas(df).repartition(5)
    out = str(tmp_path / "part")
    r1 = rio.write_partitioned_resumable(ds, out, "k", num_buckets=8)
    assert len(r1["written"]) == 8 and not r1["skipped"]

    # crash simulation: one bucket gone entirely, one left uncommitted
    shutil.rmtree(os.path.join(out, "bucket=2"))
    os.remove(os.path.join(out, "bucket=6", "_SUCCESS"))
    r2 = rio.write_partitioned_resumable(ds, out, "k", num_buckets=8)
    assert sorted(r2["written"]) == ["bucket=2", "bucket=6"]
    assert len(r2["skipped"]) == 6

    back = rio.read_partitioned(out).to_pandas()
    assert len(back) == 300 and back["k"].nunique() == 300
    assert sorted(back["v"]) == list(range(300))
    # deterministic assignment: identical buckets across runs
    m = back.groupby("bucket")["k"].count()
    r3 = rio.write_partitioned_resumable(ds, out, "k", num_buckets=8)
    assert not r3["written"] and len(r3["skipped"]) == 8


def test_ipc_sink_and_reader_roundtrip(tmp_path, ray_session):
    import pandas as pd
    import ray.data

    df = pd.DataFrame({"doc_id": range(100),
                       "text": [f"doc {i}" for i in range(100)]})
    ds = ray.data.from_pandas(df).repartition(4)
    out = str(tmp_path / "ipc")
    rio.write_ipc_dataset(ds, out)
    back = (rio.read_ipc(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(back, df)
    pruned = rio.read_ipc(out, columns=["doc_id"]).to_pandas()
    assert list(pruned.columns) == ["doc_id"] and len(pruned) == 100
