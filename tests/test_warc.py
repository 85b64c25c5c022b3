"""WARC transport source: roundtrip, type filtering, gzip layouts, and the
pages flagship running end-to-end from a .warc.gz path."""
import gzip

import pyarrow as pa
import pytest
import ray.data

from registry_address_matcher_ray.sources import synth, warc


@pytest.fixture(scope="module")
def pages_rows():
    t = synth.synth_registries(60, seed=7)
    pages = synth.synth_pages(t["registry_spr"], seed=7)
    return pages.select(["url", "warc_ts", "html"]).to_pylist(), t


def _assert_roundtrip(rows, got_tbl):
    got = sorted(got_tbl.to_pylist(), key=lambda r: r["url"])
    exp = sorted(rows, key=lambda r: r["url"])
    assert got == exp


@pytest.mark.parametrize("gzip_mode", [None, "file", "record"])
def test_roundtrip_gzip_layouts(pages_rows, tmp_path, gzip_mode):
    rows, _ = pages_rows
    payload = warc.encode_warc(rows, gzip_mode=gzip_mode)
    ext = ".warc.gz" if gzip_mode else ".warc"
    p = tmp_path / f"chunk{ext}"
    p.write_bytes(payload)
    ds = warc.read_warc(str(p))
    _assert_roundtrip(rows, pa.Table.from_pylist(
        ds.take_all(), schema=warc.WARC_PAGES_SCHEMA))


def test_non_response_records_filtered(pages_rows, tmp_path):
    rows, _ = pages_rows
    info = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        "WARC-Record-ID: <urn:uuid:info>\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        "Content-Type: application/warc-fields\r\n"
        "Content-Length: 14\r\n\r\nsoftware: test\r\n\r\n"
    ).encode()
    request = (
        "WARC/1.0\r\nWARC-Type: request\r\n"
        "WARC-Target-URI: https://pages.example.am/x\r\n"
        "WARC-Date: 2024-01-01T00:00:00Z\r\n"
        "Content-Length: 18\r\n\r\nGET / HTTP/1.1\r\n\r\n\r\n\r\n"
    ).encode()
    body = warc.encode_warc(rows, gzip_mode=None)
    payload = info + request + body
    parsed = warc.parse_warc(payload)
    _assert_roundtrip(rows, pa.Table.from_pylist(
        parsed, schema=warc.WARC_PAGES_SCHEMA))
    # opt-in to other types
    assert len(warc.parse_warc(payload, record_types=("request",))) == 1


def test_multi_file_read_task_per_archive(pages_rows, tmp_path):
    rows, _ = pages_rows
    half = len(rows) // 2
    (tmp_path / "a.warc.gz").write_bytes(warc.encode_warc(rows[:half]))
    (tmp_path / "b.warc.gz").write_bytes(
        warc.encode_warc(rows[half:], gzip_mode="record"))
    ds = warc.read_warc([str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")])
    _assert_roundtrip(rows, pa.Table.from_pylist(
        ds.take_all(), schema=warc.WARC_PAGES_SCHEMA))


def test_no_http_wrapper_and_fractional_date(tmp_path):
    from datetime import datetime

    rows = [{"url": "https://e.am/x", "warc_ts": datetime(2024, 3, 1, 5, 6, 7, 250000),
             "html": b"<html>x</html>"}]
    payload = warc.encode_warc(rows, gzip_mode=None, with_http=False)
    got = warc.parse_warc(payload)
    assert got == rows


def test_truncated_and_garbage_raise(pages_rows):
    rows, _ = pages_rows
    payload = warc.encode_warc(rows[:2], gzip_mode=None)
    with pytest.raises(ValueError, match="truncated|Content-Length"):
        warc.parse_warc(payload[: len(payload) - 40])
    with pytest.raises(ValueError, match="not a WARC record"):
        warc.parse_warc(b"HTTP/1.1 200 OK\r\n\r\nnope")


def test_pages_flagship_from_warc_path(pages_rows, tmp_path):
    """The flagship runs unchanged on read_warc output: .warc.gz in,
    match clusters out, identical to the parquet-pages path."""
    import pyarrow.parquet as pq

    from registry_address_matcher_ray.pipelines.linkage import (
        pages_to_match_clusters,
    )

    rows, t = pages_rows
    (tmp_path / "crawl.warc.gz").write_bytes(warc.encode_warc(rows))
    cad_p = tmp_path / "cad.parquet"
    pq.write_table(t["registry_cad"], cad_p)

    pages_warc = warc.read_warc(str(tmp_path / "crawl.warc.gz"))
    res = pages_to_match_clusters(
        pages_warc, ray.data.read_parquet(str(cad_p)))
    m_warc = res["matches"].to_pandas().sort_values(
        ["ADDRESS_ID_SPR", "ADDRESS_ID_CAD"]).reset_index(drop=True)

    pages_pq = synth.synth_pages(t["registry_spr"], seed=7)
    res2 = pages_to_match_clusters(
        ray.data.from_arrow(pages_pq.select(["url", "warc_ts", "html"])),
        ray.data.read_parquet(str(cad_p)))
    m_pq = res2["matches"].to_pandas().sort_values(
        ["ADDRESS_ID_SPR", "ADDRESS_ID_CAD"]).reset_index(drop=True)

    assert len(m_warc) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(m_warc, m_pq, check_dtype=False)


def test_job_cli_warc_probe(pages_rows, tmp_path, capsys):
    """`python -m registry_address_matcher_ray.job --warc ...` runs the
    flagship from a crawl archive (in-process; Ray session reused)."""
    import json

    import pyarrow.parquet as pq

    from registry_address_matcher_ray import job

    rows, t = pages_rows
    (tmp_path / "crawl.warc.gz").write_bytes(warc.encode_warc(rows))
    pq.write_table(t["registry_cad"], tmp_path / "cad.parquet")

    rc = job.main([
        "--warc", str(tmp_path / "crawl.warc.gz"),
        "--cad", str(tmp_path / "cad.parquet"),
        "--out", str(tmp_path / "out"),
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["matches"] > 0
    assert (tmp_path / "out" / "matches").is_dir()


def test_http_chunked_and_content_encoding_decoded():
    """Real crawler responses store the HTTP exchange verbatim; chunked
    transfer and gzip/deflate content encodings must be decoded."""
    import gzip as _gz
    import zlib

    html = b"<html><body>" + b"x" * 500 + b"</body></html>"

    def _rec(http_block):
        return (
            "WARC/1.0\r\nWARC-Type: response\r\n"
            "WARC-Target-URI: https://e.am/c\r\n"
            "WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(http_block)}\r\n\r\n"
        ).encode() + http_block + b"\r\n\r\n"

    # chunked
    chunks = b"".join(
        f"{len(c):x}\r\n".encode() + c + b"\r\n"
        for c in (html[:100], html[100:])) + b"0\r\n\r\n"
    block = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + chunks)
    assert warc.parse_warc(_rec(block))[0]["html"] == html

    # gzip content-encoding
    gz = _gz.compress(html)
    block = (b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n"
             + f"Content-Length: {len(gz)}\r\n\r\n".encode() + gz)
    assert warc.parse_warc(_rec(block))[0]["html"] == html

    # deflate (zlib-wrapped and raw)
    co = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    raw_defl = co.compress(html) + co.flush()
    for defl in (zlib.compress(html), raw_defl):
        block = (b"HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
                 + defl)
        assert warc.parse_warc(_rec(block))[0]["html"] == html

    # chunked THEN gzip (encoding applied before transfer chunking)
    chunks = b"".join(
        f"{len(c):x}\r\n".encode() + c + b"\r\n"
        for c in (gz[:50], gz[50:])) + b"0\r\n\r\n"
    block = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
             b"Content-Encoding: gzip\r\n\r\n" + chunks)
    assert warc.parse_warc(_rec(block))[0]["html"] == html

    # malformed chunk header falls back instead of raising
    block = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZZ\r\nx"
    assert warc.parse_warc(_rec(block))[0]["html"] == b""


from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.text(alphabet=st.characters(
                blacklist_categories=("Cs", "Cc")), min_size=1, max_size=60),
            st.binary(min_size=0, max_size=4000),
            st.integers(min_value=0, max_value=2**31 - 1),
        ),
        min_size=1, max_size=12),
    gzip_mode=st.sampled_from([None, "file", "record"]),
    with_http=st.booleans(),
)
def test_warc_roundtrip_property(data, gzip_mode, with_http):
    """Arbitrary urls (any non-control unicode, spaces percent-encoded —
    RFC 3986 URIs cannot carry raw spaces and header parsing strips
    trailing ones), binary bodies of any content (including bytes that
    look like CRLFs and markers), and second-granular timestamps roundtrip
    byte-exact through every gzip layout, with and without the HTTP
    wrapper."""
    from datetime import datetime, timedelta

    t0 = datetime(2020, 1, 1)
    rows = [{"url": "https://h.example/" + u.replace("\r", "").replace(
                "\n", "").replace(" ", "%20"),
             "warc_ts": t0 + timedelta(seconds=sec),
             "html": body}
            for (u, body, sec) in data]
    payload = warc.encode_warc(rows, gzip_mode=gzip_mode, with_http=with_http)
    got = warc.parse_warc(payload)
    assert got == rows
