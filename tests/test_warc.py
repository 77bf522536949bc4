"""WARC source: streaming parser framing, gzip members, error routing,
and the Spark end-to-end read (doppel_spark/sources/warc.py)."""

from __future__ import annotations

import gzip
import io
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from doppel_spark.sources.warc import (  # noqa: E402
    WarcFormatError,
    http_body,
    http_response_bytes,
    iter_warc_records,
    list_warc_files,
    read_warc,
    warc_file_bytes,
    warc_record_bytes,
)

RECS = [
    ("https://a.example.org/1", "2020-01-01T00:00:01Z", b"<body>alpha</body>"),
    # payload containing WARC magic + CRLFs: framing is length-delimited,
    # so this must never be mistaken for a record boundary
    ("https://a.example.org/2", "2020-01-01T00:00:02Z",
     b"<body>trap\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n</body>"),
    # multibyte UTF-8
    ("https://b.example.org/3", "2020-01-01T00:00:03Z",
     "<body>éßå 中文</body>".encode("utf-8")),
    ("https://b.example.org/4", "2020-01-01T00:00:04Z", b""),
]


def _parse_all(data: bytes, chunk_size: int = 1 << 20):
    return list(iter_warc_records(io.BytesIO(data), chunk_size=chunk_size))


def test_roundtrip_multi_record():
    recs = _parse_all(warc_file_bytes(RECS))
    assert [r["rec_type"] for r in recs] == ["warcinfo"] + ["response"] * 4
    for (url, date, html), rec in zip(RECS, recs[1:]):
        assert rec["url"] == url
        assert rec["warc_date"] == date
        assert http_body(rec["payload"]) == html


@pytest.mark.parametrize("chunk", [1, 3, 7, 64])
def test_roundtrip_survives_chunk_boundaries(chunk):
    # headers, payloads, and record terminators straddle every possible
    # chunk edge at chunk_size=1 — framing must not depend on alignment
    recs = _parse_all(warc_file_bytes(RECS), chunk_size=chunk)
    assert len(recs) == 5
    assert http_body(recs[2]["payload"]) == RECS[1][2]


def test_gzip_multi_member_stream(tmp_path):
    # per-record gzip members, Common-Crawl style
    path = tmp_path / "x.warc.gz"
    body = b"".join(
        gzip.compress(warc_record_bytes("response", u, d,
                                        http_response_bytes(h)))
        for u, d, h in RECS)
    path.write_bytes(body)
    with gzip.open(path, "rb") as fh:
        recs = list(iter_warc_records(fh))
    assert [r["url"] for r in recs] == [u for u, _, _ in RECS]


def test_framing_is_length_delimited_not_magic_scan():
    # corrupt ONLY the length: the embedded fake record header inside
    # the payload must not rescue parsing — it must fail loudly
    good = warc_record_bytes("response", "u:1", "2020-01-01T00:00:01Z",
                             b"WARC/1.0\r\n\r\nnot a record")
    bad = good.replace(b"Content-Length: ", b"Content-Length: 9")
    with pytest.raises(WarcFormatError):
        _parse_all(bad + good)


def test_bad_version_line_raises():
    with pytest.raises(WarcFormatError, match="version"):
        _parse_all(b"HTTP/1.1 200 OK\r\n\r\n")


def test_truncated_payload_raises():
    data = warc_file_bytes(RECS[:1])
    with pytest.raises(WarcFormatError, match="truncated"):
        _parse_all(data[:-10])


def test_http_body_passthrough_without_envelope():
    assert http_body(b"no envelope here") == b"no envelope here"


def _write_archives(tmp_path):
    (tmp_path / "sub").mkdir()
    a = tmp_path / "a.warc"
    b = tmp_path / "sub" / "b.warc.gz"
    a.write_bytes(warc_file_bytes(RECS[:2]))
    b.write_bytes(gzip.compress(warc_file_bytes(RECS[2:])))
    return a, b


def test_list_warc_files_walks_globs_and_dedups(tmp_path):
    a, b = _write_archives(tmp_path)
    (tmp_path / "noise.txt").write_text("not an archive")
    # overlapping roots: the dir AND an explicit file AND a glob
    got = list_warc_files([str(tmp_path), str(a), str(tmp_path / "*.warc")])
    assert got == sorted([str(a), str(b)])


def test_read_warc_end_to_end(spark, tmp_path):
    a, b = _write_archives(tmp_path)
    src = read_warc(spark, str(tmp_path))
    assert src.error_count() == 0
    rows = {r["url"]: r for r in src.pages.collect()}
    assert set(rows) == {u for u, _, _ in RECS}
    for url, date, html in RECS:
        r = rows[url]
        assert bytes(r["html"]) == html
        assert r["warc_date"] == date
        assert r["warc_ts"].isoformat() == date[:-1]  # UTC session
    assert rows[RECS[0][0]]["src"] == str(a)
    assert rows[RECS[2][0]]["src"] == str(b)


def test_read_warc_error_side_channel_keeps_prior_records(spark, tmp_path):
    good = warc_record_bytes("response", RECS[0][0], RECS[0][1],
                             http_response_bytes(RECS[0][2]))
    (tmp_path / "part.warc").write_bytes(good + b"GARBAGE NOT A RECORD")
    (tmp_path / "ok.warc").write_bytes(warc_file_bytes(RECS[1:2]))
    src = read_warc(spark, str(tmp_path))
    errs = src.errors.collect()
    assert len(errs) == 1 and errs[0]["src"].endswith("part.warc")
    assert "WarcFormatError" in errs[0]["error_reason"]
    # the record parsed BEFORE the corruption point survives
    urls = {r["url"] for r in src.pages.collect()}
    assert urls == {RECS[0][0], RECS[1][0]}


def test_read_warc_missing_root_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_warc(spark, str(tmp_path / "nope"))


def test_read_warc_plan_has_no_row_python(spark, tmp_path):
    from doppel_spark.plans.inspect import assert_no_row_python

    _write_archives(tmp_path)
    src = read_warc(spark, str(tmp_path))
    assert_no_row_python(src.pages)  # MapInPandas only, never BatchEvalPython


# --- property-based round-trip (hypothesis) ---------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAVE_HYPOTHESIS = False

if _HAVE_HYPOTHESIS:
    _urls = st.text(
        alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E),
        min_size=1, max_size=40).map(lambda s: "https://h.test/" + s)
    # payloads deliberately include framing magic, CRLFs, NULs — the
    # length-delimited parser must never care
    _bodies = st.binary(min_size=0, max_size=2048) | st.sampled_from([
        b"WARC/1.0\r\nContent-Length: 0\r\n\r\n",
        b"\r\n\r\n\r\n", b"\x00" * 512])
    _recs = st.lists(
        st.tuples(_urls, st.just("2020-06-01T00:00:00Z"), _bodies),
        min_size=0, max_size=8)

    @settings(max_examples=60, deadline=None)
    @given(recs=_recs, chunk=st.sampled_from([7, 64, 1 << 20]))
    def test_roundtrip_property(recs, chunk):
        """serialize → parse at adversarial chunk sizes recovers every
        response record's (url, date, body) byte-exactly, in order."""
        import io

        blob = warc_file_bytes(recs)
        got = [r for r in iter_warc_records(io.BytesIO(blob), chunk)
               if r["rec_type"] == "response"]
        assert len(got) == len(recs)
        for (url, date, body), r in zip(recs, got):
            assert r["url"] == url
            assert r["warc_date"] == date
            assert http_body(r["payload"]) == body
