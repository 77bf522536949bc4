"""Raw WARC ingestion: crawl archives → the canonical pages table.

The north-rule input is an Iceberg table of Common-Crawl-style pages
``(url, warc_ts, html:binary, text, lang)``; upstream of that table
sits the crawl's raw WARC layer — concatenated ``WARC/1.0`` records
(ISO 28500), one (possibly multi-member-gzipped) archive file per
crawl shard. This module is that ingestion stage: it walks archive
roots, stream-parses records with bounded memory, strips the HTTP
envelope from response payloads, and lands ``(url, warc_date,
warc_ts, html)`` rows plus an error side-channel — after which
:mod:`doppel_spark.functions.extract` and the dedup tiers take over.

Reference tie: this is the scanner stage for an archive corpus —
recursive root walking with per-entry error tolerance
(/root/reference/internal/scanner/scanner.go:32-107 logs-and-continues
and counts ``ErrorCount``; here a corrupt record routes its file to
the error side-channel, keeping every record already parsed) and
overlapping-roots handling (scanner.go:147-209; duplicate file paths
from overlapping roots are dropped before any file is opened).

Scale notes (100 TB of WARC):

* **The archive FILE is the parallelism unit** — exactly the layout
  Common Crawl ships (tens of thousands of ~1 GB ``.warc.gz`` shards
  per crawl), so file-granular tasks saturate any executor count
  without in-file splitting. The file list is a slim one-column
  DataFrame, repartitioned round-robin so task sizes balance.
* **Bounded memory, never whole-archive blobs**: the parser is an
  incremental generator over a byte stream (``iter_warc_records``) —
  it buffers only the current record, reading ``chunk_size`` bytes at
  a time, so a 5 GB uncompressed shard never materializes. This is
  why the source deliberately does NOT use Spark's ``binaryFile``
  format (which loads each file as one in-memory ``content`` cell).
* **Gzip members stream too**: Common Crawl gzips per record
  (multi-member); ``gzip.GzipFile`` decompresses member streams
  transparently, composing with the chunked reader.
* **Python is the right tier here**: this is per-FILE imperative
  decode work over multi-MB blobs (the declared slow-path use case) —
  Arrow-batched ``mapInPandas`` amortizes the Python boundary per
  record batch, and everything downstream is pure DataFrame.
* Local/HDFS-mounted paths are opened directly; an object-store
  deployment swaps ``_open_stream`` for its client (the parser only
  needs ``.read(n)``).
"""

from __future__ import annotations

import glob as _glob
import gzip
import os
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import IO, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

#: ISO-28500 WARC-Date layout (UTC, second resolution)
WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"

#: hard ceiling on one record's Content-Length — a corrupt length
#: field must not OOM an executor by forcing a multi-GB buffer
MAX_RECORD_BYTES = 1 << 30


class WarcFormatError(ValueError):
    """Malformed WARC structure (bad version line, header, or length)."""


# ---------------------------------------------------------------------------
# serialization (deterministic — used by tests and the contract query)


def http_response_bytes(html: bytes,
                        content_type: bytes = b"text/html") -> bytes:
    """Minimal HTTP/1.1 envelope around a response body — what a WARC
    ``response`` record's payload actually contains on a real crawl."""
    return (b"HTTP/1.1 200 OK\r\nContent-Type: " + content_type +
            b"\r\nContent-Length: " + str(len(html)).encode("ascii") +
            b"\r\n\r\n" + html)


def warc_record_bytes(rec_type: str, url: str, date_iso: str,
                      payload: bytes) -> bytes:
    """One ``WARC/1.0`` record, CRLF headers, length-delimited payload,
    blank-line record terminator (ISO 28500 layout)."""
    content_type = (b"application/http; msgtype=response"
                    if rec_type == "response" else b"application/octet-stream")
    return (b"WARC/1.0\r\n"
            b"WARC-Type: " + rec_type.encode("ascii") + b"\r\n"
            b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
            b"WARC-Date: " + date_iso.encode("ascii") + b"\r\n"
            b"Content-Type: " + content_type + b"\r\n"
            b"Content-Length: " + str(len(payload)).encode("ascii") +
            b"\r\n\r\n" + payload + b"\r\n\r\n")


def warc_file_bytes(records: Iterable[tuple[str, str, bytes]]) -> bytes:
    """A whole archive: one ``warcinfo`` header record (parsers must
    skip it) + one HTTP-enveloped ``response`` record per ``(url,
    date_iso, html)`` input."""
    out = [warc_record_bytes("warcinfo", "urn:warcinfo", "2020-01-01T00:00:00Z",
                             b"software: doppel_spark synthetic writer")]
    for url, date_iso, html in records:
        out.append(warc_record_bytes("response", url, date_iso,
                                     http_response_bytes(html)))
    return b"".join(out)


# ---------------------------------------------------------------------------
# streaming parser


class _ChunkedReader:
    """Bounded-memory scanner over a byte stream: holds only the bytes
    of the record currently being assembled."""

    def __init__(self, stream: IO[bytes], chunk_size: int) -> None:
        self._stream = stream
        self._chunk = chunk_size
        self._buf = b""
        self._eof = False

    def _fill(self) -> bool:
        if self._eof:
            return False
        data = self._stream.read(self._chunk)
        if not data:
            self._eof = True
            return False
        self._buf += data
        return True

    def read_until(self, marker: bytes, limit: int) -> bytes | None:
        """Bytes up to and including ``marker``; None at clean EOF with
        an empty buffer; WarcFormatError past ``limit`` or at dirty EOF."""
        search_from = 0
        while True:
            idx = self._buf.find(marker, search_from)
            if idx >= 0:
                end = idx + len(marker)
                out, self._buf = self._buf[:end], self._buf[end:]
                return out
            if len(self._buf) > limit:
                raise WarcFormatError(
                    f"no {marker!r} within {limit} bytes")
            # overlap guard: the marker may straddle the chunk boundary
            search_from = max(0, len(self._buf) - len(marker) + 1)
            if not self._fill():
                if not self._buf:
                    return None
                raise WarcFormatError("truncated record at EOF")

    def read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            if not self._fill():
                raise WarcFormatError(
                    f"truncated payload: wanted {n}, got {len(self._buf)}")
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def skip_newlines(self) -> None:
        while True:
            self._buf = self._buf.lstrip(b"\r\n")
            if self._buf or not self._fill():
                return


def _parse_headers(block: bytes) -> dict[str, str]:
    lines = block.split(b"\r\n")
    if not lines[0].startswith(b"WARC/"):
        raise WarcFormatError(f"bad version line {lines[0][:40]!r}")
    headers: dict[str, str] = {}
    for line in lines[1:]:
        if not line:
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise WarcFormatError(f"bad header line {line[:40]!r}")
        headers[name.strip().decode("ascii", "replace").lower()] = (
            value.strip().decode("utf-8", "replace"))
    return headers


def iter_warc_records(stream: IO[bytes],
                      chunk_size: int = 1 << 20) -> Iterator[dict]:
    """Incrementally yield records from a WARC byte stream.

    Each yield is ``{"rec_type", "url", "warc_date", "payload"}`` with
    the payload's raw bytes. Length-delimited all the way: a payload
    containing ``b"WARC/1.0"`` (or anything else) can never confuse
    record framing, because the parser jumps by ``Content-Length``
    instead of scanning for the next magic. Memory is bounded by the
    largest single record (capped at :data:`MAX_RECORD_BYTES`), never
    by file size.
    """
    rd = _ChunkedReader(stream, chunk_size)
    while True:
        rd.skip_newlines()
        block = rd.read_until(b"\r\n\r\n", limit=1 << 20)
        if block is None:
            return
        headers = _parse_headers(block[:-4])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcFormatError(f"bad Content-Length: {exc}") from exc
        if not 0 <= length <= MAX_RECORD_BYTES:
            raise WarcFormatError(f"unreasonable Content-Length {length}")
        payload = rd.read_exact(length)
        yield {
            "rec_type": headers.get("warc-type", ""),
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "payload": payload,
        }


def http_body(payload: bytes) -> bytes:
    """Strip the HTTP envelope from a response payload (bytes after the
    first blank line); payloads without one pass through verbatim."""
    head, sep, body = payload.partition(b"\r\n\r\n")
    return body if sep else payload


# ---------------------------------------------------------------------------
# the source


def list_warc_files(roots: list[str] | str) -> list[str]:
    """Expand roots (files, dirs — walked recursively — or globs) to a
    sorted, deduplicated file list; overlapping roots collapse here,
    before any file is opened (≈ scanner.go:147-209)."""
    if isinstance(roots, str):
        roots = [roots]
    found: set[str] = set()
    for root in roots:
        if os.path.isdir(root):
            for dirpath, _, names in os.walk(root):
                for n in names:
                    if n.endswith((".warc", ".warc.gz")):
                        found.add(os.path.join(dirpath, n))
        elif os.path.isfile(root):
            found.add(root)
        else:
            found.update(p for p in _glob.glob(root) if os.path.isfile(p))
    return sorted(found)


def _open_stream(path: str) -> IO[bytes]:
    if path.endswith(".gz"):
        # gzip streams across concatenated members (the per-record
        # gzip layout Common Crawl uses) and owns the file handle
        return gzip.open(path, "rb")  # type: ignore[return-value]
    return open(path, "rb")  # noqa: SIM115 — closed by the caller


#: flush thresholds for the parse stage's output batches — the row
#: collector must be as memory-bounded as the record parser, so parsed
#: rows stream out every FLUSH_ROWS records or FLUSH_BYTES of payload,
#: whichever comes first (an Arrow batch of ~64 MiB, never a whole shard)
FLUSH_ROWS = 256
FLUSH_BYTES = 64 << 20

#: output schema of the parse stage (error_reason null on clean rows)
WARC_ROWS_SCHEMA = ("url string, warc_date string, warc_ts timestamp, "
                    "html binary, src string, error_reason string")


@dataclass
class WarcSource:
    """Parsed pages + the error side-channel (≈ PagesSource)."""

    pages: DataFrame
    errors: DataFrame

    def error_count(self) -> int:
        """≈ Stats.ErrorCount (/root/reference/internal/model/model.go:62)."""
        return self.errors.count()


def read_warc(
    spark: SparkSession,
    roots: list[str] | str,
    num_partitions: int | None = None,
    chunk_size: int = 1 << 20,
) -> WarcSource:
    """Parse WARC archives into ``(url, warc_date, warc_ts, html, src)``.

    ``response`` records become page rows (HTTP envelope stripped,
    ``warc_ts`` the UTC timestamp parsed from ``WARC-Date``); other
    record types (warcinfo, request, metadata) are skipped. A corrupt
    record routes its file to the error side-channel with a reason,
    KEEPING every record parsed before the corruption point — the
    log-and-continue contract of the reference scanner. Raising
    ``FileNotFoundError`` for a missing root is deliberate: a wrong
    path is a job bug, not crawl noise.
    """
    import pandas as pd

    files = list_warc_files(roots)
    if not files:
        raise FileNotFoundError(f"no .warc/.warc.gz files under {roots!r}")
    parts = num_partitions or min(
        len(files), spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_date", "warc_ts", "html", "src", "error_reason"]
        for pdf in batches:
            for src in pdf["src"].tolist():
                # rows flush every FLUSH_BYTES of payload (or FLUSH_ROWS)
                # so the collector is as bounded as the parser: a 5 GB
                # shard never accumulates as one Python list of blobs
                rows: list[tuple] = []
                pending = 0
                try:
                    with _open_stream(src) as stream:
                        for rec in iter_warc_records(stream, chunk_size):
                            if rec["rec_type"] != "response":
                                continue
                            ts = datetime.strptime(
                                rec["warc_date"], WARC_DATE_FMT
                            ).replace(tzinfo=timezone.utc)
                            body = http_body(rec["payload"])
                            rows.append((rec["url"], rec["warc_date"], ts,
                                         body, src, None))
                            pending += len(body)
                            if len(rows) >= FLUSH_ROWS or pending >= FLUSH_BYTES:
                                yield pd.DataFrame(rows, columns=cols)
                                rows, pending = [], 0
                except (WarcFormatError, OSError, ValueError) as exc:
                    rows.append((None, None, None, None, src,
                                 f"{type(exc).__name__}: {exc}"))
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    listing = spark.createDataFrame(
        [(f,) for f in files], "src string").repartition(parts)
    parsed = listing.mapInPandas(gen, WARC_ROWS_SCHEMA)
    pages = parsed.filter("error_reason IS NULL").drop("error_reason")
    errors = parsed.filter("error_reason IS NOT NULL") \
                   .select("src", "error_reason")
    return WarcSource(pages=pages, errors=errors)
