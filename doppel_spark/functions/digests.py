"""Content-digest column expressions — the exact-dup tier's hash functions.

The reference computes two digests per candidate file
(/root/reference/internal/scanner/hasher.go):

* a *quick* 64-bit XXH3 digest over a bounded sample of the content —
  a cheap pruning key, explicitly NOT an equality proof
  (hasher_test.go:231-317 asserts that a middle-byte flip keeps the
  quick digest equal while the full digest differs);
* a *full* cryptographic digest (BLAKE3-256) over the whole content —
  the collision-free content-equality key that defines group membership.

We reproduce the *piecewise sampling shape* of the quick digest exactly
(hasher.go:46-92, including the 8–16 KiB first-8-KiB-only subtlety
caused by the 8 KiB buffer at hasher.go:12 / finder.go:165), but on the
``text`` column of a page row, in characters, with Spark's built-in
``xxhash64``. The specific 64-bit hash family differs from XXH3 — that
is fine: the contract is "equal samples ⇒ equal quick digest", never
the digest value itself. Likewise ``sha2(text, 256)`` replaces BLAKE3:
the contract is "cryptographic content-equality key".

Everything here is a Catalyst expression — JVM-side, codegen'd, zero
Python. On a 100 TB corpus the quick digest reads at most 16 KiB of
each text value and the expensive full digest is only ever evaluated on
rows that survived two pruning stages.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: sample window size, mirroring the reference's 8 KiB hash buffer
#: (/root/reference/internal/scanner/hasher.go:12)
QUICK_SAMPLE = 8192

#: below this total size the reference one-shots the (buffer-truncated)
#: prefix instead of sampling prefix+suffix (hasher.go:71-75)
QUICK_FULL_THRESHOLD = 16384


def quick_digest(text: Column | str) -> Column:
    """64-bit pruning digest over a bounded sample of ``text``.

    Piecewise contract (mirrors hasher.go:46-92, sizes in characters):

    * length == 0  → 0                       (hasher.go:47-49)
    * length < 16384 → xxhash64(first 8192)  (hasher.go:71-75 — only the
      first 8 KiB even for 8–16 KiB inputs, due to the 8 KiB buffer)
    * length >= 16384 → xxhash64(first 8192 ‖ last 8192)
      (hasher.go:77-90)
    """
    t = F.col(text) if isinstance(text, str) else text
    sample = F.when(
        F.length(t) < QUICK_FULL_THRESHOLD, F.substring(t, 1, QUICK_SAMPLE)
    ).otherwise(
        F.concat(
            F.substring(t, 1, QUICK_SAMPLE),
            F.substring(t, -QUICK_SAMPLE, QUICK_SAMPLE),
        )
    )
    # NULL text takes the same 0 sentinel as empty text (the reference
    # never reads unreadable files at all — scanner.go:38-52 routes them
    # to the error channel; a NULL here must not hash to xxhash64(NULL)'s
    # seed constant and collide into a shared bucket)
    return (
        F.when(t.isNull() | (F.length(t) <= 0), F.lit(0).cast("long"))
        .otherwise(F.xxhash64(sample))
        .alias("quick_digest")
    )


def full_digest(text: Column | str) -> Column:
    """Cryptographic content-equality key (hex SHA-256 of the full text).

    Replaces the reference's streamed BLAKE3-256
    (/root/reference/internal/scanner/hasher.go:22-42); group membership
    is identical under any cryptographic hash.
    """
    t = F.col(text) if isinstance(text, str) else text
    return F.sha2(t, 256).alias("digest")
