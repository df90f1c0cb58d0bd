"""Quirk-exact port of the reference's custom SHA-1 row-key hash.

``tools/Hasher.java:27-38`` hashes a UTF-8 string with SHA-1 and renders
each digest byte through a 256-entry two-char alphabet
(``Hasher.java:8-25``).  The index computation carries a signed-byte bug
that we reproduce exactly (``:35``)::

    byte2chars[(digest[i] > 0) ? digest[i] : 255 + digest[i]]

In unsigned terms (u = the byte value 0..255):

* ``u == 0``      → index 255  (0 is not > 0, so 255 + 0)
* ``u in 1..127`` → index u    (positive signed byte)
* ``u >= 128``    → index u-1  (signed value u-256, so 255 + u - 256)

so adjacent high bytes collide (u and u+1 map to the same pair for
u >= 127) and byte 0 aliases byte 255's slot shifted — faithfully wrong.

The alphabet table itself is generated, not copied: entry i is
``chr(97 + i % 26) + chr(97 + 2 * (i // 26))`` (first char cycles a-z,
second char steps a,c,e,…,s every 26 entries), which reproduces
``Hasher.java:8-25`` byte-for-byte (asserted in tests).

``hash_expr`` is a *pure-JVM Catalyst expression* — ``sha1()`` then 20
``conv``/``CASE``/``chr`` pairs — so hashing a billion row keys never
leaves whole-stage codegen.  ``hash_py`` is the driver-side twin (used as
the independent oracle in tests/test_urltools.py).

No driver ``queries()`` entry: DuckDB has no ``sha1`` function, so the
correctness gate is the pytest cross-check (Catalyst vs hashlib) instead.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F

#: Generated reproduction of Hasher.java:8-25 (see module docstring).
BYTE2CHARS: list[str] = [
    chr(97 + i % 26) + chr(97 + 2 * (i // 26)) for i in range(256)
]


def _bug_index(u: int) -> int:
    """Signed-byte index quirk of Hasher.java:35 over unsigned u."""
    if u == 0:
        return 255
    if u <= 127:
        return u
    return u - 1


def hash_py(x: str) -> str:
    """Driver-side / oracle twin of Hasher.hash (tools/Hasher.java:27-38)."""
    digest = hashlib.sha1(x.encode("utf-8")).digest()
    return "".join(BYTE2CHARS[_bug_index(b)] for b in digest)


def hash_expr(col: Column | str) -> Column:
    """Catalyst expression computing Hasher.hash of a string column.

    ``sha1`` emits 40 lowercase hex chars; each of the 20 bytes is decoded
    with ``conv(_, 16, 10)`` and mapped through the quirk index into the
    generated alphabet — all JVM-side, no Python in the plan.
    """
    c = F.col(col) if isinstance(col, str) else col
    hexd = F.sha1(c)
    pairs = []
    for i in range(20):
        u = F.conv(F.substring(hexd, 2 * i + 1, 2), 16, 10).cast("int")
        idx = (
            F.when(u == 0, F.lit(255))
            .when(u <= 127, u)
            .otherwise(u - 1)
        )
        pairs.append(F.chr(idx % 26 + 97))
        pairs.append(F.chr((F.floor(idx / 26) * 2 + 97).cast("long")))
    return F.concat(*pairs)
