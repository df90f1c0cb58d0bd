"""Quirk-exact URL parse / normalize as *portable SQL* text.

Reference semantics (cited file:line under /root/reference/):

- ``tools/URLParser.java:105-128`` — ``parseURL(url) -> [protocol, host,
  port, path]``.  Quirks reproduced exactly:

  * the split point is ``url.indexOf("//")`` with a ``> 0`` guard, so a
    protocol-relative URL (``//host/x``, indexOf == 0) is treated as a bare
    *path* (all fields null except path = the whole string);
  * protocol = ``substring(0, slashslash-1)`` — i.e. the char before
    ``//`` (the colon) is dropped positionally, not matched;
  * a colon at host position 0 (``indexOf(':') > 0``) does NOT split a
    port — the colon stays inside the host;
  * no next slash after the host → path defaults to ``"/"``.

- ``jobs/UrlNormalizer.java:8-96`` — ``normalize(baseUrl, link)``.  Quirks:

  * **dangling else** (``:28-36``): the ``else if (protocol != null)``
    binds to the *inner* if, so the base-protocol http/https check only
    runs when the link itself has an http/https protocol; a relative link
    never triggers the base-protocol rejection;
  * the jpg/jpeg/png/gif/txt extension filter (``:38-41``) tests the raw
    link path *before* the fragment is stripped;
  * fragment strip (``:44-47``) then empty-path → return the *base* URL
    verbatim (``:50-52`` — the comment says "return null", the code
    returns baseUrl);
  * absolute / protocol-relative / root-relative / relative resolution in
    that order (``:55-84``); the base port default comes from
    ``getDefaultPort`` (``:87-96``) and a null port renders as the Java
    string-concat literal ``"null"`` (``:69,84``);
  * the ``../`` loop (``:76-82``) pops one base segment per prefix; we
    unroll it ``UNROLL`` times (6 — the reference crawler caps URL path
    depth at 5 slashes, ``jobs/URLExtractor.java:53``).

Where the Java would *throw* (a base URL with no protocol NPEs at entry:
``getDefaultPort(null)`` switches on null before the link is parsed), the
SQL cannot throw per-row — it keeps evaluating and lets the NULL protocol
propagate through concat: branches interpolating the base protocol/host
yield NULL, branches that never touch them (absolute link, empty link →
base echo) yield their normal result.  ``normalize_url_py`` reproduces
the SQL's continuation exactly; tests pin this documented divergence.

The same SQL text runs on Spark and DuckDB (only functions with identical
semantics in both are used; every computed ``substr`` length is clamped
with ``greatest(..., 0)`` because the engines disagree on negative
lengths).  The Spark operator and the DuckDB oracle are therefore
identical-by-construction; the *semantic* gate is
``tests/test_urltools.py``, which checks the Spark output against an
independent Python transliteration of the Java.
"""

from __future__ import annotations

UNROLL = 6

_DEFAULT_PORT = "(CASE {p} WHEN 'http' THEN '80' WHEN 'https' THEN '443' END)"


def _keep_through_last_slash(expr: str) -> str:
    """SQL: chars to keep so the string ends at its last '/'; 0 if none.

    Mirrors Java ``lastIndexOf('/')`` + ``substring(0, i+1)``.
    """
    return (
        f"(CASE WHEN instr(reverse({expr}), '/') > 0 "
        f"THEN length({expr}) - instr(reverse({expr}), '/') + 1 ELSE 0 END)"
    )


def parse_cte(src: str, url_col: str, prefix: str, carry: str) -> str:
    """SQL deriving {prefix}proto/{prefix}host/{prefix}port/{prefix}path
    from ``url_col`` of ``src``, carrying ``carry`` columns through.

    Nested derived tables (not lateral refs) so the text is engine-portable.
    """
    p = prefix
    u = url_col
    return f"""
SELECT {carry}, {u},
       CASE WHEN {p}cp >= 2 THEN substr({p}hp, 1, greatest({p}cp - 1, 0)) ELSE {p}hp END AS {p}host,
       CASE WHEN {p}cp >= 2 THEN substr({p}hp, {p}cp + 1) END AS {p}port,
       {p}proto, {p}path
FROM (
  SELECT {carry}, {u}, {p}proto, {p}hp, {p}path,
         coalesce(instr({p}hp, ':'), 0) AS {p}cp
  FROM (
    SELECT {carry}, {u},
           CASE WHEN {p}ss > 1 THEN substr({u}, 1, greatest({p}ss - 2, 0)) END AS {p}proto,
           CASE WHEN {p}ss > 1 THEN (CASE WHEN {p}ns > 0
                THEN substr({u}, {p}ss + 2, greatest({p}ns - {p}ss - 2, 0))
                ELSE substr({u}, {p}ss + 2) END) END AS {p}hp,
           CASE WHEN {p}ss > 1 THEN (CASE WHEN {p}ns > 0
                THEN substr({u}, {p}ns) ELSE '/' END)
                ELSE {u} END AS {p}path
    FROM (
      SELECT {carry}, {u}, {p}ss,
             CASE WHEN {p}rel > 0 THEN {p}rel + {p}ss + 1 ELSE 0 END AS {p}ns
      FROM (
        SELECT {carry}, {u}, instr({u}, '//') AS {p}ss,
               instr(substr({u}, instr({u}, '//') + 2), '/') AS {p}rel
        FROM {src}
      ) AS {p}q1
    ) AS {p}q2
  ) AS {p}q3
) AS {p}q4"""


def _unroll_ctes(first: str) -> tuple[str, str]:
    """CTE chain popping one '../' per step (UrlNormalizer.java:76-82)."""
    parts = []
    prev = first
    for i in range(1, UNROLL + 1):
        bp, lp = f"bp{i - 1}", f"lp{i - 1}"
        pref = f"substr({bp}, 1, greatest(length({bp}) - 1, 0))"
        keep = _keep_through_last_slash(pref)
        parts.append(
            f"""u{i} AS (
  SELECT *, CASE WHEN substr({lp}, 1, 3) = '../' AND {keep} > 0
                 THEN substr({bp}, 1, {keep}) ELSE {bp} END AS bp{i},
            CASE WHEN substr({lp}, 1, 3) = '../'
                 THEN substr({lp}, 4) ELSE {lp} END AS lp{i}
  FROM {prev})"""
        )
        prev = f"u{i}"
    return ",\n".join(parts), prev


def normalize_sql(src: str, carry: str = "doc_id") -> str:
    """Full normalize(base_url, link) pipeline over ``src`` (must expose
    ``carry`` + ``base_url`` + ``link``); yields {carry}, base_url, link,
    normalized (NULL where the Java returns null)."""
    b_parse = parse_cte(src, "base_url", "b_", f"{carry}, link")
    l_parse = parse_cte("pb", "link", "l_", f"{carry}, base_url, b_proto, b_host, b_port, b_path")
    unroll, last = _unroll_ctes("n1")
    return f"""
WITH pb AS ({b_parse}),
pl AS ({l_parse}),
n0 AS (
  SELECT {carry}, base_url, link, b_proto, b_host, b_path,
         coalesce(b_port, {_DEFAULT_PORT.format(p='b_proto')}) AS b_portd,
         l_proto, l_host, l_path,
         coalesce(l_port, {_DEFAULT_PORT.format(p='l_proto')}) AS l_portd,
         CASE WHEN instr(l_path, '#') > 0
              THEN substr(l_path, 1, greatest(instr(l_path, '#') - 1, 0))
              ELSE l_path END AS lp_stripped,
         CASE WHEN {_keep_through_last_slash('b_path')} > 0
              THEN substr(b_path, 1, {_keep_through_last_slash('b_path')})
              ELSE b_path END AS bp0
  FROM pl
),
n1 AS (
  SELECT *, lp_stripped AS lp0 FROM n0
),
{unroll}
SELECT {carry}, base_url, link,
  CASE
    WHEN l_proto IS NOT NULL AND l_proto NOT IN ('http', 'https') THEN NULL
    WHEN l_proto IS NOT NULL AND b_proto IS NOT NULL
         AND b_proto NOT IN ('http', 'https') THEN NULL
    WHEN right(l_path, 3) = 'jpg' OR right(l_path, 4) = 'jpeg'
         OR right(l_path, 3) = 'png' OR right(l_path, 3) = 'gif'
         OR right(l_path, 3) = 'txt' THEN NULL
    WHEN lp_stripped = '' THEN base_url
    WHEN l_host IS NOT NULL
         THEN l_proto || '://' || l_host || ':' || l_portd || lp_stripped
    WHEN substr(lp_stripped, 1, 2) = '//' THEN b_proto || ':' || lp_stripped
    WHEN substr(lp_stripped, 1, 1) = '/'
         THEN b_proto || '://' || b_host || ':' || coalesce(b_portd, 'null') || lp_stripped
    ELSE b_proto || '://' || b_host || ':' || coalesce(b_portd, 'null')
         || bp{UNROLL} || lp{UNROLL}
  END AS normalized
FROM {last}"""


# ---------------------------------------------------------------------------
# Independent Python transliteration of the Java — the pytest oracle
# (NOT used by the Spark path; kept here so operator fixtures and tests
# share one source of truth).

def parse_url_py(url: str) -> list[str | None]:
    """Transliteration of URLParser.parseURL (tools/URLParser.java:105-128)."""
    result: list[str | None] = [None, None, None, None]
    slashslash = url.find("//")
    if slashslash > 0:
        result[0] = url[: slashslash - 1]
        nextslash = url.find("/", slashslash + 2)
        if nextslash >= 0:
            result[1] = url[slashslash + 2 : nextslash]
            result[3] = url[nextslash:]
        else:
            result[1] = url[slashslash + 2 :]
            result[3] = "/"
        colon = result[1].find(":")
        if colon > 0:
            result[2] = result[1][colon + 1 :]
            result[1] = result[1][:colon]
    else:
        result[3] = url
    return result


def _default_port_py(protocol: str | None) -> str | None:
    if protocol == "http":
        return "80"
    if protocol == "https":
        return "443"
    return None


def normalize_url_py(base_url: str, link: str) -> str | None:
    """Transliteration of UrlNormalizer.normalize (jobs/UrlNormalizer.java:8-96),
    dangling-else and all.

    Documented divergence (module docstring): a protocol-less base NPEs in
    the Java at entry (``getDefaultPort(null)`` switches on null,
    ``UrlNormalizer.java:17-19,88``) before the link is even parsed.  SQL
    cannot throw per-row, so ``normalize_sql`` keeps evaluating and lets
    the NULL protocol propagate: branches that interpolate the base
    protocol/host yield NULL, branches that never touch them (absolute
    link, empty-link → base echo) yield their normal result.  This twin
    matches the SQL exactly — it is the differential oracle for the SQL
    text, not for the Java throw."""
    protocol, host, port, _ = parse_url_py(base_url)
    if port is None:
        port = _default_port_py(protocol)  # Java NPEs here if protocol is None

    l_protocol, l_host, l_port, l_path = parse_url_py(link)
    assert l_path is not None

    if l_protocol is not None:
        if l_protocol not in ("https", "http"):
            return None
        elif protocol is not None:  # dangling else: bound to the inner if
            if protocol not in ("https", "http"):
                return None

    if l_path.endswith(("jpg", "jpeg", "png", "gif", "txt")):
        return None

    frag = l_path.find("#")
    if frag != -1:
        l_path = l_path[:frag]

    if l_path == "":
        return base_url

    if l_host is not None:
        if l_port is None:
            l_port = _default_port_py(l_protocol)
        return f"{l_protocol}://{l_host}:{l_port}{l_path}"

    # From here every branch interpolates the base protocol (and host); a
    # None propagates to a NULL result, mirroring the SQL's concat-NULL
    # semantics where the Java would already have NPE'd at entry.
    if protocol is None:
        return None

    if l_path.startswith("//"):
        return f"{protocol}:{l_path}"

    def j(x: str | None) -> str:  # Java string-concat renders null as "null"
        return "null" if x is None else x

    if l_path.startswith("/"):
        return f"{protocol}://{host}:{j(port)}{l_path}"

    base_path = parse_url_py(base_url)[3] or ""
    last_slash = base_path.rfind("/")
    if last_slash != -1:
        base_path = base_path[: last_slash + 1]
    while l_path.startswith("../"):
        slash = base_path[: len(base_path) - 1].rfind("/")
        if slash != -1:
            base_path = base_path[: slash + 1]
        l_path = l_path[3:]
    return f"{protocol}://{host}:{j(port)}{base_path}{l_path}"
