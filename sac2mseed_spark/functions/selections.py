"""Selection globs + field overrides — the reference's query objects.

Selections are the reference's *only* query surface: a list of
(srcname-glob, time-window) entries, a record matching ANY entry is kept
(ms_matchselect / ms_globmatch, /root/reference/libmseed/selection.c:93-151,
604-700). Here the glob grammar — ``*`` any run, ``?`` one char, ``[...]``
sets with ranges and leading ``^`` negation, ``]`` literal when first in a
set — is translated ONCE at plan time into an anchored regular expression
understood identically by Spark's ``rlike`` (Java regex) and DuckDB's
``regexp_matches`` (RE2), so the same pattern literal drives both the
engine and the oracle. The filter itself is a plain codegen'd predicate
that pushes into the scan.

Field overrides are the reference's forced net/sta/loc/chan splice
(/root/reference/src/sac2mseed.c:318-337): each character of the override
replaces the corresponding character of the original, except ``.`` which
passes the original character through; characters of the original beyond
the override's length are kept. Compiled to a ``concat`` of one-char
substrings/literals — pure whole-stage-codegen, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# regex metacharacters needing escape outside character classes (both Java
# regex and RE2)
_SPECIAL = set(".^$+{}()|\\")


def _escape_class(content: str) -> str:
    """Escape a glob set's body for use inside a regex class. A leading
    ``^`` keeps its negation meaning; ``-`` ranges pass through."""
    neg = content.startswith("^")
    body = content[1:] if neg else content
    for ch in ("\\", "]", "[", "&"):
        body = body.replace(ch, "\\" + ch)
    return ("^" if neg else "") + body


def glob_to_regex(glob: str) -> str:
    """Translate an ms_globmatch-style glob into an anchored regex."""
    out = ["^"]
    i, n = 0, len(glob)
    while i < n:
        c = glob[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = i + 1
            if j < n and glob[j] == "^":
                j += 1
            first = j  # ']' in first position is a literal member
            while j < n and (glob[j] != "]" or j == first):
                j += 1
            if j >= n:
                out.append("\\[")  # unterminated set -> literal '['
            else:
                out.append("[" + _escape_class(glob[i + 1 : j]) + "]")
                i = j
        elif c in _SPECIAL:
            out.append("\\" + c)
        else:
            out.append(c)
        i += 1
    out.append("$")
    return "".join(out)


def glob_match(col: Column | str, glob: str) -> Column:
    col = F.col(col) if isinstance(col, str) else col
    return col.rlike(glob_to_regex(glob))


def apply_selections(
    df: DataFrame,
    selections: list[tuple[str, int | None, int | None]],
    id_col: str = "conv_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Keep rows matching ANY (glob, start_us, end_us) selection.

    None bounds are open (the reference's HPTERROR sentinel,
    selection.c:117-129). The OR-of-ANDs predicate is a single codegen'd
    filter; with only-prefix globs Catalyst still pushes a StartsWith to
    the scan."""
    pred = None
    for glob, lo, hi in selections:
        p = glob_match(id_col, glob)
        if lo is not None:
            p = p & (F.col(ts_col) >= F.lit(lo))
        if hi is not None:
            p = p & (F.col(ts_col) <= F.lit(hi))
        pred = p if pred is None else (pred | p)
    return df.filter(pred) if pred is not None else df


def selections_sql(
    selections: list[tuple[str, int | None, int | None]],
    id_col: str = "conv_id",
    ts_col: str = "ts_us",
) -> str:
    """The identical predicate as ANSI SQL for the DuckDB oracle."""
    parts = []
    for glob, lo, hi in selections:
        # standard SQL single-quoted literals process no backslash escapes,
        # so the regex goes in verbatim — only quotes need doubling
        rx = glob_to_regex(glob).replace("'", "''")
        p = f"regexp_matches({id_col}, '{rx}')"
        if lo is not None:
            p += f" AND {ts_col} >= {lo}"
        if hi is not None:
            p += f" AND {ts_col} <= {hi}"
        parts.append(f"({p})")
    return " OR ".join(parts) if parts else "TRUE"


# ----------------------------------------------------------------------
# field override / dot-splice (sac2mseed.c:318-337)
# ----------------------------------------------------------------------

def override_col(col: Column | str, override: str) -> Column:
    """Dot-splice ``override`` onto a string column.

    out[i] = override[i], except '.' keeps the original character (empty
    when the original is shorter); original characters beyond the override
    are appended. NULL stays NULL (guarded explicitly so Spark's
    null-propagating concat and DuckDB's null-skipping concat agree)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = []
    for i, ch in enumerate(override):
        parts.append(F.substring(c, i + 1, 1) if ch == "." else F.lit(ch))
    parts.append(F.substring(c, len(override) + 1, 1 << 20))
    return F.when(c.isNull(), F.lit(None)).otherwise(F.concat(*parts))


def override_sql(col: str, override: str) -> str:
    """The identical splice as ANSI SQL (DuckDB oracle)."""
    parts = []
    for i, ch in enumerate(override):
        if ch == ".":
            parts.append(f"substr({col}, {i + 1}, 1)")
        else:
            parts.append("'" + ch.replace("'", "''") + "'")
    parts.append(f"substr({col}, {len(override) + 1}, {1 << 20})")
    joined = " || ".join(parts)
    return f"CASE WHEN {col} IS NULL THEN NULL ELSE {joined} END"


def override_source(
    df: DataFrame,
    conv_id: str | None = None,
    role: str | None = None,
    tool: str | None = None,
) -> DataFrame:
    """Apply forced-field splices to the transcript identity columns — the
    -n/-s/-l/-c flags of the reference CLI recast over (conv_id, role,
    tool)."""
    out = df
    for name, ov in (("conv_id", conv_id), ("role", role), ("tool", tool)):
        if ov is not None:
            out = out.withColumn(name, override_col(name, ov))
    return out
