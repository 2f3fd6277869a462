"""Event-sequence pattern matching (MATCH_RECOGNIZE-lite).

SQL:2016 MATCH_RECOGNIZE (and Flink CEP) find regex-shaped patterns
over ordered event streams; Spark has no built-in. The scale-shaped
reduction: encode each partition's time-ordered event types as ONE
character string, then run an ordinary regular expression over it —
`regexp_extract_all` is JVM-side and codegen-friendly, and the string
per key is bounded by the key's event count (at 100 TB you window the
key first — e.g. sessionize — exactly as MATCH_RECOGNIZE's PARTITION BY
... ORDER BY contract assumes the per-partition stream fits a task).

One shuffle (the groupBy that assembles each key's sequence), no
Python, no driver loops. Determinism: events are sorted by
(microsecond timestamp, symbol) so same-timestamp ties cannot reorder
across engines, and patterns whose repeated character classes EXCLUDE
the terminator symbol (e.g. ``v[cv]*p``) match identically under
leftmost-greedy (Java) and RE2 (DuckDB) semantics — the property the
oracle relies on.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def encode_symbols(type_col: Column, mapping: Mapping[str, str]) -> Column:
    """Map event-type values to single-character symbols; unmapped
    types become '.' (excluded from any sane pattern's classes)."""
    if not mapping:
        raise ValueError("mapping must be non-empty")
    for sym in mapping.values():
        if len(sym) != 1:
            raise ValueError(f"symbols must be single chars, got {sym!r}")
    if len(set(mapping.values())) != len(mapping):
        raise ValueError(
            f"duplicate symbols in mapping {dict(mapping)!r} — two event "
            "types sharing a character would silently merge"
        )
    expr = None
    for val, sym in sorted(mapping.items()):
        cond = type_col == F.lit(val)
        expr = F.when(cond, sym) if expr is None else expr.when(cond, sym)
    return expr.otherwise(F.lit("."))


def compile_pattern(pattern: str, mapping: Mapping[str, str]) -> str:
    """Compile a MATCH_RECOGNIZE ``PATTERN`` clause into the symbol
    regex :func:`match_event_pattern` runs — the SQL:2016 subset a
    funnel analyst actually writes:

        variables     event-type names (the ``mapping`` keys), each
                      standing for one event of that type
        concatenation ``A B C`` (whitespace)
        alternation   ``A | B`` — at any grouping depth
        grouping      ``( ... )``
        quantifiers   ``*  +  ?  {m}  {m,}  {m,n}`` on a variable or
                      group, greedy (SQL:2016's default; reluctant
                      ``??``-style suffixes are rejected — Java and
                      RE2 disagree on them in ways the oracle cannot
                      mirror)

    So ``signup view{2,3} purchase`` becomes e.g. ``sv{2,3}p`` and
    ``view (click|view)* purchase`` becomes ``v(?:c|v)*p``. Groups
    compile to NON-capturing ``(?:...)`` so ``regexp_extract_all(...,
    0)`` keeps returning whole matches. Unknown variables raise with
    the known alphabet (a typo would otherwise silently never match).
    Matching semantics downstream stay AFTER MATCH SKIP PAST LAST ROW
    (non-overlapping, leftmost)."""
    import re

    pattern = pattern.strip()
    if not pattern:
        raise ValueError("pattern must be non-empty")
    tok = re.compile(
        r"\s*(?:(?P<var>[A-Za-z_][\w.]*)"
        r"|(?P<open>\()|(?P<close>\))|(?P<alt>\|)"
        r"|(?P<quant>\*|\+|\?|\{\d+(?:,\d*)?\}))"
    )
    out: list[str] = []
    depth = 0
    prev_quantifiable = False  # a var or ')' directly behind us
    i, n = 0, len(pattern)
    while i < n:
        m = tok.match(pattern, i)
        if not m or m.end() == i:
            raise ValueError(
                f"PATTERN syntax error at {pattern[i:]!r} in {pattern!r}"
            )
        i = m.end()
        if m.group("var"):
            var = m.group("var")
            if var not in mapping:
                raise ValueError(
                    f"unknown pattern variable {var!r} — known: "
                    f"{sorted(mapping)}"
                )
            out.append(re.escape(mapping[var]))
            prev_quantifiable = True
        elif m.group("open"):
            out.append("(?:")
            depth += 1
            prev_quantifiable = False
        elif m.group("close"):
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced ')' in {pattern!r}")
            out.append(")")
            prev_quantifiable = True
        elif m.group("alt"):
            out.append("|")
            prev_quantifiable = False
        else:  # quantifier
            if not prev_quantifiable:
                raise ValueError(
                    f"quantifier {m.group('quant')!r} must follow a "
                    f"variable or group in {pattern!r}"
                )
            out.append(m.group("quant"))
            prev_quantifiable = False  # reject 'A*?' (reluctant)
    if depth != 0:
        raise ValueError(f"unbalanced '(' in {pattern!r}")
    rest = pattern[i:].strip()
    if rest:
        raise ValueError(f"trailing junk {rest!r} in {pattern!r}")
    return "".join(out)


def match_event_pattern(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    mapping: Mapping[str, str],
    pattern: str,
) -> DataFrame:
    """Per key: the time-ordered symbol sequence and every
    non-overlapping match of ``pattern`` (a plain regex over the
    symbol alphabet), MATCH_RECOGNIZE's AFTER MATCH SKIP PAST LAST ROW
    semantics. Returns key, seq_len, n_matches, total_matched,
    longest (longest single match length) — keys with zero matches
    included (n_matches = 0), so the result is a total report."""
    sym = encode_symbols(F.col(type_col), mapping)
    rows = df.select(
        F.col(key_col).alias("__k"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        sym.alias("__c"),
    )
    seqs = rows.groupBy("__k").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__us", "__c"))),
                lambda s: s["__c"],
            ),
            "",
        ).alias("seq")
    )
    matches = seqs.select(
        "__k",
        F.length("seq").alias("seq_len"),
        F.regexp_extract_all("seq", F.lit(pattern), 0).alias("__m"),
    )
    # materialize __m before the size/aggregate exprs reference it
    return matches.select(
        F.col("__k").alias(key_col),
        "seq_len",
        F.size("__m").cast("bigint").alias("n_matches"),
        F.aggregate(
            "__m", F.lit(0).cast("bigint"), lambda acc, m: acc + F.length(m)
        ).alias("total_matched"),
        F.coalesce(
            F.array_max(F.transform("__m", F.length)), F.lit(0)
        ).cast("int").alias("longest"),
    )


def match_event_spans(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    mapping: Mapping[str, str],
    pattern: str,
) -> DataFrame:
    """MATCH_RECOGNIZE MEASURES for :func:`match_event_pattern`: one
    ROW PER MATCH with its position and event-time span — the
    ``FIRST(ts) / LAST(ts)`` measures a funnel analyst reads off each
    match. Same reduction: symbol string per key, plain regex, AFTER
    MATCH SKIP PAST LAST ROW.

    Span recovery without per-event bookkeeping: with ``M`` the match
    list (``regexp_extract_all``) and ``S`` the split segments
    (``split`` keeps trailing empties), match i starts at
    ``sum(len(S[1..i])) + sum(len(M[1..i-1])) + 1`` in the symbol
    string; indexing the key's time-sorted microsecond array at the
    start/end positions yields the span timestamps. All-integer
    algebra, so a SQL oracle replays it exactly.

    ``pattern`` must not match the empty string (CEP patterns never
    do; a zero-width match would desynchronize the split/extract
    pairing). Keys with zero matches produce no rows. Output: key,
    match_idx (1-based), start_pos, end_pos (1-based symbol
    positions), start_us, end_us, n_events."""
    sym = encode_symbols(F.col(type_col), mapping)
    rows = df.select(
        F.col(key_col).alias("__k"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        sym.alias("__c"),
    )
    seqs = rows.groupBy("__k").agg(
        F.array_sort(F.collect_list(F.struct("__us", "__c"))).alias("__arr")
    )
    base = seqs.select(
        "__k",
        F.transform("__arr", lambda s: s["__us"]).alias("usa"),
        F.array_join(
            F.transform("__arr", lambda s: s["__c"]), ""
        ).alias("seq"),
    )
    # materialize M and S before the position lambdas reference them
    # (perf trap 1 — lambda bodies re-evaluate referenced expressions)
    parts = base.select(
        "__k",
        "usa",
        F.regexp_extract_all("seq", F.lit(pattern), 0).alias("__m"),
        F.split("seq", pattern, -1).alias("__s"),
    )
    start_of = lambda i: (  # noqa: E731 - 1-based symbol position
        F.aggregate(
            F.slice("__s", F.lit(1), i),
            F.lit(0),
            lambda acc, seg: acc + F.length(seg),
        )
        + F.when(
            i == 1, F.lit(0)
        ).otherwise(
            F.aggregate(
                F.slice("__m", F.lit(1), i - 1),
                F.lit(0),
                lambda acc, mm: acc + F.length(mm),
            )
        )
        + F.lit(1)
    )
    # drop zero-match keys BEFORE the position transform: Spark's
    # sequence(1, 0) is DESCENDING [1, 0], so an unguarded transform
    # would index the empty match list (and ANSI element_at throws)
    spans = parts.filter(F.size("__m") > 0).select(
        "__k",
        "usa",
        "__m",
        F.transform(
            F.sequence(F.lit(1), F.size("__m")),
            lambda i: F.struct(
                i.alias("match_idx"),
                start_of(i).alias("start_pos"),
                (start_of(i) + F.length(F.element_at("__m", i)) - 1).alias(
                    "end_pos"
                ),
            ),
        ).alias("__spans"),
    )
    # explode_outer on the pre-filtered non-empty array (perf trap 7:
    # plain explode would let InferFiltersFromGenerate inline the
    # whole chain into a scan filter)
    exploded = spans.select(
        "__k", "usa", F.explode_outer("__spans").alias("sp")
    )
    return exploded.select(
        F.col("__k").alias(key_col),
        F.col("sp.match_idx").alias("match_idx"),
        F.col("sp.start_pos").alias("start_pos"),
        F.col("sp.end_pos").alias("end_pos"),
        F.element_at("usa", F.col("sp.start_pos")).alias("start_us"),
        F.element_at("usa", F.col("sp.end_pos")).alias("end_us"),
        (F.col("sp.end_pos") - F.col("sp.start_pos") + 1).alias("n_events"),
    )


def match_event_starts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    mapping: Mapping[str, str],
    pattern: str,
) -> DataFrame:
    """AFTER MATCH SKIP TO NEXT ROW semantics — OVERLAPPING matches:
    every symbol position where a match of ``pattern`` BEGINS, found
    by anchoring the regex at each suffix (``^pattern`` on
    ``seq[i:]``). No lookahead tricks (RE2 — the oracle engine — has
    none); existence-at-position is greediness-independent, so Java
    and RE2 cannot disagree. Complements :func:`match_event_pattern`
    (SKIP PAST LAST ROW, non-overlapping) and
    :func:`match_event_spans` (per-match measures).

    Per key: seq_len, n_matches (overlapping count), first_start,
    last_start (1-based positions; 0 when no match). Positional scan
    is O(seq_len) anchored regex probes per key inside one projection
    — per-key strings are bounded by the caller's windowing contract,
    same as the rest of the family."""
    sym = encode_symbols(F.col(type_col), mapping)
    rows = df.select(
        F.col(key_col).alias("__k"),
        F.unix_micros(F.col(ts_col)).alias("__us"),
        sym.alias("__c"),
    )
    seqs = rows.groupBy("__k").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__us", "__c"))),
                lambda s: s["__c"],
            ),
            "",
        ).alias("seq")
    )
    anchored = f"^(?:{pattern})"
    starts = F.filter(
        F.sequence(F.lit(1), F.length("seq")),
        lambda i: F.regexp_extract(
            F.col("seq").substr(i, F.length("seq")), anchored, 0
        )
        != "",
    )
    with_starts = seqs.select(
        "__k", F.length("seq").alias("seq_len"), starts.alias("__st")
    )
    return with_starts.select(
        F.col("__k").alias(key_col),
        F.col("seq_len").cast("int").alias("seq_len"),
        F.size("__st").cast("bigint").alias("n_matches"),
        F.coalesce(F.get("__st", F.lit(0)), F.lit(0)).cast("int").alias(
            "first_start"
        ),
        F.coalesce(
            F.get("__st", F.size("__st") - 1), F.lit(0)
        ).cast("int").alias("last_start"),
    )
