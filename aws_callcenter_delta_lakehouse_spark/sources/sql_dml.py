"""SQL DML front-end over name-addressed managed tables.

Real Delta accepts the reference's merge idiom
(``/root/reference/glue_jobs/01_silver_delta_upsert.py:104-112``) as a
literal SQL string — ``spark.sql("MERGE INTO t USING s ON ... WHEN
MATCHED ...")`` — plus ``UPDATE`` / ``DELETE FROM`` / ``INSERT INTO``.
The engine's Python facade (:mod:`sources.delta_api`) already executes
every one of those semantics; this module adds the SQL SKIN: parse the
four DML verbs against names in the txn-catalog registry
(:mod:`sources.txn_catalog`) and dispatch to the existing executors.
No new engine semantics live here — every statement bottoms out in
``DeltaTable.merge/update/delete`` or ``append_rows`` /
``commit_overwrite``, so CDF, row tracking, constraints, OCC retry and
schema enforcement all apply unchanged.

Entry point: :func:`sql` — DML statements are parsed here; anything
else passes through to ``spark.sql`` with registry-name references
rewritten to per-statement temp views (see "Passthrough reads" below),
so ``SELECT ... FROM callcenter_analytics.daily_call_summary`` — the
reference's bare-name Athena idiom
(``/root/reference/sql/athena_queries.sql``) — just works, deletion
vectors and all, with no prior ``register_sql_view``.

Grammar (the Delta SQL DML subset; case-insensitive keywords, ANSI
quoting, arbitrary Spark SQL expressions inside conditions/values):

    MERGE INTO tgt [AS] [t] USING src|(subquery) [AS] [s] ON <cond>
      { WHEN MATCHED [AND <cond>] THEN { UPDATE SET * | UPDATE SET c=e,... | DELETE }
      | WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN
            { INSERT * | INSERT (c,...) VALUES (e,...) }
      | WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
            { UPDATE SET c=e,... | DELETE } } ...
    UPDATE tgt [[AS] a] SET c=e, ... [WHERE <cond>]
    DELETE FROM tgt [[AS] a] [WHERE <cond>]
    INSERT INTO tgt [(c, ...)] { VALUES (e,...), ... | SELECT ... }
    INSERT OVERWRITE [TABLE] tgt [(c, ...)] { VALUES ... | SELECT ... }

Commands (``sql_command``, routed automatically by :func:`sql`):

    CREATE [OR REPLACE] TABLE [IF NOT EXISTS] t
        (c type [GENERATED ALWAYS AS (expr)], ...)
        [USING delta] [PARTITIONED BY (...)] [CLUSTER BY (...)]
        [LOCATION '...'] [TBLPROPERTIES (k=v, ...)] [COMMENT '...']
    CREATE [OR REPLACE] TABLE [IF NOT EXISTS] t [clauses as above]
        AS <query>                                  -- CTAS / RTAS
    CREATE TABLE [IF NOT EXISTS] dst [SHALLOW] CLONE src [LOCATION '...']
    ALTER TABLE t { ADD COLUMN[S] (c type [DEFAULT lit], ...)
                  | SET TBLPROPERTIES (k=v, ...)
                  | RENAME COLUMN a TO b | DROP COLUMN c
                  | ADD CONSTRAINT n CHECK (expr) | DROP CONSTRAINT n }
    DESCRIBE { HISTORY | DETAIL } t
    DESCRIBE [TABLE] t                 -- column name/type listing
    SHOW TABLES [IN db]                -- name-registry listing (+views)
    DROP TABLE [IF EXISTS] t           -- unbinds the NAME (data stays)
    CREATE [OR REPLACE] VIEW v AS <q>  -- registry LOGICAL view (stored
                                       -- SQL, re-resolved per query)
    DROP VIEW [IF EXISTS] v
    OPTIMIZE t [WHERE pred] [ZORDER BY (cols)]
    VACUUM t [RETAIN n HOURS] [DRY RUN]
    RESTORE [TABLE] t TO { VERSION AS OF k | TIMESTAMP AS OF '...' }
    ANALYZE TABLE t COMPUTE STATISTICS [FOR COLUMNS c, ...]
    TRUNCATE TABLE t
    SHOW TBLPROPERTIES t
    SHOW PARTITIONS t
    REORG TABLE t APPLY (PURGE)
    COPY INTO t FROM '<dir|file|glob>' [FILEFORMAT = PARQUET|CSV|JSON]
        [PATTERN = '<glob>'] [FORMAT_OPTIONS (k=v, ...)]

Passthrough reads resolve FOUR registry-name reference shapes, each
spliced out quote-aware (never inside string literals) as a
per-statement temp view that :func:`sql` drops after ``spark.sql``'s
eager analysis inlines it:

    SELECT ... FROM t                        -- bare name, LIVE snapshot
    SELECT ... FROM t VERSION AS OF 3        -- time travel
    SELECT ... FROM t TIMESTAMP AS OF '...'
    SELECT ... FROM t$files|$partitions|$snapshots   -- metadata tables
    SELECT ... FROM table_changes('t', from[, to])   -- Delta's CDF TVF

Bare names route through :func:`managed_table.read`, so reader
features (deletion vectors, row tracking, column mapping, empty-table
schema) are honored — the gap :func:`delta_api.register_sql_view`'s
raw parquet views cannot close. A registry name shadows a same-named
session temp view in these positions (the registry is the metastore);
unresolvable names fall through to Spark's own catalog untouched.

Scale: the parser is driver-side string work on statements (bytes);
all data movement happens in the dispatched executors, which keep
their documented 100 TB plans (key-join MERGE, DV-aware DELETE/UPDATE,
hardlink append).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import managed_table, txn_catalog
from .delta_api import DeltaTable, _registry_dir

__all__ = ["sql", "sql_command", "sql_script", "SqlDmlError"]


class SqlDmlError(ValueError):
    """Malformed or unsupported DML statement."""


# -- lexical helpers --------------------------------------------------------
# The splitter walks the statement once, tracking quote/paren state, and
# finds keyword phrases only at TOP level — expressions, string literals
# and subqueries pass through verbatim to Spark.

_QUOTES = {"'": "'", '"': '"', "`": "`"}


_CASE_RE = re.compile(r"CASE\b", re.I)
_END_RE = re.compile(r"END\b", re.I)


def _scan(s: str, phrases: list[str]) -> list[tuple[int, int, str]]:
    """Positions of top-level keyword phrases (longest-first match).
    Each phrase is spelled with single spaces; any whitespace run
    matches between its words. CASE-aware (review r12): keywords
    between a top-level ``CASE`` and its ``END`` belong to the CASE
    expression (``WHEN``/``THEN``/``ELSE``) and are never reported —
    an unparenthesized ``CASE WHEN ... THEN ... END`` in a MERGE ON
    condition or WHEN-clause predicate must not split the statement."""
    pats = [
        (p, re.compile(r"\s+".join(map(re.escape, p.split())) + r"\b", re.I))
        for p in sorted(phrases, key=len, reverse=True)
    ]
    out: list[tuple[int, int, str]] = []
    depth, case_depth, i, n = 0, 0, 0, len(s)
    while i < n:
        c = s[i]
        if c in _QUOTES:
            end = _QUOTES[c]
            i += 1
            while i < n and s[i] != end:
                i += 2 if s[i] == "\\" and end != "`" else 1
            i += 1
            continue
        if c == "(":
            depth += 1
            i += 1
            continue
        if c == ")":
            depth -= 1
            i += 1
            continue
        if depth == 0 and (i == 0 or not (s[i - 1].isalnum() or s[i - 1] == "_")):
            m = _CASE_RE.match(s, i)
            if m:
                case_depth += 1
                i = m.end()
                continue
            if case_depth:
                m = _END_RE.match(s, i)
                if m:
                    case_depth -= 1
                    i = m.end()
                else:
                    i += 1
                continue
            for phrase, pat in pats:
                m = pat.match(s, i)
                if m:
                    out.append((i, m.end(), phrase))
                    i = m.end()
                    break
            else:
                i += 1
            continue
        i += 1
    return out


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split at top-level occurrences of a single-char separator."""
    parts, depth, start, i, n = [], 0, 0, 0, len(s)
    while i < n:
        c = s[i]
        if c in _QUOTES:
            end = _QUOTES[c]
            i += 1
            while i < n and s[i] != end:
                i += 2 if s[i] == "\\" and end != "`" else 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _parse_assignments(s: str) -> dict[str, str]:
    """``a = expr, b = expr`` -> {column: expression-string}. The LHS is
    an identifier (optionally backticked / alias-qualified); the split
    is at its FIRST top-level ``=`` so ``=`` inside the RHS expression
    (CASE WHEN x = 1 ...) is untouched."""
    out: dict[str, str] = {}
    for item in _split_top(s):
        depth, cut = 0, -1
        j = 0
        while j < len(item):
            c = item[j]
            if c in _QUOTES:
                end = _QUOTES[c]
                j += 1
                while j < len(item) and item[j] != end:
                    j += 1
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            elif c == "=" and depth == 0:
                # reject comparison spellings <= >= != == landing first
                if j and item[j - 1] in "<>!=":
                    raise SqlDmlError(f"malformed assignment: {item!r}")
                cut = j
                break
            j += 1
        if cut < 0:
            raise SqlDmlError(f"malformed assignment: {item!r}")
        col = item[:cut].strip().strip("`")
        if "." in col:  # strip a target-alias qualification
            col = col.rsplit(".", 1)[1].strip("`")
        if not col:
            raise SqlDmlError(f"malformed assignment: {item!r}")
        out[col] = item[cut + 1 :].strip()
    return out


_IDENT = r"(?:`[^`]+`|[A-Za-z_][\w$]*)(?:\.(?:`[^`]+`|[A-Za-z_][\w$]*))*"


def _parse_relation(s: str) -> tuple[str, str | None]:
    """``name [AS] [alias]`` -> (name, alias-or-None)."""
    m = re.fullmatch(
        rf"\s*({_IDENT})(?:\s+(?:AS\s+)?(`[^`]+`|[A-Za-z_]\w*))?\s*",
        s,
        re.I,
    )
    if not m:
        raise SqlDmlError(f"cannot parse table reference: {s!r}")
    alias = m.group(2)
    if alias and alias.upper() in ("SET", "WHERE", "VALUES", "SELECT"):
        raise SqlDmlError(f"cannot parse table reference: {s!r}")
    return m.group(1).replace("`", ""), alias.strip("`") if alias else None


def _strip_alias(cond: str, alias: str | None) -> str:
    """Rewrite ``alias.col`` -> ``col`` for single-table UPDATE/DELETE
    conditions (the executors evaluate against the bare table frame).
    Quote-aware: matches are located on the literal-masked text and
    spliced from the original, so an ``alias.`` sequence INSIDE a
    string literal survives (review r12: a blind re.sub silently
    rewrote ``WHERE u.name = 'u.name'`` into ``name = 'name'``)."""
    if not alias:
        return cond
    masked = _mask_literals(cond)
    out: list[str] = []
    last = 0
    for m in re.finditer(rf"\b{re.escape(alias)}\.", masked):
        out.append(cond[last : m.start()])
        last = m.end()
    if not out:
        return cond
    out.append(cond[last:])
    return "".join(out)


# -- statement executors -----------------------------------------------------


def _resolve(spark: SparkSession, name: str, registry_dir: str | None) -> str:
    return txn_catalog.resolve_table_name(
        _registry_dir(spark, registry_dir), name
    )


def _source_df(
    spark: SparkSession, src: str, registry_dir: str | None
) -> tuple[DataFrame, str | None]:
    """USING clause -> (DataFrame, declared alias). The source is a
    registered managed-table name, a Spark temp view / catalog table,
    or a parenthesized subquery."""
    src = src.strip()
    m = re.fullmatch(
        r"\((?P<sub>.*)\)\s*(?:AS\s+)?(?P<alias>`[^`]+`|[A-Za-z_]\w*)?\s*",
        src,
        re.I | re.S,
    )
    if m and m.group("sub"):
        sub_views: list[str] = []
        try:
            df = spark.sql(
                _rewrite_reads(spark, m.group("sub"), registry_dir, sub_views)
            )
        finally:
            for v in sub_views:
                spark.catalog.dropTempView(v)
        alias = (m.group("alias") or "").strip("`") or None
        return df, alias
    name, alias = _parse_relation(src)
    try:
        path = _resolve(spark, name, registry_dir)
        df = managed_table.read(spark, path)
    except (txn_catalog.TableNameError, ValueError):
        df = spark.table(name)
    return df, alias


def _merge(spark: SparkSession, body: str, registry_dir: str | None) -> None:
    marks = _scan(body, ["USING", "ON", "WHEN"])
    using = next((m for m in marks if m[2] == "USING"), None)
    on = next((m for m in marks if m[2] == "ON"), None)
    whens = [m for m in marks if m[2] == "WHEN"]
    if not (using and on and whens) or not (using[0] < on[0] < whens[0][0]):
        raise SqlDmlError(
            "MERGE needs: MERGE INTO <tgt> USING <src> ON <cond> WHEN ..."
        )
    tgt_name, tgt_alias = _parse_relation(body[: using[0]])
    src_df, src_alias = _source_df(
        spark, body[using[1] : on[0]], registry_dir
    )
    condition = body[on[1] : whens[0][0]].strip()

    dt = DeltaTable.forName(spark, tgt_name, registry_dir)
    if tgt_alias:
        dt = dt.alias(tgt_alias)
    if src_alias:
        src_df = src_df.alias(src_alias)
    mb = dt.merge(src_df, condition)

    for i, w in enumerate(whens):
        end = whens[i + 1][0] if i + 1 < len(whens) else len(body)
        clause = body[w[1] : end].strip().rstrip(";").strip()
        _apply_when(mb, clause)
    mb.execute()


_WHEN_KIND = re.compile(
    r"^(?P<kind>MATCHED|NOT\s+MATCHED(?:\s+BY\s+(?:TARGET|SOURCE))?)\b",
    re.I,
)


def _apply_when(mb, clause: str) -> None:
    km = _WHEN_KIND.match(clause)
    if not km:
        raise SqlDmlError(f"cannot parse WHEN clause: WHEN {clause!r}")
    kind = re.sub(r"\s+", " ", km.group("kind")).upper()
    rest = clause[km.end() :]
    # the THEN that ends the clause predicate is the first TOP-LEVEL
    # one — _scan is CASE-aware, so a `CASE ... THEN ... END` inside
    # the AND-condition never truncates the split (review r12; the old
    # lazy `(?P<cond>.*?)\s+THEN` regex stopped at CASE's THEN)
    thens = _scan(rest, ["THEN"])
    if not thens:
        raise SqlDmlError(f"cannot parse WHEN clause: WHEN {clause!r}")
    t0, t1, _ = thens[0]
    head = rest[:t0].strip()
    action = rest[t1:].strip()
    if head:
        am = re.match(r"AND\b(?P<cond>.*)$", head, re.I | re.S)
        if not am:
            raise SqlDmlError(f"cannot parse WHEN clause: WHEN {clause!r}")
        cond = am.group("cond").strip() or None
    else:
        cond = None
    au = action.upper()

    if kind == "MATCHED":
        if au.startswith("DELETE"):
            mb.whenMatchedDelete(condition=cond)
        elif re.match(r"UPDATE\s+SET\s+\*\s*$", action, re.I):
            mb.whenMatchedUpdateAll(condition=cond)
        elif au.startswith("UPDATE"):
            setpart = re.sub(r"^UPDATE\s+SET\s+", "", action, flags=re.I)
            mb.whenMatchedUpdate(condition=cond, set=_parse_assignments(setpart))
        else:
            raise SqlDmlError(f"WHEN MATCHED supports UPDATE/DELETE, got: {action!r}")
    elif kind in ("NOT MATCHED", "NOT MATCHED BY TARGET"):
        if re.match(r"INSERT\s+\*\s*$", action, re.I):
            mb.whenNotMatchedInsertAll(condition=cond)
        elif au.startswith("INSERT"):
            im = re.match(
                r"INSERT\s*\((?P<cols>[^)]*)\)\s*VALUES\s*\((?P<vals>.*)\)\s*$",
                action,
                re.I | re.S,
            )
            if not im:
                raise SqlDmlError(
                    f"WHEN NOT MATCHED INSERT needs `INSERT *` or "
                    f"`INSERT (cols) VALUES (exprs)`, got: {action!r}"
                )
            cols = [c.strip().strip("`") for c in _split_top(im.group("cols"))]
            vals = _split_top(im.group("vals"))
            if len(cols) != len(vals):
                raise SqlDmlError("INSERT column/value count mismatch")
            mb.whenNotMatchedInsert(
                condition=cond, values=dict(zip(cols, vals))
            )
        else:
            raise SqlDmlError(f"WHEN NOT MATCHED supports INSERT, got: {action!r}")
    else:  # NOT MATCHED BY SOURCE
        if au.startswith("DELETE"):
            mb.whenNotMatchedBySourceDelete(condition=cond)
        elif au.startswith("UPDATE"):
            setpart = re.sub(r"^UPDATE\s+SET\s+", "", action, flags=re.I)
            mb.whenNotMatchedBySourceUpdate(
                condition=cond, set=_parse_assignments(setpart)
            )
        else:
            raise SqlDmlError(
                f"WHEN NOT MATCHED BY SOURCE supports UPDATE/DELETE, got: {action!r}"
            )


def _update(spark: SparkSession, body: str, registry_dir: str | None) -> None:
    marks = _scan(body, ["SET", "WHERE"])
    set_m = next((m for m in marks if m[2] == "SET"), None)
    where_m = next((m for m in marks if m[2] == "WHERE"), None)
    if not set_m:
        raise SqlDmlError("UPDATE needs: UPDATE <tgt> SET c = e [WHERE cond]")
    name, alias = _parse_relation(body[: set_m[0]])
    set_end = where_m[0] if where_m else len(body)
    assigns = _parse_assignments(
        _strip_alias(body[set_m[1] : set_end].strip().rstrip(";"), alias)
    )
    cond = (
        _strip_alias(body[where_m[1] :].strip().rstrip(";"), alias)
        if where_m
        else None
    )
    dt = DeltaTable.forName(spark, name, registry_dir)
    dt.update(condition=cond, set=assigns)


def _delete(spark: SparkSession, body: str, registry_dir: str | None) -> None:
    marks = _scan(body, ["WHERE"])
    where_m = marks[0] if marks else None
    name, alias = _parse_relation(body[: where_m[0]] if where_m else body)
    cond = (
        _strip_alias(body[where_m[1] :].strip().rstrip(";"), alias)
        if where_m
        else None
    )
    DeltaTable.forName(spark, name, registry_dir).delete(condition=cond)


def _insert(
    spark: SparkSession,
    body: str,
    registry_dir: str | None,
    overwrite: bool,
) -> None:
    m = re.match(
        rf"\s*({_IDENT})\s*(?:\((?P<cols>[^)]*)\))?\s*(?P<rest>.*)$",
        body,
        re.S,
    )
    if not m or not m.group("rest").strip():
        raise SqlDmlError(
            "INSERT needs: INSERT INTO <tgt> [(cols)] VALUES ... | SELECT ..."
        )
    name = m.group(1).replace("`", "")
    declared = (
        [c.strip().strip("`") for c in _split_top(m.group("cols"))]
        if m.group("cols")
        else None
    )
    rest = m.group("rest").strip().rstrip(";").strip()
    path = _resolve(spark, name, registry_dir)
    table_schema = managed_table.read(spark, path).schema

    if re.match(r"VALUES\b", rest, re.I):
        rows_sql = rest[len("VALUES") :].strip()
        cols = declared or [f.name for f in table_schema.fields]
        named = ", ".join(f"`{c}`" for c in cols)
        df = spark.sql(f"SELECT * FROM (VALUES {rows_sql}) AS __v({named})")
    elif re.match(r"SELECT\b|WITH\b|\(", rest, re.I):
        # single-layer paren unwrap via the balanced matcher —
        # str.strip("()") eats EVERY edge paren and turns
        # `(SELECT id FROM range(10))` into unbalanced SQL (review r12)
        if rest.startswith("(") and _balanced(rest, 0) == len(rest):
            rest = rest[1:-1].strip()
        ins_views: list[str] = []
        try:
            df = spark.sql(_rewrite_reads(
                spark,
                rest,
                registry_dir,
                ins_views,
            ))
        finally:
            for v in ins_views:
                spark.catalog.dropTempView(v)
        cols = declared or [f.name for f in table_schema.fields]
        if len(df.columns) != len(cols):
            raise SqlDmlError(
                f"INSERT SELECT produces {len(df.columns)} columns, "
                f"target list has {len(cols)}"
            )
        df = df.toDF(*cols)  # SQL INSERT maps by POSITION
    else:
        raise SqlDmlError(f"INSERT source must be VALUES or SELECT, got: {rest!r}")

    # fill omitted columns with typed NULLs (ANSI INSERT with a column
    # list), and cast the provided ones to the table's exact types so
    # VALUES literals (e.g. INT for a BIGINT column) land enforceable
    by_name = {f.name: f for f in table_schema.fields}
    missing = [f.name for f in table_schema.fields if f.name not in df.columns]
    unknown = [c for c in df.columns if c not in by_name]
    if unknown:
        raise SqlDmlError(f"INSERT names unknown column(s) {unknown} for {name}")
    sel = [
        F.col(f.name).cast(f.dataType) if f.name in df.columns
        else F.lit(None).cast(f.dataType).alias(f.name)
        for f in table_schema.fields
    ]
    df = df.select(*sel)

    if overwrite:
        marker = managed_table._read_marker(path)
        managed_table.commit_overwrite(
            df,
            path,
            keys=marker.get("keys", ()),
            partition_by=marker.get("partition_by", ()),
        )
    else:
        managed_table.append_rows(spark, df, path)


# -- DDL / utility commands ---------------------------------------------------


def _parse_literal(s: str):
    """SQL literal -> Python: 'str' | number | true/false."""
    s = s.strip()
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        return s[1:-1]
    low = s.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    try:
        return int(s)
    except ValueError:
        pass
    try:
        return float(s)
    except ValueError:
        return s


def _parse_props(body: str) -> dict:
    """``k = v, 'k2' = v2`` -> dict with literal values."""
    out = {}
    for item in _split_top(body):
        k, _eq, v = item.partition("=")
        if not _eq:
            raise SqlDmlError(f"malformed property: {item!r}")
        key = _parse_literal(k)
        out[str(key)] = _parse_literal(v)
    return out


_CREATE_HEAD_RE = re.compile(
    r"CREATE\s+(?P<replace>OR\s+REPLACE\s+)?TABLE\s+"
    r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>" + _IDENT + r")\s*\(",
    re.I | re.S,
)

_CREATE_NOPAREN_RE = re.compile(
    r"CREATE\s+(?P<replace>OR\s+REPLACE\s+)?TABLE\s+"
    r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>" + _IDENT + r")",
    re.I | re.S,
)


def _parse_table_options(rest: str, marks) -> dict:
    """USING / PARTITIONED BY / CLUSTER BY / LOCATION / TBLPROPERTIES /
    COMMENT clause values for the column-list-free CREATE forms."""
    out: dict = {
        "partition_by": [], "cluster_by": [], "location": None,
        "props": {}, "comment": None,
    }
    for i, (_s0, s1, kw) in enumerate(marks):
        end = marks[i + 1][0] if i + 1 < len(marks) else len(rest)
        arg = rest[s1:end].strip()
        if kw == "USING":
            if arg.lower() not in ("delta", "managed_table", "parquet"):
                raise SqlDmlError(f"USING {arg}: unsupported table format")
        elif kw == "PARTITIONED BY":
            out["partition_by"] = [
                c.strip("` ") for c in _split_top(arg.strip("()"))
            ]
        elif kw == "CLUSTER BY":
            out["cluster_by"] = [
                c.strip("` ") for c in _split_top(arg.strip("()"))
            ]
        elif kw == "LOCATION":
            out["location"] = str(_parse_literal(arg))
        elif kw == "TBLPROPERTIES":
            out["props"] = dict(_parse_props(arg.strip("()")))
        elif kw == "COMMENT":
            out["comment"] = str(_parse_literal(arg))
    return out


def _refuse_view_target(registry: str, name: str) -> None:
    """Raise when ``name`` is bound to a VIEW: every CREATE-TABLE shape
    (column-list DDL, CTAS, CLONE) must refuse BEFORE any data or
    binding work — a view can never become a table implicitly."""
    try:
        entry = txn_catalog.resolve_entry(registry, name)
    except txn_catalog.TableNameError:
        return
    if "view_sql" in entry:
        raise SqlDmlError(
            f"{name!r} is a registered VIEW — a table cannot be "
            "created under a view name (DROP VIEW first)"
        )


def _table_placement(
    spark: SparkSession,
    name: str,
    location: str | None,
    registry_dir: str | None,
):
    """(path, bind) for creating a table under a registry name — same
    placement + put-if-absent binding rules as
    ``DeltaTableBuilder.execute`` (managed placement under the
    registry's warehouse dir when no LOCATION; a name already bound to
    a DIFFERENT path refuses)."""
    registry = _registry_dir(spark, registry_dir)
    try:
        bound = txn_catalog.resolve_table_name(registry, name)
    except txn_catalog.TableNameError:
        # distinguish "unbound" from "bound to a VIEW": resolve raises
        # the same error type for both, and treating a view as unbound
        # would let CTAS write a whole snapshot before failing at bind
        # time (orphaned data, late error) — refuse upfront instead
        _refuse_view_target(registry, name)
        bound = None
    path = location or bound or os.path.join(registry, "tables", name)
    if bound is not None and os.path.abspath(bound) != os.path.abspath(path):
        raise SqlDmlError(
            f"table name {name!r} is already bound to {bound} — it cannot "
            f"also be created at {path}"
        )

    def bind() -> None:
        if bound == path:
            return
        try:
            txn_catalog.register_table_name(registry, name, path)
        except txn_catalog.TableNameError:
            other = txn_catalog.resolve_table_name(registry, name)
            if os.path.abspath(other) != os.path.abspath(path):
                raise

    return path, bind


def _ctas(
    spark: SparkSession,
    nm: re.Match,
    tail: str,
    registry_dir: str | None,
) -> None:
    """CREATE TABLE ... AS <query> (CTAS / CREATE OR REPLACE ... AS):
    evaluate the query (time-travel pins on registry names honored) and
    commit it as the table's first (or replacing) snapshot through
    ``commit_overwrite`` — constraints, CDF, properties and OCC all
    apply as on any other commit."""
    marks = _scan(
        tail,
        ["USING", "PARTITIONED BY", "CLUSTER BY", "LOCATION",
         "TBLPROPERTIES", "COMMENT", "AS"],
    )
    as_m = next(
        (
            x for x in marks
            if x[2] == "AS"
            and re.match(r"\s*(SELECT|WITH|VALUES|TABLE|\()", tail[x[1]:], re.I)
        ),
        None,
    )
    if as_m is None:
        raise SqlDmlError(
            "CREATE TABLE needs a column list, AS <query> (CTAS), or "
            "[SHALLOW] CLONE <src>"
        )
    opts = _parse_table_options(
        tail[: as_m[0]], [x for x in marks if x[0] < as_m[0] and x[2] != "AS"]
    )
    if opts["partition_by"] and opts["cluster_by"]:
        raise SqlDmlError(
            "CLUSTER BY and PARTITIONED BY are mutually exclusive "
            "(Delta's liquid-clustering rule)"
        )
    name = nm.group("name").replace("`", "")
    path, bind = _table_placement(spark, name, opts["location"], registry_dir)
    exists = managed_table.is_table(spark, path)
    if exists and not nm.group("replace"):
        if nm.group("ine"):
            bind()
            return
        raise SqlDmlError(f"{path} is already a managed table")
    ctas_views: list[str] = []
    try:
        df = spark.sql(_rewrite_reads(spark, tail[as_m[1]:].strip(),
                                      registry_dir, ctas_views))
    finally:
        for v in ctas_views:
            spark.catalog.dropTempView(v)
    props = dict(opts["props"])
    if opts["comment"] is not None:
        props["comment"] = opts["comment"]
    if opts["cluster_by"]:
        props["autoOptimize"] = {
            "columns": opts["cluster_by"], "max_avg_depth": 2.0,
        }
    managed_table.commit_overwrite(
        df,
        path,
        partition_by=opts["partition_by"] or (),
        properties=props or None,
        schema_mode="overwrite",
    )
    bind()


def _clone_table_sql(
    spark: SparkSession,
    nm: re.Match,
    rest: str,
    kind: str,
    registry_dir: str | None,
) -> None:
    """CREATE TABLE dst [SHALLOW] CLONE src [LOCATION '...'] —
    zero-copy clone via ``managed_table.clone_table`` (hardlinked
    snapshot, fresh history). DEEP is refused rather than silently
    aliased: snapshots are immutable, so SHALLOW already yields a fully
    independent table and a byte-copying DEEP would only burn storage."""
    if kind == "DEEP":
        raise SqlDmlError(
            "DEEP CLONE is not supported: snapshots are immutable, so "
            "SHALLOW CLONE already yields a fully independent table"
        )
    if nm.group("replace"):
        raise SqlDmlError(
            "CREATE OR REPLACE ... CLONE is not supported — clone to a "
            "fresh name/location"
        )
    m = re.match(rf"(?P<src>{_IDENT})\s*(?P<rest>.*)$", rest, re.S)
    if not m:
        raise SqlDmlError(f"cannot parse CLONE source: {rest!r}")
    extra = m.group("rest").strip()
    if re.search(r"(VERSION|TIMESTAMP)\s+AS\s+OF", extra, re.I):
        raise SqlDmlError(
            "CLONE pins the live snapshot; RESTORE the source to the "
            "wanted version first for a historical clone"
        )
    location = None
    if extra:
        lm = re.fullmatch(r"LOCATION\s+('[^']*')", extra, re.I)
        if not lm:
            raise SqlDmlError(f"cannot parse CLONE options: {extra!r}")
        location = str(_parse_literal(lm.group(1)))
    src_path = _resolve(spark, m.group("src").replace("`", ""), registry_dir)
    name = nm.group("name").replace("`", "")
    path, bind = _table_placement(spark, name, location, registry_dir)
    if managed_table.is_table(spark, path):
        if nm.group("ine"):
            bind()
            return
        raise SqlDmlError(f"{path} is already a managed table")
    managed_table.clone_table(src_path, path)
    bind()


def _balanced(s: str, open_idx: int) -> int:
    """Index just past the ``)`` matching the ``(`` at ``open_idx``
    (quote-aware); -1 when unbalanced."""
    depth, i, n = 0, open_idx, len(s)
    while i < n:
        c = s[i]
        if c in _QUOTES:
            end = _QUOTES[c]
            i += 1
            while i < n and s[i] != end:
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return -1


def _create_table(spark: SparkSession, stmt: str, registry_dir: str | None):
    from .delta_api import DeltaTable

    m = _CREATE_HEAD_RE.match(stmt)
    close = _balanced(stmt, m.end() - 1) if m else -1
    if not m or close < 0:
        nm = _CREATE_NOPAREN_RE.match(stmt)
        if nm:
            tail = stmt[nm.end() :].rstrip(";").strip()
            cm = re.match(r"(?:(SHALLOW|DEEP)\s+)?CLONE\b", tail, re.I)
            if cm:
                return _clone_table_sql(
                    spark, nm, tail[cm.end() :].strip(),
                    (cm.group(1) or "SHALLOW").upper(), registry_dir,
                )
            return _ctas(spark, nm, tail, registry_dir)
        raise SqlDmlError(
            "CREATE TABLE needs: CREATE [OR REPLACE] TABLE [IF NOT EXISTS] "
            "<name> (col type [GENERATED ALWAYS AS (expr)], ...) "
            "[USING delta] [PARTITIONED BY (...)] [CLUSTER BY (...)] "
            "[LOCATION '...'] [TBLPROPERTIES (...)] [COMMENT '...'] — "
            "or the column-list-free forms ... AS <query> (CTAS) and "
            "... [SHALLOW] CLONE <src>"
        )
    cols_body = stmt[m.end() : close - 1]
    rest_body = stmt[close:]
    # view-bound names refuse here too (the builder has its own guard,
    # but this one raises the front-end's error type)
    _refuse_view_target(
        _registry_dir(spark, registry_dir), m.group("name").replace("`", "")
    )
    if m.group("replace"):
        builder = DeltaTable.createOrReplace(spark)
    elif m.group("ine"):
        builder = DeltaTable.createIfNotExists(spark)
    else:
        builder = DeltaTable.create(spark)
    builder = builder.tableName(m.group("name").replace("`", ""))
    for coldef in _split_top(cols_body):
        cm = re.match(
            r"(`[^`]+`|\w+)\s+(\w+(?:\s*\(\s*\d+\s*(?:,\s*\d+\s*)?\))?)"
            r"(?:\s+GENERATED\s+ALWAYS\s+AS\s*\((?P<gen>.+)\))?\s*$",
            coldef.strip(),
            re.I,
        )
        if not cm:
            raise SqlDmlError(
                f"cannot parse column definition: {coldef!r} (column "
                "DEFAULTs are added post-create via ALTER TABLE ... ADD "
                "COLUMN ... DEFAULT)"
            )
        builder = builder.addColumn(
            cm.group(1).strip("`"),
            cm.group(2).lower(),
            generatedAlwaysAs=cm.group("gen"),
        )
    rest = rest_body.rstrip(";").strip()
    # one clause grammar for every CREATE form: the column-list shape
    # maps _parse_table_options' dict onto the builder instead of
    # re-implementing the keyword loop (review r12 — the two parsers
    # had already started to drift)
    opts = _parse_table_options(
        rest,
        _scan(
            rest,
            ["USING", "PARTITIONED BY", "CLUSTER BY", "LOCATION",
             "TBLPROPERTIES", "COMMENT"],
        ),
    )
    if opts["partition_by"]:
        builder = builder.partitionedBy(*opts["partition_by"])
    if opts["cluster_by"]:
        builder = builder.clusterBy(*opts["cluster_by"])
    if opts["location"]:
        builder = builder.location(opts["location"])
    for k, v in opts["props"].items():
        builder = builder.property(k, v)
    if opts["comment"]:
        builder = builder.comment(opts["comment"])
    builder.execute()


def _alter_table(spark: SparkSession, body: str, registry_dir: str | None):
    m = re.match(rf"\s*({_IDENT})\s+(?P<rest>.*)$", body, re.S)
    if not m:
        raise SqlDmlError(f"cannot parse ALTER TABLE target: {body!r}")
    path = _resolve(spark, m.group(1).replace("`", ""), registry_dir)
    rest = m.group("rest").rstrip(";").strip()
    am = re.match(
        r"ADD\s+COLUMNS?\s*\((?P<cols>.*)\)\s*$", rest, re.I | re.S
    )
    if am:
        for coldef in _split_top(am.group("cols")):
            cm = re.match(
                r"(`[^`]+`|\w+)\s+(\w+)(?:\s+DEFAULT\s+(?P<dflt>.+))?\s*$",
                coldef.strip(),
                re.I,
            )
            if not cm:
                raise SqlDmlError(f"cannot parse column: {coldef!r}")
            managed_table.add_column(
                spark, path, cm.group(1).strip("`"), cm.group(2).lower(),
                default=_parse_literal(cm.group("dflt"))
                if cm.group("dflt") else None,
            )
        return
    pm = re.match(
        r"SET\s+TBLPROPERTIES\s*\((?P<props>.*)\)\s*$", rest, re.I | re.S
    )
    if pm:
        for k, v in _parse_props(pm.group("props")).items():
            managed_table.set_table_property(path, k, v)
        return
    rm = re.match(
        r"RENAME\s+COLUMN\s+(`[^`]+`|\w+)\s+TO\s+(`[^`]+`|\w+)\s*$",
        rest, re.I,
    )
    if rm:
        managed_table.rename_column(
            spark, path, rm.group(1).strip("`"), rm.group(2).strip("`")
        )
        return
    dm = re.match(r"DROP\s+COLUMN\s+(`[^`]+`|\w+)\s*$", rest, re.I)
    if dm:
        managed_table.drop_column(spark, path, dm.group(1).strip("`"))
        return
    acm = re.match(
        r"ADD\s+CONSTRAINT\s+(`[^`]+`|\w+)\s+CHECK\s*\((?P<expr>.+)\)\s*$",
        rest,
        re.I | re.S,
    )
    if acm:
        managed_table.add_constraint(
            spark, path, acm.group(1).strip("`"), acm.group("expr").strip()
        )
        return
    dcm = re.match(r"DROP\s+CONSTRAINT\s+(`[^`]+`|\w+)\s*$", rest, re.I)
    if dcm:
        managed_table.drop_constraint(path, dcm.group(1).strip("`"))
        return
    raise SqlDmlError(
        "ALTER TABLE supports ADD COLUMN(S) / SET TBLPROPERTIES / "
        "RENAME COLUMN / DROP COLUMN / ADD CONSTRAINT ... CHECK (...) / "
        f"DROP CONSTRAINT, got: {rest!r}"
    )


def _optimize(spark: SparkSession, body: str, registry_dir: str | None):
    from .delta_api import DeltaTable

    marks = _scan(body, ["WHERE", "ZORDER BY"])
    where_m = next((x for x in marks if x[2] == "WHERE"), None)
    z_m = next((x for x in marks if x[2] == "ZORDER BY"), None)
    name_end = min([x[0] for x in marks], default=len(body))
    name, _alias = _parse_relation(body[:name_end].rstrip(";").strip() or body)
    b = DeltaTable.forName(spark, name, registry_dir).optimize()
    if where_m:
        w_end = z_m[0] if z_m and z_m[0] > where_m[0] else len(body)
        b = b.where(body[where_m[1] : w_end].rstrip(";").strip())
    if z_m:
        cols = body[z_m[1] :].rstrip(";").strip().strip("()")
        return b.executeZOrderBy(*[c.strip("` ") for c in _split_top(cols)])
    return b.executeCompaction()


def sql_command(
    spark: SparkSession, statement: str, registry_dir: str | None = None
):
    """DDL / utility verbs of the Delta SQL surface (split from
    :func:`sql` so callers can see DML vs command intent; :func:`sql`
    routes here automatically)."""
    stmt = statement.strip()
    m = re.match(r"CREATE\s+(OR\s+REPLACE\s+)?TABLE\b", stmt, re.I)
    if m:
        return _create_table(spark, stmt, registry_dir)
    m = re.match(r"ALTER\s+TABLE\b", stmt, re.I)
    if m:
        return _alter_table(spark, stmt[m.end() :], registry_dir)
    m = re.match(r"DESCRIBE\s+(HISTORY|DETAIL)\b", stmt, re.I)
    if m:
        from .delta_api import DeltaTable

        name, _a = _parse_relation(stmt[m.end() :].rstrip(";").strip())
        dt = DeltaTable.forName(spark, name, registry_dir)
        return dt.history() if m.group(1).upper() == "HISTORY" else dt.detail()
    m = re.match(r"OPTIMIZE\b", stmt, re.I)
    if m:
        return _optimize(spark, stmt[m.end() :], registry_dir)
    m = re.match(r"VACUUM\b", stmt, re.I)
    if m:
        from .delta_api import DeltaTable

        body = stmt[m.end() :].rstrip(";").strip()
        vm = re.match(
            rf"({_IDENT})(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?"
            r"(\s+DRY\s+RUN)?\s*$",
            body,
            re.I,
        )
        if not vm:
            raise SqlDmlError(f"cannot parse VACUUM: {body!r}")
        dt = DeltaTable.forName(
            spark, vm.group(1).replace("`", ""), registry_dir
        )
        return dt.vacuum(
            retentionHours=float(vm.group(2)) if vm.group(2) else 168.0,
            dry_run=bool(vm.group(3)),
        )
    m = re.match(
        rf"RESTORE\s+(?:TABLE\s+)?({_IDENT})\s+TO\s+"
        r"(?:VERSION\s+AS\s+OF\s+(?P<ver>\d+)"
        r"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')\s*;?\s*$",
        stmt,
        re.I,
    )
    if m:
        path = _resolve(spark, m.group(1).replace("`", ""), registry_dir)
        if m.group("ver") is not None:
            version = int(m.group("ver"))
        else:
            version = managed_table.version_as_of(
                path, _parse_ts_utc(m.group("ts"))
            )
        return managed_table.restore_table(spark, path, version)
    m = re.match(
        rf"ANALYZE\s+TABLE\s+({_IDENT})\s+COMPUTE\s+STATISTICS"
        rf"(?:\s+FOR\s+COLUMNS\s+(?P<cols>[^;]+))?\s*;?\s*$",
        stmt,
        re.I,
    )
    if m:
        # maps onto the engine's skipping indexes: plain COMPUTE
        # STATISTICS refreshes the zone-map stats manifest over every
        # primitive column; FOR COLUMNS narrows the zone maps to the
        # named columns AND builds bloom filters on them
        from pyspark.sql.types import AtomicType

        from .layout import update_bloom_manifest, update_stats_manifest

        path = _resolve(spark, m.group(1).replace("`", ""), registry_dir)

        def _refresh() -> None:
            if m.group("cols"):
                cols = [
                    c.strip().strip("`") for c in _split_top(m.group("cols"))
                ]
                update_stats_manifest(path, cols)
                update_bloom_manifest(spark, path, cols)
            else:
                schema = managed_table.read(spark, path).schema
                cols = [
                    f.name for f in schema.fields
                    if isinstance(f.dataType, AtomicType)
                ]
                update_stats_manifest(path, cols)

        # state-token re-verify (advice r11): a concurrent rewriting
        # commit's swap can interleave so this refresh clobbers the
        # manifest the commit just rebuilt with one derived from the
        # pre-swap listing. Skipping is fail-open so correctness holds
        # either way, but the commit-time freshness guarantee would be
        # silently lost — re-derive from the post-swap snapshot when
        # the (version, commit-ts) token moved mid-refresh. Token
        # verification beats holding the commit lock here: a bloom
        # build is a full Spark scan that could outlive the lock's
        # stale-steal window on a large table.
        for _ in range(5):
            token = managed_table._table_state_token(path)
            _refresh()
            if managed_table._table_state_token(path) == token:
                break
        return None
    m = re.match(
        rf"COPY\s+INTO\s+(?P<name>{_IDENT})\s+FROM\s+(?P<src>'[^']*')\s*"
        r"(?:FILEFORMAT\s*=\s*(?P<fmt>\w+))?\s*"
        r"(?:PATTERN\s*=\s*(?P<pat>'[^']*'))?\s*"
        r"(?:FORMAT_OPTIONS\s*\((?P<opts>[^)]*)\))?\s*;?\s*$",
        stmt,
        re.I | re.S,
    )
    if m:
        from .copy_into import copy_into

        path = _resolve(spark, m.group("name").replace("`", ""), registry_dir)
        return copy_into(
            spark,
            path,
            str(_parse_literal(m.group("src"))),
            file_format=(m.group("fmt") or "parquet").lower(),
            pattern=(
                str(_parse_literal(m.group("pat"))) if m.group("pat") else None
            ),
            format_options=(
                {
                    str(k): str(v)
                    for k, v in _parse_props(m.group("opts")).items()
                }
                if m.group("opts")
                else None
            ),
        )
    m = re.match(rf"TRUNCATE\s+TABLE\s+({_IDENT})\s*;?\s*$", stmt, re.I)
    if m:
        from .delta_api import DeltaTable

        DeltaTable.forName(
            spark, m.group(1).replace("`", ""), registry_dir
        ).delete(None)
        return None
    m = re.match(
        rf"SHOW\s+TABLES(?:\s+(?:IN|FROM)\s+({_IDENT}))?\s*;?\s*$", stmt, re.I
    )
    if m:
        registry = _registry_dir(spark, registry_dir)
        names = sorted(txn_catalog.list_table_names(registry)) + sorted(
            txn_catalog.list_view_names(registry)
        )
        want_db = m.group(1).replace("`", "") if m.group(1) else None
        rows = []
        for n in names:
            db, _, tbl = n.rpartition(".")
            if want_db is None or db == want_db:
                rows.append((db, tbl, False))
        return spark.createDataFrame(
            rows or [],
            "namespace string, tableName string, isTemporary boolean",
        )
    m = re.match(
        rf"CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(?P<name>{_IDENT})\s+AS\s+"
        r"(?P<body>.+?)\s*;?\s*$",
        stmt,
        re.I | re.S,
    )
    if m:
        name = m.group("name").replace("`", "")
        body = m.group("body").strip()
        # eager validation (Delta/metastore behavior): the SELECT must
        # analyze NOW against the live registry — a typo'd column or
        # unknown table fails the CREATE, not every later read
        probe_views: list[str] = []
        try:
            spark.sql(_rewrite_reads(spark, body, registry_dir, probe_views))
        finally:
            for v in probe_views:
                spark.catalog.dropTempView(v)
        txn_catalog.register_view_name(
            _registry_dir(spark, registry_dir),
            name,
            body,
            replace=bool(m.group(1)),
        )
        return None
    m = re.match(
        rf"DROP\s+VIEW\s+(IF\s+EXISTS\s+)?({_IDENT})\s*;?\s*$", stmt, re.I
    )
    if m:
        name = m.group(2).replace("`", "")
        try:
            txn_catalog.unregister_view_name(
                _registry_dir(spark, registry_dir), name
            )
        except txn_catalog.TableNameError as e:
            if not m.group(1) or "is a registered TABLE" in str(e):
                raise SqlDmlError(f"DROP VIEW: {e}") from None
        return None
    m = re.match(
        rf"DESCRIBE\s+(?:TABLE\s+)?({_IDENT})\s*;?\s*$", stmt, re.I
    )
    if m:
        try:
            path = _resolve(spark, m.group(1).replace("`", ""), registry_dir)
        except txn_catalog.TableNameError:
            # not a registry name — Spark's own catalog may describe it
            # (temp views, catalog tables); review r12: raising here
            # broke the module's names-fall-through contract
            return spark.sql(stmt)
        fields = managed_table.read(spark, path).schema.fields
        return spark.createDataFrame(
            [(f.name, f.dataType.simpleString(), None) for f in fields],
            "col_name string, data_type string, comment string",
        )
    m = re.match(
        rf"DROP\s+TABLE\s+(IF\s+EXISTS\s+)?({_IDENT})\s*;?\s*$", stmt, re.I
    )
    if m:
        # external-location semantics (every managed table here is
        # path-backed): DROP removes the NAME BINDING only; the data
        # stays on disk for forPath/vacuum. Delta behaves the same for
        # external tables.
        name = m.group(2).replace("`", "")
        try:
            txn_catalog.unregister_table_name(
                _registry_dir(spark, registry_dir), name
            )
        except txn_catalog.TableNameError as e:
            # IF EXISTS forgives a MISSING name only; a view binding is
            # the wrong verb regardless (Spark/Delta: use DROP VIEW)
            if "is a registered VIEW" in str(e):
                raise SqlDmlError(f"DROP TABLE: {e}") from None
            if not m.group(1):
                raise SqlDmlError(
                    f"DROP TABLE: no such table {name!r}"
                ) from None
        return None
    m = re.match(
        rf"SHOW\s+CREATE\s+TABLE\s+({_IDENT})\s*;?\s*$", stmt, re.I
    )
    if m:
        name = m.group(1).replace("`", "")
        try:
            path = _resolve(spark, name, registry_dir)
        except txn_catalog.TableNameError:
            return spark.sql(stmt)  # Spark's catalog may know the name
        marker = managed_table._read_marker(path) or {}
        fields = managed_table.read(spark, path).schema.fields
        cols = ",\n".join(
            f"  `{f.name}` {f.dataType.simpleString().upper()}"
            for f in fields
        )
        lines = [f"CREATE TABLE {name} (\n{cols}\n)", "USING delta"]
        part = marker.get("partition_by") or []
        if part:
            lines.append(
                "PARTITIONED BY (" + ", ".join(f"`{c}`" for c in part) + ")"
            )
        props = marker.get("properties") or {}
        if props:
            import json as _json

            kv = ", ".join(
                f"'{k}' = '{v if isinstance(v, str) else _json.dumps(v)}'"
                for k, v in sorted(props.items())
            )
            lines.append(f"TBLPROPERTIES ({kv})")
        lines.append(f"LOCATION '{path}'")
        return spark.createDataFrame(
            [("\n".join(lines),)], "createtab_stmt string"
        )
    m = re.match(rf"SHOW\s+TBLPROPERTIES\s+({_IDENT})\s*;?\s*$", stmt, re.I)
    if m:
        try:
            path = _resolve(spark, m.group(1).replace("`", ""), registry_dir)
        except txn_catalog.TableNameError:
            return spark.sql(stmt)  # Spark's catalog may know the name
        props = (managed_table._read_marker(path) or {}).get(
            "properties"
        ) or {}
        import json as _json

        rows = [
            (k, v if isinstance(v, str) else _json.dumps(v))
            for k, v in sorted(props.items())
        ]
        return spark.createDataFrame(rows or [], "key string, value string")
    m = re.match(rf"SHOW\s+PARTITIONS\s+({_IDENT})\s*;?\s*$", stmt, re.I)
    if m:
        from urllib.parse import unquote

        from .maintenance import _hive_partition_dirs

        try:
            path = _resolve(spark, m.group(1).replace("`", ""), registry_dir)
        except txn_catalog.TableNameError:
            return spark.sql(stmt)  # Spark's catalog may know the name
        managed_table.recover(path)
        pby = (managed_table._read_marker(path) or {}).get(
            "partition_by"
        ) or []
        if not pby:
            raise SqlDmlError("SHOW PARTITIONS: table is not partitioned")
        rows = []
        for d in _hive_partition_dirs(path, tuple(pby)).values():
            rel = os.path.relpath(d, path).split(os.sep)
            vals = [unquote(seg.split("=", 1)[1]) for seg in rel]
            rows.append(
                tuple(
                    None if v == "__HIVE_DEFAULT_PARTITION__" else v
                    for v in vals
                )
            )
        # partition values come back as STRINGS (the on-disk Hive
        # rendering) — typed reads go through the table scan itself
        return spark.createDataFrame(
            sorted(rows, key=lambda t: tuple("" if v is None else v
                                             for v in t)),
            ", ".join(f"`{c}` string" for c in pby),
        )
    m = re.match(
        rf"REORG\s+TABLE\s+({_IDENT})\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$",
        stmt,
        re.I,
    )
    if m:
        from .maintenance import materialize_deletes

        path = _resolve(spark, m.group(1).replace("`", ""), registry_dir)
        return materialize_deletes(spark, path)
    if re.match(r"(DESCRIBE|DESC|SHOW)\b", stmt, re.I):
        # metadata verbs we don't model (DESCRIBE QUERY/FUNCTION, SHOW
        # DATABASES/FUNCTIONS/...) — Spark's own catalog serves them
        return spark.sql(stmt)
    raise SqlDmlError(f"unsupported command: {stmt.split()[0] if stmt else ''}")


_COMMAND_RE = re.compile(
    r"(CREATE\s+(OR\s+REPLACE\s+)?TABLE|ALTER\s+TABLE|"
    r"DESCRIBE|OPTIMIZE|VACUUM|RESTORE|"
    r"TRUNCATE\s+TABLE|SHOW\s+TBLPROPERTIES|SHOW\s+PARTITIONS|"
    r"SHOW\s+TABLES|DROP\s+TABLE|SHOW\s+CREATE\s+TABLE|"
    r"CREATE\s+(OR\s+REPLACE\s+)?VIEW|DROP\s+VIEW|ANALYZE\s+TABLE|"
    r"REORG\s+TABLE|COPY\s+INTO)\b",
    re.I,
)


# -- passthrough reads: quote-aware reference rewriting ----------------------
#
# Passthrough SELECTs resolve four reference shapes against the name
# registry, each spliced out as a per-statement temp view (dropped by
# sql() after spark.sql's EAGER analysis inlines them into the plan):
#   FROM t VERSION|TIMESTAMP AS OF pin      -> read(version=)/read_as_of
#   FROM t$files|$partitions|$snapshots     -> metadata_tables
#   FROM table_changes('t', from[, to])     -> CDF feed (Delta's TVF)
#   FROM t                                  -> live snapshot (bare name,
#                                              the Athena idiom) via
#                                              managed_table.read — DV
#                                              anti-join, row tracking,
#                                              column mapping all honored
# All matching runs on a LITERAL-MASKED copy of the statement so text
# inside '...'/"..." strings can never be rewritten; group text is
# pulled from the ORIGINAL by span (a TVF's name arg IS a literal).


def _parse_ts_utc(text: str) -> float:
    """ISO-8601 timestamp literal -> unix seconds, interpreting a
    NAIVE timestamp as UTC — the engine pins the session timezone to
    UTC (CLAUDE.md trap 11), so SQL timestamp literals must mean the
    same instant on every driver host. ``fromisoformat().timestamp()``
    alone would read a naive stamp in the HOST's local zone (and pick
    a DST fold arbitrarily), mapping the same statement to different
    versions depending on where the driver runs. Explicit offsets are
    honored as written. Unparseable text raises :class:`SqlDmlError`
    (the module's error contract), never a bare ValueError."""
    import datetime as _dt

    try:
        dt = _dt.datetime.fromisoformat(text)
    except ValueError:
        raise SqlDmlError(
            f"cannot parse timestamp literal {text!r} — use ISO-8601 "
            "(e.g. '2026-08-16T12:00:00', naive = UTC)"
        ) from None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=_dt.timezone.utc)
    return dt.timestamp()


def _mask_literals(s: str) -> str:
    """Copy of ``s`` with the interior of ``'...'``/``"..."`` string
    literals replaced by ``\\x00`` (positions preserved). Backtick
    identifiers stay visible — they are legitimate table references."""
    out = list(s)
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c in ("'", '"'):
            j = i + 1
            while j < n and s[j] != c:
                j += 2 if s[j] == "\\" else 1
            for k in range(i + 1, min(j, n)):
                out[k] = "\x00"
            i = j + 1
        elif c == "`":
            j = i + 1
            while j < n and s[j] != "`":
                j += 1
            i = j + 1
        else:
            i += 1
    return "".join(out)


def _sub_refs(pattern: re.Pattern, stmt: str, repl) -> str:
    """Regex substitution that never fires inside string literals:
    iterate matches over the masked text, splice replacements into the
    original. ``repl(match, stmt, masked)`` returns the replacement
    string or None to leave that segment untouched; it must take group
    TEXT from ``stmt`` by span, not from the (masked) match object
    (``masked`` is for position-based lookahead, e.g. alias
    detection)."""
    masked = _mask_literals(stmt)
    out: list[str] = []
    last = 0
    for m in pattern.finditer(masked):
        rep = repl(m, stmt, masked)
        if rep is None:
            continue
        out.append(stmt[last : m.start()])
        out.append(rep)
        last = m.end()
    if not out:
        return stmt
    out.append(stmt[last:])
    return "".join(out)


def _ref_view(df: DataFrame, prefix: str, views: list[str] | None) -> str:
    import uuid as _uuid

    view = f"{prefix}_{_uuid.uuid4().hex[:10]}"
    df.createOrReplaceTempView(view)
    if views is not None:
        views.append(view)
    return view


def _last_segment(spelling: str) -> str:
    """Last dot-separated segment of an identifier AS WRITTEN — dots
    inside backticks don't split (`` `pdb.tbl` `` is ONE segment)."""
    segs: list[str] = []
    cur: list[str] = []
    inq = False
    for c in spelling:
        if c == "`":
            inq = not inq
            continue
        if c == "." and not inq:
            segs.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    segs.append("".join(cur))
    return segs[-1]


def _alias_clause(masked: str, pos: int, spelling: str) -> str:
    """`` AS `seg` `` when the relation reference ending at ``pos``
    carries no explicit alias. Splicing a temp view in place of a name
    otherwise LOSES the name as a column qualifier: Spark keeps a
    relation's name as its implicit alias, so ``SELECT solo.id FROM
    solo`` must keep resolving after ``solo`` becomes ``__bn_...``
    (round-13 fuzz find: a TVF CTE joined back to a bare registry name
    broke on the ON clause's qualified columns). A reference that
    carries its own alias keeps it — in real SQL the alias then
    REPLACES the name as the only valid qualifier, so adding one would
    be wrong there. Qualification by the FULL multi-part name
    (``pdb.tbl.id``) is not preserved — only the last segment, which is
    the common form."""
    am = _ALIAS_CONT_RE.match(masked, pos)
    if am:
        nxt = am.group("a").replace("`", "").lower()
        if nxt not in _NOT_ALIAS:
            return ""  # explicit alias present — it owns qualification
        if nxt == "tablesample":
            # Spark grammar: sample BEFORE alias (`t TABLESAMPLE(...)
            # x` parses, `t AS x TABLESAMPLE(...)` does not) — inserting
            # here would be a syntax error, so the qualifier is dropped
            # (probe-verified; PIVOT/UNPIVOT accept a preceding alias)
            return ""
    seg = _last_segment(spelling).replace("`", "``")
    return f" AS `{seg}`"


_TT_RE = re.compile(
    rf"\b(?P<kw>FROM|JOIN)\s+(?P<name>{_IDENT})\s+"
    r"(?P<kind>VERSION|TIMESTAMP)\s+AS\s+OF\s+"
    r"(?P<pin>\d+|'[^']*')",
    re.I,
)


def _rewrite_time_travel(
    spark: SparkSession,
    stmt: str,
    registry_dir: str | None,
    views: list[str] | None = None,
) -> str:
    """Delta's time-travel read syntax over registry names:
    ``SELECT ... FROM t VERSION AS OF 3`` / ``TIMESTAMP AS OF '...'``.
    Names that do not resolve in the registry are left untouched
    (Spark's own catalog may know them)."""

    def _sub(m: re.Match, orig: str, masked: str) -> str | None:
        name = orig[m.start("name") : m.end("name")].replace("`", "")
        try:
            path = _resolve(spark, name, registry_dir)
        except Exception:
            return None
        pin = orig[m.start("pin") : m.end("pin")]
        if m.group("kind").upper() == "VERSION":
            df = managed_table.read(spark, path, version=int(pin))
        else:
            df = managed_table.read_as_of(
                spark, path, _parse_ts_utc(pin.strip("'"))
            )
        # Delta keeps the table name as the pinned relation's implicit
        # alias (`SELECT t.id FROM t VERSION AS OF 0` resolves) — so
        # must the splice, unless the reference carries its own alias
        tail = _alias_clause(
            masked, m.end(), orig[m.start("name") : m.end("name")]
        )
        return f"{m.group('kw')} {_ref_view(df, '__tt', views)}{tail}"

    return _sub_refs(_TT_RE, stmt, _sub)


_MD_RE = re.compile(
    rf"\b(?P<kw>FROM|JOIN)\s+(?P<name>{_IDENT})\$"
    r"(?P<kind>files|partitions|snapshots)\b",
    re.I,
)


def _rewrite_metadata_tables(
    spark: SparkSession,
    stmt: str,
    registry_dir: str | None,
    views: list[str] | None = None,
) -> str:
    """Iceberg/Trino-style metadata tables over registry names in
    passthrough reads: ``SELECT ... FROM t$files | t$partitions |
    t$snapshots`` (:mod:`sources.metadata_tables`). The view is
    materialized at rewrite time — metadata cardinality, so the
    collection is a driver-side listing, not a Spark job.
    Unresolvable names are left untouched."""
    from .metadata_tables import METADATA_KINDS

    def _sub(m: re.Match, orig: str, masked: str) -> str | None:
        name = orig[m.start("name") : m.end("name")].replace("`", "")
        try:
            path = _resolve(spark, name, registry_dir)
        except Exception:
            return None
        df = METADATA_KINDS[m.group("kind").lower()](spark, path)
        return f"{m.group('kw')} {_ref_view(df, '__md', views)}"

    return _sub_refs(_MD_RE, stmt, _sub)


_TVF_RE = re.compile(
    r"\b(?P<kw>FROM|JOIN)\s+table_changes\s*\(\s*"
    r"(?P<name>'[^']*')\s*,\s*(?P<frm>'[^']*'|\d+)\s*"
    r"(?:,\s*(?P<to>'[^']*'|\d+)\s*)?\)",
    re.I,
)


def _rewrite_table_changes_tvf(
    spark: SparkSession,
    stmt: str,
    registry_dir: str | None,
    views: list[str] | None = None,
) -> str:
    """Delta's CDF table-valued function in passthrough SQL:
    ``SELECT ... FROM table_changes('name', from[, to])`` becomes the
    engine's :func:`managed_table.table_changes` feed (O(changes)
    sidecar read; ``_change_type`` / ``_commit_version`` /
    ``_commit_timestamp`` columns included). Bounds are VERSION
    numbers or quoted TIMESTAMP strings (Delta accepts both), and both
    bounds are INCLUSIVE exactly as in Delta — ``table_changes('t',
    1)`` includes version 1's changes (review r12: the engine feed is
    exclusive-from, so this layer shifts the start down one; a start
    of 0 serves the CDF-enabled creation snapshot as inserts, the same
    answer Delta reconstructs from the creation commit's add files). A
    start timestamp maps to the first commit AT-OR-AFTER it (Delta's
    ``startingTimestamp``), an end timestamp to the last commit
    at-or-before — both on the marker commit-ts ladder ``read_as_of``
    uses. Timestamps outside retained history raise with the retention
    pointer. An unresolvable name raises — table_changes() over an
    unknown table is always an error, never something Spark's catalog
    can serve."""

    def _sub(m: re.Match, orig: str, masked: str) -> str | None:
        name = orig[m.start("name") + 1 : m.end("name") - 1]
        path = _resolve(spark, name, registry_dir)

        def bound(g: str, *, start: bool) -> int | None:
            """Delta-semantics bound -> version number. Both bounds are
            INCLUSIVE in Delta; the engine feed is exclusive-from, so
            the caller passes start-1. A start TIMESTAMP maps to the
            first commit AT-OR-AFTER it (Delta's startingTimestamp),
            an end timestamp to the last commit at-or-before."""
            if m.start(g) < 0:
                return None
            t = orig[m.start(g) : m.end(g)]
            if t.startswith("'"):
                ts = _parse_ts_utc(t.strip("'"))  # raises SqlDmlError
                try:
                    if start:
                        return managed_table.version_at_or_after(path, ts)
                    return managed_table.version_as_of(path, ts)
                except ValueError as e:
                    raise SqlDmlError(
                        f"table_changes(): timestamp bound {t} is "
                        f"outside {name!r}'s retained history ({e}); "
                        "DESCRIBE HISTORY lists the retained versions"
                    ) from None
            return int(t)

        frm = bound("frm", start=True)
        to = bound("to", start=False)
        if to is not None and frm > to:
            raise SqlDmlError(
                f"table_changes(): empty range [{frm}, {to}] — the "
                "start bound is after the end bound"
            )
        # Delta's start bound is INCLUSIVE of that version's changes;
        # the engine feed is (from, to], so shift the start down one
        # (version 0 is served from the retained creation snapshot)
        df = managed_table.table_changes(spark, path, frm - 1, to)
        return f"{m.group('kw')} {_ref_view(df, '__tc', views)}"

    return _sub_refs(_TVF_RE, stmt, _sub)


# NB the (?![\w$.`]) guard: without it the negative function-call
# lookahead invites BACKTRACKING — for `FROM range(10)` the IDENT
# shrinks to 'rang' so that `(?!\s*\()` passes on the final 'e'
_BARE_RE = re.compile(
    rf"\b(?P<kw>FROM|JOIN)\s+(?P<name>{_IDENT})(?![\w$.`])(?!\s*\()",
    re.I,
)

# a CTE definition: `name AS (` — nothing else in a read statement has
# an identifier directly followed by AS-open-paren (select-list aliases
# are `expr AS name`, table aliases come AFTER the relation). NB the
# lookbehind, not \b: \b never fires before a BACKTICKED name (space ->
# backtick is no word boundary), so `WITH `x` AS (...)` would go
# unexcluded and a same-named registry table would wrongly shadow the
# CTE (round-13 fuzz find)
_CTE_DEF_RE = re.compile(rf"(?<![\w$.`])(?P<cte>{_IDENT})\s+AS\s*\(", re.I)

# keywords that legitimately precede a '(' that opens a SUBQUERY (or
# grouping) rather than a function call — used to classify parens so a
# scalar FROM inside EXTRACT(year FROM d) / TRIM(x FROM s) /
# SUBSTRING(s FROM 2) is never mistaken for a relation reference, while
# `WHERE k IN (SELECT k FROM t)` still rewrites t
_SUBQ_KEYWORDS = frozenset(
    "in exists as on and or not where then else when select from join "
    "union intersect except minus all any some values by having like "
    "between over using distinct case end lateral limit offset".split()
)


def _func_paren_flags(masked: str) -> list[bool]:
    """Per-position flag: is this index inside a paren whose innermost
    unclosed '(' was opened as a FUNCTION CALL (preceded by a non-keyword
    identifier)? Positions at top level or inside subquery parens are
    False. Runs on the literal-masked text."""
    flags = [False] * len(masked)
    stack: list[bool] = []
    for i, c in enumerate(masked):
        if c == "(":
            j = i - 1
            while j >= 0 and masked[j].isspace():
                j -= 1
            is_func = False
            if j >= 0 and (masked[j].isalnum() or masked[j] in "_`$"):
                k = j
                while k >= 0 and (masked[k].isalnum() or masked[k] in "_`$."):
                    k -= 1
                word = masked[k + 1 : j + 1].lower().strip("`")
                is_func = word not in _SUBQ_KEYWORDS
            stack.append(is_func)
        elif c == ")" and stack:
            stack.pop()
        if stack:
            flags[i] = stack[-1]
    return flags


# comma-separated relation lists after FROM (`FROM t1, t2` — legal in
# the Athena idiom) and the optional alias each relation may carry
_COMMA_CONT_RE = re.compile(
    rf"\s*,\s*(?P<name>{_IDENT})(?![\w$.`])(?!\s*\()", re.I
)
# a comma-list member that is a parenthesized subquery or a table
# function (`range(10)`) — skipped over so LATER registry names in the
# same list still resolve
_COMMA_PAREN_RE = re.compile(rf"\s*,\s*(?:{_IDENT}\s*)?\(", re.I)
# a FROM whose FIRST member is a parenthesized subquery or table
# function — `FROM (SELECT ...) s, reg` / `FROM range(10) r, reg`;
# the bare regex never fires there, so this anchors the list scan
_FROM_PAREN_RE = re.compile(rf"\bFROM\s*(?:{_IDENT}\s*)?\(", re.I)
_ALIAS_CONT_RE = re.compile(rf"\s+(?:AS\s+)?(?P<a>{_IDENT})", re.I)
# tokens that may directly follow a relation and must never be read as
# its alias (they terminate the FROM item list)
_NOT_ALIAS = frozenset(
    "where group order having limit union intersect except join inner "
    "left right full cross natural on using when then else end window "
    "qualify lateral version timestamp offset semi anti values select "
    "from distribute cluster sort tablesample pivot unpivot".split()
)


def _rewrite_bare_names(
    spark: SparkSession,
    stmt: str,
    registry_dir: str | None,
    views: list[str] | None = None,
    seen: frozenset[str] = frozenset(),
) -> str:
    """Bare registry names in passthrough reads — the reference's
    Athena idiom (``/root/reference/sql/athena_queries.sql``: every
    query speaks ``SELECT ... FROM callcenter_analytics.<table>``,
    no pins): each resolvable ``FROM``/``JOIN`` reference becomes a
    temp view over the LIVE snapshot via :func:`managed_table.read`,
    so deletion vectors, row tracking, column mapping and empty-table
    schema are honored — unlike :func:`delta_api.register_sql_view`'s
    raw parquet views, which refuse reader-feature tables. Runs LAST
    in the rewrite chain (after time-travel pins, ``$``-metadata and
    ``table_changes()`` are already spliced out); names the registry
    does not know are left for Spark's own catalog (temp views,
    catalog tables, ``parquet.`path``` refs). A registry name SHADOWS
    a same-named temp view here — the registry is the metastore.
    Registry LOGICAL VIEWS (``CREATE VIEW name AS ...``, stored SQL in
    :mod:`sources.txn_catalog`) resolve by recursively rewriting their
    stored SELECT — views over views work; cycles raise (``seen``
    carries the in-progress chain). CTE names defined in the statement
    are EXCLUDED — SQL scoping puts a ``WITH t AS (...)`` definition
    ahead of any catalog object, so a same-named registry table must
    not shadow it; the exclusion is DEPTH-SCOPED (review r12): a WITH
    defined inside a subquery excludes only references at that paren
    depth or deeper, so an outer ``FROM name`` still resolves when an
    inner subquery happens to define a same-named CTE. Two parser
    refinements (advice r11): a ``FROM``
    inside a function call's parens is SQL scalar syntax
    (``EXTRACT(year FROM d)``, ``TRIM(x FROM s)``, ``SUBSTRING(s FROM
    2)``) and is never a relation reference; and comma-separated
    relation lists (``FROM t1, t2`` — legal in the Athena idiom)
    resolve every list member, not just the first."""
    masked = _mask_literals(stmt)
    in_func = _func_paren_flags(masked)
    # paren depth per position (masked text, so parens in literals
    # don't count) — used to scope CTE-name exclusion
    depth_at: list[int] = []
    _d = 0
    for _c in masked:
        if _c == "(":
            depth_at.append(_d)
            _d += 1
        elif _c == ")":
            _d = max(0, _d - 1)
            depth_at.append(_d)
        else:
            depth_at.append(_d)
    cte_names: dict[str, int] = {}  # name -> shallowest definition depth
    for cm_ in _CTE_DEF_RE.finditer(masked):
        # name from the ORIGINAL by span, never from masked: backticks
        # are mask-quotes, so a backtick-quoted CTE name reads as NULs
        # in masked text and the exclusion would silently miss it
        # (round-13 fuzz find — the r11 span-extraction trap, here too)
        nm_ = stmt[cm_.start("cte") : cm_.end("cte")].replace("`", "").lower()
        d_ = depth_at[cm_.start("cte")]
        cte_names[nm_] = min(cte_names.get(nm_, d_), d_)

    def _resolve_ref(name: str, ref_pos: int) -> str | None:
        """Registry name -> spliced temp-view identifier, or None to
        leave the reference for Spark's own catalog (or to a CTE whose
        definition scopes over this reference's depth)."""
        key0 = name.lower()
        if key0 in cte_names and depth_at[ref_pos] >= cte_names[key0]:
            return None
        try:
            entry = txn_catalog.resolve_entry(
                _registry_dir(spark, registry_dir), name
            )
        except Exception:
            return None
        if "view_sql" in entry:
            key = name.strip().lower()
            if key in seen:
                raise SqlDmlError(
                    f"view cycle: {name!r} references itself "
                    f"(chain: {sorted(seen)})"
                )
            df = spark.sql(
                _rewrite_reads(
                    spark,
                    entry["view_sql"],
                    registry_dir,
                    views,
                    seen | {key},
                )
            )
        else:
            df = managed_table.read(spark, entry["path"])
        return _ref_view(df, "__bn", views)

    # replacement SPANS, applied sorted at the end: a comma-list scan
    # can hop over a parenthesized subquery member whose interior holds
    # its own `FROM name` matches — eager left-to-right splicing would
    # swallow those; span collection lets the main finditer loop and
    # the comma scans each contribute independently (they can never
    # overlap: a comma member is not preceded by FROM/JOIN, so the two
    # sources match disjoint text)
    repls: list[tuple[int, int, str]] = []

    def _hop_parens(start: int) -> int:
        """Index past the balanced paren group opening at masked[start]
        (which must be '('); -1 when unbalanced."""
        depth, j = 1, start + 1
        while j < len(masked) and depth:
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
            j += 1
        return -1 if depth else j

    def _scan_comma_list(pos: int) -> None:
        """Resolve every further member of a FROM relation list from
        ``pos``: bare names splice, parenthesized subquery /
        table-function members are hopped (their interiors' own FROM
        matches splice via the main loop), one optional alias per
        relation is skipped."""
        while True:
            cm = _COMMA_CONT_RE.match(masked, pos)
            if cm:
                nm = stmt[cm.start("name") : cm.end("name")].replace("`", "")
                rep2 = _resolve_ref(nm, cm.start("name"))
                if rep2 is not None:
                    tail = _alias_clause(
                        masked,
                        cm.end("name"),
                        stmt[cm.start("name") : cm.end("name")],
                    )
                    repls.append(
                        (cm.start("name"), cm.end("name"), rep2 + tail)
                    )
                pos = cm.end()
                continue
            pm = _COMMA_PAREN_RE.match(masked, pos)
            if pm:
                j = _hop_parens(pm.end() - 1)
                if j < 0:
                    return  # unbalanced — leave the rest untouched
                pos = j
                continue
            am = _ALIAS_CONT_RE.match(masked, pos)
            if am and am.group("a").replace("`", "").lower() not in _NOT_ALIAS:
                pos = am.end()
                continue
            return

    for m in _BARE_RE.finditer(masked):
        if m.start() < len(in_func) and in_func[m.start()]:
            continue  # scalar FROM inside a function call
        name = stmt[m.start("name") : m.end("name")].replace("`", "")
        rep = _resolve_ref(name, m.start("name"))
        if rep is not None:
            tail = _alias_clause(
                masked, m.end(), stmt[m.start("name") : m.end("name")]
            )
            repls.append((m.start(), m.end(), f"{m.group('kw')} {rep}{tail}"))
        if m.group("kw").upper() == "FROM":
            _scan_comma_list(m.end())
    # a relation list can also START with a parenthesized subquery /
    # table function (`FROM (SELECT ...) s, reg_t` — review r12): the
    # bare regex never fires there, so anchor on `FROM (` / `FROM f(`,
    # hop the group, and scan the remainder of the list the same way
    for m in _FROM_PAREN_RE.finditer(masked):
        if m.start() < len(in_func) and in_func[m.start()]:
            continue
        j = _hop_parens(m.end() - 1)
        if j >= 0:
            _scan_comma_list(j)
    if not repls:
        return stmt
    repls.sort()
    out: list[str] = []
    last = 0
    for s, e, text in repls:
        if s < last:  # pragma: no cover - overlap safety net
            continue
        out.append(stmt[last:s])
        out.append(text)
        last = e
    out.append(stmt[last:])
    return "".join(out)


def _rewrite_reads(
    spark: SparkSession,
    stmt: str,
    registry_dir: str | None,
    views: list[str] | None = None,
    seen: frozenset[str] = frozenset(),
) -> str:
    """The full passthrough-read rewrite chain, in dependency order:
    metadata tables and the CDF TVF first (their shapes embed names),
    then time-travel pins (``FROM t VERSION AS OF`` must not be seen
    by the bare rewriter, which would orphan the pin clause), bare
    names (tables AND logical views) last."""
    stmt = _rewrite_metadata_tables(spark, stmt, registry_dir, views)
    stmt = _rewrite_table_changes_tvf(spark, stmt, registry_dir, views)
    stmt = _rewrite_time_travel(spark, stmt, registry_dir, views)
    return _rewrite_bare_names(spark, stmt, registry_dir, views, seen)


# -- entry point -------------------------------------------------------------


def sql(
    spark: SparkSession, statement: str, registry_dir: str | None = None
) -> DataFrame | None:
    """Execute one SQL statement. The four DML verbs (MERGE INTO /
    UPDATE / DELETE FROM / INSERT INTO|OVERWRITE) are parsed here and
    dispatched to the managed-table executors by registry NAME —
    the reference's Delta SQL idiom end-to-end. Everything else
    passes through to ``spark.sql`` and its DataFrame comes back.
    DML returns ``None`` (like delta-spark's Python DML surface);
    read the table to observe the effect."""
    stmt = statement.strip()
    m = re.match(r"MERGE\s+INTO\b", stmt, re.I)
    if m:
        _merge(spark, stmt[m.end() :], registry_dir)
        return None
    m = re.match(r"UPDATE\b", stmt, re.I)
    if m:
        _update(spark, stmt[m.end() :], registry_dir)
        return None
    m = re.match(r"DELETE\s+FROM\b", stmt, re.I)
    if m:
        _delete(spark, stmt[m.end() :], registry_dir)
        return None
    m = re.match(r"INSERT\s+(INTO|OVERWRITE)(\s+TABLE)?\b", stmt, re.I)
    if m:
        _insert(
            spark,
            stmt[m.end() :],
            registry_dir,
            overwrite=m.group(1).upper() == "OVERWRITE",
        )
        return None
    if _COMMAND_RE.match(stmt):
        out = sql_command(spark, statement, registry_dir)
        return out if isinstance(out, DataFrame) else None
    views: list[str] = []
    try:
        return spark.sql(_rewrite_reads(spark, statement, registry_dir, views))
    finally:
        # spark.sql analyzes EAGERLY, so the views are already inlined
        # into the returned DataFrame's plan — dropping them here leaks
        # nothing and keeps the session catalog clean across statements
        for v in views:
            spark.catalog.dropTempView(v)


def _strip_line_comments(text: str) -> str:
    """Remove ``--`` line comments, quote-aware (a ``--`` inside a
    string literal survives)."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in _QUOTES:
            end = _QUOTES[c]
            j = i + 1
            while j < n and text[j] != end:
                j += 2 if text[j] == "\\" and end != "`" else 1
            out.append(text[i : min(j + 1, n)])
            i = j + 1
        elif c == "-" and i + 1 < n and text[i + 1] == "-":
            while i < n and text[i] != "\n":
                i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def sql_script(
    spark: SparkSession, script: str, registry_dir: str | None = None
) -> list[DataFrame | None]:
    """Execute a multi-statement SQL script (the ``.sql``-file idiom,
    e.g. the reference's ``sql/athena_queries.sql``): strip ``--``
    comments, split on top-level ``;`` (quote/paren-aware — a ``;``
    inside a string literal or subquery survives), run each statement
    through :func:`sql` in order, and return the per-statement results
    (a DataFrame for reads/commands that produce one, else None).
    Statements run sequentially with no implicit transaction — each
    DML commit is individually atomic exactly as in single-statement
    use; a failing statement raises and leaves earlier commits in
    place (same as running the file line by line)."""
    results: list[DataFrame | None] = []
    for stmt in _split_top(_strip_line_comments(script), ";"):
        results.append(sql(spark, stmt, registry_dir))
    return results
