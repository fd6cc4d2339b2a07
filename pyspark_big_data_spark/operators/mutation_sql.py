"""SQL-text front for the mutation layer — MERGE / time travel /
RESTORE / branches / tags as statements, not just Python calls.

The reference treats SQL as a co-equal surface for its queries
(src/query1.py:94-115 runs every query twice, DataFrame and
``spark.sql``); this module extends that principle to the extension
surface: every mutation primitive (operators/merge.py,
operators/versioned.py, operators/refs.py) gets a documented statement
form, parsed here and dispatched to the SAME Python implementation —
so the two surfaces cannot drift (the parity tests assert statement ==
API call on identical inputs).

Grammar (a DOCUMENTED SUBSET — anything else refuses loudly rather
than mis-parsing; case-insensitive keywords, ``--`` comments
stripped)::

    MERGE INTO <table> USING <view> ON target.<k> = source.<k>
        [AND target.<k2> = source.<k2> ...]
        [WHEN MATCHED AND <cond> THEN DELETE]
        [WHEN MATCHED [AND <cond>] THEN UPDATE SET *
                                      | UPDATE SET <c> = <expr> [, ...]]
        [WHEN NOT MATCHED [AND <cond>] THEN INSERT *
                        | INSERT (<c> [, ...]) VALUES (<expr> [, ...])]
        [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE]
        [WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
            UPDATE SET <c> = <expr> [, ...]]

    DELETE FROM <table> [WHERE <cond>]
    UPDATE <table> SET <c> = <expr> [, ...] [WHERE <cond>]
    DESCRIBE HISTORY <table>
    VACUUM <table> KEEP <n>
    OPTIMIZE <table> TARGET <n> FILES [CLUSTER BY <col>]

    SELECT ... FROM <table> VERSION AS OF <n> ...
    SELECT ... FROM <table> TIMESTAMP AS OF '<ts>' ...
    SELECT ... FROM <table> BRANCH <name> ...
    SELECT ... FROM <table> TAG <name> ...

    RESTORE TABLE <table> TO VERSION AS OF <n>
    RESTORE TABLE <table> TO TIMESTAMP AS OF '<ts>'
    CREATE BRANCH <name> ON <table> [AT VERSION <n>]
    MERGE BRANCH <src> INTO <dst> ON <table>
    MERGE BRANCH <src> INTO <dst> ON <table> BY KEY <k>[, <k2> ...]
    CREATE TAG <name> ON <table> AT VERSION <n> [NOTE '<text>']
    COMMIT TRANSACTION ON <group> WRITE <table> FROM <view>
        [, <table> FROM <view> ...] [APPEND] [EXPECTED <t>]

Tables resolve through an explicit CATALOG (``{name: chain root}``) —
no global registry, no ambient state: the caller owns the namespace
exactly as it owns SparkSession temp views. ``USING <view>`` names a
registered temp view (create it with ``df.createOrReplaceTempView`` —
the same way ``spark.sql`` gets any other relation). Clause conditions
pass through VERBATIM as the SQL-over-target/source-aliases strings
``merge_into`` already accepts, so the statement form has exactly the
clause power of the API, by construction.

Time-travel SELECTs resolve ``<table> VERSION|TIMESTAMP AS OF`` to the
pinned chain read, register it as a scoped temp view, rewrite the
statement to reference the view, and hand the REST of the SQL to
Catalyst untouched — the front parses only the travel suffix, never
the query.

100 TB: parsing is driver-side string work; every statement executes
as the identical plan its Python twin builds.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_IDENT = r"[A-Za-z_][A-Za-z0-9_.]*"


_LITERAL_RE = re.compile(r"'(?:[^']|'')*'")


def _split_literals(sql: str) -> list[tuple[str, bool]]:
    """Segments of ``sql`` as ``(text, is_literal)`` — the one lexical
    fact the regex front must respect: nothing inside a single-quoted
    SQL string (with ``''`` escapes) is a comment, a keyword, or a
    travel suffix."""
    out: list[tuple[str, bool]] = []
    pos = 0
    for m in _LITERAL_RE.finditer(sql):
        if m.start() > pos:
            out.append((sql[pos : m.start()], False))
        out.append((m.group(0), True))
        pos = m.end()
    if pos < len(sql):
        out.append((sql[pos:], False))
    return out


def _strip_comments(sql: str) -> str:
    cleaned = "".join(
        seg if lit else re.sub(r"--[^\n]*", " ", seg)
        for seg, lit in _split_literals(sql)
    )
    return cleaned.strip().rstrip(";").strip()


def _literal_spans(sql: str) -> list[tuple[int, int]]:
    return [m.span() for m in _LITERAL_RE.finditer(sql)]


def _starts_in_literal(pos: int, spans: list[tuple[int, int]]) -> bool:
    return any(lo < pos < hi for lo, hi in spans)


def _sub_outside_literals(pattern: re.Pattern, repl, sql: str) -> str:
    """Apply ``pattern.sub`` skipping matches that START inside a
    string literal. (A match may legitimately CONTAIN one — the
    TIMESTAMP AS OF '<ts>' form — so segment-wise masking would break
    it; only the start position decides.)"""
    spans = _literal_spans(sql)

    def guarded(m: re.Match):
        if _starts_in_literal(m.start(), spans):
            return m.group(0)
        return repl(m)

    return pattern.sub(guarded, sql)


def _search_outside_literals(pattern: re.Pattern, sql: str) -> bool:
    spans = _literal_spans(sql)
    return any(
        not _starts_in_literal(m.start(), spans)
        for m in pattern.finditer(sql)
    )


def _root(catalog: dict[str, str], table: str) -> str:
    if table not in catalog:
        raise ValueError(
            f"unknown table {table!r}; catalog has {sorted(catalog)}"
        )
    return catalog[table]


_MERGE_RE = re.compile(
    rf"^MERGE\s+INTO\s+(?P<table>{_IDENT})\s+USING\s+(?P<view>{_IDENT})\s+"
    rf"ON\s+(?P<on>.+?)\s*(?P<clauses>\bWHEN\b.+)$",
    re.IGNORECASE | re.DOTALL,
)
_ON_RE = re.compile(
    rf"^target\.(?P<t>{_IDENT})\s*=\s*source\.(?P<s>{_IDENT})$", re.IGNORECASE
)
_CLAUSE_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED\s*(?P<bysrc>BY\s+SOURCE\s*)?"
    r"(?:AND\s+(?P<cond>.+?))?\s*THEN\s+"
    r"(?P<action>DELETE|UPDATE\s+SET\s+.+?|INSERT\s+.+?)"
    r"(?=\s*\bWHEN\b|\s*$)",
    re.IGNORECASE | re.DOTALL,
)
_ASSIGN_RE = re.compile(
    rf"^(?P<col>{_IDENT})\s*=\s*(?P<expr>.+)$", re.IGNORECASE | re.DOTALL
)
_INSERT_COLS_RE = re.compile(
    r"^INSERT\s*\((?P<cols>[^()]+)\)\s*VALUES\s*\((?P<vals>.+)\)$",
    re.IGNORECASE | re.DOTALL,
)


def _split_top_level(text: str) -> list[str]:
    """Split on commas at paren depth zero, respecting single-quoted
    SQL literals — the separator an assignment/expression list uses."""
    parts: list[str] = []
    depth = 0
    in_lit = False
    cur: list[str] = []
    i = 0
    while i < len(text):
        ch = text[i]
        if in_lit:
            cur.append(ch)
            if ch == "'":
                if i + 1 < len(text) and text[i + 1] == "'":
                    cur.append("'")
                    i += 1  # '' escape stays inside the literal
                else:
                    in_lit = False
        elif ch == "'":
            in_lit = True
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _parse_assignments(text: str, label: str) -> dict[str, str]:
    """``c = expr [, ...]`` into an ordered dict; duplicate targets and
    non-assignment terms refuse."""
    out: dict[str, str] = {}
    for part in _split_top_level(text):
        m = _ASSIGN_RE.match(part)
        if not m:
            raise ValueError(f"unsupported {label} term {part!r}; expected '<col> = <expr>'")
        col = m["col"]
        if col in out:
            raise ValueError(f"duplicate {label} assignment to {col!r}")
        out[col] = m["expr"].strip()
    if not out:
        raise ValueError(f"{label} needs at least one assignment")
    return out
_TRAVEL_RE = re.compile(
    rf"\b(?P<table>{_IDENT})\s+(?:(?P<kind>VERSION)\s+AS\s+OF\s+(?P<v>\d+)"
    rf"|(?P<kind2>TIMESTAMP)\s+AS\s+OF\s+'(?P<ts>[^']+)'"
    rf"|(?P<kind3>BRANCH)\s+(?P<branch>{_IDENT})"
    rf"|(?P<kind4>TAG)\s+(?P<tag>{_IDENT}))",
    re.IGNORECASE,
)
_RESTORE_RE = re.compile(
    rf"^RESTORE\s+TABLE\s+(?P<table>{_IDENT})\s+TO\s+"
    r"(?:VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    r"|TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')$",
    re.IGNORECASE,
)
_CREATE_BRANCH_RE = re.compile(
    rf"^CREATE\s+BRANCH\s+(?P<name>{_IDENT})\s+ON\s+(?P<table>{_IDENT})"
    r"(?:\s+AT\s+VERSION\s+(?P<v>\d+))?$",
    re.IGNORECASE,
)
_MERGE_BRANCH_RE = re.compile(
    rf"^MERGE\s+BRANCH\s+(?P<src>{_IDENT})\s+INTO\s+(?P<dst>{_IDENT})\s+"
    rf"ON\s+(?P<table>{_IDENT})"
    rf"(?:\s+BY\s+KEY\s+(?P<keys>{_IDENT}(?:\s*,\s*{_IDENT})*))?$",
    re.IGNORECASE,
)
_COMMIT_TXN_RE = re.compile(
    rf"^COMMIT\s+TRANSACTION\s+ON\s+(?P<group>{_IDENT})\s+WRITE\s+"
    rf"(?P<writes>{_IDENT}\s+FROM\s+{_IDENT}(?:\s*,\s*{_IDENT}\s+FROM\s+{_IDENT})*)"
    r"(?P<append>\s+APPEND)?(?:\s+EXPECTED\s+(?P<exp>\d+))?$",
    re.IGNORECASE,
)
_WRITE_RE = re.compile(
    rf"^(?P<table>{_IDENT})\s+FROM\s+(?P<view>{_IDENT})$", re.IGNORECASE
)
_DELETE_STMT_RE = re.compile(
    rf"^DELETE\s+FROM\s+(?P<table>{_IDENT})"
    r"(?:\s+WHERE\s+(?P<cond>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_STMT_RE = re.compile(
    rf"^UPDATE\s+(?P<table>{_IDENT})\s+SET\s+(?P<rest>.+)$",
    re.IGNORECASE | re.DOTALL,
)
_WHERE_SPLIT_RE = re.compile(r"\sWHERE\s", re.IGNORECASE)


def _split_where(rest: str) -> tuple[str, str | None]:
    """Split ``<assignments> [WHERE <cond>]`` on the first WHERE
    keyword outside a string literal (assignments cannot contain the
    bare keyword outside literals in the documented subset)."""
    spans = _literal_spans(rest)
    for m in _WHERE_SPLIT_RE.finditer(rest):
        if not _starts_in_literal(m.start() + 1, spans):
            return rest[: m.start()].strip(), rest[m.end() :].strip()
    return rest.strip(), None


_DESCRIBE_RE = re.compile(
    rf"^DESCRIBE\s+HISTORY\s+(?P<table>{_IDENT})$", re.IGNORECASE
)
_VACUUM_RE = re.compile(
    rf"^VACUUM\s+(?P<table>{_IDENT})\s+KEEP\s+(?P<n>\d+)$", re.IGNORECASE
)
_OPTIMIZE_RE = re.compile(
    rf"^OPTIMIZE\s+(?P<table>{_IDENT})\s+TARGET\s+(?P<n>\d+)\s+FILES"
    rf"(?:\s+CLUSTER\s+BY\s+(?P<col>{_IDENT}))?$",
    re.IGNORECASE,
)
_CREATE_TAG_RE = re.compile(
    rf"^CREATE\s+TAG\s+(?P<name>{_IDENT})\s+ON\s+(?P<table>{_IDENT})\s+"
    r"AT\s+VERSION\s+(?P<v>\d+)(?:\s+NOTE\s+'(?P<note>[^']*)')?$",
    re.IGNORECASE,
)


def _parse_merge(spark: SparkSession, m: re.Match, catalog: dict[str, str]):
    from pyspark_big_data_spark.operators.merge import merge_into

    keys = []
    for part in re.split(r"\s+AND\s+", m["on"].strip(), flags=re.IGNORECASE):
        om = _ON_RE.match(part.strip())
        if not om:
            raise ValueError(
                f"unsupported ON term {part.strip()!r}: the statement form "
                "supports equi-conditions 'target.<k> = source.<k>' only"
            )
        if om["t"].lower() != om["s"].lower():
            raise ValueError(
                f"ON term {part.strip()!r} joins different column names; "
                "the UPDATE SET * / INSERT * form needs matching names"
            )
        keys.append(om["t"])
    clauses_text = m["clauses"].strip()
    leftover = clauses_text
    for c in _CLAUSE_RE.finditer(clauses_text):
        leftover = leftover.replace(c.group(0), "", 1)
    if leftover.strip():
        raise ValueError(
            f"unsupported MERGE clause text {leftover.strip()!r}; supported "
            "actions: DELETE, UPDATE SET * | UPDATE SET c = expr [, ...], "
            "INSERT * | INSERT (cols) VALUES (exprs)"
        )
    upd = None
    dele = None
    ins = None
    update_set = None
    insert_values = None
    by_upd = None
    by_del = None
    by_set = None
    upd_pos = dele_pos = None
    by_upd_pos = by_del_pos = None
    for c in _CLAUSE_RE.finditer(clauses_text):
        action_raw = c["action"].strip()
        action = re.sub(r"\s+", " ", action_raw.upper())
        cond = c["cond"].strip() if c["cond"] else True
        if c["bysrc"] and not c["not"]:
            raise ValueError(
                "MATCHED BY SOURCE is not a clause; did you mean "
                "WHEN NOT MATCHED BY SOURCE?"
            )
        if c["not"] and c["bysrc"]:
            if action == "DELETE":
                if by_del is not None:
                    raise ValueError(
                        "duplicate WHEN NOT MATCHED BY SOURCE ... DELETE clause"
                    )
                by_del = cond
                by_del_pos = c.start()
            elif action.startswith("UPDATE SET"):
                if by_upd is not None:
                    raise ValueError(
                        "duplicate WHEN NOT MATCHED BY SOURCE ... UPDATE clause"
                    )
                if action == "UPDATE SET *":
                    raise ValueError(
                        "WHEN NOT MATCHED BY SOURCE ... UPDATE SET * is "
                        "meaningless (there is no source row); name the "
                        "assignments"
                    )
                by_upd = cond
                by_upd_pos = c.start()
                sm = re.match(
                    r"^UPDATE\s+SET\s+(?P<assigns>.+)$",
                    action_raw,
                    re.IGNORECASE | re.DOTALL,
                )
                by_set = _parse_assignments(
                    sm["assigns"], "NOT MATCHED BY SOURCE UPDATE SET"
                )
            else:
                raise ValueError(
                    "WHEN NOT MATCHED BY SOURCE supports DELETE and "
                    "UPDATE SET c = expr only"
                )
        elif c["not"]:
            if not action.startswith("INSERT"):
                raise ValueError("WHEN NOT MATCHED supports INSERT only")
            if ins is not None:
                raise ValueError("duplicate WHEN NOT MATCHED clause")
            ins = cond
            if action != "INSERT *":
                im = _INSERT_COLS_RE.match(action_raw)
                if not im:
                    raise ValueError(
                        f"unsupported INSERT form {action_raw!r}; expected "
                        "INSERT * or INSERT (cols) VALUES (exprs)"
                    )
                cols = [s.strip() for s in im["cols"].split(",")]
                vals = _split_top_level(im["vals"])
                if len(cols) != len(vals):
                    raise ValueError(
                        f"INSERT names {len(cols)} column(s) but "
                        f"{len(vals)} value(s)"
                    )
                if len(set(cols)) != len(cols):
                    raise ValueError("duplicate column in INSERT column list")
                insert_values = dict(zip(cols, vals))
        elif action == "DELETE":
            if dele is not None:
                raise ValueError("duplicate WHEN MATCHED ... DELETE clause")
            dele = cond
            dele_pos = c.start()
        elif action.startswith("UPDATE SET"):
            if upd is not None:
                raise ValueError("duplicate WHEN MATCHED ... UPDATE clause")
            upd = cond
            upd_pos = c.start()
            if action != "UPDATE SET *":
                sm = re.match(
                    r"^UPDATE\s+SET\s+(?P<assigns>.+)$",
                    action_raw,
                    re.IGNORECASE | re.DOTALL,
                )
                update_set = _parse_assignments(sm["assigns"], "UPDATE SET")
        else:
            raise ValueError(f"unsupported matched action {action!r}")
    if dele is True and upd is not None:
        raise ValueError(
            "an unconditional WHEN MATCHED THEN DELETE shadows the UPDATE "
            "clause; give DELETE a condition"
        )
    if by_del is True and by_upd is not None:
        raise ValueError(
            "an unconditional WHEN NOT MATCHED BY SOURCE THEN DELETE "
            "shadows the by-source UPDATE clause; give DELETE a condition"
        )
    if (
        by_upd_pos is not None
        and by_del_pos is not None
        and by_upd_pos < by_del_pos
    ):
        raise ValueError(
            "WHEN NOT MATCHED BY SOURCE ... UPDATE before ... DELETE: "
            "this engine evaluates the by-source DELETE first, so a row "
            "matching both conditions would be deleted, not updated — "
            "write the DELETE clause first to acknowledge the order"
        )
    if (
        upd_pos is not None
        and dele_pos is not None
        and upd_pos < dele_pos
    ):
        # SQL's first-matching-clause-wins would UPDATE a row satisfying
        # both conditions; the engine's pinned order is delete-first
        # (Delta's rule, merge.py docstring) — refuse the ordering whose
        # semantics would silently diverge instead of reordering it
        raise ValueError(
            "WHEN MATCHED ... UPDATE before WHEN MATCHED ... DELETE: this "
            "engine evaluates DELETE first (Delta's clause order), so a row "
            "matching both conditions would be deleted, not updated — write "
            "the DELETE clause first to acknowledge the order"
        )
    source = spark.table(m["view"])
    return merge_into(
        spark,
        _root(catalog, m["table"]),
        source,
        keys if len(keys) > 1 else keys[0],
        when_matched_update=upd,
        when_matched_delete=dele,
        when_not_matched_insert=ins,
        update_set=update_set,
        insert_values=insert_values,
        when_not_matched_by_source_update=by_upd,
        when_not_matched_by_source_delete=by_del,
        not_matched_by_source_set=by_set,
    )


def run_mutation_sql(
    spark: SparkSession, sql: str, catalog: dict[str, str]
) -> DataFrame | dict | int | None:
    """Execute one statement of the documented subset. Returns what the
    underlying API returns: a DataFrame for SELECTs, the merge result
    dict for MERGE INTO / MERGE BRANCH, the new version for RESTORE,
    the head/pin for branch/tag creation."""
    stmt = _strip_comments(sql)

    m = _RESTORE_RE.match(stmt)
    if m:
        from pyspark_big_data_spark.operators.versioned import (
            restore_version,
            restore_version_as_of,
        )

        root = _root(catalog, m["table"])
        if m["v"] is not None:
            return restore_version(spark, root, int(m["v"]))
        return restore_version_as_of(spark, root, m["ts"])

    m = _CREATE_BRANCH_RE.match(stmt)
    if m:
        from pyspark_big_data_spark.operators.refs import create_branch
        from pyspark_big_data_spark.operators.versioned import latest_version

        root = _root(catalog, m["table"])
        v = int(m["v"]) if m["v"] is not None else latest_version(spark, root)
        create_branch(spark, root, m["name"], v)
        return v

    m = _MERGE_BRANCH_RE.match(stmt)
    if m:
        from pyspark_big_data_spark.operators.refs import (
            merge_branch,
            merge_branch_keyed,
        )

        root = _root(catalog, m["table"])
        if m["keys"]:
            keys = [k.strip() for k in m["keys"].split(",")]
            return merge_branch_keyed(
                spark, root, m["src"], m["dst"],
                keys if len(keys) > 1 else keys[0],
            )
        return merge_branch(spark, root, m["src"], m["dst"])

    m = _CREATE_TAG_RE.match(stmt)
    if m:
        from pyspark_big_data_spark.operators.refs import create_tag

        return create_tag(
            spark,
            _root(catalog, m["table"]),
            m["name"],
            int(m["v"]),
            note=m["note"] or "",
        )

    m = _COMMIT_TXN_RE.match(stmt)
    if m:
        from pyspark_big_data_spark.operators.multitxn import commit_txn

        writes = {}
        for part in m["writes"].split(","):
            wm = _WRITE_RE.match(part.strip())
            tbl = wm["table"]
            if tbl in writes:
                raise ValueError(f"duplicate table {tbl!r} in COMMIT TRANSACTION")
            writes[tbl] = spark.table(wm["view"])
        return commit_txn(
            spark,
            _root(catalog, m["group"]),
            writes,
            append=m["append"] is not None,
            expected_txn=int(m["exp"]) if m["exp"] is not None else None,
        )

    m = _DESCRIBE_RE.match(stmt)
    if m:
        from pyspark_big_data_spark.operators.versioned import snapshot_history

        hist = snapshot_history(spark, _root(catalog, m["table"]))
        return spark.createDataFrame(
            [
                (
                    int(h["version"]),
                    int(h["n_files"]),
                    None if h["n_rows"] is None else int(h["n_rows"]),
                    bool(h["has_manifest"]),
                    None if h["base_version"] is None else int(h["base_version"]),
                )
                for h in hist
            ],
            "version long, n_files long, n_rows long, has_manifest boolean, "
            "base_version long",
        )

    m = _VACUUM_RE.match(stmt)
    if m:
        from pyspark_big_data_spark.operators.versioned import expire_versions

        return expire_versions(
            spark, _root(catalog, m["table"]), keep_last=int(m["n"])
        )

    m = _OPTIMIZE_RE.match(stmt)
    if m:
        from pyspark_big_data_spark.operators.versioned import compact_version

        return compact_version(
            spark,
            _root(catalog, m["table"]),
            target_files=int(m["n"]),
            cluster_by=m["col"],
        )

    m = _DELETE_STMT_RE.match(stmt)
    if m:
        from pyspark_big_data_spark.operators.merge import delete_where

        return delete_where(
            spark,
            _root(catalog, m["table"]),
            m["cond"].strip() if m["cond"] else "true",
        )

    m = _UPDATE_STMT_RE.match(stmt)
    if m:
        from pyspark_big_data_spark.operators.merge import update_where

        assigns_text, cond = _split_where(m["rest"])
        return update_where(
            spark,
            _root(catalog, m["table"]),
            _parse_assignments(assigns_text, "UPDATE SET"),
            cond if cond is not None else True,
        )

    m = _MERGE_RE.match(stmt)
    if m:
        return _parse_merge(spark, m, catalog)

    if re.match(r"^SELECT\b", stmt, re.IGNORECASE) and _search_outside_literals(
        _TRAVEL_RE, stmt
    ):
        return _run_travel_select(spark, stmt, catalog)

    raise ValueError(
        "statement not in the documented mutation-SQL subset (MERGE INTO, "
        "DELETE FROM, UPDATE ... SET, SELECT ... VERSION/TIMESTAMP AS OF, "
        "RESTORE TABLE, CREATE BRANCH, MERGE BRANCH, CREATE TAG, "
        "COMMIT TRANSACTION, DESCRIBE HISTORY, VACUUM, OPTIMIZE): "
        f"{stmt[:120]!r}"
    )


def _run_travel_select(
    spark: SparkSession, stmt: str, catalog: dict[str, str]
) -> DataFrame:
    # Every travel read is MERGE-ON-READ: a chain with MERGE commits or
    # deletion vectors serves its LOGICAL state (read_version_mor is
    # the zero-extra-nodes plain read when no vectors exist), so the
    # statement surface can never resurrect retired rows the API
    # surface masks.
    from pyspark_big_data_spark.operators.deletes import read_version_mor
    from pyspark_big_data_spark.operators.versioned import version_as_of

    views: list[str] = []

    def _sub(m: re.Match) -> str:
        table = m["table"]
        if table not in catalog:
            # not one of ours (e.g. a column alias that happened to
            # precede the keyword) — leave untouched
            return m.group(0)
        root = catalog[table]
        if m["kind"]:
            v = int(m["v"])
            vname = f"__travel_{table}_v{m['v']}"
        elif m["kind2"]:
            v = version_as_of(spark, root, m["ts"])
            vname = f"__travel_{table}_ts{len(views)}"
        elif m["kind3"]:
            from pyspark_big_data_spark.operators.refs import branch_head

            v = branch_head(spark, root, m["branch"])
            vname = f"__travel_{table}_br_{m['branch']}"
        else:
            from pyspark_big_data_spark.operators.refs import read_tag

            v = read_tag(spark, root, m["tag"])
            vname = f"__travel_{table}_tag_{m['tag']}"
        read_version_mor(spark, root, v).createOrReplaceTempView(vname)
        views.append(vname)
        return vname

    rewritten = _sub_outside_literals(_TRAVEL_RE, _sub, stmt)
    if not views:
        raise ValueError(
            "VERSION/TIMESTAMP AS OF names no table in the catalog"
        )
    return spark.sql(rewritten)
