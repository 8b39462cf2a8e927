"""MySQL DDL *text* front-end (V14/V15 + M11 SQL route).

The engine's native DDL surface is structured (SURVEY.md §2.3), but real
feeds — Debezium's schema-change topic in particular — carry raw SQL
statements. This module parses the reference-relevant DDL statement
family into the structured events ``Registry.apply`` consumes,
re-implementing the reference parser's two quirky surfaces exactly:

* **V15 — quoted identifiers**: char-wise quote-aware scan of
  ``db``.``table`` ids: doubled-quote escape inside a component, dots
  inside quotes are part of the name, any of `` ` ' " `` quotes
  (MySqlAntlrDdlParser.parseQualifiedTableId, :286-322).
* **V14 — enum/set option escaping**: strip quotes, then ``,`` ->
  ``\\,``, ``\\'`` -> ``'``, ``''`` -> ``'``
  (MySqlAntlrDdlParser.extractEnumAndSetOptions/escapeOption, :89-101).

Type mapping follows the parser's DDL table (MySqlAntlrDdlParser.java:
134-258 — TINYTEXT..LONGTEXT as text, YEAR as INTEGER, SERIAL as
BIGINT, TIMESTAMP with zone vs DATETIME without) and the assessor rules
(§1.2b), emitting the engine's portable type names + value-converter
specs.

Statements: CREATE/DROP DATABASE, CREATE TABLE (inline + table-level
PRIMARY KEY), DROP TABLE, TRUNCATE [TABLE], RENAME TABLE a TO b, and
ALTER TABLE with ADD [COLUMN] (single or parenthesized multi) / DROP
[COLUMN] / RENAME COLUMN a TO b / MODIFY [COLUMN] / CHANGE [COLUMN]
a b type (rename + retype) / RENAME TO. One statement may expand to
several structured events (CHANGE = rename then widen). Clauses with
no replicated-schema shape (indexes, constraints, DEFAULT tweaks,
ENGINE/CHARSET/COLLATE/COMMENT table options) parse and drop. Column
clauses handle CHARACTER SET/COLLATE (non-default charset emits the
``charset:`` decode converter) and generated columns (declared type
kept, expression stripped). ``parse_ddl_script`` is the
schema-change-topic front-end: multi-statement scripts with line/block
comments, ``USE db`` switches, and session/index/privilege statements
skipped (optionally skipping unparseable statements, the
``database.history.skip.unparseable.ddl`` analog).
"""

from __future__ import annotations

import json
import re

from ..model import (
    DDL_ALTER_TABLE,
    DDL_CREATE_DATABASE,
    DDL_CREATE_TABLE,
    DDL_DROP_DATABASE,
    DDL_DROP_TABLE,
    DDL_RENAME_TABLE,
    DDL_TRUNCATE_TABLE,
)

_QUOTES = ("`", "'", '"')


def is_quote(c: str) -> bool:
    return c in _QUOTES


def without_quotes(s: str) -> str:
    """Strip one layer of surrounding quotes (any of ` ' ")."""
    if len(s) >= 2 and is_quote(s[0]) and s[-1] == s[0]:
        return s[1:-1]
    return s


def escape_option(option: str) -> str:
    """V14 (MySqlAntlrDdlParser.escapeOption, :96-101): escape commas with
    a backslash (comma is part of the option), collapse the two quote
    escapes (backslash-quote and doubled quote) to a bare quote."""
    return (option.replace(",", "\\,")
            .replace("\\'", "'")
            .replace("''", "'"))


def extract_enum_and_set_options(raw_values: list[str]) -> list[str]:
    """V14 (:89-94): raw quoted literal list -> parsed, escaped options."""
    return [escape_option(without_quotes(v)) for v in raw_values]


def split_qualified_id(text: str, default_db: str = "") -> tuple[str, str]:
    """V15 (parseQualifiedTableId, :286-322): (db, name) from a possibly
    quoted ``db.table`` id. Faithful char-wise scan: doubled-quote escape
    inside a quoted component; a dot inside quotes is part of the name;
    a foreign quote char inside quotes is literal."""
    component: list[str] = []
    db: str | None = None
    last_quote = ""
    i = 0
    while i < len(text):
        c = text[i]
        if is_quote(c):
            if not last_quote:
                last_quote = c  # opening quote
            elif last_quote == c:
                if i + 1 < len(text) and text[i + 1] == c:
                    component.append(c)  # escape by doubling
                    i += 1
                else:
                    last_quote = ""  # closing quote
            else:
                component.append(c)  # other quote char is part of the name
        elif c == "." and not last_quote:
            db = "".join(component)
            component = []
        else:
            component.append(c)
        i += 1
    return (db if db is not None else default_db), "".join(component)


def qualified_table(text: str, default_db: str = "") -> str:
    db, name = split_qualified_id(text.strip(), default_db)
    return f"{db}.{name}" if db else name


# ---------------------------------------------------------------------------
# type mapping (MySqlAntlrDdlParser.java:134-258 + assessor §1.2b)
# ---------------------------------------------------------------------------

_GENERATED_AS = re.compile(r"\b(?:GENERATED\s+ALWAYS\s+)?AS\s*\(", re.I)


def _mask_quoted(s: str) -> str:
    """Same-length copy of ``s`` with every quoted-literal CONTENT
    blanked to spaces (quote chars kept, escapes honored) — modifier
    scans run on the mask so words inside DEFAULT/COMMENT/option
    literals can never match, while index-based slicing of the
    original stays valid."""
    out = list(s)
    quote = ""
    i = 0
    while i < len(s):
        c = s[i]
        if quote:
            if c == "\\" and i + 1 < len(s):
                out[i] = " "
                out[i + 1] = " "
                i += 1
            elif c == quote:
                if i + 1 < len(s) and s[i + 1] == quote:
                    out[i] = " "
                    out[i + 1] = " "
                    i += 1
                else:
                    quote = ""
            else:
                out[i] = " "
        elif is_quote(c):
            quote = c
        i += 1
    return "".join(out)


def _strip_generated(rest: str, masked: str) -> tuple[str, str]:
    """Cut a generated-column expression — ``[GENERATED ALWAYS] AS
    (expr) [VIRTUAL|STORED]`` — so modifier scans (UNSIGNED, CHARACTER
    SET) can't match words inside the expression. Generated columns
    keep their declared data type (the parser treats them as regular
    columns of that type, MySqlAntlrDdlParser.java column-definition
    path). Operates on the quote-mask so an ``AS (`` inside a quoted
    literal (e.g. an ENUM option) is never treated as a generated
    clause; returns (rest, masked) with the same cut applied to both."""
    m = _GENERATED_AS.search(masked)
    if not m:
        return rest, masked
    depth, i = 1, m.end()
    while i < len(masked) and depth:
        if masked[i] == "(":
            depth += 1
        elif masked[i] == ")":
            depth -= 1
        i += 1
    tm = re.match(r"^\s*(?:VIRTUAL|STORED)\b", masked[i:], flags=re.I)
    cut = i + (tm.end() if tm else 0)
    return (rest[:m.start()] + " " + rest[cut:],
            masked[:m.start()] + " " + masked[cut:])


def map_column_type(type_text: str) -> tuple[str, str | None]:
    """MySQL column type text -> (portable type name, converter spec or
    None). Handles length/precision args, UNSIGNED, ENUM/SET option
    lists, CHARACTER SET/COLLATE clauses (a non-default charset on a
    string column emits the ``charset:<name>`` decode converter —
    MySqlValueConverters.java:421-474 charsetFor), and generated-column
    expressions (stripped; the column keeps its declared type)."""
    t = type_text.strip()
    m = re.match(r"^([A-Za-z]+)", t)
    if not m:
        raise ValueError(f"unparseable column type: {type_text!r}")
    base = m.group(1).upper()
    rest, masked = _strip_generated(t[m.end():], _mask_quoted(t[m.end():]))
    args = ""
    lead = len(rest) - len(rest.lstrip())
    if rest[lead:lead + 1] == "(":
        # quote-aware balanced extraction: ENUM/SET options may contain
        # ')' inside their quoted literals
        args, _ = _balanced_group(rest, lead)
    # modifier scans run on the QUOTE-MASKED text: a DEFAULT/COMMENT
    # literal mentioning 'unsigned' or 'character set x' must not match.
    # The charset NAME itself reads from the original at the matched
    # position — it may be a backtick-quoted identifier the mask blanks
    unsigned = bool(re.search(r"\bUNSIGNED\b", masked, re.I))
    charset = None
    cs_m = re.search(r"\b(?:CHARACTER\s+SET|CHARSET)\s+", masked, re.I)
    if cs_m:
        nm = re.match(r"[`'\"]?(\w+)", rest[cs_m.end():])
        if nm:
            charset = nm.group(1).lower()

    def _string(portable: str) -> tuple[str, str | None]:
        return portable, (f"charset:{charset}" if charset else None)

    if base in ("ENUM", "SET"):
        opts = extract_enum_and_set_options(_split_top_level(args))
        kind = "enum" if base == "ENUM" else "set"
        return "string", f"{kind}:" + ",".join(opts)
    if base == "BIT":
        return "bool", None
    if base in ("BOOL", "BOOLEAN"):
        return "bool", None
    if base in ("TINYINT", "SMALLINT", "MEDIUMINT"):
        if unsigned:
            return "int32", f"unsigned:{base}"
        return "int32", None
    if base in ("INT", "INTEGER"):
        if unsigned:
            return "int64", "unsigned:INT"
        return "int32", None
    if base == "BIGINT":
        if unsigned:
            return "decimal(20,0)", "unsigned:BIGINT"
        return "int64", None
    if base == "SERIAL":  # :134-258 SERIAL -> BIGINT
        return "int64", None
    if base in ("REAL", "FLOAT"):
        return "float32", None
    if base in ("DOUBLE", "FLOAT8"):
        return "float64", None
    if base in ("DECIMAL", "NUMERIC", "FIXED", "DEC"):
        if args:
            parts = [p.strip() for p in args.split(",")]
            p = int(parts[0])
            s = int(parts[1]) if len(parts) > 1 else 0
        else:
            p, s = 10, 0  # MySQL default precision
        return f"decimal({p},{s})", None
    if base == "DATE":
        return "date", None
    if base == "TIME":
        return "time_micros", None
    # TIMESTAMP is zoned, DATETIME is local (:216-218)
    if base == "TIMESTAMP":
        return "timestamp_micros", None
    if base == "DATETIME":
        return "datetime", None
    if base == "YEAR":  # YEAR -> INTEGER with 2-digit adjust (V9)
        return "int32", "year"
    if base in ("CHAR", "VARCHAR", "NCHAR", "NVARCHAR"):
        return _string("string")
    if base in ("TINYTEXT", "TEXT", "MEDIUMTEXT", "LONGTEXT"):
        return _string("large_string")
    if base == "BINARY":
        n = int(args) if args else 1
        return f"binary({n})", f"binary_pad:{n}"
    if base in ("VARBINARY", "BLOB", "TINYBLOB", "MEDIUMBLOB", "LONGBLOB"):
        return "bytes", None
    if base == "JSON":
        return "string", "json"
    raise ValueError(f"unsupported MySQL type {base!r}")


def _split_top_level(s: str) -> list[str]:
    """Split on commas at paren depth 0, outside quoted literals (with
    doubled-quote and backslash escapes honored)."""
    out: list[str] = []
    buf: list[str] = []
    depth = 0
    quote = ""
    i = 0
    while i < len(s):
        c = s[i]
        if quote:
            buf.append(c)
            if c == "\\" and i + 1 < len(s):
                buf.append(s[i + 1])
                i += 1
            elif c == quote:
                if i + 1 < len(s) and s[i + 1] == quote:
                    buf.append(quote)
                    i += 1
                else:
                    quote = ""
        elif is_quote(c):
            quote = c
            buf.append(c)
        elif c == "(":
            depth += 1
            buf.append(c)
        elif c == ")":
            depth -= 1
            buf.append(c)
        elif c == "," and depth == 0:
            out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
        i += 1
    if "".join(buf).strip():
        out.append("".join(buf).strip())
    return out


# ---------------------------------------------------------------------------
# statement parsing
# ---------------------------------------------------------------------------

#: event tuple: (ddl_op, table, prev_table, payload_json)
Event = tuple[str, str, str, str]


def _balanced_group(s: str, open_idx: int) -> tuple[str, str]:
    """(content, remainder) of the paren group opening at ``open_idx``,
    quote-aware (quotes may contain unbalanced parens)."""
    assert s[open_idx] == "("
    depth = 0
    quote = ""
    i = open_idx
    while i < len(s):
        c = s[i]
        if quote:
            if c == "\\" and i + 1 < len(s):
                i += 1
            elif c == quote:
                if i + 1 < len(s) and s[i + 1] == quote:
                    i += 1
                else:
                    quote = ""
        elif c in _QUOTES:
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return s[open_idx + 1:i], s[i + 1:]
        i += 1
    raise ValueError(f"unbalanced parentheses in DDL: {s[:120]!r}")

_TABLE_LEVEL_KEYS = re.compile(
    r"^(PRIMARY\s+KEY|UNIQUE|KEY|INDEX|CONSTRAINT|FOREIGN\s+KEY|CHECK)\b",
    re.I)


def _parse_create_table(body: str, table: str) -> Event:
    cols: list[list] = []
    pk: list[str] = []
    for item in _split_top_level(body):
        m = re.match(r"^PRIMARY\s+KEY\s*\(([^)]*)\)", item, re.I)
        if m:
            pk = [without_quotes(p.strip())
                  for p in m.group(1).split(",") if p.strip()]
            continue
        if _TABLE_LEVEL_KEYS.match(item):
            continue  # secondary indexes/constraints don't shape the schema
        m = re.match(r"^(`(?:[^`]|``)+`|'(?:[^']|'')+'|\"(?:[^\"]|\"\")+\"|\S+)\s+(.*)$",
                     item, re.S)
        if not m:
            raise ValueError(f"unparseable column def: {item!r}")
        name = without_quotes(m.group(1)).replace("``", "`")
        rest = m.group(2)
        typ, conv = map_column_type(rest)
        if re.search(r"\bPRIMARY\s+KEY\b", rest, re.I):
            pk.append(name)
        cols.append([name, typ, conv] if conv else [name, typ])
    payload = json.dumps({"columns": cols, "primary_key": pk})
    return (DDL_CREATE_TABLE, table, "", payload)


def _ident(tok: str) -> str:
    return without_quotes(tok.strip()).replace("``", "`")


#: ALTER clauses that shape no replicated schema: secondary indexes,
#: constraints, default tweaks, storage/table options
#: (MySqlAntlrDdlParser handles the full dialect; the replicated schema
#: only changes through column/table shape — these clauses are parsed
#: and dropped, not errors)
_ALTER_IGNORABLE = re.compile(
    r"^(?:"
    r"ADD\s+(?:UNIQUE|FULLTEXT|SPATIAL)?\s*(?:INDEX|KEY)\b"
    r"|ADD\s+(?:CONSTRAINT|FOREIGN\s+KEY|CHECK|UNIQUE)\b"
    r"|DROP\s+(?:INDEX|KEY|FOREIGN\s+KEY|CONSTRAINT|CHECK)\b"
    r"|ALTER\s+(?:COLUMN\s+)?\S+\s+(?:SET|DROP)\b"
    r"|(?:DEFAULT\s+)?(?:CHARACTER\s+SET|CHARSET)\b"
    r"|CONVERT\s+TO\s+CHARACTER\s+SET\b"
    r"|(?:ENGINE|AUTO_INCREMENT|ROW_FORMAT|COMMENT|COLLATE)\b"
    r"|(?:ENABLE|DISABLE)\s+KEYS\b"
    r"|(?:ORDER\s+BY|FORCE|ALGORITHM|LOCK)\b"
    r")", re.I)

#: A primary-key change — via ADD/DROP/MODIFY/CHANGE ... PRIMARY KEY,
#: ADD CONSTRAINT ... PRIMARY KEY, or MySQL's index-name spelling
#: DROP INDEX/KEY `PRIMARY` — changes the row-identity rule every
#: fence, partition route and LWW merge keys on; silently dropping it
#: would let the replicated state diverge from the source. Loud
#: failure, like the DROP-COLUMN-of-a-PK path.
_PK_CHANGE = re.compile(
    r"^(?:ADD|DROP|MODIFY|CHANGE)\b.*\bPRIMARY\s+KEY\b", re.I | re.S)
_PK_INDEX_DROP = re.compile(
    r"^DROP\s+(?:INDEX|KEY)\s+(\S+)", re.I)


def _pk_error(clause: str) -> ValueError:
    return ValueError(
        f"primary-key change is unsupported ({clause!r}): key "
        "identity is the replication contract")


def _reject_pk_column_attr(clause: str, type_text: str) -> None:
    """A COLUMN clause whose modifiers declare the column a key —
    ``PRIMARY KEY`` or MySQL's bare ``KEY`` attribute (but not
    ``UNIQUE KEY``/``FOREIGN KEY``) — is a primary-key change."""
    masked = _mask_quoted(type_text)
    _, masked = _strip_generated(type_text, masked)
    masked = re.sub(r"\b(?:UNIQUE|FOREIGN)\s+KEY\b", " ", masked,
                    flags=re.I)
    if re.search(r"\bPRIMARY\s+KEY\b|\bKEY\b", masked, re.I):
        raise _pk_error(clause)


def _parse_alter(rest: str, table: str) -> list[Event]:
    events: list[Event] = []
    for clause in _split_top_level(rest):
        if _PK_CHANGE.match(_mask_quoted(clause)):
            raise _pk_error(clause)
        pm = _PK_INDEX_DROP.match(clause)
        if pm and _ident(pm.group(1)).upper() == "PRIMARY":
            # DROP INDEX `PRIMARY`: MySQL's index-name spelling of a
            # primary-key drop (the PK index is literally named PRIMARY)
            raise _pk_error(clause)
        if _ALTER_IGNORABLE.match(clause):
            continue
        # parenthesized multi-ADD: ADD [COLUMN] (a INT, b TEXT, ...)
        m = re.match(r"^ADD\s+(?:COLUMN\s+)?\((.*)\)$", clause, re.I | re.S)
        if m:
            for item in _split_top_level(m.group(1)):
                im = re.match(r"^(\S+)\s+(.*)$", item, re.S)
                if not im:
                    raise ValueError(f"unparseable column def: {item!r}")
                name = _ident(im.group(1))
                _reject_pk_column_attr(clause, im.group(2))
                typ, conv = map_column_type(im.group(2))
                doc = {"action": "add", "column": name, "type": typ}
                if conv:
                    doc["converter"] = conv
                events.append((DDL_ALTER_TABLE, table, "", json.dumps(doc)))
            continue
        m = re.match(r"^ADD\s+(?:COLUMN\s+)?(\S+)\s+(.*)$", clause, re.I | re.S)
        if m:
            name = _ident(m.group(1))
            _reject_pk_column_attr(clause, m.group(2))
            typ, conv = map_column_type(m.group(2))
            doc = {"action": "add", "column": name, "type": typ}
            if conv:
                doc["converter"] = conv
            events.append((DDL_ALTER_TABLE, table, "", json.dumps(doc)))
            continue
        m = re.match(r"^RENAME\s+COLUMN\s+(\S+)\s+TO\s+(\S+)$", clause, re.I)
        if m:
            events.append((DDL_ALTER_TABLE, table, "", json.dumps(
                {"action": "rename", "column": _ident(m.group(1)),
                 "new_name": _ident(m.group(2))})))
            continue
        m = re.match(r"^MODIFY\s+(?:COLUMN\s+)?(\S+)\s+(.*)$", clause,
                     re.I | re.S)
        if m:
            _reject_pk_column_attr(clause, m.group(2))
            typ, _conv = map_column_type(m.group(2))
            events.append((DDL_ALTER_TABLE, table, "", json.dumps(
                {"action": "widen", "column": _ident(m.group(1)),
                 "type": typ})))
            continue
        m = re.match(r"^CHANGE\s+(?:COLUMN\s+)?(\S+)\s+(\S+)\s+(.*)$",
                     clause, re.I | re.S)
        if m:
            old, new = _ident(m.group(1)), _ident(m.group(2))
            _reject_pk_column_attr(clause, m.group(3))
            typ, _conv = map_column_type(m.group(3))
            if old != new:
                events.append((DDL_ALTER_TABLE, table, "", json.dumps(
                    {"action": "rename", "column": old, "new_name": new})))
            events.append((DDL_ALTER_TABLE, table, "", json.dumps(
                {"action": "widen", "column": new, "type": typ})))
            continue
        m = re.match(r"^RENAME\s+(?:TO\s+|AS\s+)?(\S+)$", clause, re.I)
        if m:
            new = qualified_table(m.group(1),
                                  table.partition(".")[0])
            events.append((DDL_RENAME_TABLE, new, table, json.dumps(
                {"new_name": new})))
            continue
        m = re.match(r"^DROP\s+(?:COLUMN\s+)?(\S+)$", clause, re.I)
        if m:
            events.append((DDL_ALTER_TABLE, table, "", json.dumps(
                {"action": "drop", "column": _ident(m.group(1))})))
            continue
        raise ValueError(f"unsupported ALTER clause: {clause!r}")
    return events


def parse_ddl_sql(sql: str, default_db: str = "") -> list[Event]:
    """One DDL statement -> structured event tuples
    ``(ddl_op, table, prev_table, payload_json)`` for ``Registry.apply``."""
    s = sql.strip().rstrip(";").strip()

    m = re.match(r"^CREATE\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+NOT\s+EXISTS\s+)?(\S+)$",
                 s, re.I)
    if m:
        return [(DDL_CREATE_DATABASE, _ident(m.group(1)), "", "{}")]
    m = re.match(r"^DROP\s+(?:DATABASE|SCHEMA)\s+(?:IF\s+EXISTS\s+)?(\S+)$",
                 s, re.I)
    if m:
        return [(DDL_DROP_DATABASE, _ident(m.group(1)), "", "{}")]
    m = re.match(r"^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(.+?)\s+"
                 r"LIKE\s+(\S+)$", s, re.I)
    if m:
        # CREATE TABLE x LIKE y: copy y's schema (MySQL table-clone DDL)
        table = qualified_table(m.group(1), default_db)
        src = qualified_table(m.group(2), default_db)
        return [(DDL_CREATE_TABLE, table, "",
                 json.dumps({"like": src}))]
    m = re.match(r"^CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(.+?)\s*\(",
                 s, re.I | re.S)
    if m:
        table = qualified_table(m.group(1), default_db)
        # balanced, quote-aware body extraction: trailing table options
        # (ENGINE=..., PARTITION BY HASH(id) PARTITIONS 4, ...) may
        # themselves contain parens, so a greedy regex mis-captures
        body, _rest = _balanced_group(s, m.end() - 1)
        return [_parse_create_table(body, table)]
    m = re.match(r"^DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(.+)$", s, re.I)
    if m:
        return [(DDL_DROP_TABLE, qualified_table(m.group(1), default_db),
                 "", "{}")]
    m = re.match(r"^TRUNCATE\s+(?:TABLE\s+)?(.+)$", s, re.I)
    if m:
        return [(DDL_TRUNCATE_TABLE,
                 qualified_table(m.group(1), default_db), "", "{}")]
    m = re.match(r"^RENAME\s+TABLE\s+(.+?)\s+TO\s+(.+)$", s, re.I)
    if m:
        old = qualified_table(m.group(1), default_db)
        new = qualified_table(m.group(2), default_db)
        return [(DDL_RENAME_TABLE, new, old, json.dumps({"new_name": new}))]
    m = re.match(
        r"^ALTER\s+TABLE\s+(?:IF\s+EXISTS\s+)?(.+?)\s+"
        r"(ADD|RENAME|MODIFY|CHANGE|DROP|ALTER|ENGINE|AUTO_INCREMENT"
        r"|DEFAULT|CHARACTER|CHARSET|COLLATE|COMMENT|ROW_FORMAT|CONVERT"
        r"|ENABLE|DISABLE|ORDER|FORCE|ALGORITHM|LOCK)\b(.*)$",
        s, re.I | re.S)
    if m:
        table = qualified_table(m.group(1), default_db)
        return _parse_alter((m.group(2) + m.group(3)).strip(), table)
    raise ValueError(f"unsupported DDL statement: {sql[:120]!r}")


# ---------------------------------------------------------------------------
# multi-statement scripts (the schema-change-topic / mysqldump shape)
# ---------------------------------------------------------------------------

#: statements with no replicated-schema consequence, skipped by the
#: script front-end (session/txn control, secondary indexes, privileges)
_SCRIPT_SKIP = re.compile(
    r"^(?:SET|BEGIN|COMMIT|ROLLBACK|START\s+TRANSACTION|FLUSH"
    r"|LOCK\s+TABLES?|UNLOCK\s+TABLES?"
    r"|CREATE\s+(?:UNIQUE\s+|FULLTEXT\s+|SPATIAL\s+)?INDEX|DROP\s+INDEX"
    r"|ANALYZE\s+TABLE|OPTIMIZE\s+TABLE"
    r"|GRANT|REVOKE|CREATE\s+USER|DROP\s+USER)\b", re.I)


def split_statements(script: str) -> list[str]:
    """Quote- and comment-aware statement split: ``;`` at top level ends
    a statement; ``-- ``/``#`` line comments and ``/* */`` block
    comments (including MySQL ``/*! */`` version comments, whose guarded
    content here is session SET noise) are stripped; quoted literals
    (with backslash and doubled-quote escapes) pass through intact."""
    out: list[str] = []
    buf: list[str] = []
    quote = ""
    i, n = 0, len(script)
    while i < n:
        c = script[i]
        if quote:
            buf.append(c)
            if c == "\\" and i + 1 < n:
                buf.append(script[i + 1])
                i += 1
            elif c == quote:
                if i + 1 < n and script[i + 1] == quote:
                    buf.append(quote)
                    i += 1
                else:
                    quote = ""
        elif c in _QUOTES:
            quote = c
            buf.append(c)
        elif c == "-" and script[i:i + 3] in ("-- ", "--\t", "--\n"):
            while i < n and script[i] != "\n":
                i += 1
            buf.append(" ")
        elif c == "#":
            while i < n and script[i] != "\n":
                i += 1
            buf.append(" ")
        elif c == "/" and script[i:i + 2] == "/*":
            end = script.find("*/", i + 2)
            i = n if end < 0 else end + 1
            buf.append(" ")
        elif c == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(c)
        i += 1
    stmt = "".join(buf).strip()
    if stmt:
        out.append(stmt)
    return out


def parse_ddl_script(script: str, default_db: str = "",
                     skip_unsupported: bool = False) -> list[Event]:
    """A multi-statement DDL script -> the flat event list, in statement
    order. ``USE db`` switches the default database for the statements
    that follow (the mysqldump / schema-change-topic convention);
    session/index/privilege statements are skipped. An unparseable
    statement raises unless ``skip_unsupported`` (the analog of
    Debezium's ``database.history.skip.unparseable.ddl``)."""
    events: list[Event] = []
    db = default_db
    for stmt in split_statements(script):
        m = re.match(r"^USE\s+(\S+)$", stmt, re.I)
        if m:
            db = _ident(m.group(1))
            continue
        m = re.match(r"^DROP\s+(?:INDEX|KEY)\s+(\S+)\s+ON\b", stmt, re.I)
        if m and _ident(m.group(1)).upper() == "PRIMARY":
            # standalone index-name spelling of a primary-key drop
            raise _pk_error(stmt)
        if _SCRIPT_SKIP.match(stmt):
            continue
        try:
            events.extend(parse_ddl_sql(stmt, db))
        except ValueError:
            if not skip_unsupported:
                raise
    return events
