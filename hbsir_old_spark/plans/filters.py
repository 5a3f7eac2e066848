"""Pandas-`query` dialect -> Spark SQL predicate translator.

The reference embeds pandas query strings in its schema YAML
(/root/reference/hbsir/core/data_engine.py:407-412; examples
schema.yaml:190-195,943,990,1035 — e.g. ``"Code not in [18888, 19993]"``,
``"Imputed_Rent.notnull() & (Imputed_Rent > 0)"``). The new engine keeps
that surface but compiles it to a SQL condition for ``DataFrame.filter`` so
the predicate participates in Catalyst pushdown.

Translated idioms:
* ``col.notnull()`` / ``col.isnull()``  -> ``col IS NOT NULL`` / ``IS NULL``
* ``in [a, b]`` / ``not in [a, b]``     -> ``IN (a, b)`` / ``NOT IN (a, b)``
* ``&`` / ``|`` / ``~``                 -> ``AND`` / ``OR`` / ``NOT``
* ``==``                                -> ``=``
* backticked names pass through (Spark SQL understands backticks)
"""

from __future__ import annotations

import re

_NOTNULL = re.compile(r"([`\w.]+)\s*\.\s*notnull\(\)")
_ISNULL = re.compile(r"([`\w.]+)\s*\.\s*isnull\(\)")
_IN_LIST = re.compile(r"(not\s+in|in)\s*\[([^\]]*)\]", re.IGNORECASE)
_EQ = re.compile(r"(?<![=!<>])==(?!=)")


_STRING_LITERAL = re.compile(r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"")


def translate_pandas_query(expr: str) -> str:
    """Translate a pandas ``DataFrame.query`` expression into a Spark SQL
    boolean expression. Quoted string literals are shielded so operators
    inside them (``Brand == 'A&B'``) survive untouched."""
    literals: list[str] = []

    def shield(m: re.Match) -> str:
        literals.append(m.group(0))
        return f"\x00{len(literals) - 1}\x00"

    out = _STRING_LITERAL.sub(shield, expr)
    out = _NOTNULL.sub(lambda m: f"{m.group(1)} IS NOT NULL", out)
    out = _ISNULL.sub(lambda m: f"{m.group(1)} IS NULL", out)
    out = _IN_LIST.sub(lambda m: f"{m.group(1).upper()} ({m.group(2)})", out)
    out = _EQ.sub("=", out)
    out = out.replace("&", " AND ").replace("|", " OR ")
    out = re.sub(r"~\s*", " NOT ", out)
    out = re.sub(r"\s+", " ", out).strip()
    return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], out)
