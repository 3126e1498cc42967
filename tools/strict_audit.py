#!/usr/bin/env python
"""Full-precision cross-engine audit: every oracled query, Spark vs
DuckDB, compared at FULL float precision (repr, no rounding) and exact
string forms — stricter than tests/test_oracle_parity.py's 6dp
canonicalization, so it catches divergence the rounded parity suite
would hide (it is how the round-2 HUGEINT/int-width alignment was
validated at all three SFs).

Usage:
  python tools/strict_audit.py [sf_dir]     (default /root/testdata/sf0.01)

At sf0.1 pass --skip-q22: the DuckDB oracle's nested-loop theta join
alone takes ~316s there (the Spark side runs the banded plan in ~0.5s);
q22 stays covered at the smaller SFs.

Exit code 0 iff every checked query matches exactly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def c(v):
        if v is None:
            return "<N>"
        if isinstance(v, bool):
            return "b:" + str(v)
        if isinstance(v, float):
            return "f:" + repr(v)
        if isinstance(v, int):
            return "i:" + str(v)
        return "s:" + str(v)

    return sorted(tuple(c(r[i]) for i in order) for r in rows)


_SPARK_NUM_WIDTH = {
    "tinyint": 8, "smallint": 16, "int": 32, "bigint": 64,
    "float": -32, "double": -64,
}
_DUCK_NUM_WIDTH = {
    "TINYINT": 8, "SMALLINT": 16, "INTEGER": 32, "BIGINT": 64,
    "HUGEINT": 128, "UTINYINT": 8, "USMALLINT": 16, "UINTEGER": 32,
    "UBIGINT": 64, "FLOAT": -32, "DOUBLE": -64,
}


def width_mismatches(df, rel) -> list[tuple[str, str, str]]:
    """Numeric columns whose physical width differs across engines.

    The driver's value hash is TYPE-AWARE (r4: q115 hash-failed on
    Spark INT vs DuckDB BIGINT with bit-identical values), so equal
    values are not enough — int/float widths must match column-wise.
    """
    duck = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    bad = []
    for c, st in df.dtypes:
        sw = _SPARK_NUM_WIDTH.get(st)
        dw = _DUCK_NUM_WIDTH.get(duck.get(c, ""))
        if sw is not None and dw is not None and sw != dw:
            bad.append((c, st, duck[c]))
    return bad


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    skip = {"q22"} if "--skip-q22" in sys.argv else set()
    only: set[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = {q for q in a[len("--only="):].split(",") if q}

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("strict-audit")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad: dict[str, list] = {}
    n_checked = 0
    for name in sorted(qs, key=lambda k: int(k.lstrip("q"))):
        if name not in osql or name in skip:
            continue
        if only is not None and name not in only:
            continue
        n_checked += 1
        df = qs[name](spark, sf_dir)
        s = canon(df.columns, [tuple(r) for r in df.collect()])
        rel = con.sql(osql[name])
        wm = width_mismatches(df, rel)
        if wm:
            bad.setdefault(name, []).append(wm)
            print(f"TYPE-WIDTH MISMATCH {name}: {wm}")
        d = canon(rel.columns, rel.fetchall())
        if s != d:
            ex = next(((a, b) for a, b in zip(s, d) if a != b), None)
            bad.setdefault(name, []).append(ex)
            print(f"MISMATCH {name}: {ex}")
    if n_checked == 0:
        # a filter matching nothing must not read as a green audit
        print("STRICT_AUDIT ERROR: no queries matched the filter")
        return 2
    print(f"STRICT_CHECKED: {n_checked}")
    print("STRICT_MISMATCHES:", sorted(bad))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
