"""Driver-mimic oracle verifier: run any `queries()` entry AND its
`oracle_sql()` twin side-by-side over an sf directory and compare
rows / schema / value hash exactly the way the graft driver does
(columns sorted by name, rows sorted, md5 over CSV).

Usage:
    python tools/verify_oracles.py [--sf /root/testdata/sf0.01] [names...]

No names = every registered query. Exit code 1 if any comparison fails.
This file is a DEV TOOL with its own Ray session (the library itself
never calls ray.init)."""

from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import duckdb
    import pandas as pd

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __ray_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    names = args.names or sorted(qs)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    failures = 0
    for name in names:
        res = qs[name](args.sf)
        df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
        if name not in osql:
            print(f"{name}: rows-only {len(df)}")
            continue
        odf = con.execute(osql[name]).fetchdf()
        a, b = _norm(df), _norm(odf)
        rows = len(a) == len(b)
        schema = list(a.columns) == list(b.columns) and all(
            str(x) == str(y) for x, y in zip(a.dtypes, b.dtypes)
        )
        ha = hashlib.md5(a.to_csv(index=False).encode()).hexdigest()
        hb = hashlib.md5(b.to_csv(index=False).encode()).hexdigest()
        ok = rows and schema and ha == hb
        print(f"{name}: rows={len(a)}/{len(b)} schema={schema} hash={ha == hb}")
        if not ok:
            failures += 1
            print(f"  engine dtypes: {dict(a.dtypes.astype(str))}")
            print(f"  oracle dtypes: {dict(b.dtypes.astype(str))}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
