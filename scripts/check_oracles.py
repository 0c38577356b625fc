"""Local pre-flight for the driver's correctness gate: run every
`queries()` entry that has an `oracle_sql()` sibling at a given scale
factor and compare row count, column set, and sorted values (the driver
sorts columns by name before hashing, so this is at least as strict).

Usage: PYTHONPATH=. python scripts/check_oracles.py [sf_dir]
"""
from __future__ import annotations

import importlib.util
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype(np.float64)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    spec = importlib.util.spec_from_file_location("entry", "__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    qs, sqls = m.queries(), m.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    fails = []
    for name in sorted(qs):
        if name not in sqls:
            continue
        t0 = time.time()
        try:
            got = canon(to_df(qs[name](sf)))
            want = canon(con.execute(sqls[name]).df())
            assert list(got.columns) == list(want.columns), \
                f"schema {list(got.columns)} != {list(want.columns)}"
            assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
            pd.testing.assert_frame_equal(
                got, want.astype(got.dtypes.to_dict()), check_exact=False,
                rtol=0, atol=0)
            print(f"  ok   {name:<28} {len(got):>7} rows  "
                  f"{time.time() - t0:6.1f}s")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"  FAIL {name:<28} {str(e).splitlines()[0][:120]}")
    # rows-only entries: the driver's weaker gate — must run, return rows,
    # and any self-checking `ok` column must be all-true
    for name in sorted(set(qs) - set(sqls)):
        t0 = time.time()
        try:
            got = to_df(qs[name](sf))
            assert len(got) >= 0
            if "ok" in got.columns:
                assert bool(got["ok"].all()), "self-check column has False rows"
            print(f"  ok   {name:<28} {len(got):>7} rows  "
                  f"{time.time() - t0:6.1f}s (rows-only)")
        except Exception as e:  # noqa: BLE001 — report and continue
            fails.append(name)
            print(f"  FAIL {name:<28} {str(e).splitlines()[0][:120]}")
    print(f"{len(qs) - len(fails)} ok, "
          f"{len(fails)} failed{': ' + ', '.join(fails) if fails else ''}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
