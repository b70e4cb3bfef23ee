"""CLI entry points — the non-interactive twin of the reference's menu.

The reference exposes three interactive menu actions (stdin loop at
/root/reference/ETLManager.py:101-124): 1 = file ingest, 2/3 = table
transfer with overwrite/append sink semantics. A scriptable pipeline can't
block on stdin, so the same three actions are subcommands:

    python -m data_integration_and_processing_spark ingest \
        --source data.csv --dest /sink/tbl --rename "автор=author,дата=date"
    python -m data_integration_and_processing_spark transfer \
        --source /lake/src_tbl --dest /sink/tbl --mode append

Rename maps accept the reference's Cyrillic->English style pairs
(ETLManager.py:42-48); name cleaning always applies.
"""

from __future__ import annotations

import argparse
import sys


def _parse_mapping(s: str | None) -> dict[str, str] | None:
    if not s:
        return None
    pairs = [p.split("=", 1) for p in s.split(",") if p]
    bad = [p for p in pairs if len(p) != 2]
    if bad:
        raise SystemExit(f"bad --rename entry (want old=new): {bad}")
    return dict(pairs)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_integration_and_processing_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="file -> cleaned/renamed -> sink (reference menu action 1)")
    ing.add_argument("--source", required=True)
    ing.add_argument("--dest", required=True)
    ing.add_argument("--source-fmt", default="csv", choices=["csv", "json", "parquet", "xlsx"])
    ing.add_argument("--dest-fmt", default="parquet")
    ing.add_argument("--rename", default=None, help="comma-separated old=new pairs")
    ing.add_argument("--mode", default="overwrite", choices=["overwrite", "append"])

    tr = sub.add_parser("transfer", help="table -> cleaned/renamed -> sink (reference menu actions 2/3)")
    tr.add_argument("--source", required=True, help="parquet path of the source table")
    tr.add_argument("--dest", required=True)
    tr.add_argument("--rename", default=None)
    tr.add_argument("--mode", default="overwrite", choices=["overwrite", "append"])

    qr = sub.add_parser(
        "query",
        help="run SQL over parquet tables: every <name>.parquet under --tables "
        "registers as a view named <name> (absent in the reference — its users "
        "query the warehouse directly; here the engine IS the warehouse)",
    )
    qr.add_argument("--tables", required=True, help="directory of <name>.parquet tables")
    qr.add_argument("--sql", required=True, help="ANSI SQL text; views are the table names")
    qr.add_argument("--dest", default=None, help="optional parquet output path (default: print)")
    qr.add_argument("--limit", type=int, default=20, help="rows to print when no --dest")

    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from data_integration_and_processing_spark.plans.pipelines import ingest_file, transfer
    from data_integration_and_processing_spark.session import get_spark

    # Only stop the session this invocation CREATED: get_spark's getOrCreate
    # returns any live session, and stopping a borrowed one kills the
    # embedding process's Spark (an in-process caller, a notebook, a test
    # suite) on the way out.
    borrowed = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name=f"cli-{args.cmd}")
    try:
        if args.cmd == "ingest":
            out = ingest_file(
                spark,
                args.source,
                args.dest,
                source_fmt=args.source_fmt,
                dest_fmt=args.dest_fmt,
                column_mapping=_parse_mapping(args.rename),
                mode=args.mode,
            )
        elif args.cmd == "query":
            import glob as _glob
            import os as _os

            for t in sorted(_glob.glob(f"{args.tables}/*.parquet")):
                name = _os.path.basename(t)[: -len(".parquet")]
                spark.read.parquet(t).createOrReplaceTempView(name)
            out = spark.sql(args.sql)
            if args.dest:
                out.write.mode("overwrite").parquet(args.dest)
                print(f"query: wrote {spark.read.parquet(args.dest).count()} rows to {args.dest}")
            else:
                out.show(args.limit, truncate=False)
            return 0
        else:
            out = transfer(
                spark,
                args.source,
                args.dest,
                column_mapping=_parse_mapping(args.rename),
                mode=args.mode,
            )
        print(f"{args.cmd}: wrote {out.count()} rows to {args.dest} ({args.mode})")
        return 0
    finally:
        if not borrowed:
            spark.stop()


if __name__ == "__main__":
    sys.exit(main())
