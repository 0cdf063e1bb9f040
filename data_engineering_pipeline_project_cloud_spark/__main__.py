"""CLI — the analog of the reference's ``python pipeline.py`` entry
point (``scripts/pipeline.py:4-18``), plus query execution.

    python -m data_engineering_pipeline_project_cloud_spark pipeline --sf-dir DIR --out DIR
    python -m data_engineering_pipeline_project_cloud_spark query NAME --sf-dir DIR [-n 20]
    python -m data_engineering_pipeline_project_cloud_spark list
    python -m data_engineering_pipeline_project_cloud_spark sql "UPDATE `/t` SET ..." [-n 20]
    python -m data_engineering_pipeline_project_cloud_spark serve --sf-dir DIR --out DIR [--sql Q | --stdin]

``serve`` is the BI entry (the reference's Superset-over-warehouse
role, ``docker-compose.yml:21-47``): materialize the mart, register
the serving views (plans/parity.py:serve), then either run one SQL
statement (``--sql``), answer SQL statements line-by-line from stdin
(``--stdin`` — what the compose serving container runs), or print the
registered view names and exit.  For a real dashboard, point the
Thrift JDBC server or a Spark Connect client at the same session —
the views are session-scoped SQL tables.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data_engineering_pipeline_project_cloud_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pp = sub.add_parser("pipeline", help="run the 3-stage ELT pipeline")
    pp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pp.add_argument("--out", required=True)

    qp = sub.add_parser("query", help="run one registry query")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    qp.add_argument("-n", type=int, default=20, help="rows to show")

    sub.add_parser("list", help="list registry queries")

    gp = sub.add_parser("sql", help="run lakehouse SQL statements "
                                    "(statements.graft_sql grammar)")
    gp.add_argument("statement", nargs="?",
                    help="one statement or a ;-separated script "
                         "(BEGIN..COMMIT spans are transactional); "
                         "omit to read line-by-line from stdin")
    gp.add_argument("--script", metavar="FILE",
                    help="execute FILE ('-' = stdin) as ONE script "
                         "via graft_sql_script: statements split at "
                         "top-level semicolons, BEGIN..COMMIT spans "
                         "roll back atomically on mid-script failure")
    gp.add_argument("--group", metavar="DIR",
                    help="publish each script COMMIT as a consistent-"
                         "cut group snapshot under DIR "
                         "(table_group.pin_group)")
    gp.add_argument("-n", type=int, default=20, help="rows to show")

    sp = sub.add_parser("serve", help="materialize the mart and serve "
                                      "it as SQL views")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sp.add_argument("--out", required=True)
    sp.add_argument("--sql", help="run one SQL statement against the "
                                  "served views and print the rows")
    sp.add_argument("--stdin", action="store_true",
                    help="answer SQL statements line-by-line from stdin")
    sp.add_argument("-n", type=int, default=20, help="rows to show")

    args = p.parse_args(argv)

    from .plans import all_oracle_sql, all_queries

    if args.cmd == "list":
        oracle = all_oracle_sql()
        for name in sorted(all_queries()):
            print(f"{name}  [{'oracle' if name in oracle else 'rows-only'}]")
        return 0

    from .session import get_spark

    spark = get_spark("cli")
    if args.cmd == "pipeline":
        from .etl import run_pipeline

        report = run_pipeline(spark, args.sf_dir, args.out)
        print(json.dumps(report))
        return 0

    if args.cmd == "sql":
        from .statements import graft_sql, graft_sql_script

        if args.script:
            text = (sys.stdin.read() if args.script == "-"
                    else open(args.script).read())
            graft_sql_script(spark, text, group=args.group) \
                .show(args.n, truncate=False)
            return 0
        if args.statement:
            # a ;-separated script routes through the transactional
            # executor; a single statement behaves identically
            graft_sql_script(spark, args.statement,
                             group=args.group) \
                .show(args.n, truncate=False)
            return 0
        for line in sys.stdin:
            stmt = line.strip()
            if not stmt:
                continue
            try:
                graft_sql(spark, stmt).show(args.n, truncate=False)
            except Exception as exc:  # keep the console alive
                print(f"error: {exc}", file=sys.stderr, flush=True)
        return 0

    if args.cmd == "serve":
        from .plans.parity import serve, write_master

        write_master(spark, args.sf_dir, args.out)
        views = serve(spark, args.out)
        if args.sql:
            spark.sql(args.sql).show(args.n, truncate=False)
        elif args.stdin:
            print(f"serving views: {', '.join(views)}", flush=True)
            for line in sys.stdin:
                stmt = line.strip().rstrip(";")
                if not stmt:
                    continue
                try:
                    spark.sql(stmt).show(args.n, truncate=False)
                except Exception as exc:  # keep the console alive
                    print(f"error: {exc}", file=sys.stderr, flush=True)
        else:
            print(json.dumps({"views": views}))
        return 0

    qs = all_queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
        return 2
    qs[args.name](spark, args.sf_dir).show(args.n, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
