"""Engine CLI: run, explain, and list declared queries.

    python -m sora_spark list [--tag TAG]
    python -m sora_spark run NAME [--sf DIR] [--limit N]
    python -m sora_spark explain NAME [--mode simple|formatted|...]
    python -m sora_spark inventory          # markdown table to stdout

The run/explain paths build the tuned session (sora_spark.session);
`--sf` defaults to $SPARK_GRAFT_SF_DIR or the sf0.001 fixtures.
"""

from __future__ import annotations

import argparse
import os
import sys


def _session():
    from sora_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = build_session(app_name="sora-cli", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sora_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    lp = sub.add_parser("list")
    lp.add_argument("--tag")
    rp = sub.add_parser("run")
    rp.add_argument("name")
    rp.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    rp.add_argument("--limit", type=int, default=20)
    ep = sub.add_parser("explain")
    ep.add_argument("name")
    ep.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ep.add_argument("--mode", default="formatted")
    sub.add_parser("inventory")
    args = p.parse_args(argv)

    from sora_spark.queries import REGISTRY

    if args.cmd == "list":
        for q in REGISTRY.values():
            if args.tag and args.tag not in q.tags:
                continue
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"{q.name:45s} [{oracle}] {','.join(q.tags)}")
        return 0

    if args.cmd == "inventory":
        print("| query | tier | tags | doc |")
        print("| --- | --- | --- | --- |")
        for q in REGISTRY.values():
            tier = "oracle" if q.oracle else "rows-only"
            doc = " ".join((q.doc or "").split()).replace("|", "\\|")
            if len(doc) > 140:
                doc = doc[:137] + "..."
            print(f"| {q.name} | {tier} | {','.join(q.tags)} | {doc} |")
        return 0

    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r}; `python -m sora_spark list`",
              file=sys.stderr)
        return 2
    spark = _session()
    df = REGISTRY[args.name].spark_fn(spark, args.sf)
    if args.cmd == "explain":
        df.explain(args.mode)
    else:
        df.show(args.limit, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # e.g. `... | head`
        raise SystemExit(0)
