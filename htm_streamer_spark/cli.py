"""spark-submit entry point.

Deployment per the north rule: ``spark-submit --py-files
htm_streamer_spark.zip htm_streamer_spark/cli.py validate --table
s3://…/sequences --checkpoint s3://…/ckpt --config engine.yaml``.
On a cluster the SparkSession comes from spark-submit's conf (master,
executors); locally it falls back to the engine defaults.

Subcommands mirror the reference's entry points
(run_batch / run_stream / reset, SURVEY.md §3):

- ``validate``  — incremental run over all unvalidated partitions
  (≙ run_batch + the stream driver's resume loop)
- ``refresh-baseline`` — re-estimate drift baseline (W3)
- ``status``    — print checkpoint verdict summary
- ``reset``     — truncate the checkpoint (≙ reset_config)
"""

from __future__ import annotations

import argparse
import json
import sys


def _session(app: str):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    try:
        # under spark-submit, builder picks up submitted conf
        return SparkSession.builder.appName(app).getOrCreate()
    except Exception:
        from htm_streamer_spark.session import get_spark

        return get_spark(app)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="htm-streamer-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("validate", help="validate all unvalidated partitions")
    pv.add_argument("--table", required=True, help="sequences table path")
    pv.add_argument("--checkpoint", required=True, help="checkpoint catalog path")
    pv.add_argument("--config", help="engine config YAML")
    pv.add_argument("--max-partitions", type=int, default=None)
    pv.add_argument("--run-id", default=None)
    pv.add_argument(
        "--repartition",
        type=int,
        default=None,
        metavar="WIDTH",
        help="explicit repartition(WIDTH, hash(doc_id)) of the batch "
        "before validation — use when input files are skewed/oversized",
    )

    pr = sub.add_parser("refresh-baseline", help="re-estimate the drift baseline")
    pr.add_argument("--table", required=True)
    pr.add_argument("--checkpoint", required=True)
    pr.add_argument("--config", help="engine config YAML")

    ps = sub.add_parser("status", help="checkpoint verdict summary")
    ps.add_argument("--checkpoint", required=True)

    pt = sub.add_parser("reset", help="truncate the checkpoint catalog")
    pt.add_argument("--checkpoint", required=True)

    args = p.parse_args(argv)

    from htm_streamer_spark.config import EngineConfig, config_from_yaml
    from htm_streamer_spark.sources.table_io import ManifestCatalog

    cfg = config_from_yaml(args.config) if getattr(args, "config", None) else EngineConfig()
    catalog = ManifestCatalog(args.checkpoint)

    if args.cmd == "reset":
        catalog.truncate()
        print(json.dumps({"status": "reset"}))
        return 0

    spark = _session("htm_streamer_spark")

    if args.cmd == "validate":
        from htm_streamer_spark.streaming.incremental import run_incremental

        summary = run_incremental(
            spark,
            args.table,
            catalog,
            cfg,
            run_id=args.run_id,
            max_partitions=args.max_partitions,
            repartition_width=args.repartition,
        )
        print(json.dumps(summary))
        return 0

    if args.cmd == "refresh-baseline":
        from htm_streamer_spark.streaming.incremental import refresh_baseline

        out = refresh_baseline(spark, args.table, catalog, cfg)
        print(json.dumps(out))
        return 0

    if args.cmd == "status":
        from htm_streamer_spark.streaming.incremental import CheckpointStore

        store = CheckpointStore(catalog)
        verd = store.verdicts(spark)
        if verd is None:
            print(json.dumps({"partitions": 0}))
            return 0
        from pyspark.sql import functions as F

        counts = {
            r["status"]: r["n"]
            for r in verd.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        print(json.dumps({"partitions": sum(counts.values()), "by_status": counts}))
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
