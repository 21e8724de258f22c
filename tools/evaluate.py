"""Detection-quality evaluation — the engine's analog of the reference's
NAB harness (/root/reference/driver.py:84-138: run the model over
labeled datasets, join detections against anomaly windows, score).

Here the labels are the generator's injected corruptions + drifted
partitions (FIXTURES.md §3); the engine's detections are its violation
rows + drift-failed partitions. Reports row-level precision/recall per
check and partition-level drift detection.

Usage: python tools/evaluate.py [n_partitions rows_per_partition]
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

KIND_TO_CHECK = {
    "null_n_tok": "null_n_tok",
    "len_mismatch": "len_mismatch",
    "token_oob_neg": "token_range",
    "token_oob_high": "token_range",
    "dup_doc_id": "dup_doc_id",
    "bad_source": "bad_source",
    "empty_tokens": "empty_tokens",
}


def main() -> int:
    n_parts = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    from htm_streamer_spark.config import EngineConfig
    from htm_streamer_spark.fixtures.generator import (
        generate_sequences,
        write_sequences_parquet,
    )
    from htm_streamer_spark.plans.validation_plan import (
        load_sequences,
        run_validation_batch,
    )
    from htm_streamer_spark.session import get_spark

    out = tempfile.mkdtemp() + "/seq"
    write_sequences_parquet(out, n_partitions=n_parts, rows_per_partition=rows,
                            hot_key_copies=200)
    cols = generate_sequences(n_parts, rows, hot_key_copies=200)
    labels = pd.DataFrame(
        {"doc_id": cols["doc_id"], "part_id": cols["part_id"], "kind": cols["injected"]}
    )
    injected = labels[labels["kind"] != ""]

    spark = get_spark("evaluate", cores=8, driver_memory="8g")
    cfg = EngineConfig()
    res = run_validation_batch(spark, load_sequences(spark, out), cfg)
    viol = res.violations.toPandas()
    verd = res.verdicts.toPandas()

    report: dict = {"n_rows": n_parts * rows, "per_check": {}}
    detected = set(zip(viol["doc_id"], viol["part_id"], viol["check_id"]))
    for kind, check in KIND_TO_CHECK.items():
        truth = injected[injected["kind"] == kind]
        if len(truth) == 0:
            continue
        tp = sum(
            (d, p, check) in detected for d, p in zip(truth["doc_id"], truth["part_id"])
        )
        recall = tp / len(truth)
        report["per_check"][kind] = {"n_injected": int(len(truth)), "recall": round(recall, 4)}

    # precision: every violation row must correspond to a genuinely bad row
    # (injected corruption, a hot-key duplicate, or the duplicate partner
    # of an injected dup)
    inj_set = set(zip(injected["doc_id"], injected["part_id"]))
    dup_ids = labels["doc_id"][labels["doc_id"].duplicated(keep=False)]
    dup_set = set(dup_ids)
    fp = 0
    for d, p, c in detected:
        if (d, p) in inj_set:
            continue
        if c == "dup_doc_id" and d in dup_set:
            continue  # duplicate partners / hot-key rows
        fp += 1
    report["row_precision"] = round(1 - fp / max(len(detected), 1), 6)
    report["n_violation_rows"] = int(len(detected))

    # drift: the last 2 partitions are drifted by construction
    drifted_truth = {n_parts - 1, n_parts - 2}
    clean_parts = set(range(cfg.baseline_partitions, n_parts)) - drifted_truth
    drift_detected = {
        int(r["part_id"])
        for _, r in verd.iterrows()
        if r["verdict"] == "fail" and r["n_violations"] == 0
    }
    report["drift"] = {
        "detected": sorted(drift_detected),
        "truth": sorted(drifted_truth),
        "recall": round(len(drift_detected & drifted_truth) / len(drifted_truth), 4),
        "false_positive_partitions": sorted(drift_detected - drifted_truth),
    }
    print(json.dumps(report, indent=1))
    ok = (
        all(v["recall"] == 1.0 for v in report["per_check"].values())
        and report["row_precision"] == 1.0
        and report["drift"]["recall"] == 1.0
        and not report["drift"]["false_positive_partitions"]
    )
    print("EVALUATION:", "PERFECT" if ok else "IMPERFECT")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
