"""Scaling-evidence protocol (SURVEY.md §4.3, BASELINE.json north_rule).

No real cluster in the sandbox, so the N→4N-executor criterion is
evidenced by running the identical job at two parallelism levels on the
same input. Each level runs in its own subprocess (a JVM's master can't
change in-process); throughput + raw and hardware-normalized efficiency
land in ``BENCH/BASELINE.md``.

Default levels are local[2] vs local[8]: a pure-CPU calibration phase
shows this VM's 32 vCPUs are oversubscribed and only the first ~8-16
threads scale linearly, so 2→8 is the widest honest 4x window (the
calibration is re-run every invocation and printed into the report).

Usage: python tools/scaling_bench.py [sf_dir] [repeats] [shape] [N] [4N]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def run_once(sf_dir: str, cores: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cores))
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=2400,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


_CALIBRATE = """
import time, sys
from pyspark.sql import SparkSession, functions as F
cores = int(sys.argv[1])
spark = (SparkSession.builder.master(f"local[{cores}]").appName("cal")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.range(10_000).count()
t = time.time()
spark.range(0, 3_000_000_000, 1, 256).select(
    F.count(F.when(F.xxhash64("id") % 1000 == 0, 1))).collect()
print(f"CAL {time.time()-t:.2f}")
spark.stop()
"""


def calibrate(cores: int) -> float:
    """Pure-CPU hardware ceiling: hash-mixing throughput at this thread
    count. The sandbox VM does not deliver 4x real CPU from 8→32
    threads, so raw scaling efficiency is bounded by this ratio — the
    normalized efficiency divides it out."""
    out = subprocess.run(
        [sys.executable, "-c", _CALIBRATE, str(cores)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    for ln in out.stdout.splitlines():
        if ln.startswith("CAL "):
            return float(ln.split()[1])
    raise RuntimeError(out.stdout + out.stderr)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    shape = sys.argv[3] if len(sys.argv) > 3 else "100x40000"
    lo = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    hi = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    # default N=2 vs 4N=8: pure-CPU calibration shows this VM scales
    # linearly only inside its first ~8-16 threads (32 vCPUs are
    # oversubscribed ~4:1); 2->8 is the largest honest 4x window.
    os.environ["SPARK_GRAFT_SEQ_SHAPE"] = shape

    # hardware ceiling: what 8→32 threads is physically worth on this VM
    cal_lo = min(calibrate(lo) for _ in range(2))
    cal_hi = min(calibrate(hi) for _ in range(2))
    hw_speedup = cal_lo / cal_hi
    print(f"hardware calibration: pure-CPU {lo}→{hi} speedup = {hw_speedup:.2f}x "
          f"(ideal {hi//lo}x)", flush=True)

    results: dict[int, list[dict]] = {lo: [], hi: []}
    for r in range(repeats):
        for cores in (lo, hi):
            t0 = time.time()
            res = run_once(sf_dir, cores)
            print(
                f"run {r} cores={cores}: seq_validate={res['queries']['seq_validate']}s "
                f"thr={res['validated_seqs_per_sec']}/s total={res['value']}s "
                f"(wall {time.time()-t0:.0f}s)",
                flush=True,
            )
            results[cores].append(res)

    def best(cores: int, key):
        return max(key(r) for r in results[cores])

    thr_lo = best(lo, lambda r: r["validated_seqs_per_sec"])
    thr_hi = best(hi, lambda r: r["validated_seqs_per_sec"])
    eff = (thr_hi / thr_lo) / (hi / lo)
    eff_norm = (thr_hi / thr_lo) / hw_speedup

    # SAME-RUN hardware ceiling: session-start calibration can drift
    # before the timed runs (scaling session O measured a 4.24x ceiling
    # whose 4-core runs then throttled — point-in-time cal can't see
    # that). bench.py records a cal probe IMMEDIATELY BEFORE each
    # seq_validate run at the invocation's own core count, so the cal
    # paired with the best run at each level gives the ceiling that was
    # actually in force while the best runs executed.
    def best_run_cal(cores: int) -> float:
        inv = max(
            results[cores], key=lambda r: r["validated_seqs_per_sec"]
        )
        runs, cals = inv["seq_validate_runs"], inv["seq_validate_run_cals"]
        return cals[runs.index(min(runs))]

    cal_sr_lo, cal_sr_hi = best_run_cal(lo), best_run_cal(hi)
    hw_speedup_samerun = cal_sr_lo / cal_sr_hi
    eff_norm_samerun = (thr_hi / thr_lo) / hw_speedup_samerun
    print(
        f"same-run hardware ceiling: {hw_speedup_samerun:.2f}x "
        f"(best-run cals {cal_sr_lo:.2f}s @ local[{lo}] / "
        f"{cal_sr_hi:.2f}s @ local[{hi}]); "
        f"normalized_samerun={eff_norm_samerun:.2f}",
        flush=True,
    )

    ratio = hi // lo
    md = f"""# BENCH — measured baseline + scaling evidence

Input: synthetic sequences table (seed 42), shape {shape}
({results[lo][0]['seq_rows']:,} sequences, ~256 tokens/row), full
constraint suite: null/len/token-range/empty/source invariants + salted
doc_id uniqueness + broadcast referential + token & n_tok histogram
drift KL/PSI. Best of {repeats} runs per level. Protocol per SURVEY.md
§4.3: identical job, identical input, two parallelism levels in
separate JVMs (no real cluster in the sandbox).

## Level choice + hardware calibration

The VM advertises 32 vCPUs but a pure-CPU Spark job (hash-mix count,
zero I/O, zero Python) scales linearly only inside its first ~8-16
threads (oversubscribed host); from local[{lo}] to local[{hi}] the same
job speeds up **{hw_speedup:.2f}x** (ideal {ratio}x), making {lo}→{hi}
the largest honest N→4N window this box can express. Raw efficiency
divides by {ratio}; normalized divides by the measured hardware ceiling.

| metric | local[{lo}] | local[{hi}] | raw eff (÷{ratio}) | normalized eff (÷{hw_speedup:.2f}) |
|---|---|---|---|---|
| validated sequences/sec (full suite) | {thr_lo:,.0f} | {thr_hi:,.0f} | {eff:.2f} | {eff_norm:.2f} |

## Per-query seconds (best local[{hi}] run)

| query | sec |
|---|---|
"""
    best_hi = min(results[hi], key=lambda r: r["value"])
    for k, v in best_hi["queries"].items():
        md += f"| {k} | {v} |\n"
    md += f"""
## Why the design scales on a real cluster

- one fused `groupBy(part_id)` aggregation pass (partial-merge map-side;
  shuffle carries one row per partition);
- violations via a single array-explode pass, uniqueness via salted
  two-phase aggregation (hot key bounded at n_salts reduce rows), the
  duplicate join-back and the referential check broadcast;
- token histograms via a zero-copy mapInArrow kernel whose shuffle
  output is `partitions × buckets` rows regardless of token count;
- the narrow featurized frame is the only thing cached (~1% of bytes);
- AQE on (runtime coalesce + skew-join).
All cross-node traffic is per-partition constants, so executor count
scales the scan/compute plane linearly — the thing a single shared VM
cannot demonstrate past its physical-core budget.

Raw JSON (last run each):

```json
{json.dumps(results[lo][-1])}
{json.dumps(results[hi][-1])}
```
"""
    out = REPO / "BENCH" / "BASELINE.md"
    out.parent.mkdir(exist_ok=True)
    # SPARK_GRAFT_SCALING_JSON: dump raw session results there and leave
    # BASELINE.md alone (used when accumulating several sessions whose
    # tables are then merged by hand with round history preserved)
    json_out = os.environ.get("SPARK_GRAFT_SCALING_JSON")
    if json_out:
        Path(json_out).write_text(
            json.dumps(
                {
                    "levels": {str(lo): results[lo], str(hi): results[hi]},
                    "hw_speedup": hw_speedup,
                    "thr_lo": thr_lo,
                    "thr_hi": thr_hi,
                    "raw_eff": eff,
                    "normalized_eff": eff_norm,
                    "hw_speedup_samerun": hw_speedup_samerun,
                    "normalized_eff_samerun": eff_norm_samerun,
                }
            )
        )
        print(f"wrote {json_out}; raw_eff={eff:.2f} normalized_eff={eff_norm:.2f}")
        return
    out.write_text(md)
    print(
        f"wrote {out}; raw_eff={eff:.2f} normalized_eff={eff_norm:.2f} "
        f"(hw ceiling {hw_speedup:.2f}x)"
    )


if __name__ == "__main__":
    main()
