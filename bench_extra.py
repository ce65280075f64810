"""Extra benchmark harness for optimization work (guide §1).

NOT part of the driver contract — bench.py stays frozen. This file times
individual declared queries in isolation with the noop sink (times the
computation, not the sink), best/all-of-N, labels jobs, and can dump
`.explain("formatted")` plans for each query.

Usage:
  python bench_extra.py [--repeats N] [--explain-dir DIR] [name ...]
Env (same contract as bench.py):
  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS   (default 32)
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from tiflow_spark.plans.bench_queries import QUERIES
    from tiflow_spark.session import get_spark

    names = args.names or [
        "cdc_lww_final_state", "cdc_net_op_algebra", "cdc_update_split",
        "cdc_checksum_chunks", "text_stats", "text_lang_id", "dedup_exact",
        "dedup_minhash_sigs", "dedup_simhash", "ann_topk", "ann_lsh_topk",
        "embedding_near_dups",
    ]

    spark = get_spark("tiflow_spark_bench_extra", cores=cpus, shuffle_partitions=cpus)

    # warm-up (classloading + codegen compiler), same as bench.py
    QUERIES["cdc_checksum_chunks"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, dict] = {}
    for name in names:
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
        samples = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} [rep {i}]")
            t0 = time.time()
            df = QUERIES[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "results": out}))


if __name__ == "__main__":
    main()
