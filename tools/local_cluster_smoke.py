"""Executor-boundary smoke: representative queries on local-cluster.

Everything else in this repo runs in ONE local-mode JVM, where driver
and executors share a process — broadcasts, Arrow UDF closures,
localCheckpoint blocks and Python-worker imports can never fail to
cross a process boundary. ``local-cluster[2,4,2048]`` launches two REAL
worker JVMs (Spark's own pseudo-cluster test harness), so this script
proves the five riskiest constructs survive an actual executor
boundary with oracle parity:

  * ``text_bloom_decontaminate`` — a numpy uint64 Bloom bitset built
    driver-side and broadcast as plan literals;
  * ``dedup_semantic`` — centroid-literal Arrow argmax + applyInPandas
    cell scoring (worker-side numpy closures);
  * ``similarity_pq`` — codebook literals riding the plan;
  * ``rml_gtfs_composite`` — multi-TM plan with broadcast joins and a
    shared-parent cache;
  * ``streaming_minhash_dedup`` — Structured Streaming availableNow
    drain with a checkpoint dir.

Usage: python tools/local_cluster_smoke.py [sf_dir] [query ...]
Exit 0 = all green. Used by tests/test_local_cluster.py (subprocess —
a second SparkSession must not fight the pytest session fixture's JVM).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "text_bloom_decontaminate",
    "dedup_semantic",
    "similarity_pq",
    "rml_gtfs_composite",
    "streaming_minhash_dedup",
]

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or QUERIES

    spark = (
        SparkSession.builder.master("local-cluster[2,4,2048]")
        .appName("sdm-rdfizer-spark-executor-smoke")
        # worker JVMs are fresh processes: their Python workers must
        # find the package (closures pickle module refs, not code)
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from sdm_rdfizer_spark.engine import tune_session

    tune_session(spark)

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for name in names:
        sdf = qs[name](spark, sf_dir)
        srows = [tuple("" if v is None else str(v) for v in r)
                 for r in sdf.collect()]
        scols = sorted(sdf.columns)
        idx = [sdf.columns.index(c) for c in scols]
        s_multi = Counter(tuple(r[i] for i in idx) for r in srows)
        if name not in oracles:
            print(f"{name:28s} rows={len(srows)} (rows-only)")
            if not srows:
                failures += 1
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        oidx = [ocols.index(c) for c in sorted(ocols)]
        o_multi = Counter(tuple("" if r[i] is None else str(r[i])
                                for i in oidx) for r in orows)
        ok = (scols == sorted(ocols) and s_multi == o_multi)
        print(f"{name:28s} {'OK' if ok else 'FAIL'} "
              f"spark={len(srows)} duck={len(orows)}")
        if not ok:
            failures += 1
            for r, n in list((s_multi - o_multi).items())[:3]:
                print(f"   spark-only ×{n}: {r}")
            for r, n in list((o_multi - s_multi).items())[:3]:
                print(f"   duck-only  ×{n}: {r}")
    spark.stop()
    print(f"executor-boundary smoke: {len(names) - failures}/{len(names)} OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
