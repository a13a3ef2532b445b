"""Scale a testdata sf directory up by an integer factor (default 10×,
sf0.1 → "sf1") for large-scale bench runs.

Fact tables (orders, lineitem, events, documents, embeddings) are
replicated with key offsets so join relationships hold; dimension tables
(region, nation, customer, supplier, part) are copied verbatim — the
"facts grow, dims don't" shape of a real warehouse. Replica documents get
a per-replica token appended and embeddings a small deterministic
perturbation so duplicate/near-duplicate rates stay realistic instead of
exploding by the replication factor (10 identical copies of every doc
would make pair-generating dedup queries measure a degenerate dup rate,
not scale).

Deterministic (seed fixed per replica); writes only under the output dir.

Usage: python tools/gen_scale.py [--src /root/testdata/sf0.1]
                                 [--dst /tmp/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACTS = ["orders", "lineitem", "events", "documents", "embeddings"]
KEY_COLS = ("o_orderkey", "l_orderkey", "event_id",
            "doc_id", "vec_id", "user_id")


def key_stride(src: str) -> int:
    """Replica key offset: the next power of 10 above every key column's
    max in the SOURCE — derived, not fixed, so re-scaling an
    already-scaled directory (sf0.1 → sf1 → sf10) can't collide replica
    key ranges (a fixed stride did: replicas i and j of pre-offset keys
    base+j·S landed on base+(i+j)·S)."""
    m = 0
    for name in FACTS:
        p = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(p):
            continue
        t = pq.read_table(p, columns=[
            c for c in KEY_COLS if c in pq.read_schema(p).names])
        for c in t.column_names:
            v = pa.compute.max(t.column(c)).as_py()
            if v is not None:
                m = max(m, int(v))
    stride = 10
    while stride <= m:
        stride *= 10
    return stride


def _offset(col: pa.ChunkedArray, i: int, stride: int) -> pa.Array:
    return pa.compute.add(col, i * stride)


def scale_table(name: str, src: str, dst: str, factor: int,
                stride: int) -> int:
    t = pq.read_table(os.path.join(src, f"{name}.parquet"))
    reps = []
    for i in range(factor):
        cols = {}
        for field in t.schema:
            c = t.column(field.name)
            if i == 0:
                cols[field.name] = c
                continue
            if field.name in KEY_COLS:
                cols[field.name] = _offset(c, i, stride)
            elif field.name == "text":
                # distinct replica text: append a replica token so exact/
                # near-dup pair counts scale linearly, not quadratically
                cols[field.name] = pa.compute.binary_join_element_wise(
                    c.cast(pa.string()), f" r{i}", " ")
            elif field.name == "embedding":
                rng = np.random.default_rng(1000 + i)
                flat = c.combine_chunks()
                vals = flat.values.to_numpy(zero_copy_only=False)
                noise = rng.normal(0, 0.01, size=vals.shape).astype(np.float32)
                cols[field.name] = pa.ListArray.from_arrays(
                    flat.offsets, pa.array(vals + noise, type=pa.float32()))
            else:
                cols[field.name] = c
        reps.append(pa.table(cols, schema=None))
    out = pa.concat_tables(reps)
    pq.write_table(out, os.path.join(dst, f"{name}.parquet"))
    return out.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.dst, exist_ok=True)
    # absent tables are skipped, so a PARTIAL source dir (e.g. only the
    # tables one spot query needs) scales without materializing the rest
    for d in DIMS:
        src = os.path.join(args.src, f"{d}.parquet")
        if not os.path.exists(src):
            print(f"{d}: missing, skipped")
            continue
        shutil.copyfile(src, os.path.join(args.dst, f"{d}.parquet"))
        print(f"{d}: copied")
    stride = key_stride(args.src)
    print(f"key stride: {stride}")
    for f in FACTS:
        if not os.path.exists(os.path.join(args.src, f"{f}.parquet")):
            print(f"{f}: missing, skipped")
            continue
        n = scale_table(f, args.src, args.dst, args.factor, stride)
        print(f"{f}: {n} rows")


if __name__ == "__main__":
    main()
