#!/usr/bin/env python
"""Appendable ANN index lifecycle: build → serve → append → staleness
→ retrain → serve again.

The nightly 100 TB cost model the persisted IVF/PQ stores implement
(operators/index_store.py, VERDICT r13 #4): training and corpus
encoding run at BUILD time; a day's new vectors arrive as an APPEND
(IVF: a partitioned write into their ``label=`` dirs; PQ: an encode of
only the increment against the broadcast stored codebook); the frozen
trained artifact drifts measurably (`*_index_staleness`) until the
documented 10% trigger fires, at which point IVF retrains with ONE
aggregate over the stored vectors while PQ honestly rebuilds (a new
codebook invalidates every stored code).

Everything runs against a PRIVATE tempdir index — never the shared
per-sf_dir store the driver/bench serve.

    python examples/ann_index_lifecycle.py \
        [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from streaming_amqp_spark.operators import index_store as ixs  # noqa: E402
from streaming_amqp_spark.operators.similarity import (  # noqa: E402
    ivf_topk_from,
)
from streaming_amqp_spark.session import get_spark  # noqa: E402
from streaming_amqp_spark.tables import load_table  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    spark = get_spark("ann-index-lifecycle")
    workdir = tempfile.mkdtemp(prefix="annlife_")
    try:
        emb = load_table(spark, args.sf_dir, "embeddings")
        day0 = emb.where(F.col("vec_id") % 4 != 3)  # "yesterday's corpus"
        day1 = emb.where(F.col("vec_id") % 4 == 3)  # "today's arrivals"

        # 1. bootstrap: train + lay out vectors by cluster
        path = str(Path(workdir) / "ivf")
        t0 = time.perf_counter()
        ixs.build_ivf_index_from(day0, path)
        print(f"[1] IVF index built on {day0.count()} vectors "
              f"in {time.perf_counter() - t0:.2f}s")

        # 2. serve from the store (training never runs at query time)
        t0 = time.perf_counter()
        n0 = ivf_topk_from(*ixs.load_ivf_index(spark, path)).count()
        print(f"[2] top-k serve: {n0} result rows "
              f"in {time.perf_counter() - t0:.2f}s")

        # 3. append today's vectors — partitioned write, centroids frozen
        ixs.append_ivf_index(day1, path)
        st = ixs.ivf_index_staleness(spark, path)
        print(f"[3] appended {day1.count()} vectors; staleness "
              f"{st['appended_fraction']:.0%} -> retrain_due="
              f"{st['retrain_due']}")
        assert st["retrain_due"]  # ~33% appended > the 10% trigger

        # 4. retrain = ONE aggregate over the STORED vectors
        t0 = time.perf_counter()
        ixs.retrain_ivf_centroids(spark, path)
        print(f"[4] centroids retrained from the store "
              f"in {time.perf_counter() - t0:.2f}s")
        st = ixs.ivf_index_staleness(spark, path)
        assert not st["retrain_due"]

        # 5. the retrained store answers exactly like a from-scratch
        #    build on the full corpus (the append-equals-full contract)
        full = str(Path(workdir) / "ivf_full")
        ixs.build_ivf_index_from(emb, full)
        a = ivf_topk_from(*ixs.load_ivf_index(spark, path))
        b = ivf_topk_from(*ixs.load_ivf_index(spark, full))
        # engine-side multiset equality — no rows cross to the driver
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        n_rows = a.count()
        assert n_rows > 0
        print(f"[5] append+retrain ≡ full rebuild: {n_rows} identical "
              "result rows")
        print("OK")
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
