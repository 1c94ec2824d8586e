"""Round-5z operators: exact latency percentiles, silhouette proxy."""

from __future__ import annotations

import datetime
import os
import tempfile

import code_graph_backend_spark.registry_ext32 as ext32  # noqa: F401

_EPOCH = datetime.datetime(1970, 1, 1)


class TestLatencyPercentiles:
    def test_order_statistics(self, spark):
        """Values 1..100 for one type: p50=50, p90=90, p99=99 (type-1
        order statistic: smallest rank covering the quantile)."""
        rows = [
            (i, 1, _EPOCH + datetime.timedelta(seconds=i), "a", float(i))
            for i in range(1, 101)
        ]
        ev = spark.createDataFrame(
            rows,
            "event_id long, user_id long, ts timestamp, event_type string, value double",
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = ext32.events_latency_percentiles_q(spark, td).collect()
        r = out[0]
        assert r["n_events"] == 100
        assert (r["p50_micro"], r["p90_micro"], r["p99_micro"]) == (
            50_000_000, 90_000_000, 99_000_000
        )


class TestSilhouetteProxy:
    def test_two_tight_clusters(self, spark):
        """Cluster A at (0,0)/(0,2), cluster B at (10,10)/(10,12):
        centroids (0,1) and (10,11); intra d2 = 1e12 per member; inter
        d2 = (1e7)^2 * 2 = 2e14."""
        rows = [
            (1, [0.0, 0.0], 0), (2, [0.0, 2.0], 0),
            (3, [10.0, 10.0], 1), (4, [10.0, 12.0], 1),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label long"
        )
        with tempfile.TemporaryDirectory() as td:
            emb.write.parquet(os.path.join(td, "embeddings.parquet"))
            out = {
                r["label"]: r
                for r in ext32.emb_silhouette_proxy_q(spark, td).collect()
            }
        unit = 1_000_000
        for lab in (0, 1):
            r = out[lab]
            assert r["n_members"] == 2
            assert r["sum_intra_sq"] == 2 * unit**2  # each member 1.0 away
            assert r["min_inter_sq"] == (10 * unit) ** 2 * 2
            assert r["avg_intra_sq"] == unit**2
