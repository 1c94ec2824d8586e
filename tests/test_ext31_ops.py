"""Round-5y operators: consistent-hash ring, bot regularity."""

from __future__ import annotations

import datetime
import hashlib
import os
import tempfile

import code_graph_backend_spark.registry_ext31 as ext31  # noqa: F401

_EPOCH = datetime.datetime(1970, 1, 1)


class TestHashRing:
    def test_matches_python_replica_and_moves_little(self, spark):
        """Assignments equal a pure-Python clockwise lookup, and the
        8->9 rebalance moves roughly 1/9 of docs (never the ~8/9 a
        modulo scheme would)."""
        from code_graph_backend_spark.registry_ext31 import (
            _RING_WORKERS, _ring_points,
        )

        docs = spark.createDataFrame(
            [(i,) for i in range(1, 401)], "doc_id long"
        )
        with tempfile.TemporaryDirectory() as td:
            docs.write.parquet(os.path.join(td, "documents.parquet"))
            rows = ext31.shard_hash_ring_q(spark, td).collect()

        def assign(pts, h):
            cands = [p * 16 + w for p, w in pts if p * 16 + w >= h * 16]
            packed = min(cands) if cands else pts[0][0] * 16 + pts[0][1]
            return packed % 16

        p8 = _ring_points(_RING_WORKERS)
        p9 = _ring_points(_RING_WORKERS + 1)
        want8, moved = {}, 0
        for i in range(1, 401):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16)
            w8 = assign(p8, h)
            want8[w8] = want8.get(w8, 0) + 1
            if assign(p9, h) != w8:
                moved += 1
        got8 = {r["worker"]: r["n_docs_8"] for r in rows}
        assert got8 == want8
        got_moved = sum(r["n_moved"] for r in rows)
        assert got_moved == moved
        assert got_moved < 400 // 3  # far below a modulo reshuffle


class TestBotRegularity:
    def test_metronomic_user_flagged(self, spark):
        """User 1 fires every 60s exactly (variance 0 -> flagged);
        user 2's gaps are bursty (not flagged); user 3 has too few
        events to judge."""
        rows = []
        eid = 0
        for i in range(7):
            eid += 1
            rows.append((eid, 1, _EPOCH + datetime.timedelta(seconds=60 * i), "a"))
        for gap_at in (0, 10, 500, 520, 9000, 9005):
            eid += 1
            rows.append((eid, 2, _EPOCH + datetime.timedelta(seconds=gap_at), "a"))
        rows.append((eid + 1, 3, _EPOCH, "a"))
        ev = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, event_type string"
        )
        with tempfile.TemporaryDirectory() as td:
            ev.write.parquet(os.path.join(td, "events.parquet"))
            out = {
                r["user_id"]: r
                for r in ext31.events_bot_regularity_q(spark, td).collect()
            }
        assert out[1]["var_num"] == 0 and out[1]["bot_flag"] == 1
        assert out[2]["bot_flag"] == 0
        assert 3 not in out
