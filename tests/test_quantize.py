"""int8 quantization invariants (functions/vectors.py::q_quantize);
value parity is oracle-checked, these pin the numeric guarantees."""

from __future__ import annotations

from pyanamo_spark.registry import QUERIES


def test_quantize_range_and_error_bound(spark, sf_dir):
    rows = QUERIES["q_quantize"](spark, sf_dir).collect()
    emb = {
        r.vec_id: r.embedding for r in spark.table("embeddings").collect()
    }
    assert len(rows) == len(emb)
    for r in rows:
        # qvec is comma-joined (scalar string, per the driver-canon
        # contract on oracle-checked queries)
        qvec = [int(q) for q in r.qvec.split(",")]
        assert all(-127 <= q <= 127 for q in qvec)
        orig = emb[r.vec_id]
        assert len(qvec) == len(orig)
        # reconstruction error ≤ half a quantization step (scale was
        # rounded to 9dp for the oracle hash; allow that slack too)
        for q, x in zip(qvec, orig):
            assert abs(q * r.scale - x) <= r.scale / 2 + 1e-6
