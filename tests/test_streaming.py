"""Structured Streaming incremental plane: drain, resume, idempotence."""

from __future__ import annotations

import os

from grepai_spark import extract, streaming
from grepai_spark.storage import Catalog


def _write_slice(df, path):
    df.coalesce(1).write.mode("overwrite").parquet(path)


def test_streaming_drains_and_resumes(spark, tiny_transcripts, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src, exist_ok=True)

    first = tiny_transcripts.where("conv_id in ('conv-a', 'conv-b')")
    second = tiny_transcripts.where("conv_id in ('conv-c', 'conv-d')")
    _write_slice(first, f"{src}/slice1")

    streaming.incremental_call_edges(spark, f"{src}/slice*", out, ck)
    cat = Catalog(spark, out)
    got1 = {
        (r["conv_id"], r["turn_idx"], r["obj"])
        for r in cat.read(streaming.EDGES_TABLE).collect()
    }
    want1 = {
        (r["conv_id"], r["turn_idx"], r["obj"])
        for r in extract.call_triples(first).collect()
    }
    assert got1 == want1

    # second drain picks up ONLY the new slice (checkpoint = resume gate)
    _write_slice(second, f"{src}/slice2")
    streaming.incremental_call_edges(spark, f"{src}/slice*", out, ck)
    got2 = {
        (r["conv_id"], r["turn_idx"], r["obj"])
        for r in cat.read(streaming.EDGES_TABLE).collect()
    }
    want2 = {
        (r["conv_id"], r["turn_idx"], r["obj"])
        for r in extract.call_triples(tiny_transcripts).collect()
    }
    assert got2 == want2

    # idempotence: draining again with nothing new changes nothing
    streaming.incremental_call_edges(spark, f"{src}/slice*", out, ck)
    got3 = {
        (r["conv_id"], r["turn_idx"], r["obj"])
        for r in cat.read(streaming.EDGES_TABLE).collect()
    }
    assert got3 == got2


def test_streaming_merge_is_idempotent_on_redelivery(
    spark, tiny_transcripts, tmp_path
):
    """Re-delivering the same slice through a FRESH checkpoint (at-least-once
    delivery) must not duplicate edges — the MERGE key absorbs it."""
    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    os.makedirs(src, exist_ok=True)
    _write_slice(tiny_transcripts, f"{src}/slice1")

    streaming.incremental_call_edges(spark, f"{src}/slice*", out, str(tmp_path / "ckA"))
    streaming.incremental_call_edges(spark, f"{src}/slice*", out, str(tmp_path / "ckB"))
    cat = Catalog(spark, out)
    rows = cat.read(streaming.EDGES_TABLE).collect()
    keys = [(r["conv_id"], r["turn_idx"], r["obj"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert set(keys) == {
        (r["conv_id"], r["turn_idx"], r["obj"])
        for r in extract.call_triples(tiny_transcripts).collect()
    }
