"""Avro OCF codec tests: spec byte-vectors, hypothesis round-trips,
codec matrix, and the distributed DataSource vs driver-side read."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_capstone_spark.sources import avroplain as av

FIELDS = [("a", "long"), ("b", "string"), ("c", "double"), ("d", "boolean")]


def test_zigzag_spec_vectors():
    # the worked examples from the Avro specification
    assert av.zigzag_encode(0) == b"\x00"
    assert av.zigzag_encode(-1) == b"\x01"
    assert av.zigzag_encode(1) == b"\x02"
    assert av.zigzag_encode(-2) == b"\x03"
    assert av.zigzag_encode(2) == b"\x04"
    assert av.zigzag_encode(-64) == b"\x7f"
    assert av.zigzag_encode(64) == b"\x80\x01"


row_st = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
    st.one_of(st.none(), st.text(max_size=40)),
    st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
    st.one_of(st.none(), st.booleans()),
)


@given(st.lists(row_st, max_size=60), st.sampled_from(["null", "deflate"]),
       st.integers(min_value=1, max_value=7))
@settings(max_examples=40, deadline=None,
          suppress_health_check=list(HealthCheck))
def test_avro_roundtrip_property(tmp_path_factory, rows, codec, block_rows):
    path = os.path.join(str(tmp_path_factory.mktemp("avro")), "t.avro")
    av.write_avro(path, FIELDS, rows, codec=codec, block_rows=block_rows)
    fields, back = av.read_avro(path)
    assert fields == FIELDS
    assert back == rows
    # block index covers exactly the written rows
    assert sum(n for _, n, _ in av.index_blocks(path)) == len(rows)


def test_avro_deterministic_bytes(tmp_path):
    rows = [(1, "x", 2.5, True), (None, None, None, None)]
    p1, p2 = str(tmp_path / "a1.avro"), str(tmp_path / "a2.avro")
    av.write_avro(p1, FIELDS, rows, codec="deflate")
    av.write_avro(p2, FIELDS, rows, codec="deflate")
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_avro_datasource_parallel_equals_driver_read(spark, tmp_path):
    rows = [(i, f"n{i}", i * 1.5, i % 2 == 0) for i in range(257)]
    path = str(tmp_path / "big.avro")
    av.write_avro(path, FIELDS, rows, codec="deflate", block_rows=16)
    try:
        spark.dataSource.register(av.AvroPlainDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("avroplain")
        .option("path", path)
        .option("blocksPerPartition", "2")
        .load()
    )
    assert df.rdd.getNumPartitions() > 1  # genuinely split
    got = sorted(tuple(r) for r in df.collect())
    assert got == sorted(rows)


def test_avro_rejects_non_avro_file(tmp_path):
    p = str(tmp_path / "bad.avro")
    open(p, "wb").write(b"NOPE" + b"\x00" * 64)
    import pytest

    with pytest.raises(ValueError, match="not an Avro"):
        av.read_avro_header(p)


def test_avro_distributed_writer_roundtrip(spark, tmp_path):
    import os

    try:
        spark.dataSource.register(av.AvroPlainDataSource)
    except Exception:
        pass
    out = str(tmp_path / "out")
    df = spark.range(100).selectExpr(
        "id", "concat('u', id) AS name", "CAST(id * 1.5 AS DOUBLE) AS bal", "id % 2 = 0 AS ok"
    ).repartition(4)
    df.write.format("avroplain").option("path", out).mode("append").save()
    assert os.path.isfile(os.path.join(out, "_SUCCESS"))
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 4  # one OCF file per partition
    back = spark.read.format("avroplain").option("path", out).load()
    got = sorted((r.id, r.name, r.bal, r.ok) for r in back.collect())
    want = sorted((i, f"u{i}", i * 1.5, i % 2 == 0) for i in range(100))
    assert got == want


def test_avro_writer_rejects_unsupported_type(spark, tmp_path):
    import pytest

    try:
        spark.dataSource.register(av.AvroPlainDataSource)
    except Exception:
        pass
    df = spark.range(3).selectExpr("array(id) AS arr")
    with pytest.raises(Exception, match="unsupported column type"):
        df.write.format("avroplain").option(
            "path", str(tmp_path / "bad")
        ).mode("append").save()


def test_avro_streaming_sink_exactly_once_visibility(spark, tmp_path):
    import os

    try:
        spark.dataSource.register(av.AvroPlainDataSource)
    except Exception:
        pass
    src = str(tmp_path / "src_parquet")
    spark.range(50).selectExpr(
        "id", "CAST(id * 2.0 AS DOUBLE) AS v"
    ).repartition(2).write.parquet(src)
    out = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("parquet")
        .schema("id bigint, v double")
        .option("maxFilesPerTrigger", "1")
        .load(src)
    )
    q = (
        stream.writeStream.format("avroplain")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # commit log exists and only committed batch dirs are visible
    assert os.path.isfile(os.path.join(out, "_commits"))
    rows = av.read_committed_stream_output(out)
    assert sorted(rows) == [(i, i * 2.0) for i in range(50)]
    # staged leftovers are not visible to the committed-output reader
    assert not [
        f for f in os.listdir(os.path.join(out, "_staging"))
    ] if os.path.isdir(os.path.join(out, "_staging")) else True


def test_stream_commit_idempotent_under_replay(tmp_path):
    """Driver-crash replay semantics of the streaming sink commit
    (round-3 advice): a batch replayed after a crash must REPLACE any
    half-published part files, and a batch already in _commits must not
    be published twice — read_committed_stream_output sees each batch's
    rows exactly once in both scenarios."""
    from pyspark.sql.types import StructType

    out = str(tmp_path / "sink")
    schema = (
        StructType()
        .add("id", "long")
        .add("v", "double")
    )
    w = av.AvroPlainStreamWriter({"path": out}, schema)

    def staged(rows):
        return [w.write(iter(rows))]

    # scenario 1: crash AFTER moving files into batch=0 but BEFORE the
    # log append — replay must replace, not append
    msgs = staged([(1, 1.0), (2, 2.0)])
    bdir = os.path.join(out, "batch=0")
    os.makedirs(bdir)
    for m in msgs:  # simulate the half-published state by hand
        os.replace(m.file, os.path.join(bdir, os.path.basename(m.file)))
    # _commits was never written; driver restarts and replays batch 0
    replay = staged([(1, 1.0), (2, 2.0)])
    w.commit(replay, 0)
    assert sorted(av.read_committed_stream_output(out)) == [(1, 1.0), (2, 2.0)]

    # scenario 2: batch already committed — a second commit is a no-op
    dup = staged([(1, 1.0), (2, 2.0)])
    w.commit(dup, 0)
    assert sorted(av.read_committed_stream_output(out)) == [(1, 1.0), (2, 2.0)]
    with open(os.path.join(out, "_commits")) as f:
        assert f.read().split() == ["0"]
    # the duplicate's staged files were cleaned up
    assert not os.listdir(os.path.join(out, "_staging"))


def test_empty_dir_raises_clear_error(tmp_path):
    import pytest

    d = str(tmp_path / "empty")
    os.makedirs(d)
    open(os.path.join(d, "_SUCCESS"), "w").close()
    with pytest.raises(FileNotFoundError, match="no part-"):
        av._data_files(d)
    with pytest.raises(FileNotFoundError, match="no such file"):
        av._data_files(str(tmp_path / "absent.avro"))
