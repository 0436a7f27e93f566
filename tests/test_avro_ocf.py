"""Pins for the dependency-free Avro OCF codec + the pyavro DataSource:
binary-encoding round-trips (incl. pre-epoch timestamps, decimals,
unicode, both container codecs), corruption detection, Spark write/read
exactness, and header-based schema inference."""

from __future__ import annotations

import datetime
import os
import tempfile
from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_change_data_capture_streaming_spark.sources.avro_ocf import (
    read_ocf,
    write_ocf,
)

_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
        {"name": "ts", "type": ["null", {"type": "long", "logicalType": "timestamp-micros"}]},
        {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal", "precision": 18, "scale": 2}},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
    ],
}

_ROW = st.fixed_dictionaries(
    {
        "k": st.integers(-(2**62), 2**62),
        "s": st.one_of(st.none(), st.text(max_size=12)),
        "d": st.floats(allow_nan=False, width=64),
        "b": st.booleans(),
        "dt": st.dates(datetime.date(1900, 1, 1), datetime.date(2200, 1, 1)),
        "ts": st.one_of(
            st.none(),
            st.datetimes(
                datetime.datetime(1950, 1, 1),
                datetime.datetime(2100, 1, 1),
                timezones=st.just(datetime.timezone.utc),
            ),
        ),
        "dec": st.decimals(
            min_value=Decimal("-99999.99"), max_value=Decimal("99999.99"), places=2
        ),
        "arr": st.lists(st.integers(-100, 100), max_size=5),
    }
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(_ROW, max_size=8), codec=st.sampled_from(["null", "deflate", "snappy", "bzip2", "xz", "zstandard"]))
def test_ocf_roundtrip_property(rows, codec):
    """Arbitrary rows of the mixed-type schema round-trip exactly under
    both container codecs, including multi-block files."""
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.avro")
        write_ocf(p, _SCHEMA, rows, codec=codec, block_rows=3)
        schema, back = read_ocf(p)
        assert schema == _SCHEMA
        assert back == rows


def test_ocf_pre_epoch_timestamp_exact():
    """int(ts.timestamp()) truncates toward zero and flips sub-second
    signs before 1970 — the timedelta path must be exact."""
    row = {
        "k": 1,
        "s": None,
        "d": 0.0,
        "b": False,
        "dt": datetime.date(1969, 12, 25),
        "ts": datetime.datetime(1969, 12, 31, 23, 59, 59, 500000, tzinfo=datetime.timezone.utc),
        "dec": Decimal("0.01"),
        "arr": [],
    }
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.avro")
        write_ocf(p, _SCHEMA, [row])
        _, (back,) = read_ocf(p)
        assert back == row


def test_ocf_corruption_detected():
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.avro")
        write_ocf(p, _SCHEMA, [])
        buf = open(p, "rb").read()
        open(p, "wb").write(b"JUNK" + buf[4:])
        with pytest.raises(ValueError, match="bad magic"):
            read_ocf(p)
        write_ocf(p, _SCHEMA, [{"k": 1, "s": "x", "d": 1.0, "b": True,
                                "dt": datetime.date(2000, 1, 1), "ts": None,
                                "dec": Decimal("1.00"), "arr": [1]}])
        buf = bytearray(open(p, "rb").read())
        buf[-1] ^= 0xFF  # clobber the trailing sync marker
        open(p, "wb").write(bytes(buf))
        with pytest.raises(ValueError, match="sync marker"):
            read_ocf(p)


def test_pyavro_spark_roundtrip_exact(spark, sf_dir):
    """orders written through the pyavro DataSource read back row-exact
    (explicit schema), and header-based schema inference agrees."""
    from realtime_change_data_capture_streaming_spark.sources import avro_ocf
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    avro_ocf.register(spark)
    src = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "orders_avro")
        src.write.mode("overwrite").format("pyavro").save(path)
        assert os.path.exists(os.path.join(path, "_SUCCESS"))
        back = spark.read.format("pyavro").schema(src.schema).load(path)
        assert back.exceptAll(src).count() == 0
        assert src.exceptAll(back).count() == 0
        inferred = spark.read.format("pyavro").load(path)
        assert [f.name for f in inferred.schema.fields] == [
            f.name for f in src.schema.fields
        ]
        assert inferred.count() == src.count()


def test_pyavro_deflate_codec(spark, sf_dir):
    """codec=deflate writes smaller files that still read back exact."""
    from realtime_change_data_capture_streaming_spark.sources import avro_ocf
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    avro_ocf.register(spark)
    src = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    with tempfile.TemporaryDirectory() as d:
        raw, packed = os.path.join(d, "raw"), os.path.join(d, "deflate")
        src.coalesce(1).write.mode("overwrite").format("pyavro").save(raw)
        src.coalesce(1).write.mode("overwrite").format("pyavro").option(
            "codec", "deflate"
        ).save(packed)
        size = lambda p: sum(
            os.path.getsize(os.path.join(p, e)) for e in os.listdir(p) if e.endswith(".avro")
        )
        assert size(packed) < size(raw)
        back = spark.read.format("pyavro").schema(src.schema).load(packed)
        assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_schema_resolution_evolution():
    """The spec's Schema Resolution rules: a v2 reader (field added with
    default, field dropped, fields reordered, int promoted to long,
    float to double) reads v1 files exactly; a defaultless new field is
    a loud error, as is an impossible promotion."""
    v1 = {"type": "record", "name": "r", "fields": [
        {"name": "a", "type": "int"},
        {"name": "gone", "type": "string"},
        {"name": "f", "type": "float"},
        {"name": "u", "type": ["null", "int"]},
    ]}
    v2 = {"type": "record", "name": "r", "fields": [
        {"name": "f", "type": "double"},          # reordered + promoted
        {"name": "a", "type": "long"},            # promoted
        {"name": "added", "type": "string", "default": "dflt"},
        {"name": "u", "type": ["null", "long"]},  # union member promoted
    ]}
    rows = [{"a": 7, "gone": "x", "f": 1.5, "u": None},
            {"a": -3, "gone": "y", "f": -0.25, "u": 42}]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "v1.avro")
        write_ocf(p, v1, rows)
        schema, back = read_ocf(p, reader_schema=v2)
        assert schema == v2
        assert back == [
            {"f": 1.5, "a": 7, "added": "dflt", "u": None},
            {"f": -0.25, "a": -3, "added": "dflt", "u": 42},
        ]
        assert all(isinstance(r["a"], int) and isinstance(r["f"], float) for r in back)
        # defaultless new field: loud
        v_bad = {"type": "record", "name": "r", "fields": [
            {"name": "a", "type": "long"}, {"name": "new", "type": "string"}]}
        with pytest.raises(ValueError, match="no default"):
            read_ocf(p, reader_schema=v_bad)
        # impossible promotion (string field read as long): loud
        v_bad2 = {"type": "record", "name": "r", "fields": [
            {"name": "gone", "type": "long"}]}
        with pytest.raises(ValueError, match="cannot resolve"):
            read_ocf(p, reader_schema=v_bad2)


def test_pyavro_reader_schema_option(spark):
    """format('pyavro').option('readerSchema', v2) reads v1 files with
    the evolved schema through Spark — defaults filled, promotions
    applied."""
    import json as _json

    from realtime_change_data_capture_streaming_spark.sources import avro_ocf

    avro_ocf.register(spark)
    v1 = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "int"}, {"name": "s", "type": "string"}]}
    v2 = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "tag", "type": "string", "default": "legacy"}]}
    with tempfile.TemporaryDirectory() as d:
        write_ocf(os.path.join(d, "part-0.avro"), v1, [{"k": 1, "s": "a"}, {"k": 2, "s": "b"}])
        got = (
            spark.read.format("pyavro")
            .schema("k bigint, s string, tag string")
            .option("readerSchema", _json.dumps(v2))
            .load(d)
        )
        rows = {r["k"]: (r["s"], r["tag"]) for r in got.collect()}
        assert rows == {1: ("a", "legacy"), 2: ("b", "legacy")}


def test_codec_hostile_inputs_raise_valueerror():
    """Every hostile-byte class raises ValueError (never hangs, never a
    foreign exception type): negative block size (would walk pos
    backward and loop forever), truncated boolean/float/double,
    out-of-range timestamp varints, multi-branch union with no matching
    branch, decimal finer than the declared scale, and non-dict record
    values."""
    from realtime_change_data_capture_streaming_spark.sources.avro_ocf import (
        decode_value,
        encode_value,
    )

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.avro")
        write_ocf(p, _SCHEMA, [])
        buf = bytearray(open(p, "rb").read())
        # craft a block header after the file header: count=0, size=-18
        from realtime_change_data_capture_streaming_spark.sources.avro_ocf import _enc_long

        open(p, "wb").write(bytes(buf) + _enc_long(0) + _enc_long(-18))
        with pytest.raises(ValueError, match="corrupt block header"):
            read_ocf(p)
    with pytest.raises(ValueError, match="truncated boolean"):
        decode_value("boolean", b"", 0)
    with pytest.raises(ValueError, match="truncated double"):
        decode_value("double", b"\x00\x01", 0)
    with pytest.raises(ValueError, match="truncated float"):
        decode_value("float", b"\x00", 0)
    ts_schema = {"type": "long", "logicalType": "timestamp-micros"}
    huge = encode_value("long", 2**62)
    with pytest.raises(ValueError, match="out of datetime range"):
        decode_value(ts_schema, huge, 0)
    # multi-branch union: value routed by TYPE, not first-non-null
    u = ["null", "string", "long"]
    assert decode_value(u, encode_value(u, 42), 0)[0] == 42
    assert decode_value(u, encode_value(u, "x"), 0)[0] == "x"
    with pytest.raises(ValueError, match="no union branch"):
        encode_value(u, 1.5)
    dec_schema = {"type": "bytes", "logicalType": "decimal", "precision": 18, "scale": 2}
    with pytest.raises(ValueError, match="fractional digits"):
        encode_value(dec_schema, Decimal("1.005"))
    rec_schema = {"type": "record", "name": "r", "fields": [{"name": "a", "type": "long"}]}
    with pytest.raises(ValueError, match="must be a dict"):
        encode_value(rec_schema, (1,))


def test_schema_resolution_recurses_into_arrays_and_maps():
    """Nested evolution: records inside arrays/maps get reader defaults
    and promotions; incompatible nested item types are loud."""
    w = {"type": "record", "name": "r", "fields": [
        {"name": "xs", "type": {"type": "array", "items":
            {"type": "record", "name": "e", "fields": [{"name": "a", "type": "int"}]}}},
        {"name": "m", "type": {"type": "map", "values": "int"}},
    ]}
    r = {"type": "record", "name": "r", "fields": [
        {"name": "xs", "type": {"type": "array", "items":
            {"type": "record", "name": "e", "fields": [
                {"name": "a", "type": "long"},
                {"name": "b", "type": "string", "default": "d"}]}}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
    ]}
    rows = [{"xs": [{"a": 1}, {"a": 2}], "m": {"k": 3}}]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.avro")
        write_ocf(p, w, rows)
        _, back = read_ocf(p, reader_schema=r)
        assert back == [{"xs": [{"a": 1, "b": "d"}, {"a": 2, "b": "d"}], "m": {"k": 3}}]
        bad = {"type": "record", "name": "r", "fields": [
            {"name": "xs", "type": {"type": "array", "items":
                {"type": "record", "name": "e", "fields": [{"name": "a", "type": "string"}]}}},
            {"name": "m", "type": {"type": "map", "values": "long"}},
        ]}
        with pytest.raises(ValueError, match="cannot resolve"):
            read_ocf(p, reader_schema=bad)


def test_snappy_codec_format_and_crc():
    """The pure-Python snappy implements the published block format:
    hand-crafted streams with all three copy-tag widths and an
    overlapping (RLE) back-reference decode correctly; repetitive data
    actually compresses; Avro's appended big-endian CRC32 of the
    uncompressed block is verified (a flipped byte is loud)."""
    from realtime_change_data_capture_streaming_spark.sources.avro_ocf import (
        snappy_compress,
        snappy_decompress,
    )

    # copy-2 with overlap (offset < length): the RLE idiom
    hand = bytes([12, (2 - 1) << 2]) + b"ab" + bytes([((10 - 1) << 2) | 2]) + (2).to_bytes(2, "little")
    assert snappy_decompress(hand) == b"ab" * 6
    # copy-1 and copy-4 tags
    lit = bytes([8, (4 - 1) << 2]) + b"abcd"
    assert snappy_decompress(lit + bytes([((4 - 4) << 2) | 1, 4])) == b"abcdabcd"
    assert snappy_decompress(lit + bytes([((4 - 1) << 2) | 3]) + (4).to_bytes(4, "little")) == b"abcdabcd"
    data = b"the quick brown fox jumps over the lazy dog " * 400
    z = snappy_compress(data)
    assert snappy_decompress(z) == data and len(z) < len(data) // 2
    for bad in (b"", bytes([200]), bytes([4, ((4 - 1) << 2) | 1, 9])):
        with pytest.raises(ValueError):
            snappy_decompress(bad)
    # Avro-layer CRC: flip one payload byte inside a snappy OCF block
    rows = [{"k": 1, "s": "x" * 50, "d": 1.0, "b": True,
             "dt": datetime.date(2000, 1, 1), "ts": None,
             "dec": Decimal("1.00"), "arr": [1, 2]}]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.avro")
        write_ocf(p, _SCHEMA, rows, codec="snappy")
        _, back = read_ocf(p)
        assert back == rows
        buf = bytearray(open(p, "rb").read())
        buf[-21] ^= 0x01  # a byte inside the compressed payload
        open(p, "wb").write(bytes(buf))
        with pytest.raises(ValueError, match="CRC mismatch|snappy|corrupt"):
            read_ocf(p)


def test_pyavro_compressed_codecs_through_spark(spark, sf_dir):
    """snappy/bzip2/xz/zstandard OCFs written through the DataSource read back
    exact and smaller than the uncompressed form."""
    from realtime_change_data_capture_streaming_spark.sources import avro_ocf
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    avro_ocf.register(spark)
    src = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    with tempfile.TemporaryDirectory() as d:
        size = lambda p: sum(
            os.path.getsize(os.path.join(p, e)) for e in os.listdir(p) if e.endswith(".avro")
        )
        raw = os.path.join(d, "raw")
        src.coalesce(1).write.mode("overwrite").format("pyavro").save(raw)
        for codec in ("snappy", "bzip2", "xz", "zstandard"):
            path = os.path.join(d, codec)
            src.coalesce(1).write.mode("overwrite").format("pyavro").option(
                "codec", codec
            ).save(path)
            assert size(path) < size(raw), codec
            back = spark.read.format("pyavro").schema(src.schema).load(path)
            assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_pyavro_stream_reader(spark, sf_dir, tmp_path):
    """An OCF directory consumed as a STREAM with filename-frontier
    offsets: run 1 drains the two files present; a third file arrives
    and run 2 RESUMES FROM THE CHECKPOINT, reading only the new file —
    offsets persist, nothing re-reads, the union equals the batch
    read.  (Under availableNow the engine snapshots latestOffset once,
    so the per-run drain is one batch; the frontier is what carries
    across runs.)"""
    from realtime_change_data_capture_streaming_spark.sources import avro_ocf
    from realtime_change_data_capture_streaming_spark.sources.avro_ocf import (
        spark_to_avro_schema,
    )
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    avro_ocf.register(spark)
    src = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus").limit(90)
    rows = [{"o_orderkey": r["o_orderkey"], "o_orderstatus": r["o_orderstatus"]}
            for r in src.collect()]
    schema = spark_to_avro_schema(src.schema)
    d = tmp_path / "stream_in"
    d.mkdir()
    out = tmp_path / "out"

    def run_once():
        q = (
            spark.readStream.format("pyavro")
            .schema(src.schema)
            .load(str(d))
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300)

    for i in range(2):
        write_ocf(str(d / f"part-{i:05d}.avro"), schema, rows[i * 30 : (i + 1) * 30])
    run_once()
    assert spark.read.parquet(str(out)).count() == 60
    # a new file arrives; the restarted stream must read ONLY it
    write_ocf(str(d / "part-00002.avro"), schema, rows[60:90])
    run_once()
    back = spark.read.parquet(str(out))
    assert back.count() == 90  # 60 + 30, no re-reads
    assert back.exceptAll(spark.read.format("pyavro").schema(src.schema).load(str(d))).count() == 0


def test_pyavro_filter_pushdown(spark, sf_dir):
    """Simple comparisons push into the Python reader (applied before
    the Arrow transfer; Spark still re-checks): the filtered read equals
    the post-hoc filter, and the plan records the pushed filters."""
    from realtime_change_data_capture_streaming_spark.sources import avro_ocf
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    avro_ocf.register(spark)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        src = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
        with tempfile.TemporaryDirectory() as d:
            src.write.mode("overwrite").format("pyavro").save(d)
            base = spark.read.format("pyavro").schema(src.schema).load(d)
            got = base.filter("o_orderkey % 2 = 0 AND o_totalprice > 150000.0")
            want = src.filter("o_orderkey % 2 = 0 AND o_totalprice > 150000.0")
            assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
            # unit-level: the comparison reaches the reader and rows are
            # dropped BEFORE the Arrow boundary; the unsupported modulo
            # expression is yielded back for Spark to evaluate
            from pyspark.sql.datasource import GreaterThan
            from realtime_change_data_capture_streaming_spark.sources.avro_ocf import (
                _AvroReader,
                _FilePartition,
            )

            rd = _AvroReader({"path": d}, src.schema)
            kept = list(rd.pushFilters([GreaterThan(("o_totalprice",), 150000.0)]))
            assert len(kept) == 1 and len(rd._preds) == 1  # re-checked by Spark
            part = rd.partitions()[0]
            vals = [t for t in rd.read(part)]
            assert vals and all(v[1] > 150000.0 for v in vals)
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


_FIELD_POOL = [
    ("a", "int", 0),
    ("b", "long", 7),
    ("c", "string", "x"),
    ("d", "double", 1.5),
    ("e", "boolean", True),
]


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    writer_idx=st.lists(st.integers(0, 4), min_size=1, max_size=5, unique=True),
    reader_idx=st.lists(st.integers(0, 4), min_size=1, max_size=5, unique=True),
    n_rows=st.integers(0, 4),
    seed=st.integers(0, 999),
)
def test_schema_resolution_property(writer_idx, reader_idx, n_rows, seed):
    """Random writer/reader field subsets in random orders: resolution
    always equals the reference projection — writer-only fields dropped,
    reader-only fields defaulted, common fields carried (with int->long
    promotion applied when the pair differs)."""
    import random

    rng = random.Random(seed)

    def field(i, promote):
        name, t, dflt = _FIELD_POOL[i]
        if promote and t == "int":
            t = "long"
        return {"name": name, "type": t, "default": dflt}

    writer = {"type": "record", "name": "r",
              "fields": [field(i, promote=False) for i in writer_idx]}
    reader = {"type": "record", "name": "r",
              "fields": [field(i, promote=True) for i in reader_idx]}

    def sample(t):
        return {"int": rng.randrange(-99, 99), "long": rng.randrange(-99, 99),
                "string": str(rng.randrange(99)), "double": float(rng.randrange(99)),
                "boolean": rng.random() < 0.5}[t]

    rows = [
        {_FIELD_POOL[i][0]: sample(_FIELD_POOL[i][1]) for i in writer_idx}
        for _ in range(n_rows)
    ]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.avro")
        write_ocf(p, writer, rows)
        _, back = read_ocf(p, reader_schema=reader)
    wnames = {_FIELD_POOL[i][0] for i in writer_idx}
    expect = [
        {
            _FIELD_POOL[i][0]: (
                r[_FIELD_POOL[i][0]] if _FIELD_POOL[i][0] in wnames else _FIELD_POOL[i][2]
            )
            for i in reader_idx
        }
        for r in rows
    ]
    assert back == expect


def test_pyavro_writer_abort_removes_staged(spark, sf_dir):
    """The 2PC writer's abort path deletes staged .tmp files so a failed
    job leaves no partial output behind."""
    import glob

    from realtime_change_data_capture_streaming_spark.sources.avro_ocf import _AvroCommit, _AvroWriter
    from realtime_change_data_capture_streaming_spark.sources.tables import load_table

    src = load_table(spark, sf_dir, "orders").select("o_orderkey")
    with tempfile.TemporaryDirectory() as d:
        w = _AvroWriter({"path": d}, src.schema, overwrite=True)
        staged = os.path.join(d, ".part-00000.avro.deadbeef.tmp")
        open(staged, "wb").write(b"partial")
        w.abort([_AvroCommit(staged=staged, final="part-00000.avro"), None])
        assert glob.glob(os.path.join(d, "*.tmp")) == []
        assert not os.path.exists(os.path.join(d, "_SUCCESS"))


def test_typed_defaults_match_decoded_types():
    """Reader defaults convert through the field TYPE (ADVICE r10):
    bytes defaults are ISO-8859-1 strings per the spec but must decode
    to bytes; date/timestamp/decimal defaults are raw ints/strings but
    must come back as date/datetime/Decimal — same Python types as the
    decoded path, or the Arrow boundary type-errors on mixed files."""
    v1 = {"type": "record", "name": "r", "fields": [{"name": "k", "type": "long"}]}
    v2 = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "raw", "type": "bytes", "default": "\u00ff\u0001"},
            {"name": "day", "type": {"type": "int", "logicalType": "date"}, "default": 19723},
            {
                "name": "at",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
                "default": 1_700_000_000_000_000,
            },
            {
                "name": "amt",
                "type": {"type": "bytes", "logicalType": "decimal", "precision": 9, "scale": 2},
                # two's-complement big-endian unscaled 0x04D2 = 1234 -> 12.34
                "default": "\u0004\u00d2",
            },
            {"name": "u", "type": ["null", "long"], "default": None},
            {"name": "xs", "type": {"type": "array", "items": "double"}, "default": [1, 2]},
        ],
    }
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "v1.avro")
        write_ocf(p, v1, [{"k": 1}])
        _, back = read_ocf(p, reader_schema=v2)
        (r,) = back
    assert r["raw"] == b"\xff\x01"
    assert r["day"] == datetime.date(1970, 1, 1) + datetime.timedelta(days=19723)
    assert r["at"] == datetime.datetime(
        1970, 1, 1, tzinfo=datetime.timezone.utc
    ) + datetime.timedelta(microseconds=1_700_000_000_000_000)
    assert r["amt"] == Decimal("12.34")
    assert r["u"] is None
    assert r["xs"] == [1.0, 2.0] and all(isinstance(x, float) for x in r["xs"])


def test_int_union_branch_range_checked():
    """In a ["int","long"] union a value outside 32 bits must encode
    under the LONG branch (ADVICE r10): the int branch is range-checked
    so strict third-party readers never see a spec-invalid stream."""
    from realtime_change_data_capture_streaming_spark.sources.avro_ocf import decode_value, encode_value

    u = ["int", "long"]
    small = encode_value(u, 7)
    big = encode_value(u, 1 << 40)
    assert small[0] == 0  # zigzag(0): int branch
    assert big[0] == 2  # zigzag(1): long branch
    assert decode_value(u, small, 0)[0] == 7
    assert decode_value(u, big, 0)[0] == 1 << 40
    assert encode_value(u, -(1 << 31))[0] == 0  # boundary: still int
    assert encode_value(u, 1 << 31)[0] == 2  # one past: long


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    cuts=st.lists(st.integers(0, 6000), max_size=6),
    codec=st.sampled_from(["null", "deflate"]),
)
def test_split_tiling_reads_every_row_exactly_once(cuts, codec):
    """Hadoop-style split semantics: ANY tiling of the file's byte range
    into [0,c1),[c1,c2),...,[ck,size) reads every row exactly once —
    cut points may land inside the header, inside a block, inside a
    sync marker, anywhere."""
    from realtime_change_data_capture_streaming_spark.sources.avro_ocf import iter_ocf_range

    schema = {"type": "record", "name": "r", "fields": [{"name": "k", "type": "long"}]}
    rows = [{"k": i} for i in range(400)]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.avro")
        write_ocf(p, schema, rows, codec=codec, block_rows=17)
        size = os.path.getsize(p)
        bounds = sorted({0, size, *(c % (size + 1) for c in cuts)})
        got = []
        for lo, hi in zip(bounds, bounds[1:]):
            got.extend(r["k"] for r in iter_ocf_range(p, lo, hi))
        assert sorted(got) == list(range(400)), (bounds, len(got))


def test_pyavro_split_reads_match_unsplit(spark):
    """A large OCF file planned with a small splitSize reads as MANY
    partitions with exactly the same rows as the unsplit read."""
    from realtime_change_data_capture_streaming_spark.sources import avro_ocf

    avro_ocf.register(spark)
    schema = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"}, {"name": "s", "type": "string"}]}
    rows = [{"k": i, "s": f"row-{i:05d}-" + "x" * 40} for i in range(5000)]
    ddl = "k bigint, s string"
    with tempfile.TemporaryDirectory() as d:
        avro_ocf.write_ocf(os.path.join(d, "part-0.avro"), schema, rows, block_rows=128)
        whole = spark.read.format("pyavro").schema(ddl).load(d)
        split = (
            spark.read.format("pyavro")
            .schema(ddl)
            .option("splitSize", "16384")
            .load(d)
        )
        n_parts = split.rdd.getNumPartitions()
        assert n_parts >= 8, f"expected many byte-range splits, got {n_parts}"
        assert whole.rdd.getNumPartitions() == 1
        a = sorted((r["k"], r["s"]) for r in whole.collect())
        b = sorted((r["k"], r["s"]) for r in split.collect())
        assert a == b and len(a) == 5000


def test_pyavro_inferred_schema_honors_reader_schema(spark):
    """With a readerSchema option and NO explicit .schema(), inference
    derives the DDL from the READER schema (ADVICE r10): reader-added
    default fields appear, writer-only fields are gone."""
    import json as _json

    from realtime_change_data_capture_streaming_spark.sources import avro_ocf

    avro_ocf.register(spark)
    v1 = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "int"},
        {"name": "legacy_only", "type": "string"}]}
    v2 = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"},
        {"name": "tag", "type": "string", "default": "legacy"}]}
    with tempfile.TemporaryDirectory() as d:
        write_ocf(os.path.join(d, "part-0.avro"), v1, [{"k": 5, "legacy_only": "x"}])
        got = (
            spark.read.format("pyavro")
            .option("readerSchema", _json.dumps(v2))
            .load(d)
        )
        assert [f.name for f in got.schema.fields] == ["k", "tag"]
        assert got.schema["k"].dataType.simpleString() == "bigint"
        assert [(r["k"], r["tag"]) for r in got.collect()] == [(5, "legacy")]


def test_partial_record_default_is_loud():
    """A reader field with a record-typed PARTIAL default (subfield
    missing, no default of its own) must raise — not invent None for a
    non-nullable column (r10 review)."""
    v1 = {"type": "record", "name": "r", "fields": [{"name": "k", "type": "long"}]}
    v2 = {"type": "record", "name": "r", "fields": [
        {"name": "k", "type": "long"},
        {"name": "meta", "type": {"type": "record", "name": "m", "fields": [
            {"name": "a", "type": "string"}]}, "default": {}},
    ]}
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "v1.avro")
        write_ocf(p, v1, [{"k": 1}])
        with pytest.raises(ValueError, match="missing subfield 'a'"):
            read_ocf(p, reader_schema=v2)
        # a COMPLETE record default works, typed through the subfields
        v3 = {"type": "record", "name": "r", "fields": [
            {"name": "k", "type": "long"},
            {"name": "meta", "type": {"type": "record", "name": "m2", "fields": [
                {"name": "a", "type": "string"},
                {"name": "b", "type": "double", "default": 2}]}, "default": {"a": "x"}},
        ]}
        _, (row,) = read_ocf(p, reader_schema=v3)
        assert row["meta"] == {"a": "x", "b": 2.0} and isinstance(row["meta"]["b"], float)
