"""Randomized cross-codec round-trip fuzz.

The fixed-fixture round-trips (test_codecs.py, test_round4/5_features.py)
pin each codec's happy path; this suite drives ONE randomized frame —
quotes, backslashes, newlines, tabs, CJK, emoji, embedded JSON, empty
strings, NULL data columns, negative and 2^40-sized longs — through every
lossless encode/decode pair and asserts exact field-level equality. The
reference runs the same posture per codec (e.g.
/root/reference/pkg/sink/codec/open/codec_test.go's random event tables);
here one generator covers the whole family, so an escaping bug in any
envelope shows up as a concrete field diff.

The CSV leg found a real edge on first run: an unquoted empty field
parses as NULL, conflating '' with the \\N sentinel — fixed by quoting
empty strings in _csv_field.
"""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tiflow_spark.sinks import codecs
from tiflow_spark.sources.registry import SchemaVersion

NASTY_TEXT = [
    "",
    "plain text",
    'quo"te and \'single\'',
    "back\\slash\\\\double",
    "new\nline and \r carriage",
    "tab\tseparated",
    "comma,separated,values",
    "汉字文本测试",
    "émigré café naïve",
    "🙂 emoji 🚀 mix",
    '{"json":"inside","n":[1,2]}',
    "null",
    "   leading and trailing   ",
    "a" * 300,
]

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("score", T.LongType()),
    ]
)

FRAME_SCHEMA = (
    "op STRING, commit_ts LONG, start_ts LONG, conv_id STRING, "
    "turn_idx INT, role STRING, text STRING, tool STRING, score LONG, "
    "source_partition INT"
)


def _rand_rows(seed: int, n: int = 100):
    """Unique (conv_id, turn_idx) per row so every decode compares 1:1."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        op = rng.choice("IUD")
        cts = rng.randint(1, 10**9)
        sts = cts - rng.randint(1, 5)
        if op == "D":
            role = text = tool = None
            score = None
        else:
            role = rng.choice(["user", "assistant", None])
            text = rng.choice(NASTY_TEXT)
            tool = rng.choice([None, "T1", 'to"ol', "多工具"])
            score = rng.choice(
                [None, 0, -5, 2**40, rng.randint(-(10**6), 10**6)]
            )
        rows.append(
            (op, cts, sts, f"c{i}", i, role, text, tool, score, 0)
        )
    return rows


def _src_by_key(rows):
    cols = (
        "op commit_ts start_ts conv_id turn_idx role text tool score "
        "source_partition"
    ).split()
    return {r[3]: dict(zip(cols, r)) for r in rows}


def _assert_matches(dec_df, src, codec_name):
    """Compare every decode-output column that exists in the source rows —
    codecs differ in which envelope fields they carry, but whatever they
    carry must round-trip exactly."""
    out = dec_df.collect()
    assert len(out) == len(src), f"{codec_name}: row count"
    compared = set()
    for r in out:
        d = r.asDict()
        s = src[d["conv_id"]]
        for c, v in d.items():
            if c in s:
                assert v == s[c], (codec_name, c, d["conv_id"], v, s[c])
                compared.add(c)
    # the data columns must actually have been compared (a decode that
    # drops them would vacuously pass)
    assert {"text", "tool", "score"} <= compared, (codec_name, compared)


@pytest.fixture(scope="module")
def fuzz(spark):
    rows = _rand_rows(seed=20260818)
    return spark.createDataFrame(rows, FRAME_SCHEMA), _src_by_key(rows)


def test_fuzz_open_protocol(spark, fuzz):
    frame, src = fuzz
    dec = codecs.open_protocol_decode(
        codecs.open_protocol_encode(frame), VALUE_SCHEMA
    )
    _assert_matches(dec, src, "open_protocol")


def test_fuzz_avro_json(spark, fuzz):
    frame, src = fuzz
    ver = SchemaVersion(1, 0, VALUE_SCHEMA)
    dec = codecs.avro_json_decode(codecs.avro_json_encode(frame, ver), ver)
    _assert_matches(dec, src, "avro_json")


def test_fuzz_avro_binary(spark, fuzz):
    frame, src = fuzz
    ver = SchemaVersion(1, 0, VALUE_SCHEMA)
    dec = codecs.avro_binary_decode(
        codecs.avro_binary_encode(frame, ver), [ver]
    )
    _assert_matches(dec, src, "avro_binary")


def test_fuzz_debezium(spark, fuzz):
    frame, src = fuzz
    dec = codecs.debezium_decode(codecs.debezium_encode(frame), VALUE_SCHEMA)
    _assert_matches(dec, src, "debezium")


def test_fuzz_maxwell(spark, fuzz):
    frame, src = fuzz
    dec = codecs.maxwell_decode(codecs.maxwell_encode(frame), VALUE_SCHEMA)
    _assert_matches(dec, src, "maxwell")


def test_fuzz_simple(spark, fuzz):
    frame, src = fuzz
    dec = codecs.simple_decode(codecs.simple_encode(frame), VALUE_SCHEMA)
    _assert_matches(dec, src, "simple")


def test_fuzz_craft(spark, fuzz):
    frame, src = fuzz
    out_schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("commit_ts", T.LongType()),
            T.StructField("start_ts", T.LongType()),
            *VALUE_SCHEMA.fields,
        ]
    )
    dec = codecs.craft_decode(codecs.craft_encode(frame), out_schema)
    _assert_matches(dec, src, "craft")


def test_fuzz_csv(spark, fuzz):
    """CSV with RFC-4180 quoting must round-trip the same nasty inputs as
    the JSON/binary codecs (commas, quotes, newlines, CJK; the \\N null
    sentinel vs literal '\\N'-shaped data)."""
    frame, src = fuzz
    csv_schema = T.StructType(
        [f for f in VALUE_SCHEMA.fields if f.name != "score"]
        + [T.StructField("score", T.LongType())]
    )
    dec = codecs.csv_decode(codecs.csv_encode(frame), csv_schema)
    _assert_matches(dec, src, "csv")
