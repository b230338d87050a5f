"""Batch tests for the envelope converters (SURVEY §2A A12/A13 parity):
the JSON envelope must reproduce AMQPJsonFunction's key names and nesting
(AMQPJsonFunction.scala:39-54), Base64-encode binary bodies (:146), and
body_as must drop inconvertible rows instead of crashing (§7.4.2)."""

from __future__ import annotations

import base64
import datetime
import json

from streaming_amqp_spark.envelope import (
    ENVELOPE_SCHEMA,
    body_as,
    json_envelope_column,
)


def _mk_env_df(spark, rows):
    return spark.createDataFrame(rows, schema=ENVELOPE_SCHEMA)


_TS = datetime.datetime(2024, 1, 1, 0, 0, 0)


def test_json_envelope_key_names_and_nesting(spark):
    df = _mk_env_df(
        spark,
        [
            (
                "id-1",
                "my_address",
                "subj",
                "reply",
                "corr-1",
                {"k": "v"},
                {"ann": "x"},
                "amqpValue",
                "Spark Streaming & AMQP",
                None,
                _TS,
            )
        ],
    )
    out = json.loads(df.select(json_envelope_column().alias("j")).collect()[0].j)
    assert out["properties"] == {
        "messageId": "id-1",
        "to": "my_address",
        "subject": "subj",
        "replyTo": "reply",
        "correlationId": "corr-1",
    }
    assert out["applicationProperties"] == {"k": "v"}
    assert out["messageAnnotations"] == {"ann": "x"}
    assert out["body"] == {"type": "amqpValue", "section": "Spark Streaming & AMQP"}


def test_json_envelope_base64_binary_body(spark):
    payload = b"Spark Streaming & AMQP"
    df = _mk_env_df(
        spark,
        [(None, None, None, None, None, None, None, "data", None, payload, _TS)],
    )
    out = json.loads(df.select(json_envelope_column().alias("j")).collect()[0].j)
    assert out["body"]["type"] == "data"
    assert base64.b64decode(out["body"]["section"]) == payload


def test_body_as_drops_inconvertible_rows(spark):
    df = _mk_env_df(
        spark,
        [
            (None, None, None, None, None, None, None, "amqpValue", "41", None, _TS),
            (None, None, None, None, None, None, None, "amqpValue", "xyz", None, _TS),
            (None, None, None, None, None, None, None, "data", None, b"42", _TS),
            (None, None, None, None, None, None, None, None, None, None, _TS),
        ],
    )
    got = sorted(r.value for r in body_as(df, "int").collect())
    # "41" casts, b"42" decodes as UTF-8 then casts, "xyz" and the absent
    # body drop silently (the reference's unreliable path would crash)
    assert got == [41, 42]
