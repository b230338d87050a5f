"""Property-based tests (hypothesis) for the pure-Python pieces of the
source, plus cross-engine invariants of the hashing operators.

The reference's tests are example-based only (SURVEY §5); property tests
cover the body-mapping totality the reference lacks (its JSON converter
MatchErrors on unexpected bodies, SURVEY §7.4.3)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from streaming_amqp_spark.sources.amqp import _json_encode_body

# any JSON-able body the wire could deliver
_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=60),
)
_bodies = st.one_of(
    _json_scalars,
    st.binary(max_size=80),
    st.lists(_json_scalars, max_size=10),
    st.dictionaries(st.text(max_size=10), _json_scalars, max_size=8),
)


@given(_bodies)
@settings(max_examples=300, deadline=None)
def test_body_mapping_is_total_and_typed(body):
    """Every body maps to exactly one of {None, amqpValue, data} with the
    right payload column populated — no exceptions, ever."""
    body_type, body_json, body_bin = _json_encode_body(body)
    if body is None:
        assert (body_type, body_json, body_bin) == (None, None, None)
    elif isinstance(body, (bytes, bytearray)):
        assert body_type == "data"
        assert body_bin == bytes(body) and body_json is None
    else:
        assert body_type == "amqpValue"
        assert body_bin is None and isinstance(body_json, str)


@given(st.one_of(st.lists(_json_scalars, max_size=10),
                 st.dictionaries(st.text(max_size=10), _json_scalars, max_size=8)))
@settings(max_examples=200, deadline=None)
def test_structured_bodies_round_trip_through_json(body):
    """List/map bodies survive the JSON encoding losslessly
    (≡ the reference's round-trip assertions, AMQPBrokerStreamSuite.scala:102-224)."""
    _, body_json, _ = _json_encode_body(body)
    assert json.loads(body_json) == body


@given(st.text(max_size=200))
@settings(max_examples=100, deadline=None)
def test_string_bodies_pass_through_verbatim(body):
    """String bodies are NOT JSON-wrapped — delivered as-is
    (AMQPJsonFunction.scala:115-117 semantics)."""
    body_type, body_json, _ = _json_encode_body(body)
    assert body_type == "amqpValue" and body_json == body
