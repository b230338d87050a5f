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


# --- deterministic hash-split invariants (plans.statistics) ---------------

@given(st.sets(st.integers(min_value=0, max_value=2**40), max_size=200))
@settings(max_examples=100, deadline=None)
def test_hash_split_is_deterministic_partition_and_total(ids):
    """The md5 hex-digit split is a pure per-row function: (a) every id
    lands in exactly one split, (b) assignment is independent of input
    order/grouping — the property that makes it safe at any partitioning."""
    import hashlib

    def bucket(i):
        return hashlib.md5(str(i).encode()).hexdigest()[0]

    def split(i):
        b = bucket(i)
        if b in "0123456789ab":
            return "train"
        return "val" if b in "cd" else "test"

    assigned = {i: split(i) for i in ids}
    # total: every id assigned exactly once
    assert set(assigned) == set(ids)
    # order-independence: shuffling the iteration order changes nothing
    for i in sorted(ids, reverse=True):
        assert split(i) == assigned[i]


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=2,
        max_size=200,
    )
)
@settings(max_examples=100, deadline=None)
def test_percentile_interpolation_definition(values):
    """The (p·(n−1)) linear-interpolation definition both engines share,
    checked against a direct reference implementation."""
    import math

    xs = sorted(values)
    n = len(xs)
    for p in (0.25, 0.5, 0.75, 0.9, 0.99):
        pos = p * (n - 1)
        lo = math.floor(pos)
        hi = min(lo + 1, n - 1)
        frac = pos - lo
        expected = xs[lo] + (xs[hi] - xs[lo]) * frac
        import numpy as np

        got = float(np.percentile(np.array(xs, dtype="float64"), p * 100))
        assert got == expected or abs(got - expected) < 1e-9
