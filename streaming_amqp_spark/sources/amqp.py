"""AMQP 1.0 streaming source as a PySpark ``DataSource``.

The Spark-first re-expression of the reference's receiver stack
(AMQPReceiver.scala, ReliableAMQPReceiver.scala, AMQPFlowController.scala,
AMQPUtils.scala): one source + options replaces the DStream/receiver/flow-
controller/rate-controller class hierarchy, and Structured Streaming's
offset/commit protocol replaces the WAL + store-then-ack machinery.

Semantics mapping (reference → here):

- ``AMQPUtils.createStream(ssc, host, port, username, password, address,
  converter, storageLevel)`` (AMQPUtils.scala:45-57) →
  ``spark.readStream.format("amqp").options(host=…, port=…, username=…,
  password=…, address=…).load()``; converters are column expressions over
  the fixed envelope schema (streaming_amqp_spark.envelope).
- Credit-based flow control — prefetch off, 1000 credits, replenish at 50%
  (AMQPFlowController.scala:55-56,92-94,131-141) → ``maxMessagesPerBatch``
  admission cap + the transport's credit window (same defaults).
- Reliable receiver — buffer, store block, then send AMQP ``Accepted``
  (ReliableAMQPReceiver.scala:111-169) → messages are retained in the
  reader buffer until Spark calls ``commit(offset)``, which settles them;
  a restart replays the unsettled tail ⇒ the same at-least-once guarantee.
- Unreliable receiver (AMQPReceiver.scala:159-162) → ``reliable=false``
  settles on receive (at-most-once on failure).
- Rate controllers (AMQPRateController.scala) → admission control: at most
  ``maxMessagesPerBatch`` per micro-batch; messages beyond the cap stay
  buffered/unsettled rather than AMQP-``Rejected`` (SURVEY §4.2: rejection
  has no Structured Streaming analogue; releasing is the lossless choice).

Scale note: this reader is a ``SimpleDataSourceStreamReader`` (driver-side
ingest, records shipped to executors as Arrow batches) — appropriate for a
protocol-push source at the reference's design rate (~10k msg/s,
AMQPFlowController.scala:271).  Scaling beyond one link = N source
instances on N addresses unioned together, which Spark plans as N
independent partitions.

The network transport (python-qpid-proton) is optional: the container has
no AMQP stack, so ``QpidTransport`` import-gates and tests exercise the
full source machinery through ``SpoolTransport`` (a directory of JSON-line
message files — the stand-in for the reference's in-process ProtonServer
harness, AMQPTestUtils.scala:213-266).
"""

from __future__ import annotations

import base64
import json
import os
import time
from collections import deque
from datetime import datetime, timezone
from functools import lru_cache
from typing import Any, Iterator

from pyspark.errors import PySparkNotImplementedError
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from streaming_amqp_spark.envelope import ENVELOPE_SCHEMA

CREDITS_DEFAULT = 1000  # AMQPFlowController.scala:55
CREDITS_THRESHOLD = 500  # AMQPFlowController.scala:56

# Receiver restart on connection close/disconnect (AMQPReceiver.scala:121-151
# calls Receiver.restart, which re-runs onStop/onStart).  Here the reader
# retries transport.fetch with exponential backoff after reconnect().
RECONNECT_MAX_ATTEMPTS = 5
RECONNECT_BASE_DELAY_S = 0.05


class TransportDisconnected(Exception):
    """Transport-level connection loss — the reader reconnects and retries
    (≡ the close/disconnect handlers at AMQPReceiver.scala:121-143)."""


def _json_encode_body(body: Any) -> tuple[str | None, str | None, bytes | None]:
    """Total mapping of an AMQP body to (body_type, body_json, body_binary).

    Mirrors AMQPJsonFunction.scala:111-148 (string/list/map/array → JSON,
    binary → bytes) but adds the default case the reference lacks
    (SURVEY §7.4.3: an Int body raises MatchError there) — any other value
    is JSON-stringified and tagged amqpValue.
    """
    if body is None:
        return None, None, None
    if isinstance(body, (bytes, bytearray)):
        return "data", None, bytes(body)
    if isinstance(body, str):
        return "amqpValue", body, None
    # list / dict / int / float / bool — JSON-encode (total, unlike the ref)
    return "amqpValue", json.dumps(body, separators=(",", ":")), None


@lru_cache(maxsize=4096)
def _parse_iso_ts(ts_str: str) -> datetime:
    """ISO-8601 → naive-UTC datetime, memoized: AMQP bursts commonly carry
    repeated (sender-batched, second-granularity) timestamps, and datetime
    objects are immutable so sharing one instance across rows is safe."""
    ingest = datetime.fromisoformat(ts_str)
    if ingest.tzinfo is not None:
        ingest = ingest.astimezone(timezone.utc).replace(tzinfo=None)
    return ingest


def _msg_to_row(msg: dict) -> tuple:
    """One spool/transport message dict → one envelope-schema row."""
    body_type, body_json, body_bin = _json_encode_body(msg.get("body"))
    if msg.get("body_b64") is not None:  # spool-file binary bodies
        body_type, body_json = "data", None
        body_bin = base64.b64decode(msg["body_b64"])
    if ts_str := msg.get("ingest_ts"):
        ingest = _parse_iso_ts(ts_str)
    else:
        ingest = datetime.fromtimestamp(time.time(), tz=timezone.utc).replace(
            tzinfo=None
        )
    props = msg.get("application_properties") or None
    annotations = msg.get("message_annotations") or None
    return (
        msg.get("message_id"),
        msg.get("to_address"),
        msg.get("subject"),
        msg.get("reply_to"),
        msg.get("correlation_id"),
        {str(k): str(v) for k, v in props.items()} if props else None,
        {str(k): str(v) for k, v in annotations.items()} if annotations else None,
        body_type,
        body_json,
        body_bin,
        ingest,
    )


# ---------------------------------------------------------------------------
# Arrow-batched row shipping.
#
# PySpark's Python-data-source worker accepts either tuples or
# ``pyarrow.RecordBatch``es from ``read()``.  The tuple path runs a
# per-row, per-column converter loop (plan_data_source_read.records_to_
# arrow_batches) that measures ~27 µs/row on the 11-column envelope —
# 4× the cost of the JSON parse itself.  Building the RecordBatch here,
# column-wise, keeps the JVM↔Python boundary columnar end to end and
# was measured bit-equal to the tuple path (same pa schema, same values,
# including bool/int→string coercion, map-entry and tz normalization).

_ARROW_ENV: tuple | None = None  # (pyarrow module, envelope arrow schema)
ARROW_ROWS_PER_BATCH = 16384  # flush granularity; bounds per-batch memory


def _arrow_env():
    global _ARROW_ENV
    if _ARROW_ENV is None:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        _ARROW_ENV = (pa, to_arrow_schema(ENVELOPE_SCHEMA))
    return _ARROW_ENV


def _coerce_str(v):
    """The worker's StringType coercion (conversion.py convert_string):
    None/str pass through, bool lowers, anything else str()s."""
    if v is None or type(v) is str:
        return v
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _rows_to_arrow_batch(rows: list[tuple]):
    """Envelope row tuples (``_msg_to_row`` output) → one RecordBatch,
    replicating the stock tuple-path converters exactly: string coercion,
    map dict → entry list, naive timestamp interpreted via astimezone(UTC)
    (identical to conversion.py's TimestampType converter).

    ADVICE r15: converters dispatch on the arrow schema's FIELD TYPES
    (string / map / binary / timestamp), not hard-coded column
    positions, so an ENVELOPE_SCHEMA reorder or extension either keeps
    converting correctly or fails loudly here — never silently
    misaligns.  The pinned bit-equality corpus test
    (tests/test_scaleout.py) remains the behavioural guard."""
    pa, schema = _arrow_env()
    cols = list(zip(*rows))
    arrays = []
    for i, t in enumerate(schema.types):
        if pa.types.is_string(t):
            arrays.append(pa.array([_coerce_str(v) for v in cols[i]], t))
        elif pa.types.is_map(t):
            arrays.append(
                pa.array(
                    [
                        list(v.items()) if v is not None else None
                        for v in cols[i]
                    ],
                    t,
                )
            )
        elif pa.types.is_binary(t):
            arrays.append(
                pa.array(
                    [None if v is None else bytes(v) for v in cols[i]], t
                )
            )
        elif pa.types.is_timestamp(t):
            arrays.append(
                pa.array(
                    [
                        None if v is None else v.astimezone(timezone.utc)
                        for v in cols[i]
                    ],
                    t,
                )
            )
        else:  # loud failure beats silent misconversion
            raise TypeError(
                f"unsupported envelope arrow type {t} for column "
                f"{schema.names[i]}"
            )
    return pa.RecordBatch.from_arrays(arrays, schema=schema)


def _parse_spool_line(line: str) -> dict | None:
    """One spool-file line → message dict, or None for a malformed /
    non-object line (SURVEY §7.4.2 drop-don't-crash semantics — shared by
    the streaming SpoolTransport and the batch reader so the two paths
    can never diverge)."""
    line = line.strip()
    if not line:
        return None
    try:
        msg = json.loads(line)
    except ValueError:
        return None
    return msg if isinstance(msg, dict) else None


def _retry_on_disconnect(op, reconnect):
    """Run ``op`` with reconnect-on-TransportDisconnected + exponential
    backoff (≡ Receiver.restart on close/disconnect,
    AMQPReceiver.scala:121-151) — one policy shared by the reader's fetch
    and the writer's send so a backoff fix can't miss one of them."""
    delay = RECONNECT_BASE_DELAY_S
    for attempt in range(RECONNECT_MAX_ATTEMPTS + 1):
        try:
            return op()
        except TransportDisconnected:
            if attempt == RECONNECT_MAX_ATTEMPTS:
                raise
            time.sleep(delay)
            delay *= 2
            reconnect()
    raise AssertionError("unreachable")


class Transport:
    """Minimal message-delivery interface the reader drives.

    ``fetch(max_n)`` returns up to max_n new messages as dicts;
    ``settle(n)`` acknowledges the oldest n outstanding messages
    (≡ AMQP Accepted disposition on commit).
    """

    def fetch(self, max_n: int) -> list[dict]:
        raise NotImplementedError

    def settle(self, n: int) -> None:
        pass

    def reconnect(self) -> None:
        """Re-establish the underlying connection after a
        ``TransportDisconnected`` from ``fetch``.  Stateless transports
        (spool) need nothing; ``QpidTransport`` rebuilds the link."""

    def close(self) -> None:
        pass


class SpoolTransport(Transport):
    """Replayable test/file transport: JSON-lines message files in a
    directory, consumed in (filename, line) order.  Stands in for a broker
    in tests exactly like the reference's embedded ActiveMQ / in-process
    ProtonServer (AMQPTestUtils.scala:66-91,213-266).

    ``fetch`` tail-reads incrementally: a per-file byte high-water mark
    means each appended line is read and parsed exactly once over the
    stream's lifetime — O(new data) per micro-batch, not O(total spool)
    (the previous full-rescan was quadratic over a long-running stream).
    Files must be appended in non-decreasing filename order (a new file
    sorting before an already-consumed one would be read late — same
    contract a broker's FIFO link gives the reference's receiver).
    """

    def __init__(self, spool_dir: str):
        self.spool_dir = spool_dir
        self.consumed = 0
        # Converter-crash semantics (SURVEY §7.4.2): the reference's
        # unreliable path throws on an unconvertible message
        # (AMQPReceiver.scala:161) while the reliable path silently drops
        # (ReliableAMQPReceiver.scala:127).  The resolved semantic here:
        # drop AND count — the stream never dies, the loss is observable.
        self.malformed = 0
        self._offsets: dict[str, int] = {}  # fname -> next unread byte
        self._pending: deque[dict] = deque()
        self._to_skip = 0  # checkpoint fast-forward debt (see skip())

    def _poll(self) -> None:
        """Read only bytes appended since the last poll.  Only complete
        (newline-terminated) lines are consumed; a partially-flushed tail
        stays unread — its offset un-advanced — until its newline arrives,
        so a mid-write poll can never parse half a message."""
        for fname in sorted(os.listdir(self.spool_dir)):
            if not fname.endswith(".jsonl"):
                continue
            path = os.path.join(self.spool_dir, fname)
            off = self._offsets.get(fname, 0)
            if os.path.getsize(path) <= off:
                continue
            with open(path, "rb") as f:
                f.seek(off)
                data = f.read()
            end = data.rfind(b"\n") + 1
            if end == 0:
                continue
            self._offsets[fname] = off + end
            for raw in data[:end].splitlines():
                line = raw.decode("utf-8", errors="replace")
                if line.strip():
                    if (msg := _parse_spool_line(line)) is not None:
                        self._pending.append(msg)
                    else:
                        self.malformed += 1

    def skip(self, n: int) -> None:
        """Checkpoint-recovery fast-forward: drop the next ``n`` messages
        (the committed prefix) without surfacing them.  Messages not yet
        on disk are skipped as they arrive."""
        self._to_skip += n
        self.consumed += n

    def fetch(self, max_n: int) -> list[dict]:
        self._poll()
        while self._to_skip and self._pending:
            self._pending.popleft()
            self._to_skip -= 1
        if self._to_skip:
            return []
        n = min(max_n, len(self._pending))
        batch = [self._pending.popleft() for _ in range(n)]
        self.consumed += n
        return batch

    def replay(self, start: int, end: int) -> list[dict]:
        """Full-rescan slow path for offset-range replay after a restart
        (≡ WAL block re-read); leaves the incremental cursor and the
        malformed counter untouched."""
        out: list[dict] = []
        for fname in sorted(os.listdir(self.spool_dir)):
            if not fname.endswith(".jsonl"):
                continue
            with open(os.path.join(self.spool_dir, fname)) as f:
                for line in f:
                    if line.strip():
                        if (msg := _parse_spool_line(line)) is not None:
                            out.append(msg)
                            if len(out) >= end:
                                return out[start:end]
        return out[start:end]


class QpidTransport(Transport):
    """Real AMQP 1.0 transport over python-qpid-proton (import-gated: the
    lib is absent in this container, so constructing this raises with a
    clear message; the class documents the intended wiring).

    Flow control mirrors AMQPFlowController.scala: prefetch disabled,
    ``credit_window`` credits granted, replenished when consumption crosses
    ``credit_threshold`` (:92-94,:131-141).  Deliveries stay unsettled
    until ``settle`` (reliable mode) ≡ ReliableAMQPReceiver.scala:142-159.
    """

    def __init__(
        self,
        host: str,
        port: int,
        address: str,
        username: str | None = None,
        password: str | None = None,
        credit_window: int = CREDITS_DEFAULT,
        credit_threshold: int = CREDITS_THRESHOLD,
        reliable: bool = True,
    ):
        try:
            import proton  # noqa: F401
            import proton.utils  # noqa: F401
        except ImportError as e:  # pragma: no cover - no AMQP stack in image
            raise ImportError(
                "QpidTransport needs python-qpid-proton; use "
                "transport=spool for offline testing"
            ) from e
        self._host, self._port, self._address = host, port, address
        self._username, self._password = username, password
        self._credit_window = credit_window
        self._credit_threshold = credit_threshold
        self._reliable = reliable
        self._since_replenish = 0
        self._unsettled: list[Any] = []
        self._connect()

    def _connect(self) -> None:
        from proton.utils import BlockingConnection

        url = f"amqp://{self._host}:{self._port}"
        self._conn = BlockingConnection(
            url, allowed_mechs="PLAIN" if self._username else None,
            user=self._username, password=self._password,
        )
        # prefetch=0 ≡ setPrefetch(0) + manual flow (AMQPFlowController.scala:92-94)
        self._recv = self._conn.create_receiver(self._address, credit=0)
        self._recv.receiver.flow(self._credit_window)
        self._since_replenish = 0

    def reconnect(self) -> None:
        """Rebuild connection + link after a drop (≡ Receiver.restart at
        AMQPReceiver.scala:129-131).  Unsettled deliveries of the dead
        connection are forgotten — the broker redelivers them on the new
        link (at-least-once, same as the reference's WAL replay)."""
        try:
            self._conn.close()
        except Exception:
            pass
        self._unsettled = []
        self._connect()

    def fetch(self, max_n: int) -> list[dict]:
        from proton import Timeout

        out: list[dict] = []
        while len(out) < max_n:
            try:
                delivery = self._recv.receive(timeout=0.1)
            except Timeout:
                break  # queue drained — a normal end of batch
            except Exception as e:
                # connection/link failure mid-fetch: surface as a typed
                # disconnect so the reader can reconnect-and-retry
                # (already-fetched messages stay buffered in the reader)
                raise TransportDisconnected(str(e)) from e
            msg = delivery.message if hasattr(delivery, "message") else delivery
            out.append(
                {
                    "message_id": str(msg.id) if msg.id is not None else None,
                    "to_address": msg.address,
                    "subject": msg.subject,
                    "reply_to": msg.reply_to,
                    "correlation_id": (
                        str(msg.correlation_id)
                        if msg.correlation_id is not None
                        else None
                    ),
                    "application_properties": {
                        str(k): str(v) for k, v in (msg.properties or {}).items()
                    },
                    # Symbol→Any map, both sides stringified
                    # (AMQPJsonFunction.scala:91-100)
                    "message_annotations": {
                        str(k): str(v)
                        for k, v in (msg.annotations or {}).items()
                    },
                    "body": msg.body,
                }
            )
            if self._reliable:
                self._unsettled.append(delivery)
            else:
                delivery.settle()
            self._since_replenish += 1
            # replenish ≡ issueCredits (AMQPFlowController.scala:131-141)
            if self._since_replenish >= self._credit_threshold:
                self._recv.receiver.flow(self._since_replenish)
                self._since_replenish = 0
        return out

    def settle(self, n: int) -> None:
        for d in self._unsettled[:n]:
            d.settle()  # Accepted ≡ ReliableAMQPReceiver.scala:152-156
        del self._unsettled[:n]

    def close(self) -> None:
        self._conn.close()


class AMQPStreamReader(SimpleDataSourceStreamReader):
    """Offset/commit protocol over a Transport.

    Offset = {"seq": total messages admitted}.  Messages fetched but not
    yet committed stay in ``_retained`` so ``readBetweenOffsets`` can
    replay a failed batch (≡ WAL-backed block replay in the reference);
    ``commit`` settles and drops them (≡ store-then-ack,
    ReliableAMQPReceiver.scala:111-159).
    """

    def __init__(self, options: dict):
        self.options = options
        self.max_per_batch = int(
            options.get("maxmessagesperbatch", CREDITS_DEFAULT)
        )
        # Rate limiting ≡ the latent AMQPAsyncFlowController /
        # AMQPRateController family (AMQPFlowController.scala:152-370,
        # AMQPRateController.scala:38-341): admit at most
        # maxRatePerSecond × elapsed-since-last-batch messages per batch.
        # Excess stays buffered/unsettled (released, never AMQP-Rejected —
        # SURVEY §4.2).
        self.max_rate = float(options.get("maxratepersecond", 0)) or None
        self._last_read_t: float | None = None
        # Adaptive admission (full A10/A11 parity): Structured Streaming
        # has no push-side PID, so the reader closes the loop itself.  The
        # feedback signal is the batch-processing duration measured from
        # read-end to commit(end) — see commit() — so the cap shrinks when
        # batches genuinely overrun targetBatchSeconds and regrows
        # geometrically toward maxMessagesPerBatch when they run fast;
        # trigger intervals and idle gaps never enter the signal.
        self.target_batch_s = (
            float(options.get("targetbatchseconds", 0)) or None
        )
        self._adaptive_cap = self.max_per_batch
        # end-seq -> (read-finished time, admitted count): commit() turns
        # these into observed batch-processing durations
        self._batch_done: dict[int, tuple[float, int]] = {}
        self.reliable = options.get("reliable", "true").lower() == "true"
        transport_kind = options.get("transport", "qpid")
        if transport_kind == "spool":
            self.transport: Transport = SpoolTransport(options["spooldir"])
        else:
            self.transport = QpidTransport(
                host=options.get("host", "localhost"),
                port=int(options.get("port", 5672)),
                address=options.get("address", "spark"),
                username=options.get("username"),
                password=options.get("password"),
                credit_window=self.max_per_batch,
                reliable=self.reliable,
            )
        self._seq = 0
        self._retained: list[tuple[int, tuple]] = []  # (seq, row)

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _fetch_with_reconnect(self, max_n: int) -> list[dict]:
        """transport.fetch with restart-on-disconnect (≡ the reference's
        Receiver.restart on close/disconnect, AMQPReceiver.scala:121-151):
        exponential backoff, then transport.reconnect() and retry.  Rows
        already retained from earlier batches are untouched; a broker that
        redelivers the in-flight tail yields duplicates, the same
        at-least-once guarantee as the reference's WAL path."""
        return _retry_on_disconnect(
            lambda: self.transport.fetch(max_n), self.transport.reconnect
        )

    def _to_row(self, msg: dict) -> tuple:
        return _msg_to_row(msg)

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        # Restart resync (≡ checkpoint recovery via StreamingContext.
        # getOrCreate, AMQPTemperature.scala:61): a fresh reader starts at
        # seq 0 but Spark hands us the checkpointed offset. For a replayable
        # transport, fast-forward past the committed prefix; for a live AMQP
        # link the broker redelivers unsettled messages itself and committed
        # ones were already settled (at-least-once either way).
        if start["seq"] > self._seq and isinstance(self.transport, SpoolTransport):
            self.transport.skip(start["seq"] - self._seq)
            self._seq = start["seq"]
        now = time.monotonic()
        elapsed = (
            now - self._last_read_t if self._last_read_t is not None else 1.0
        )
        self._last_read_t = now
        admit = self.max_per_batch
        if self.max_rate:
            admit = min(admit, max(1, int(self.max_rate * elapsed)))
        if self.target_batch_s:
            admit = min(admit, self._adaptive_cap)
        msgs = self._fetch_with_reconnect(admit)
        rows = [self._to_row(m) for m in msgs]
        base = self._seq
        self._retained.extend((base + i, r) for i, r in enumerate(rows))
        self._seq = base + len(rows)
        if not self.reliable:
            self._retained.clear()
        if self.target_batch_s and rows:
            # commit(end) closes this sample into a processing duration;
            # bound the map in case an epoch is never committed (restart)
            self._batch_done[self._seq] = (time.monotonic(), len(rows))
            while len(self._batch_done) > 64:
                self._batch_done.pop(next(iter(self._batch_done)))
        # Ship as ONE RecordBatch (columnar boundary — the driver-side
        # prefetch cache passes it to the JVM unconverted; the tuple
        # path's per-row converter loop was the measured bottleneck).
        # An empty read MUST return an empty iterator, not a 0-row batch:
        # the engine treats any yielded element with an unchanged offset
        # as OFFSET_DID_NOT_ADVANCE.  Rows stay retained as tuples for
        # readBetweenOffsets replay (per-message granularity).
        out = iter([_rows_to_arrow_batch(rows)]) if rows else iter(())
        return out, {"seq": self._seq}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        lo, hi = start["seq"], end["seq"]
        replay = [r for s, r in self._retained if lo <= s < hi]
        if len(replay) == hi - lo:
            return iter(replay)
        if isinstance(self.transport, SpoolTransport):  # replayable transport
            return iter(
                self._to_row(m) for m in self.transport.replay(lo, hi)
            )
        # non-replayable transport with settled messages: at-least-once means
        # the committed prefix is gone; only the retained tail is available.
        return iter(replay)

    def commit(self, end: dict) -> None:
        upto = end["seq"]
        n_settle = sum(1 for s, _ in self._retained if s < upto)
        self.transport.settle(n_settle)
        self._retained = [(s, r) for s, r in self._retained if s >= upto]
        # Adaptive admission (full A10/A11 parity: the latent controllers
        # track Spark's PID-driven blockGenerator.getCurrentLimit,
        # AMQPRateController.scala:56,214-215).  commit(end) fires after
        # the batch finished processing, so now − read-end is the TRUE
        # batch-processing duration — unlike inter-read elapsed time, it
        # cannot confuse a long trigger interval or an idle source with a
        # slow pipeline (which would ratchet the cap down permanently).
        sample = self._batch_done.pop(upto, None)
        if self.target_batch_s and sample is not None:
            t_read_end, n_admitted = sample
            proc = time.monotonic() - t_read_end
            if proc > self.target_batch_s:
                # overran: scale cap to what this batch's rate would have
                # processed within the target
                self._adaptive_cap = max(
                    1, int(n_admitted * self.target_batch_s / proc)
                )
            elif proc < 0.5 * self.target_batch_s:
                self._adaptive_cap = min(
                    self.max_per_batch, max(self._adaptive_cap * 2, 1)
                )


def _complete_bytes(path: str, upto: int | None = None, chunk: int = 1 << 16) -> int:
    """Byte length of the newline-terminated prefix of ``path`` (at most
    ``upto`` bytes) — the metadata-only probe the scale-out reader's
    driver side uses.  Reads at most a few tail chunks (lines are small),
    never the file body."""
    size = os.path.getsize(path)
    if upto is not None:
        size = min(size, upto)
    if size <= 0:
        return 0
    with open(path, "rb") as f:
        lo = size
        while lo > 0:
            start = max(0, lo - chunk)
            f.seek(start)
            data = f.read(lo - start)
            nl = data.rfind(b"\n")
            if nl >= 0:
                return start + nl + 1
            lo = start
    return 0


def _next_newline(path: str, off: int, chunk: int = 1 << 16) -> int | None:
    """Byte position just past the first newline at/after ``off`` — the
    make-progress probe for a single line larger than the batch budget.
    Returns None if no complete line exists yet."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = off
        while pos < size:
            f.seek(pos)
            data = f.read(min(chunk, size - pos))
            nl = data.find(b"\n")
            if nl >= 0:
                return pos + nl + 1
            pos += len(data)
    return None


class _SpoolRangePartition(InputPartition):
    """One spool directory's new byte ranges for one micro-batch:
    ``ranges`` = [(file path, start byte, end byte)], newline-aligned."""

    def __init__(self, ranges: list[tuple[str, int, int]]):
        self.ranges = ranges


class AMQPScaleOutStreamReader(DataSourceStreamReader):
    """Partitioned streaming reader: one executor-side partition per spool
    directory per micro-batch — the Structured Streaming re-expression of
    the reference's receiver-per-stream parallelism (a receiver object is
    shipped to an executor per stream, AMQPInputDStream.scala:40-59;
    scale-out there = N streams unioned).

    Division of labour at scale: the driver's ``latestOffset`` does
    metadata-only work (file sizes + a tail probe for the last newline,
    O(#files) regardless of data volume); executors parse their assigned
    newline-aligned byte ranges in parallel.  Offsets are plain
    {dir: {file: completed-byte}} maps, so any (start, end] range is
    replayable from the files themselves — exactly-once for a durable
    spool, with none of the driver-funnel ceiling of the simple reader.

    Selected via option ``spooldirs`` (comma-separated directories).  A
    live multi-link deployment uses :func:`api.create_union_stream` (one
    driver-side link per address) — an AMQP broker gives no replayable
    byte ranges, so executor-side live links cannot honour
    ``partitions(start, end)`` replay and are intentionally not offered.
    """

    def __init__(self, options: dict):
        dirs = options.get("spooldirs") or options.get("spooldir", "")
        self.spool_dirs = [d.strip() for d in dirs.split(",") if d.strip()]
        if not self.spool_dirs:
            raise ValueError("spooldirs option is required for scale-out mode")
        # Admission control (≡ maxMessagesPerBatch on the simple reader,
        # AMQPFlowController.scala:55): cap the bytes each DIRECTORY
        # contributes per micro-batch so a deep backlog drains as bounded
        # batches instead of one giant one.  Byte- not message-denominated
        # because the driver only ever sees sizes, never message bodies.
        self.max_bytes = int(options.get("maxbytesperbatch", 0)) or None
        self._last: dict | None = None

    def _dir_files(self, d: str) -> list[str]:
        return sorted(
            os.path.join(d, f)
            for f in os.listdir(d)
            if f.endswith(".jsonl")
        )

    def initialOffset(self) -> dict:
        return {d: {} for d in self.spool_dirs}

    def latestOffset(self) -> dict:
        # Restart safety: after a checkpoint recovery the engine may call
        # latestOffset before any partitions(start, end), so the cap's
        # byte-counting memory (_last) is empty and a capped count from
        # byte 0 would return offsets BELOW the checkpointed start —
        # Spark would then plan (prev_end, our_smaller_end] ranges that
        # re-deliver consumed data.  First call is therefore uncapped
        # (offsets are monotone by construction); the cap engages from
        # the second batch on, once _last holds a real high-water mark.
        first_call = self._last is None
        prev = self._last or {}
        out: dict = {}
        for d in self.spool_dirs:
            prev_d = prev.get(d, {})
            cur: dict = {}
            budget = self.max_bytes
            for p in self._dir_files(d):
                lo = prev_d.get(p, 0)
                if budget is None or first_call:
                    hi = _complete_bytes(p)
                elif budget > 0:
                    hi = _complete_bytes(p, upto=lo + budget)
                    if hi <= lo and _complete_bytes(p) > lo:
                        # a single line larger than the whole budget:
                        # admit that one line anyway — progress beats the
                        # cap, else this file stalls forever while later
                        # files overtake it (FIFO violation + data loss)
                        hi = _next_newline(p, lo) or lo
                    budget -= max(0, hi - lo)
                else:
                    hi = lo
                cur[p] = max(hi, lo)
            out[d] = cur
        self._last = out
        return out

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # Secondary restart resync (belt to latestOffset's first-call
        # braces): floor the cap's memory at every observed start so a
        # capped latestOffset can never re-issue consumed ranges.
        if self._last is None:
            self._last = {}
        for d, files in start.items():
            mine = self._last.setdefault(d, {})
            for p, off in files.items():
                if mine.get(p, 0) < off:
                    mine[p] = off
        parts = []
        for d in self.spool_dirs:
            prev = start.get(d, {})
            ranges = [
                (p, prev.get(p, 0), hi)
                for p, hi in end.get(d, {}).items()
                if hi > prev.get(p, 0)
            ]
            if ranges:
                parts.append(_SpoolRangePartition(ranges))
        return parts or [_EmptyPartition()]

    def read(self, partition: InputPartition) -> Iterator:
        # Yields RecordBatches, not tuples: columnar all the way to the JVM
        # (see _rows_to_arrow_batch — the tuple path's per-row converter
        # loop dominated the measured per-batch cost).
        if isinstance(partition, _EmptyPartition):
            return
        buf: list[tuple] = []
        for path, lo, hi in partition.ranges:
            with open(path, "rb") as f:
                f.seek(lo)
                data = f.read(hi - lo)
            for raw in data.splitlines():
                line = raw.decode("utf-8", errors="replace")
                if line.strip():
                    if (msg := _parse_spool_line(line)) is not None:
                        buf.append(_msg_to_row(msg))
                        if len(buf) >= ARROW_ROWS_PER_BATCH:
                            yield _rows_to_arrow_batch(buf)
                            buf = []
        if buf:
            yield _rows_to_arrow_batch(buf)

    def commit(self, end: dict) -> None:
        pass


class _SpoolFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _EmptyPartition(InputPartition):
    """Explicit no-data partition for an empty spool directory (Spark
    requires at least one partition per scan)."""

    def __init__(self):
        pass


class _AddressPartition(InputPartition):
    def __init__(self, address: str):
        self.address = address


class AMQPBatchReader(DataSourceReader):
    """``spark.read.format("amqp")`` — drain currently-available messages as
    a batch DataFrame (the reference has no batch mode; this is the
    DataFrame-native upgrade for replaying a captured spool or bounded
    queue).

    Scale design: the scan is partitioned — one executor-side partition per
    spool file (``transport=spool``) or per AMQP address
    (comma-separated ``address`` list for a live link), so a 100 TB spool
    directory reads wide exactly like Spark's file sources; nothing funnels
    through the driver.
    """

    def __init__(self, options: dict):
        self.options = options
        self.kind = options.get("transport", "qpid")

    def partitions(self) -> list[InputPartition]:
        if self.kind == "spool":
            spool = self.options["spooldir"]
            files = sorted(
                os.path.join(spool, f)
                for f in os.listdir(spool)
                if f.endswith(".jsonl")
            )
            return [_SpoolFilePartition(p) for p in files] or [_EmptyPartition()]
        addresses = self.options.get("address", "spark").split(",")
        return [_AddressPartition(a.strip()) for a in addresses]

    def read(self, partition: InputPartition) -> Iterator:
        if isinstance(partition, _EmptyPartition):
            return
        if isinstance(partition, _SpoolFilePartition):
            # same drop-and-count semantics as the streaming SpoolTransport
            # (SURVEY §7.4.2): a malformed or non-object line never fails
            # the task.  Rows ship as RecordBatches (columnar boundary —
            # see _rows_to_arrow_batch).
            buf: list[tuple] = []
            with open(partition.path) as f:
                for line in f:
                    if (msg := _parse_spool_line(line)) is not None:
                        buf.append(_msg_to_row(msg))
                        if len(buf) >= ARROW_ROWS_PER_BATCH:
                            yield _rows_to_arrow_batch(buf)
                            buf = []
            if buf:
                yield _rows_to_arrow_batch(buf)
            return
        # live link: per-partition connection, drain until empty, settle all
        transport = QpidTransport(  # pragma: no cover - no AMQP stack in image
            host=self.options.get("host", "localhost"),
            port=int(self.options.get("port", 5672)),
            address=partition.address,
            username=self.options.get("username"),
            password=self.options.get("password"),
            reliable=True,
        )
        try:  # pragma: no cover
            while batch := transport.fetch(CREDITS_DEFAULT):
                for m in batch:
                    yield _msg_to_row(m)
                transport.settle(len(batch))
        finally:  # pragma: no cover
            transport.close()


class QpidSender:
    """Live AMQP 1.0 sender over python-qpid-proton (import-gated like
    ``QpidTransport``) — the publish half ``AMQPWriter`` opens per task in
    live mode.

    ``BlockingSender.send`` waits for the broker to settle each delivery
    (at-least-once: a retried task may re-send messages the broker already
    accepted — the mirror of the source's redelivery contract).  The
    reference has no sink at all (ingestion-only connector,
    AMQPInputDStream.scala), so this is engine completeness, not parity.
    """

    def __init__(
        self,
        host: str,
        port: int,
        address: str,
        username: str | None = None,
        password: str | None = None,
    ):
        try:
            import proton  # noqa: F401
            import proton.utils  # noqa: F401
        except ImportError as e:  # pragma: no cover - no AMQP stack in image
            raise ImportError(
                "live AMQP publish needs python-qpid-proton; use "
                "transport=spool for offline testing"
            ) from e
        self._host, self._port, self._address = host, port, address
        self._username, self._password = username, password
        self._connect()

    def _connect(self) -> None:  # pragma: no cover
        from proton.utils import BlockingConnection

        url = f"amqp://{self._host}:{self._port}"
        self._conn = BlockingConnection(
            url, allowed_mechs="PLAIN" if self._username else None,
            user=self._username, password=self._password,
        )
        self._snd = self._conn.create_sender(self._address)

    def reconnect(self) -> None:  # pragma: no cover
        try:
            self._conn.close()
        except Exception:
            pass
        self._connect()

    def send(self, msg: dict) -> None:  # pragma: no cover
        from proton import Message

        m = Message(
            id=msg.get("message_id"),
            address=msg.get("to_address") or self._address,
            subject=msg.get("subject"),
            reply_to=msg.get("reply_to"),
            correlation_id=msg.get("correlation_id"),
            properties=msg.get("application_properties"),
            annotations=msg.get("message_annotations"),
            body=(
                base64.b64decode(msg["body_b64"])
                if "body_b64" in msg
                else msg.get("body")
            ),
        )
        try:
            self._snd.send(m)
        except Exception as e:
            raise TransportDisconnected(str(e)) from e

    def close(self) -> None:  # pragma: no cover
        try:
            self._conn.close()
        except Exception:
            pass


def _row_to_msg(row) -> dict:
    """One envelope(-ish) row → one spool/transport message dict (the
    inverse of ``_msg_to_row``; missing columns become absent keys)."""
    d = row.asDict() if hasattr(row, "asDict") else dict(row)
    msg: dict = {}
    for k in (
        "message_id",
        "to_address",
        "subject",
        "reply_to",
        "correlation_id",
        "application_properties",
        "message_annotations",
    ):
        if d.get(k) is not None:
            v = d[k]
            msg[k] = dict(v) if hasattr(v, "items") else v
    if d.get("body_type") == "data" and d.get("body_binary") is not None:
        msg["body_b64"] = base64.b64encode(bytes(d["body_binary"])).decode()
    elif d.get("body") is not None:
        msg["body"] = d["body"]
    if d.get("ingest_ts") is not None:
        msg["ingest_ts"] = d["ingest_ts"].isoformat()
    return msg


class _SpoolCommit(WriterCommitMessage):
    """Commit message: the task's temp file + its partition id."""

    def __init__(self, tmp_path: str | None, partition_id: int, n_rows: int):
        self.tmp_path = tmp_path
        self.partition_id = partition_id
        self.n_rows = n_rows


class AMQPWriter(DataSourceWriter, DataSourceStreamWriter):
    """``df.write[Stream].format("amqp")`` — publish envelope rows.

    Offline (``transport=spool``): two-phase commit onto the spool
    directory in the exact format ``SpoolTransport`` reads (write→read
    round-trips).  Tasks write temp files and report them in their commit
    message; the driver's ``commit`` renames them to their final
    ``<epoch>-<partition>.jsonl`` names (atomic per file), ``abort``
    deletes them.  A replayed streaming epoch re-renames onto the same
    names instead of duplicating — the sink half of the at-least-once
    contract.  The mechanism assumes the spool dir is shared storage, the
    same assumption Spark's own file sinks make.

    Live (``transport=qpid``): each task opens a ``QpidSender`` and
    publishes row-by-row with reconnect-on-disconnect (same backoff policy
    as the reader's ``_fetch_with_reconnect``).  AMQP has no cross-message
    transaction, so the live sink is at-least-once: ``commit`` is a no-op
    and a retried task may re-send its partition — the same contract as
    the source side.  The reference has no sink at all (ingestion-only
    connector), so this is an engine-completeness upgrade, not a parity
    port.
    """

    def __init__(self, options: dict):
        import uuid

        self.options = options
        self.live = options.get("transport", "qpid") != "spool"
        if self.live:
            self._check_live_stack()
            self.spool_dir = None
        else:
            self.spool_dir = options["spooldir"]
        # Batch publishes must not collide: each .save() finalizes under a
        # unique job epoch (override with option epoch=… for deterministic
        # names).  Streaming epochs are e<batchId>, stable across restarts
        # so a replayed epoch re-renames onto the same files (idempotent);
        # two streaming queries sharing one spooldir must therefore pass
        # distinct queryName=… options to namespace their epochs.
        self.batch_epoch = options.get("epoch") or f"b{uuid.uuid4().hex[:12]}"
        self.query_prefix = options.get("queryname", "")

    def _check_live_stack(self) -> None:  # pragma: no cover
        try:
            import proton  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "live AMQP publish needs python-qpid-proton (absent in "
                "this container); use transport=spool"
            ) from e

    def _make_sender(self) -> QpidSender:  # pragma: no cover
        return QpidSender(
            host=self.options.get("host", "localhost"),
            port=int(self.options.get("port", 5672)),
            address=self.options.get("address", "spark"),
            username=self.options.get("username"),
            password=self.options.get("password"),
        )

    @staticmethod
    def _send_with_reconnect(sender, msg: dict) -> None:
        """Send one message via the shared reconnect/backoff policy.  A
        message whose send raced the drop may reach the broker twice —
        at-least-once (the mirror of the source's redelivery contract)."""
        _retry_on_disconnect(lambda: sender.send(msg), sender.reconnect)

    def _write_live(self, iterator, pid: int) -> _SpoolCommit:
        sender = self._make_sender()
        n = 0
        try:
            for row in iterator:
                self._send_with_reconnect(sender, _row_to_msg(row))
                n += 1
        finally:
            sender.close()
        return _SpoolCommit(None, pid, n)

    def write(self, iterator) -> _SpoolCommit:
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        if self.live:
            return self._write_live(iterator, pid)
        os.makedirs(self.spool_dir, exist_ok=True)
        tmp = os.path.join(self.spool_dir, f".inprogress-{uuid.uuid4().hex}.tmp")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(_row_to_msg(row), separators=(",", ":")) + "\n")
                n += 1
        return _SpoolCommit(tmp, pid, n)

    def _finalize(self, messages, epoch: str) -> None:
        for m in messages:
            if m is None or m.tmp_path is None:  # live sends: nothing to rename
                continue
            final = os.path.join(
                self.spool_dir, f"{epoch}-{m.partition_id:05d}.jsonl"
            )
            os.replace(m.tmp_path, final)

    # batch path: DataSourceWriter.commit(messages)
    # stream path: DataSourceStreamWriter.commit(messages, batchId)
    def commit(self, messages, batchId=None) -> None:
        if batchId is None:
            epoch = self.batch_epoch
        else:
            prefix = f"{self.query_prefix}-" if self.query_prefix else ""
            epoch = f"{prefix}e{batchId}"
        self._finalize(messages, epoch)

    def abort(self, messages, batchId=None) -> None:
        for m in messages:
            if m is not None and m.tmp_path and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class AMQPDataSource(DataSource):
    """``spark.read[Stream].format("amqp")`` — envelope-schema AMQP source."""

    @classmethod
    def name(cls) -> str:
        return "amqp"

    def schema(self) -> StructType:
        return ENVELOPE_SCHEMA

    def reader(self, schema: StructType) -> AMQPBatchReader:
        return AMQPBatchReader(dict(self.options))

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        """Partitioned executor-side reader when ``spooldirs`` is given
        (scale-out mode); otherwise signal Spark to fall back to the
        driver-side simple reader below."""
        if dict(self.options).get("spooldirs"):
            return AMQPScaleOutStreamReader(dict(self.options))
        raise PySparkNotImplementedError(
            errorClass="NOT_IMPLEMENTED", messageParameters={"feature": "streamReader"}
        )

    def simpleStreamReader(self, schema: StructType) -> AMQPStreamReader:
        return AMQPStreamReader(dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> AMQPWriter:
        return AMQPWriter(dict(self.options))

    def streamWriter(self, schema: StructType, overwrite: bool) -> AMQPWriter:
        return AMQPWriter(dict(self.options))


def register_amqp_source(spark) -> None:
    spark.dataSource.register(AMQPDataSource)
