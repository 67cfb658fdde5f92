"""Live keyspace-notification bridge: server events → the CDC changes feed.

The reference's keyspace-trigger family is notification-driven: the module
subscribes to every keyspace event class on load (@STREAM @GENERIC @ALL
@MISSED — redisgears_core/src/lib.rs:1904-1908) and fans each notification
out to registered consumers (keys_notifications.rs:191-208), with the
callback's read-only snapshot taken synchronously at event time. This
module is that subscription for the Spark engine: it turns a server's
`__keyspace@<db>__:<key>` notifications into rows of the parquet `changes`
feed that `KeyspaceTriggerRuntime` already consumes — so the whole CDC
machinery (prefix match, expr/callback paths, DLQ + replay, exactly-once
sink collapse, origin-tag re-entrancy suppression) applies unchanged to a
live server.

Why a bridge into the feed rather than a pub/sub streaming source: Redis
pub/sub has NO replay — a message missed while a micro-batch was planning
is gone, which breaks the delivery guarantee every other source here
honors. Landing notifications into the append-only parquet feed first
makes the feed the replayable offset log (the same reason the reference
journals trigger state into the RDB rather than trusting live delivery).
The bridge itself is the one at-most-once hop (as it is in the reference:
a crashed server loses undelivered notifications); everything downstream
of the feed is exactly-once.

Origin tagging without wire support: real notifications carry only
(event, key) — there is no "who wrote it" field. The reference suppresses
callback-origin notifications with a thread-local blocker around the
callback (NotificationBlocker, lib.rs:629-645). The analog here is the
`trigger_client()` write proxy: trigger actions write THROUGH it, it
pre-registers the (key) with the bridge, and the next notification for
that key is tagged origin='trigger' — which the runtime's match predicate
already filters, breaking write loops end-to-end.
"""

from __future__ import annotations

import threading
from collections import Counter
from typing import Callable

import pandas as pd


class KeyspaceNotificationBridge:
    """Subscribes to a server's keyspace notifications and appends them —
    with an event-time snapshot and origin tag — to a
    `KeyspaceTriggerRuntime`'s changes feed.

    Transport dispatch: a `FakeRedis` client (offline tests) exposes
    `notification_listeners`, and the bridge registers a synchronous
    callback; a redis-py client goes through `pubsub()` +
    `psubscribe('__keyspace@<db>__:*')` on a daemon thread (live servers
    only — requires `notify-keyspace-events` enabled server-side).

    `flush_every` batches notifications per parquet append: 1 lands each
    event immediately (deterministic tests); production uses a larger
    batch so the feed gets micro-batch-sized files instead of one file
    per SET. `drain()` force-flushes the buffer.
    """

    def __init__(
        self,
        runtime,
        client,
        db: int = 0,
        flush_every: int = 1,
        clock: Callable[[], pd.Timestamp] | None = None,
    ):
        self.runtime = runtime
        self.client = client
        self.db = db
        self.flush_every = max(1, int(flush_every))
        self._clock = clock or (lambda: pd.Timestamp.utcnow().tz_localize(None))
        self._buffer: list[dict] = []
        self._suppress: Counter = Counter()
        self._lock = threading.Lock()
        self._pubsub = None
        self._pubsub_thread = None
        self._attached = False

    # -- lifecycle ----------------------------------------------------------

    def attach(self) -> None:
        """Start observing. Idempotent."""
        if self._attached:
            return
        listeners = getattr(self.client, "notification_listeners", None)
        if listeners is not None:
            listeners.append(self._on_event)
        else:  # pragma: no cover - needs a live server
            pubsub = self.client.pubsub()
            pubsub.psubscribe(
                **{f"__keyspace@{self.db}__:*": self._on_pubsub_message}
            )
            self._pubsub = pubsub
            self._pubsub_thread = pubsub.run_in_thread(
                sleep_time=0.05, daemon=True
            )
        self._attached = True

    def detach(self) -> None:
        """Stop observing and flush anything buffered. Idempotent."""
        if not self._attached:
            return
        listeners = getattr(self.client, "notification_listeners", None)
        if listeners is not None:
            try:
                listeners.remove(self._on_event)
            except ValueError:
                pass
        elif self._pubsub_thread is not None:  # pragma: no cover - live only
            self._pubsub_thread.stop()
            self._pubsub.close()
            self._pubsub = self._pubsub_thread = None
        self._attached = False
        self.drain()

    # -- event path ----------------------------------------------------------

    def _on_pubsub_message(self, message) -> None:  # pragma: no cover - live
        """redis-py pattern-subscription handler: channel carries the key,
        payload carries the event name."""
        channel = message.get("channel", "")
        if isinstance(channel, bytes):
            channel = channel.decode()
        data = message.get("data", "")
        if isinstance(data, bytes):
            data = data.decode()
        _, _, key = channel.partition("__:")
        if key:
            self._on_event(data, key)

    def _on_event(self, event: str, key: str) -> None:
        with self._lock:
            if self._suppress[key] > 0:
                self._suppress[key] -= 1
                origin = "trigger"
            else:
                origin = "client"
            # seq is stamped by append_changes at flush time — the runtime
            # is the single allocator, so a bridge row can never collide
            # with (or double-advance past) a driver-side appended row.
            row = {
                "event": event,
                "key": key,
                "ts": self._clock(),
                "origin": origin,
                "snapshot": self._snapshot(key),
            }
            self._buffer.append(row)
            if len(self._buffer) >= self.flush_every:
                self._flush_locked()

    def _snapshot(self, key: str) -> dict:
        """Read-only event-time snapshot — the onTriggerFired stage the
        reference hardwires NO_WRITES for (lib.rs:518-526). Type-dispatched
        map<string,string>: string → {'value': v}; hash → the fields;
        stream → the last entry id; deleted/expired keys → {}."""
        try:
            kind = self.client.type(key)
        except Exception:
            return {}
        if isinstance(kind, bytes):  # pragma: no cover - live decode off
            kind = kind.decode()
        if kind == "string":
            v = self.client.get(key)
            return {} if v is None else {"value": str(v)}
        if kind == "hash":
            return {str(k): str(v) for k, v in self.client.hgetall(key).items()}
        if kind == "stream":
            last = None
            xrev = getattr(self.client, "xrevrange", None)
            if xrev is not None:  # pragma: no cover - live client
                entries = xrev(key, count=1)
                last = entries[0][0] if entries else None
            else:
                entries = self.client.xrange(key)
                last = entries[-1][0] if entries else None
            return {} if last is None else {"last_id": str(last)}
        return {}

    # -- feed landing ---------------------------------------------------------

    def drain(self) -> int:
        """Flush buffered notifications to the changes feed; returns the
        number of rows landed."""
        with self._lock:
            return self._flush_locked()

    def _flush_locked(self) -> int:
        if not self._buffer:
            return 0
        rows, self._buffer = self._buffer, []
        # rows carry per-row origin (client vs suppressed trigger echo)
        self.runtime.append_changes(rows, origin=None)
        return len(rows)

    # -- the thin write proxy for trigger actions -----------------------------

    def trigger_client(self) -> "_TriggerWriteProxy":
        """A client wrapper for trigger actions: every write made through
        it pre-registers its key, so the resulting notification is tagged
        origin='trigger' and the runtime's re-entrancy predicate filters
        it — the NotificationBlocker analog for a wire protocol that
        carries no origin."""
        return _TriggerWriteProxy(self)


class _TriggerWriteProxy:
    """Write-through proxy tagging the next notification per written key."""

    _WRITE_METHODS = ("set", "hset", "delete", "xadd", "expire")
    # commands that fire NO notification when they return falsy (DEL of a
    # missing key, EXPIRE of a missing key) — the pre-registered
    # suppression must be withdrawn or it would mis-tag the next genuine
    # client event on that key as trigger-origin
    _CONDITIONAL = ("delete", "expire")

    def __init__(self, bridge: KeyspaceNotificationBridge):
        self._bridge = bridge

    def __getattr__(self, name: str):
        target = getattr(self._bridge.client, name)
        if name not in self._WRITE_METHODS:
            return target
        conditional = name in self._CONDITIONAL

        def wrapped(*args, **kwargs):
            # every proxied write method takes the key as its first
            # parameter, named `name` (the redis-py convention) — resolve
            # it from either calling style so a keyword call (set(name=...,
            # value=...)) registers the suppression instead of raising
            if args:
                key = args[0]
            elif "name" in kwargs:
                key = kwargs["name"]
            else:
                # no key present: defer to the client's own signature error
                return target(*args, **kwargs)
            with self._bridge._lock:
                self._bridge._suppress[key] += 1
            try:
                result = target(*args, **kwargs)
            except BaseException:
                with self._bridge._lock:  # write failed: no echo coming
                    self._bridge._suppress[key] -= 1
                raise
            if conditional and not result:  # no-op: no echo coming
                with self._bridge._lock:
                    self._bridge._suppress[key] -= 1
            return result

        return wrapped
