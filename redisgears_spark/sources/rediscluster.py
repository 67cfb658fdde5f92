"""Cluster-mode fan-out for the `gears_redis` source.

The reference's production shape is a Redis CLUSTER: keys are sharded
over 16384 hash slots (CRC16 of the key, or of the `{hash tag}` inside
it), each master owns a slot range, and a node answers `MOVED <slot>
<addr>` for keys it does not own (redisgears_core/src/
background_run_ctx.rs:179-231 routes by slot; rdb.rs:196-201 calc_slot).
A single-endpoint SCAN on such a deployment silently reads a PARTIAL
keyspace — which is why redisstream._ensure_single_node refuses cluster
endpoints by default.

This module is the opt-in fan-out path (`cluster=fanout` option): a
client-side router that

  * discovers the slot->master topology once (CLUSTER SLOTS, or each
    fake node's self-reported range),
  * fans SCAN out to EVERY master and unions the results (slots are
    disjoint, so the union is exact),
  * routes per-key commands (TYPE / XRANGE / XADD / XTRIM / DEL) to the
    owning master by key slot, and
  * on `MOVED`/`ASK` redirects — resharding moved the slot after
    discovery — follows the redirect, refreshes the routing table, and
    retries once (the reference's redirect-following contract).

Everything here implements the PUBLIC Redis cluster specification
(CRC16-XMODEM key hashing, hash-tag rule, 16384 slots, MOVED/ASK
grammar); no reference code is used.

The `FakeRedisClusterNode` twin lets the whole contract run offline: a
set of FakeRedis spools, each owning a slot range and answering MOVED
for keys it does not own — the same observable behavior a real cluster
node exhibits, so the router's tests exercise the production code path
end-to-end (discovery, fan-out scan, routing, stale-table redirect).
"""

from __future__ import annotations

from redisgears_spark.sources.redisstream import FakeRedis, _xrange_pairs

N_SLOTS = 16384

# CRC16-CCITT (XMODEM): poly 0x1021, init 0x0000 — the public algorithm
# the Redis cluster spec mandates for key->slot hashing.
_CRC16_TABLE = []
for _byte in range(256):
    _crc = _byte << 8
    for _ in range(8):
        _crc = ((_crc << 1) ^ 0x1021) if (_crc & 0x8000) else (_crc << 1)
    _CRC16_TABLE.append(_crc & 0xFFFF)


def crc16_xmodem(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF]
    return crc


def key_slot(key: str) -> int:
    """Key -> hash slot, honoring the `{hash tag}` rule: if the key
    contains a `{` with a matching later `}` and NON-EMPTY content
    between, only that substring is hashed (so `user:{42}:orders` and
    `user:{42}:carts` co-locate). An empty tag `{}` hashes the whole
    key — the spec's exact rule."""
    start = key.find("{")
    if start != -1:
        end = key.find("}", start + 1)
        if end != -1 and end > start + 1:
            key = key[start + 1 : end]
    return crc16_xmodem(key.encode("utf-8")) % N_SLOTS


class GearsMovedError(RuntimeError):
    """A node refused a key it does not own. `slot` and `addr` carry
    the redirect target — the same payload as the wire-level
    `MOVED <slot> <addr>` / `ASK <slot> <addr>` errors."""

    def __init__(self, slot: int, addr: str, ask: bool = False):
        super().__init__(
            f"{'ASK' if ask else 'MOVED'} {slot} {addr}"
        )
        self.slot = slot
        self.addr = addr
        self.ask = ask


def _parse_redirect(exc: BaseException) -> tuple[int, str, bool] | None:
    """(slot, addr, is_ask) if `exc` is a MOVED/ASK redirect (ours or
    redis-py's ResponseError carrying the wire message), else None. The
    ask flag must survive parsing: ASK and MOVED demand different retry
    protocols (ASKING preamble vs routing-table refresh)."""
    if isinstance(exc, GearsMovedError):
        return exc.slot, exc.addr, exc.ask
    msg = str(exc)
    parts = msg.split()
    if len(parts) == 3 and parts[0] in ("MOVED", "ASK"):
        try:
            return int(parts[1]), parts[2], parts[0] == "ASK"
        except ValueError:
            return None
    return None


def _send_asking(node) -> None:
    """Issue the ASKING preamble on `node` before an ASK-redirected retry.
    Per the cluster spec an importing node answers MOVED (back to the
    migrating source) for any non-ASKING command on an importing slot, so
    skipping this makes the one retry fail on a real mid-migration
    cluster. Fake nodes expose `asking()`; redis-py exposes
    execute_command('ASKING'); bare stand-ins (contract tests) may expose
    neither, in which case there is nothing to send.

    Live-connection invariant: ASKING is one-shot PER CONNECTION, so the
    preamble and the retried command must ride the same socket — for
    redis-py nodes that pairing is enforced mechanically by `_ask_pinned`
    (a single-connection client wraps both commands); calling this bare
    is only safe for fake/pool-less nodes."""
    fn = getattr(node, "asking", None)
    if fn is not None:
        fn()
        return
    exec_ = getattr(node, "execute_command", None)
    if exec_ is not None:
        exec_("ASKING")


def _ask_pinned(node, op):
    """Run the ASKING preamble and the ASK-redirected retry on ONE
    connection. ASKING is one-shot per connection: on a pooled redis-py
    client, execute_command('ASKING') may ride connection A while the
    retried op checks out connection B (pool holds >1 connection, or
    another caller interleaves), silently voiding the preamble — the
    importing node then answers MOVED and the retry fails mid-migration.
    redis-py's own escape hatch is `Redis.client()`: a child client bound
    to a single checked-out connection (exposed as `.connection`, which
    the raw xrange_pairs path also honors); both commands ride that
    socket, and close() returns it to the pool. Fake nodes are
    single-threaded spools with no pool — the bare preamble is exact
    there."""
    single = getattr(node, "client", None)
    if callable(single):
        pinned = single()
        try:
            _send_asking(pinned)
            return op(pinned)
        finally:
            close = getattr(pinned, "close", None)
            if close is not None:
                close()
    _send_asking(node)
    return op(node)


class FakeRedisClusterNode(FakeRedis):
    """A FakeRedis spool that OWNS a slot range: per-key commands on a
    key outside the range raise the MOVED redirect a real cluster node
    would send, and SCAN returns only owned keys. `topology` maps each
    addr (here: spool path) to its (lo, hi) range, so redirects can
    name the true owner — exactly what a real node's gossip view does."""

    def __init__(self, path: str, slot_range: tuple, topology: dict):
        super().__init__(path, cluster_enabled=True)
        self.addr = path
        self.slot_lo, self.slot_hi = slot_range
        self._topology = dict(topology)
        # live-migration state, mirroring CLUSTER SETSLOT MIGRATING /
        # IMPORTING: a migrating owner answers ASK <target> for keys it no
        # longer holds; an importing node REFUSES non-ASKING commands on
        # the importing slot with MOVED back to the table owner — the
        # behavior that makes a missing ASKING preamble a hard failure,
        # exactly as on a real cluster
        self.migrating: dict = {}  # slot -> target addr
        self.importing: set = set()  # slots being received
        self._asking = False  # one-shot, set by ASKING

    # -- cluster surface ----------------------------------------------

    def cluster_slots(self) -> list:
        """The node's gossip view: [[lo, hi, [addr]], ...] for every
        master — the same shape as the real CLUSTER SLOTS reply."""
        return [
            [lo, hi, [addr]]
            for addr, (lo, hi) in sorted(self._topology.items())
        ]

    def _owns(self, key: str) -> bool:
        return self.slot_lo <= key_slot(key) <= self.slot_hi

    def _redirect(self, key: str) -> GearsMovedError:
        slot = key_slot(key)
        for addr, (lo, hi) in self._topology.items():
            if lo <= slot <= hi:
                return GearsMovedError(slot, addr)
        return GearsMovedError(slot, self.addr)  # pragma: no cover

    def asking(self) -> None:
        """The ASKING preamble: permits exactly ONE following command on
        an importing slot (one-shot, as on a real connection)."""
        self._asking = True

    def _check(self, key: str) -> None:
        slot = key_slot(key)
        asking, self._asking = self._asking, False  # consume one-shot
        if self._owns(key):
            if slot in self.migrating:
                # mid-migration owner: keys already moved are served by
                # the importing target via ASK (simplification: the fake
                # redirects the whole slot once migration starts)
                raise GearsMovedError(slot, self.migrating[slot], ask=True)
            return
        if slot in self.importing:
            if asking:
                return  # ASKING preamble received — serve the command
            # non-ASKING command on an importing slot: MOVED back to the
            # committed table owner (the migrating source)
            raise self._redirect(key)
        raise self._redirect(key)

    # -- per-key commands route-check before serving -------------------

    def xadd(self, name, fields, id="*"):
        self._check(name)
        return super().xadd(name, fields, id)

    # generic-keyspace commands slot-check like every keyed command (a
    # real cluster node MOVED-redirects SET/HSET/EXPIRE the same way)

    def set(self, name, value):
        self._check(name)
        return super().set(name, value)

    def get(self, name):
        self._check(name)
        return super().get(name)

    def hset(self, name, key=None, value=None, mapping=None):
        self._check(name)
        return super().hset(name, key=key, value=value, mapping=mapping)

    def hgetall(self, name):
        self._check(name)
        return super().hgetall(name)

    def expire(self, name, seconds):
        self._check(name)
        return super().expire(name, seconds)

    def xrange(self, name, min="-", max="+", count=None):
        self._check(name)
        return super().xrange(name, min, max, count)

    def xrange_pairs(self, name, min="-", max="+", count=None):
        self._check(name)
        return super().xrange_pairs(name, min, max, count)

    def type(self, name):
        self._check(name)
        return super().type(name)

    def xtrim(self, name, minid=None, **kw):
        self._check(name)
        return super().xtrim(name, minid=minid, **kw)

    def delete(self, name):
        self._check(name)
        return super().delete(name)

    def scan_iter(self, match="*", _type=None):
        # a real node's SCAN surfaces only the keys it owns
        for k in super().scan_iter(match=match, _type=_type):
            if self._owns(k):
                yield k


def parse_node_ranges(spec: str) -> dict:
    """`"0-5460:/path/a,5461-16383:/path/b"` -> {addr: (lo, hi)}.
    Validates full disjoint coverage of the 16384 slots — a routing
    table with holes turns "cluster-safe" back into "silently partial",
    the exact failure this module exists to prevent."""
    topo: dict = {}
    for part in spec.split(","):
        rng, _, addr = part.strip().partition(":")
        lo_s, _, hi_s = rng.partition("-")
        lo, hi = int(lo_s), int(hi_s)
        if not (0 <= lo <= hi < N_SLOTS) or not addr:
            raise ValueError(f"bad cluster node range: {part!r}")
        topo[addr] = (lo, hi)
    spans = sorted(topo.values())
    cursor = 0
    for lo, hi in spans:
        if lo != cursor:
            raise ValueError(
                f"cluster ranges must cover all {N_SLOTS} slots exactly; "
                f"gap/overlap at slot {cursor} (got {spans})"
            )
        cursor = hi + 1
    if cursor != N_SLOTS:
        raise ValueError(
            f"cluster ranges stop at slot {cursor - 1}, need {N_SLOTS - 1}"
        )
    return topo


class ClusterFanoutClient:
    """Slot-routing client over the masters of a Redis cluster.

    Exposes exactly the surface the gears_redis source and the
    migration bridges use (scan_iter / type / xrange / xrange_pairs /
    xadd / xtrim / delete / info), so it drops in wherever a
    single-node client goes. Routing table refreshes on any MOVED/ASK
    redirect, then the command retries ONCE against the named owner —
    a resharding in flight costs one extra round-trip, never a wrong
    answer (a second redirect propagates: something is actually broken).

    Scale note: Spark executors each hold their own router (options are
    plan-serialized, clients are built per partition, same as the
    single-node path); per-key partitions route straight to the owning
    master, so the read fan-out IS the cluster fan-out.
    """

    # discovery marks the client safe for _ensure_single_node: the
    # whole point of this wrapper is that SCAN here is NOT partial
    _gears_single_node_ok = True

    def __init__(self, node_factory, seed_addrs: list):
        """`node_factory(addr) -> client` builds a per-master client;
        `seed_addrs` are bootstrap contact points (any master works —
        CLUSTER SLOTS returns the full topology)."""
        self._factory = node_factory
        self._seeds = list(seed_addrs)
        self._nodes: dict = {}
        self._slots: list = []  # [(lo, hi, addr)], sorted
        self._discover()

    # -- topology -------------------------------------------------------

    def _node(self, addr: str):
        cli = self._nodes.get(addr)
        if cli is None:
            cli = self._factory(addr)
            self._nodes[addr] = cli
        return cli

    def _discover(self) -> None:
        last_err: BaseException | None = None
        for addr in self._seeds or list(self._nodes):
            try:
                reply = self._cluster_slots(self._node(addr))
            except Exception as e:  # unreachable seed: try the next
                last_err = e
                continue
            slots = []
            for entry in reply:
                lo, hi, master = entry[0], entry[1], entry[2]
                node_addr = (
                    master[0]
                    if isinstance(master, (list, tuple)) and len(master) == 1
                    else f"{master[0]}:{master[1]}"
                )
                slots.append((int(lo), int(hi), node_addr))
            if slots:
                self._slots = sorted(slots)
                return
        raise GearsMovedError(
            -1, "?", False
        ) from last_err  # pragma: no cover - all seeds down

    @staticmethod
    def _cluster_slots(cli):
        fn = getattr(cli, "cluster_slots", None)
        if fn is not None:
            return fn()
        # redis-py: CLUSTER SLOTS via execute_command (works against
        # any cluster node without redis-py's own cluster client)
        return cli.execute_command("CLUSTER SLOTS")  # pragma: no cover

    def _owner(self, key: str):
        slot = key_slot(key)
        for lo, hi, addr in self._slots:
            if lo <= slot <= hi:
                return self._node(addr)
        raise GearsMovedError(slot, "?")  # pragma: no cover - full cover

    def _routed(self, key: str, op):
        """Run `op(node)` against the slot owner; on one redirect, follow
        it per the cluster spec: MOVED (committed topology change) retries
        at the named owner then refreshes the table; ASK (migration in
        flight) sends the ASKING preamble and retries at the target WITHOUT
        refreshing — the table still names the migrating source and will
        flip to MOVED only when the migration commits."""
        try:
            return op(self._owner(key))
        except BaseException as e:
            redirect = _parse_redirect(e)
            if redirect is None:
                raise
            _slot, addr, ask = redirect
            target = self._node(addr)
            if ask:
                return _ask_pinned(target, op)
            result = op(target)  # follow the redirect FIRST
            try:
                self._discover()  # then refresh for subsequent commands
            except Exception:
                pass  # refresh is best-effort; routing still corrected
            return result

    # -- the source's client surface -------------------------------------

    def scan_iter(self, match: str = "*", _type: str | None = None):
        seen = set()
        for _lo, _hi, addr in self._slots:
            for k in self._node(addr).scan_iter(match=match, _type=_type):
                if k not in seen:
                    seen.add(k)
                    yield k

    def type(self, name: str):
        return self._routed(name, lambda n: n.type(name))

    def xrange(self, name, min="-", max="+", count=None):
        return self._routed(
            name, lambda n: n.xrange(name, min, max, count=count)
        )

    def xrange_pairs(self, name, min="-", max="+", count=None):
        # route, then serve through the shared raw-protocol helper so a
        # real redis-py node keeps ordered duplicate-field fidelity
        return self._routed(
            name, lambda n: _xrange_pairs(n, name, min, max, count=count)
        )

    def xadd(self, name, fields, id="*"):
        return self._routed(name, lambda n: n.xadd(name, fields, id))

    def xtrim(self, name, minid=None, **kw):
        return self._routed(name, lambda n: n.xtrim(name, minid=minid, **kw))

    def delete(self, name):
        return self._routed(name, lambda n: n.delete(name))

    def set(self, name, value):
        return self._routed(name, lambda n: n.set(name, value))

    def get(self, name):
        return self._routed(name, lambda n: n.get(name))

    def hset(self, name, key=None, value=None, mapping=None):
        return self._routed(
            name, lambda n: n.hset(name, key=key, value=value, mapping=mapping)
        )

    def hgetall(self, name):
        return self._routed(name, lambda n: n.hgetall(name))

    def expire(self, name, seconds):
        return self._routed(name, lambda n: n.expire(name, seconds))

    def info(self, section: str | None = None) -> dict:
        # the router spans the cluster; report what discovery knows
        return {
            "cluster_enabled": 1,
            "gears_fanout": 1,
            "n_masters": len(self._slots),
        }


def make_fake_cluster_client(node_spec: str) -> ClusterFanoutClient:
    """Router over FakeRedisClusterNode spools.
    `node_spec` = `"lo-hi:path,..."` (full slot coverage enforced)."""
    topo = parse_node_ranges(node_spec)

    def factory(addr: str):
        return FakeRedisClusterNode(addr, topo[addr], topo)

    return ClusterFanoutClient(factory, sorted(topo))


def make_real_cluster_client(options: dict):  # pragma: no cover - live only
    """Router over redis-py clients, one per master, discovered from the
    seed host/port via CLUSTER SLOTS. Needs a live cluster (the opt-in
    TestRealCluster suite, REDIS_CLUSTER_URL)."""
    import redis  # type: ignore[import-not-found]

    def factory(addr: str):
        host, _, port = addr.rpartition(":")
        return redis.Redis(
            host=host or "localhost",
            port=int(port or "6379"),
            password=options.get("password") or None,
            decode_responses=True,
        )

    seed = f"{options.get('host', 'localhost')}:{options.get('port', '6379')}"
    return ClusterFanoutClient(factory, [seed])
