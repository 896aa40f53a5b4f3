"""Custom PySpark DataSource for the realtime quote feed.

Reference parity: /root/reference/src/extractors/price_extractor.py:109-155
serves a realtime quote table (symbol, price, change, pct_change, volume,
time) through a driver-side HTTP client with a 60 s TTL cache and a 50-
symbol-per-call cap. That design is single-process by construction. The
Spark-native shape is a DataSource V2 implementation: the symbol universe
is split into input partitions, so every EXECUTOR fetches its own slice of
the feed in parallel — the per-call cap becomes partition sizing, the TTL
cache becomes micro-batch offsets, and fault tolerance comes from the
engine replaying a partition read instead of an ad-hoc retry decorator.

The transport here is a deterministic synthetic quote generator (a pure
function of ``(symbol, seq)`` via md5 — the same construction the media
and dedup oracles use), which keeps the source fully oracle-checkable:
DuckDB can regenerate the identical rows from SQL, so the driver's value
hash verifies a CUSTOM SOURCE end to end. A production deployment swaps
``_quote`` for the HTTP call; partitioning, offsets, schema, and restart
semantics all stay.

Batch:    spark.read.format("quotefeed").option("symbols", "A,B")
              .option("ticks", "100").load()
Stream:   spark.readStream.format("quotefeed")... — offsets advance by
          ``ticks_per_batch`` per micro-batch; a checkpoint restart
          resumes from the committed offset, so (symbol, seq) rows are
          emitted exactly once across restarts.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

QUOTE_SCHEMA = (
    "symbol string, seq bigint, ts timestamp, price double, change double, "
    "pct_change double, volume bigint"
)

_DEFAULT_SYMBOLS = ",".join(f"SYM{i:02d}" for i in range(20))


def _raw_price_volume(symbol: str, seq: int) -> tuple[float, int]:
    """price/volume at tick ``seq`` — pure md5 arithmetic, engine-portable
    (the DuckDB oracle mirrors it nibble for nibble). Doubles are RAW IEEE
    results of the same operation order the oracle uses — no Python
    ``round``, whose banker's ties would drift from SQL HALF_UP on exact
    boundaries."""
    h = hashlib.md5(f"{symbol}:{seq}".encode()).hexdigest().upper()
    px_cents = int(h[0:6], 16) % 10000
    volume = int(h[6:12], 16) % 100000
    return 50.0 + px_cents / 100.0, volume


def _quote(symbol: str, seq: int, start_epoch: int, interval_s: int):
    price, volume = _raw_price_volume(symbol, seq)
    if seq > 0:
        prev, _ = _raw_price_volume(symbol, seq - 1)
        change = price - prev
        pct = change / prev * 100.0
    else:
        change, pct = 0.0, 0.0
    ts = datetime.fromtimestamp(start_epoch + seq * interval_s, tz=timezone.utc).replace(
        tzinfo=None
    )
    return (symbol, seq, ts, price, change, pct, volume)


def _opts(options) -> tuple[list[str], int, int]:
    symbols = [
        s for s in options.get("symbols", _DEFAULT_SYMBOLS).split(",") if s.strip()
    ]
    start = int(options.get("start", "1704067200"))  # 2024-01-01T00:00:00Z
    interval_s = int(options.get("interval", "60"))
    return symbols, start, interval_s


@dataclass
class SymbolTicks(InputPartition):
    """One feed slice: a symbol's ticks [lo, hi) — the unit an executor
    fetches independently (the distributed analogue of the reference's
    per-symbol request loop)."""

    symbol: str
    lo: int
    hi: int


class QuoteFeedBatchReader(DataSourceReader):
    def __init__(self, options):
        self.symbols, self.start, self.interval_s = _opts(options)
        self.ticks = int(options.get("ticks", "100"))

    def partitions(self):
        return [SymbolTicks(s, 0, self.ticks) for s in self.symbols]

    def read(self, part: SymbolTicks):
        for seq in range(part.lo, part.hi):
            yield _quote(part.symbol, seq, self.start, self.interval_s)


class QuoteFeedStreamReader(DataSourceStreamReader):
    """Micro-batch offsets over the tick counter: each trigger advances the
    high-water mark by ``ticks_per_batch``; ``partitions(start, end)``
    fans the offset range out per symbol. Offsets live in the checkpoint,
    so a restart resumes at the committed tick — exactly-once rows."""

    def __init__(self, options):
        self.symbols, self.start, self.interval_s = _opts(options)
        self.ticks_per_batch = int(options.get("ticks_per_batch", "10"))
        self._hwm = 0

    def initialOffset(self):
        return {"tick": 0}

    def latestOffset(self):
        self._hwm += self.ticks_per_batch
        return {"tick": self._hwm}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["tick"], end["tick"]
        # resuming from a checkpoint: keep generating past the restored mark
        self._hwm = max(self._hwm, hi)
        return [SymbolTicks(s, lo, hi) for s in self.symbols]

    def read(self, part: SymbolTicks):
        for seq in range(part.lo, part.hi):
            yield _quote(part.symbol, seq, self.start, self.interval_s)

    def commit(self, end: dict) -> None:
        pass


class QuoteFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "quotefeed"

    def schema(self) -> str:
        return QUOTE_SCHEMA

    def reader(self, schema):
        return QuoteFeedBatchReader(self.options)

    def streamReader(self, schema):
        return QuoteFeedStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the ``quotefeed`` format on this session."""
    spark.dataSource.register(QuoteFeedDataSource)
