"""RESP (Redis serialization) ingest protocol -> narrow samples.

Reference: RESPProtocolParser (stdb/protocol/protocolparser.h:129-264):
a PDU is ``+<series>\\r\\n`` then ``+<ISO8601-or-int ts>\\r\\n`` (or
``:<int>``) then ``+<value>\\r\\n`` (or ``:<int>``).  The row-protocol
variant names N pipe-joined metrics sharing tags and carries an array of
N values (``*N`` prefix).  The dictionary prelude maps integer ids to
series names.

Two layers here:

- ``RESPStream``: an incremental pure-Python parser with the reference's
  framing semantics, for the (driver-side) TCP entry point and for unit
  tests.
- ``parse_resp_pdus``: a distributed DataFrame transformation over
  pre-framed PDU strings (one PDU per row, e.g. from Kafka where the
  producer frames messages) — JVM-side split/explode, no Python in the
  hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stdb_spark.common.seriesparser import parse_series_name
from stdb_spark.common.timeutil import parse_timestamp_ns
from stdb_spark.model import series_id_col


class RESPError(ValueError):
    pass


@dataclass
class Sample:
    series: str
    ts: int
    value: float


class RESPStream:
    """Incremental line-oriented RESP parser (dictionary + row protocol).

    Feed chunks with :meth:`feed`; complete samples accumulate in
    :attr:`out`.  State is (pending series, pending ts) like the
    reference's parser loop (protocolparser.cc:538-614).
    """

    def __init__(self) -> None:
        self.out: list[Sample] = []
        self._buf = ""
        self._series: str | None = None
        self._ts: int | None = None
        self._dict: dict[int, str] = {}

    def feed(self, chunk: str) -> None:
        self._buf += chunk
        while "\r\n" in self._buf or "\n" in self._buf:
            sep = "\r\n" if "\r\n" in self._buf.split("\n", 1)[0] + "\n" else "\n"
            line, self._buf = self._buf.split(sep, 1)
            if line:
                self._line(line)

    def _line(self, line: str) -> None:
        kind, body = line[0], line[1:]
        if kind == "+" and self._series is None:
            self._series = body
        elif kind == ":" and self._series is None:
            sid = int(body)
            if sid not in self._dict:
                raise RESPError(f"unknown series id {sid}")
            self._series = self._dict[sid]
        elif self._series is not None and self._ts is None:
            if kind in "+:":
                self._ts = parse_timestamp_ns(body)
            else:
                raise RESPError(f"expected timestamp, got {line!r}")
        elif self._series is not None and self._ts is not None:
            if kind not in "+:":
                raise RESPError(f"expected value, got {line!r}")
            self._emit(float(body))
        elif kind == "*":
            raise RESPError("array PDU must follow a series name")
        else:
            raise RESPError(f"unexpected line {line!r}")

    def define(self, sid: int, series: str) -> None:
        """Dictionary prelude entry (integer id -> series name)."""
        self._dict[sid] = series

    def _emit(self, value: float) -> None:
        series, ts = self._series, self._ts
        self._series = self._ts = None
        # row protocol: pipe-joined metrics share the tag suffix
        metric_part, _, tags_part = series.partition(" ")
        metrics = metric_part.split("|")
        for m in metrics:
            name = f"{m} {tags_part}".strip()
            parse_series_name(name)  # validates
            self.out.append(Sample(name, ts, value))


def parse_resp_pdus(pdus: DataFrame, value_col: str = "value") -> DataFrame:
    """PDU strings ``+series\\n+ts\\n+value`` -> narrow samples; the row
    protocol (``m1|m2|m3 tags`` + ``*N`` array of values) explodes into
    one sample per metric.  All JVM-side."""
    lines = F.split(F.regexp_replace(F.col(value_col), "\r", ""), "\n")
    strip = lambda c: F.regexp_replace(c, r"^[+:]", "")  # noqa: E731
    df = pdus.select(
        strip(lines[0]).alias("series"),
        strip(lines[1]).cast("long").alias("ts"),
        strip(lines[2]).cast("double").alias("value"),
    ).filter(
        F.col("series").isNotNull() & F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    metric_part = F.split(F.col("series"), " ")[0]
    tags_part = F.array_join(
        F.slice(F.split(F.col("series"), " "), 2, 32), " "
    )
    df = df.select(
        F.explode(F.split(metric_part, r"\|")).alias("metric"),
        "ts",
        "value",
        F.map_from_entries(
            F.transform(
                F.filter(F.split(tags_part, " "), lambda t: t.contains("=")),
                lambda t: F.struct(
                    F.split(t, "=")[0].alias("key"), F.split(t, "=")[1].alias("value")
                ),
            )
        ).alias("tags"),
    )
    return df.withColumn("series_id", series_id_col()).select(
        "series_id", "metric", "tags", "ts", "value"
    )
