"""RESP / OpenTSDB ingest parity (protocolparser.h:129-327 semantics)."""

import pytest

from stdb_spark.sources.opentsdb import parse_opentsdb_lines
from stdb_spark.sources.resp import RESPError, RESPStream, parse_resp_pdus


def test_resp_stream_basic():
    p = RESPStream()
    p.feed("+cpu.user host=h0\r\n+1000\r\n+3.14\r\n")
    assert [(s.series, s.ts, s.value) for s in p.out] == [("cpu.user host=h0", 1000, 3.14)]


def test_resp_stream_int_ts_and_value():
    p = RESPStream()
    p.feed("+mem host=a\r\n:2000\r\n:42\r\n")
    assert p.out[0].ts == 2000 and p.out[0].value == 42.0


def test_resp_stream_iso_timestamp():
    p = RESPStream()
    p.feed("+m t=1\r\n+19700101T000001\r\n+1\r\n")
    assert p.out[0].ts == 1_000_000_000


def test_resp_row_protocol_fanout():
    p = RESPStream()
    p.feed("+cpu|mem|disk host=h1\r\n:5\r\n:1\r\n")
    assert [s.series for s in p.out] == ["cpu host=h1", "mem host=h1", "disk host=h1"]


def test_resp_dictionary():
    p = RESPStream()
    p.define(7, "cpu host=h9")
    p.feed(":7\r\n:123\r\n:9\r\n")
    assert p.out[0].series == "cpu host=h9"
    with pytest.raises(RESPError):
        RESPStream().feed(":99\r\n")


def test_resp_partial_chunks():
    p = RESPStream()
    p.feed("+cpu ho")
    p.feed("st=h0\r\n+10")
    p.feed("00\r\n+1.5\r\n")
    assert p.out[0].series == "cpu host=h0"


def test_parse_resp_pdus_dataframe(spark):
    pdus = spark.createDataFrame(
        [("+cpu|mem host=h0\n:1000\n:2.5",), ("+disk host=h1\n:2000\n:7",)],
        "value string",
    )
    rows = parse_resp_pdus(pdus).orderBy("metric").collect()
    assert [(r.metric, r.tags["host"], r.ts, r.value) for r in rows] == [
        ("cpu", "h0", 1000, 2.5),
        ("disk", "h1", 2000, 7.0),
        ("mem", "h0", 1000, 2.5),
    ]


def test_parse_opentsdb_lines(spark):
    lines = spark.createDataFrame(
        [
            ("put sys.cpu 1428000000 42.5 host=web01 dc=lga",),
            ("put sys.mem 1428000000123 7 host=web01",),
            ("garbage line",),
            ("put broken",),
        ],
        "value string",
    )
    rows = parse_opentsdb_lines(lines).orderBy("metric").collect()
    assert len(rows) == 2
    cpu, mem = rows
    assert cpu.metric == "sys.cpu"
    assert cpu.ts == 1428000000 * 10**9
    assert cpu.tags == {"host": "web01", "dc": "lga"}
    assert mem.ts == 1428000000123 * 10**6
