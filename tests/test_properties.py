"""Hypothesis property tests for the semantics that are easiest to get
subtly wrong (SURVEY.md §7 "hard parts"): begin-aligned buckets in both
scan directions, canonical series names, duration literals, and
limit/offset — each checked against an independent pure-Python model.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stdb_spark.common.seriesparser import (
    SeriesError,
    make_canonical,
    parse_series_name,
    to_canonical_form,
)
from stdb_spark.common.timeutil import parse_duration_ns
from stdb_spark.engine import Engine
from tests.conftest import make_samples

# ------------------------------------------------- pure-Python properties

_ident = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=127),
    min_size=1,
    max_size=8,
)


@given(metric=_ident, tags=st.dictionaries(_ident, _ident, min_size=0, max_size=5))
@settings(max_examples=200)
def test_canonical_roundtrip(metric, tags):
    """parse(make_canonical(m, t)) == (m, t); canonicalization is
    idempotent; tags come out sorted (seriesparser.h:39-53)."""
    name = make_canonical(metric, tags)
    m2, t2 = parse_series_name(name)
    assert (m2, t2) == (metric, tags)
    assert to_canonical_form(name) == name
    if tags:
        # Reference comparator sorts by KEY, '=' acting as a terminator
        # (seriesparser.cc:168-195) — '0=x' sorts before '00=x' even though
        # '=' > '0' as a byte, so sort by the key part, not the full string.
        keys = name.split(" ", 1)[1].split(" ")
        assert keys == sorted(keys, key=lambda kv: kv.split("=", 1)[0])


@given(
    metric=_ident,
    tags=st.dictionaries(_ident, _ident, min_size=1, max_size=5),
    order=st.randoms(),
)
@settings(max_examples=100)
def test_canonical_order_insensitive(metric, tags, order):
    """Any tag ordering in the input string canonicalizes identically."""
    items = list(tags.items())
    order.shuffle(items)
    scrambled = metric + " " + " ".join(f"{k}={v}" for k, v in items)
    assert to_canonical_form(scrambled) == make_canonical(metric, tags)


@given(n=st.integers(min_value=0, max_value=10**9))
@settings(max_examples=100)
def test_duration_literals(n):
    """N[n|us|ms|s|m|h|d] ratios (datetime.cc:60-229)."""
    assert parse_duration_ns(f"{n}n") == n
    assert parse_duration_ns(f"{n}us") == n * 1_000
    assert parse_duration_ns(f"{n}ms") == n * 1_000_000
    assert parse_duration_ns(f"{n}s") == n * 10**9
    assert parse_duration_ns(f"{n}m") == n * 60 * 10**9
    assert parse_duration_ns(f"{n}h") == n * 3600 * 10**9
    assert parse_duration_ns(f"{n}d") == n * 86400 * 10**9


def test_canonical_rejects_garbage():
    for bad in ("", " ", "m k=", "m =v"):
        with pytest.raises(SeriesError):
            to_canonical_form(bad)
    # duplicate keys: last occurrence wins (reference map-insert behavior)
    assert to_canonical_form("m k=v k=w") == "m k=w"


# ------------------------------------------------ Spark-backed properties

_DATA = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),  # ts offset
        st.floats(min_value=-100, max_value=100, allow_nan=False),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


@given(
    data=_DATA,
    begin_off=st.integers(min_value=0, max_value=500),
    span=st.integers(min_value=100, max_value=10_000),
    step=st.integers(min_value=7, max_value=4_000),
    backward=st.booleans(),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_group_aggregate_buckets_match_python_model(
    spark, data, begin_off, span, step, backward
):
    """Begin-aligned tumbling buckets, both directions
    (aggregate.cc:160-170): bucket_ts and per-bucket count/min/max match
    a pure-Python fold for arbitrary data/begin/step."""
    base = 1_700_000_000_000_000_000
    rows = [("m", {"t": "a"}, base + off, v) for off, v in data]
    samples = make_samples(spark, rows)
    eng = Engine(spark, samples=samples)
    if backward:
        begin, end = base + begin_off + span, base + begin_off
        in_range = lambda ts: end < ts <= begin
        bucket_of = lambda ts: begin - step * ((begin - ts) // step)
    else:
        begin, end = base + begin_off, base + begin_off + span
        in_range = lambda ts: begin <= ts < end
        bucket_of = lambda ts: begin + step * ((ts - begin) // step)

    expected = {}
    for off, v in data:
        ts = base + off
        if not in_range(ts):
            continue
        b = bucket_of(ts)
        cnt, mn, mx = expected.get(b, (0, float("inf"), float("-inf")))
        expected[b] = (cnt + 1, min(mn, v), max(mx, v))

    out = eng.query(
        {
            "group-aggregate": {"step": f"{step}n", "metric": "m", "func": ["count", "min", "max"]},
            "range": {"from": begin, "to": end},
        }
    ).collect()
    got = {r["ts"]: (int(r["count"]), r["min"], r["max"]) for r in out}
    assert got == expected


@given(
    data=_DATA,
    limit=st.integers(min_value=0, max_value=70),
    offset=st.integers(min_value=0, max_value=70),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_limit_offset_match_python_slice(spark, data, limit, offset):
    """limit/offset over the total (ts, series) order == list slicing —
    the reference's offset-overwrites-limit bug must NOT reproduce."""
    base = 1_700_000_000_000_000_000
    rows = [("m", {"t": "a"}, base + off, v) for off, v in data]
    samples = make_samples(spark, rows)
    eng = Engine(spark, samples=samples)
    out = eng.query(
        {
            "select": "m",
            "range": {"from": base, "to": base + 20_000},
            "limit": limit,
            "offset": offset,
        }
    ).collect()
    ordered = sorted((base + off, v) for off, v in data)
    want = ordered[offset : offset + limit]
    assert [(r["ts"], r["value"]) for r in out] == want


# ------------------------------------------- hamming recall / asof model
@given(
    sigs=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=2, max_size=24, unique=True,
    ),
    flips=st.lists(st.integers(min_value=0, max_value=63), min_size=0, max_size=3),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_hamming_pairs_match_bruteforce(spark, sigs, flips):
    """Pigeonhole-blocked pairing == exact all-pairs at distance <= 3,
    including a pair constructed to differ only at the chosen bits."""
    planted = sigs[0]
    for f in set(flips):
        planted ^= 1 << f
    # normalize back into signed int64 (Python XOR on negatives yields
    # arbitrary-precision values outside the range in both directions)
    planted &= (1 << 64) - 1
    if planted >= 2**63:
        planted -= 2**64
    rows = [(i, s) for i, s in enumerate(sigs)] + [(len(sigs), planted)]
    rows = list({(i, s) for i, s in enumerate(dict.fromkeys(s for _, s in rows))})
    df = spark.createDataFrame(rows, "doc_id long, simhash long")
    from stdb_spark.functions import dedup

    got = {(r.a, r.b, r.hamming) for r in dedup.hamming_pairs(df).collect()}
    want = set()
    for i, si in rows:
        for j, sj in rows:
            if i < j:
                d = bin((si ^ sj) & ((1 << 64) - 1)).count("1")
                if d <= 3:
                    want.add((i, j, d))
    assert got == want


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["the", "cat", "dog", "runs", "fast", "slow", "a"]),
            min_size=1, max_size=8,
        ).map(" ".join),
        min_size=2, max_size=10,
    ),
    cap=st.integers(min_value=1, max_value=6),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_jaccard_df_cap_is_monotone_subset(spark, texts, cap):
    """Dropping hot shingles can only remove pairs or lower scores:
    capped pairs ⊆ uncapped pairs, and every capped score <= its
    uncapped twin (never above)."""
    from stdb_spark.functions import dedup

    rows = [(i, t, "s") for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    un = {(r.a, r.b): r.jaccard
          for r in dedup.ngram_jaccard_pairs(docs, n=2, threshold=0.0).collect()}
    cp = {(r.a, r.b): r.jaccard
          for r in dedup.ngram_jaccard_pairs(
              docs, n=2, threshold=0.0, df_cap=cap).collect()}
    assert set(cp) <= set(un)
    for k, v in cp.items():
        assert v <= un[k] + 1e-12, k


@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=20
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50),
                  st.floats(-10, 10, allow_nan=False)),
        min_size=0, max_size=20,
    ),
)
@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
def test_asof_matches_python_model(spark, left, right):
    """asof_join == per-row python scan: most recent right at or before,
    ties resolved to the row with the greatest value struct."""
    from stdb_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(k, ts) for k, ts in dict.fromkeys(left)], "k int, ts long"
    )
    rdf = spark.createDataFrame(right, "k int, ts long, v double")
    out = {
        (r.k, r.ts): (r.v_right, r.ts_right)
        for r in asof_join(ldf, rdf, on="ts", by=["k"], right_cols=["v"]).collect()
    }
    for k, ts in dict.fromkeys(left):
        cands = [(rts, v) for rk, rts, v in right if rk == k and rts <= ts]
        if not cands:
            want = (None, None)
        else:
            best_ts = max(rts for rts, _ in cands)
            best_v = max(v for rts, v in cands if rts == best_ts)
            want = (best_v, best_ts)
        assert out[(k, ts)] == want, (k, ts)


# ------------------------------------------------- sessionize invariants
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tss=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=5_000),  # ts
        ),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    gap=st.integers(min_value=1, max_value=1_000),
)
def test_sessionize_matches_pure_python_model(spark, tss, gap):
    """Sessions partition each user's distinct instants; consecutive
    instants share a session iff their gap <= `gap` — checked against a
    trivial sequential model."""
    from stdb_spark.operators import behavior

    df = spark.createDataFrame(
        [(f"u{u}", t) for u, t in tss], "u string, tu long"
    ).distinct()
    got = {
        (r.u, r.session_idx): (r.session_start, r.session_end, r.n_events)
        for r in behavior.session_stats(
            df, user_col="u", ts_col="tu", gap=gap
        ).collect()
    }
    # pure-python model
    want = {}
    by_user = {}
    for u, t in sorted(set(tss)):
        by_user.setdefault(f"u{u}", []).append(t)
    for u, times in by_user.items():
        times.sort()
        idx = 0
        start = times[0]
        cur = [times[0]]
        for prev, t in zip(times, times[1:]):
            if t - prev > gap:
                want[(u, idx)] = (start, cur[-1], len(cur))
                idx += 1
                start = t
                cur = [t]
            else:
                cur.append(t)
        want[(u, idx)] = (start, cur[-1], len(cur))
    assert got == want


# ------------------------------------------------- funnel invariants
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # user
            st.sampled_from(["a", "b", "c", "x"]),  # event type
            st.integers(min_value=0, max_value=50),  # ts
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    within=st.one_of(st.none(), st.integers(min_value=1, max_value=30)),
)
def test_funnel_matches_greedy_model(spark, evs, within):
    from stdb_spark.operators import behavior

    steps = ["a", "b", "c"]
    df = spark.createDataFrame(
        [(f"u{u}", m, t) for u, m, t in evs], "u string, metric string, tu long"
    )
    got = {
        r.u: r.stage
        for r in behavior.funnel_stages(
            df, steps, user_col="u", ts_col="tu", within=within
        ).collect()
    }
    # greedy model: earliest qualifying event per step
    by_user = {}
    for u, m, t in evs:
        by_user.setdefault(f"u{u}", []).append((m, t))
    want = {}
    for u, events in by_user.items():
        prev = None
        first = None
        stage = 0
        for step in steps:
            cands = [
                t
                for m, t in events
                if m == step
                and (prev is None or t > prev)
                and (within is None or first is None or t <= first + within)
            ]
            if not cands:
                break
            prev = min(cands)
            if first is None:
                first = prev
            stage += 1
        want[u] = stage
    assert got == want


@given(
    n_docs=st.integers(min_value=1, max_value=60),
    weights=st.dictionaries(
        st.sampled_from(["s0", "s1", "s2", "s3"]),
        st.floats(min_value=0.0, max_value=4.0, allow_nan=False),
        min_size=1,
        max_size=4,
    ),
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_source_mixture_matches_python_model(spark, n_docs, weights):
    """Row multiplicity equals the pure-Python floor+hash-frac model,
    independent of partitioning."""
    import hashlib
    import math

    from stdb_spark.functions import sampling

    rows = [(i, f"s{i % 5}") for i in range(n_docs)]  # s4 never weighted
    df = spark.createDataFrame(rows, "doc_id long, source string").repartition(5)
    epochs = {}
    for r in sampling.source_mixture(df, weights, salt="p0").collect():
        epochs.setdefault(r.doc_id, []).append(r.epoch)
    got = {i: len(es) for i, es in epochs.items()}
    for i, es in epochs.items():
        assert sorted(es) == list(range(1, got[i] + 1))  # epochs are 1..copies
    want = {}
    for i, src in rows:
        w = weights.get(src)
        if w is None:
            continue
        u = (
            int(hashlib.md5(f"p0{i}".encode()).hexdigest()[:15], 16)
            / float(sampling.HASH_DOMAIN)
        )
        copies = int(math.floor(w)) + (1 if u < w - math.floor(w) else 0)
        if copies >= 1:
            want[i] = copies
    assert got == want


@given(
    vec=st.lists(
        st.floats(min_value=-100.0, max_value=100.0, allow_nan=False, width=32),
        min_size=1,
        max_size=32,
    )
)
@settings(max_examples=100)
def test_int8_quantize_roundtrip_bound(vec):
    """Pure-Python twin: |dequant - x| <= scale/2 and |q| <= 127."""
    from stdb_spark.functions.similarity import quantize_query_int8

    scale, q = quantize_query_int8(vec)
    assert all(abs(qi) <= 127 for qi in q)
    if scale == 0.0:
        assert all(qi == 0 for qi in q)
    else:
        for qi, xi in zip(q, vec):
            assert abs(qi * scale - float(xi)) <= scale / 2 + 1e-9


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=24), min_size=1, max_size=10
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_ngram_novelty_bounds_and_partition_invariance(spark, texts):
    """novelty in [0,1]; novel <= total; result identical under
    repartitioning (the determinism invariant every curation op holds)."""
    from stdb_spark.functions import dedup

    rows = [(i, t, "s") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    a = sorted(map(tuple, dedup.ngram_novelty(df, n=2).collect()))
    for _, n_sh, novel, nov in a:
        assert 0 <= novel <= n_sh
        assert 0.0 <= nov <= 1.0
    b = sorted(map(tuple, dedup.ngram_novelty(df.repartition(7), n=2).collect()))
    assert a == b


# ------------------------------------------ round-3 extension properties

_words = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=3), min_size=0, max_size=30
)


@given(docs=st.lists(_words, min_size=1, max_size=6))
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_dup_span_scrub_matches_python_model(spark, docs):
    """dup_span_scrub == a pure-Python reimplementation for arbitrary
    small corpora: first occurrence (by (doc, pos)) of every duplicated
    W-gram survives, all other occurrences' positions are removed."""
    from stdb_spark.functions.dedup import dup_span_scrub

    W = 3
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_scrubbed, r.n_tokens, r.n_tokens_removed)
        for r in dup_span_scrub(df, width=W).collect()
    }

    # python model
    spans = {}  # gram -> list of (doc, i)
    for d, ws in enumerate(docs):
        for i in range(len(ws) - W + 1):
            spans.setdefault(tuple(ws[i : i + W]), []).append((d, i))
    covered = {d: set() for d in range(len(docs))}
    for g, occ in spans.items():
        if len(occ) >= 2:
            first = min(occ)
            for d, i in occ:
                if (d, i) != first:
                    covered[d].update(range(i, i + W))
    for d, ws in enumerate(docs):
        if not ws:
            assert d not in got
            continue
        kept = [w for p, w in enumerate(ws) if p not in covered[d]]
        assert got[d] == (" ".join(kept), len(ws), len(ws) - len(kept))


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=2, max_size=40
    ),
    parts=st.integers(min_value=1, max_value=5),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_trapezoid_integral_partition_invariant(spark, vals, parts):
    """The integral is a pure function of content — decimal-sum
    accumulation makes it independent of physical partitioning, and it
    matches a pure-Python trapezoid fold (values are integer-valued
    doubles so the model is exact)."""
    from stdb_spark.operators.behavior import trapezoid_integral

    S = 1_000_000_000
    rows = [("s", (t + 1) * S, float(v)) for t, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "series string, ts long, value double")
    B = 7 * S
    expect = {}
    for j in range(1, len(vals)):
        b = ((j + 1) * S) // B * B
        expect[b] = expect.get(b, 0.0) + (vals[j] + vals[j - 1]) / 2.0 * 1.0
    for p in (1, parts):
        got = {
            r.ts: r.integral
            for r in trapezoid_integral(df.repartition(p), B).collect()
        }
        assert set(got) == set(expect)
        for b in got:
            assert got[b] == pytest.approx(expect[b], abs=1e-9)


@given(
    base=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=-99, max_value=99),
        min_size=1,
        max_size=10,
    ),
    upd=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=-99, max_value=99),
        min_size=0,
        max_size=10,
    ),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_upsert_latest_is_dict_update(spark, base, upd):
    """upsert_latest == dict.update: updates win on overlap, both sides'
    exclusive keys survive, and re-applying the same batch is a no-op."""
    from stdb_spark.sources.storage import upsert_latest

    b = spark.createDataFrame(
        [(k, float(v), 0) for k, v in base.items()], "k long, value double, batch int"
    )
    u = spark.createDataFrame(
        [(k, float(v), 1) for k, v in upd.items()], "k long, value double, batch int"
    )
    merged = upsert_latest(b, u, ["k"], "batch")
    got = {r.k: r.value for r in merged.collect()}
    want = {**{k: float(v) for k, v in base.items()},
            **{k: float(v) for k, v in upd.items()}}
    assert got == want
    again = {r.k: r.value for r in upsert_latest(merged, u, ["k"], "batch").collect()}
    assert again == want


# ---------------------------------------------------------------- RESP
_resp_metric = st.from_regex(r"[a-z][a-z0-9.]{0,8}", fullmatch=True)
_resp_val = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
)


@st.composite
def _resp_session(draw):
    """A valid RESP session: optional dictionary prelude + a mix of
    data-point and row-protocol PDUs (protocolparser.h:129-264)."""
    dict_entries = draw(
        st.lists(
            st.tuples(
                st.lists(_resp_metric, min_size=1, max_size=3, unique=True),
                st.integers(min_value=1, max_value=50),
            ),
            max_size=3,
            unique_by=lambda t: t[1],
        )
    )
    wire = []
    if dict_entries:
        wire.append(f"*{2 * len(dict_entries)}")
        for metrics, sid in dict_entries:
            wire.append("+" + "|".join(metrics) + " host=h0")
            wire.append(f":{sid}")
    n_msgs = draw(st.integers(min_value=1, max_value=8))
    for i in range(n_msgs):
        use_dict = dict_entries and draw(st.booleans())
        if use_dict:
            metrics, sid = draw(st.sampled_from(dict_entries))
            wire.append(f":{sid}")
        else:
            metrics = draw(
                st.lists(_resp_metric, min_size=1, max_size=3, unique=True)
            )
            wire.append("+" + "|".join(metrics) + " host=h0")
        wire.append(f":{1000 + i}")
        vals = [draw(_resp_val) for _ in metrics]
        if len(metrics) == 1 and draw(st.booleans()):
            wire.append(f"+{vals[0]!r}")
        else:
            wire.append(f"*{len(vals)}")
            wire.extend(f"+{v!r}" for v in vals)
    return "\r\n".join(wire) + "\r\n"


@given(session=_resp_session(), data=st.data())
@settings(max_examples=120, deadline=None)
def test_resp_stream_chunking_invariant(session, data):
    """The incremental parser's output must not depend on how the TCP
    stream is chunked (protocolparser.cc worker loop is resumable)."""
    from stdb_spark.sources.resp import RESPStream

    whole = RESPStream()
    whole.feed(session)
    chunked = RESPStream()
    rest = session
    while rest:
        n = data.draw(st.integers(min_value=1, max_value=max(1, len(rest))))
        chunked.feed(rest[:n])
        rest = rest[n:]
    assert [(s.series, s.ts, s.value) for s in whole.out] == [
        (s.series, s.ts, s.value) for s in chunked.out
    ]


@given(session=_resp_session())
@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_resp_batch_matches_stream(spark, session):
    """The distributed pre-framed parser (parse_resp_pdus) and the
    sequential wire parser (RESPStream) must agree sample-for-sample
    on the same session (dictionary resolved identically)."""
    from stdb_spark.sources.resp import RESPStream, parse_resp_pdus

    stream = RESPStream()
    stream.feed(session)
    want = sorted(
        (s.series.partition(" ")[0], s.ts, s.value) for s in stream.out
    )
    # split the session into PDUs: the dictionary prelude (if any) maps
    # to the `dictionary` argument; messages frame as one PDU per row
    lines = [l for l in session.split("\r\n") if l]
    i, dictionary = 0, {}
    if lines and lines[0].startswith("*"):
        n = int(lines[0][1:])
        for j in range(1, n + 1, 2):
            dictionary[int(lines[j + 1][1:])] = lines[j][1:]
        i = 1 + n
    pdus = []
    while i < len(lines):
        pdu = [lines[i], lines[i + 1]]
        i += 2
        if lines[i].startswith("*"):
            cnt = int(lines[i][1:])
            pdu.extend(lines[i : i + cnt + 1])
            i += cnt + 1
        else:
            pdu.append(lines[i])
            i += 1
        pdus.append(("\n".join(pdu),))
    df = spark.createDataFrame(pdus, "value string")
    got = sorted(
        (r.metric, r.ts, r.value)
        for r in parse_resp_pdus(df, dictionary=dictionary or None).collect()
    )
    assert got == want


@given(
    vals=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, min_value=-100, max_value=100),
        min_size=1,
        max_size=60,
    ),
    n_tiles=st.integers(min_value=1, max_value=12),
)
@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
def test_two_phase_ntile_property(spark, vals, n_tiles):
    """two_phase_ntile == ntile window for arbitrary data (ties, skewed
    buckets, n < k) under any monotone bucket function."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from stdb_spark.operators.ranks import two_phase_ntile

    df = spark.createDataFrame(
        [(float(v), i) for i, v in enumerate(vals)], "v double, k long"
    )
    order = [F.col("v").asc(), F.col("k").asc()]
    got = two_phase_ntile(df, n_tiles, order, F.floor(F.col("v") / 7), "t")
    want = df.withColumn("t", F.ntile(n_tiles).over(W.orderBy(*order)))
    assert sorted(got.select("v", "k", "t").collect()) == sorted(
        want.select("v", "k", "t").collect()
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    evs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # user
            st.sampled_from(["a", "b", "c", "x"]),  # event type
            st.integers(min_value=0, max_value=50),  # ts (dups ACROSS
            # rows allowed — same-instant ordering is the point here)
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    within=st.one_of(st.none(), st.integers(min_value=1, max_value=30)),
)
def test_funnel_cumulative_matches_inclusive_greedy_model(spark, evs, within):
    from stdb_spark.operators import behavior

    steps = ["a", "b", "c"]
    df = spark.createDataFrame(
        [(f"u{u}", m, t) for u, m, t in evs], "u string, metric string, tu long"
    )
    got = {
        r.u: (r.stage, r.t1, r.t2, r.t3)
        for r in behavior.funnel_stages_cumulative(
            df, steps, user_col="u", ts_col="tu", within=within
        ).collect()
    }
    # the model IS the streaming state fold's resolver — asserting the
    # batch windows against it transitively proves batch == streaming
    # resolution (greedy inclusive >=, whole chain within `within` of
    # the earliest step-1 time)
    from stdb_spark.streaming.ingest import greedy_funnel_resolve

    step_idx = {s: i for i, s in enumerate(steps)}
    by_user = {}
    for u, m, t in evs:
        by_user.setdefault(f"u{u}", []).append((t, step_idx.get(m, -1)))
    want = {}
    for u, events in by_user.items():
        ts = greedy_funnel_resolve(
            [(t, si) for t, si in events if si >= 0], 3, within
        )
        stage = len(ts)
        ts = list(ts) + [None] * (3 - stage)
        want[u] = (stage, *ts)
    assert got == want


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    channels=st.sampled_from([1, 3, 4]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_png_codec_roundtrip_property(w, h, channels, seed):
    """decode(encode(img)) == img for arbitrary sizes/channels — the
    pure-Python PNG codec is lossless over its supported domain."""
    import numpy as np

    from stdb_spark.functions import multimodal as mm

    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert np.array_equal(mm.decode_image(mm.encode_png(img)), img)
    if channels in (1, 3):
        assert np.array_equal(mm.decode_image(mm.encode_ppm(img)), img)


@given(
    n=st.integers(min_value=1, max_value=2000),
    channels=st.sampled_from([1, 2]),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=25, deadline=None)
def test_wav_codec_roundtrip_property(n, channels, rate, seed):
    """decode_wav(encode_wav(pcm)) == pcm for arbitrary int16 PCM —
    the stdlib RIFF/WAV parser is lossless over its domain, and the
    sample rate survives the container."""
    import numpy as np

    from stdb_spark.functions import multimodal as mm

    rng = np.random.default_rng(seed)
    shape = (n,) if channels == 1 else (n, channels)
    pcm = rng.integers(-(2**15), 2**15, size=shape).astype(np.int16)
    got, got_rate = mm.decode_wav(mm.encode_wav(pcm, rate=rate))
    assert got_rate == rate
    assert got.shape == shape and np.array_equal(got, pcm)


def test_wav_decoder_chunk_walking_and_rejections():
    """Spec coverage the roundtrip can't reach: unknown chunks with odd
    sizes are skipped word-aligned, 8-bit PCM centers to signed, and
    non-PCM / non-RIFF payloads raise the declared boundary error."""
    import struct

    import numpy as np
    import pytest

    from stdb_spark.functions import multimodal as mm

    pcm = np.array([0, 1000, -1000, 32767], dtype=np.int16)
    wav = mm.encode_wav(pcm, rate=8000)
    # splice an odd-sized LIST chunk between fmt and data
    head, data_chunk = wav[:36], wav[36:]
    spliced = head + b"LIST" + struct.pack("<I", 3) + b"abc\x00" + data_chunk
    got, rate = mm.decode_wav(spliced)
    assert np.array_equal(got, pcm) and rate == 8000
    # 8-bit unsigned: 128 -> 0, 0 -> -128, 255 -> 127
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + 3, b"WAVE", b"fmt ", 16, 1, 1, 8000, 8000, 1, 8,
        b"data", 3,
    )
    got8, _ = mm.decode_wav(hdr + bytes([128, 0, 255]))
    assert got8.tolist() == [0, -128, 127]
    with pytest.raises(mm.DecodeUnavailable):
        mm.decode_wav(b"ID3\x04" + b"\x00" * 64)  # mp3, not RIFF
    # compressed (non-PCM) WAV: format tag 85 (MP3-in-RIFF)
    bad = bytearray(wav)
    struct.pack_into("<H", bad, 20, 85)
    with pytest.raises(mm.DecodeUnavailable):
        mm.decode_wav(bytes(bad))


@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    mode=st.sampled_from(["gray", "rgb444", "rgb420"]),
    quality=st.sampled_from([85, 92, 100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(max_examples=20, deadline=None)
def test_jpeg_codec_roundtrip_property(w, h, mode, quality, seed):
    """decode(encode(img)) stays within quantization tolerance for
    SMOOTH images at any size/mode — the pure-numpy baseline JPEG codec
    is a faithful (lossy) T.81 implementation: per-pixel error bounded,
    shape/dtype preserved."""
    import numpy as np

    from stdb_spark.functions import jpeg

    rng = np.random.default_rng(seed)
    base = np.add.outer(
        np.arange(h) * rng.uniform(0.5, 2.5), np.arange(w) * rng.uniform(0.5, 2.5)
    ) + rng.uniform(0, 100)
    if mode == "gray":
        img = np.clip(base, 0, 255).astype(np.uint8)
        enc = jpeg.encode_jpeg(img, quality=quality)
    else:
        img = np.clip(
            np.stack([base, base + 40, base + 80], -1), 0, 255
        ).astype(np.uint8)
        enc = jpeg.encode_jpeg(
            img, quality=quality, subsampling="420" if mode == "rgb420" else "444"
        )
    dec = jpeg.decode_jpeg(enc)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    # smooth content: DC + low-frequency only; Annex-K quantization at
    # q>=85 keeps per-pixel error tiny (chroma table is coarser)
    assert err.max() <= (3 if mode == "gray" else 10), err.max()


def test_jpeg_decoder_structural_paths():
    """Paths the roundtrip property can't pin: restart-marker resync is
    bit-identical to the unrestarted stream, gray roundtrip of smooth
    gradients stays within quantization tolerance at q95, and
    non-baseline modes reject."""
    import numpy as np
    import pytest

    from stdb_spark.functions import jpeg
    from stdb_spark.functions.multimodal import DecodeUnavailable, decode_image

    g = np.add.outer(np.arange(37) * 2, np.arange(53) * 3).astype(np.uint8)
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=95))
    assert np.abs(dec.astype(int) - g.astype(int)).max() <= 3
    ref = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90))
    rst = jpeg.decode_jpeg(jpeg.encode_jpeg(g, quality=90, restart_interval=2))
    assert np.array_equal(ref, rst)
    # decode_image dispatches on the SOI magic
    assert decode_image(jpeg.encode_jpeg(g, quality=95)).shape == g.shape
    # progressive (SOF2) is the declared boundary
    enc = bytearray(jpeg.encode_jpeg(g))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(DecodeUnavailable):
        jpeg.decode_jpeg(bytes(enc))
    with pytest.raises(DecodeUnavailable):
        jpeg.decode_jpeg(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
