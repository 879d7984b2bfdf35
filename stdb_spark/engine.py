"""Engine: executes the JSON query language over narrow DataFrames.

The Spark analog of the reference's two-stage pipeline (SURVEY.md §3):
QueryParser -> ReshapeRequest -> QueryPlanBuilder -> executor.  Here the
"plan" is a declarative DataFrame program; Catalyst supplies predicate
pushdown, partial aggregation, and the physical strategy (the reference
hand-rolls these per query shape, stdb/query/plan/query_plan_builder.cc).

Output shapes (DataFrame-native renderings of the reference's sample
stream):

    select           -> (series string, ts long, value double)
    select-events    -> (series, ts, body string)
    aggregate        -> (series "metric:func tags", value)
    group-aggregate  -> (series "m:f1|m:f2 tags", ts bucket, <func cols>)
    join             -> (series "m1|m2 tags", ts, <metric cols>)
    group-agg-join   -> same as join over buckets
    select meta:names-> (series)

Scale notes: the series binding (`where`) filters on the fact table's own
metric/tags columns so Parquet predicate pushdown applies; group-by keys
are strings (canonical tag suffix) to keep every shuffle key sortable;
aggregates are single Catalyst expressions so map-side partials apply;
pivot passes an explicit metric list to avoid the discovery pass.
"""

from __future__ import annotations

import functools
import operator as _op
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stdb_spark import model
from stdb_spark.operators.aggregates import agg_expr
from stdb_spark.query.apply_nodes import apply_pipeline
from stdb_spark.query.parser import (
    QueryKind,
    QueryParseError,
    QueryRequest,
    ValueFilter,
    parse_query,
)


def _tags_suffix():
    """Sorted ``k1=v1 k2=v2`` string for the tags map (canonical-form
    parity with SeriesParser, stdb/index/seriesparser.h:39-53)."""
    kv = F.transform(
        F.array_sort(F.map_keys(F.col("tags"))),
        lambda k: F.concat(k, F.lit("="), F.col("tags")[k]),
    )
    return F.array_join(kv, " ")


def _series_name(metric_expr):
    sfx = _tags_suffix()
    return F.when(
        F.length(sfx) > 0, F.concat(metric_expr, F.lit(" "), sfx)
    ).otherwise(metric_expr)


def _and_all(conds):
    return functools.reduce(_op.and_, conds)


def _or_all(conds):
    return functools.reduce(_op.or_, conds)


def _vf_condition(col, vf: ValueFilter):
    conds = []
    if vf.gt is not None:
        conds.append(col > F.lit(vf.gt))
    if vf.ge is not None:
        conds.append(col >= F.lit(vf.ge))
    if vf.lt is not None:
        conds.append(col < F.lit(vf.lt))
    if vf.le is not None:
        conds.append(col <= F.lit(vf.le))
    return _and_all(conds)


class Engine:
    """Query executor bound to narrow samples/events/series DataFrames."""

    def __init__(
        self,
        spark: SparkSession,
        samples: DataFrame | None = None,
        events: DataFrame | None = None,
        series: DataFrame | None = None,
        exact_sums: bool = False,
        ts_slack_ns: int = 0,
        summaries: DataFrame | None = None,
        summary_step_ns: int | None = None,
    ):
        self.spark = spark
        self.samples = samples
        self.events = events
        # optional pre-aggregated per-(series, coarse-bucket) table
        # (sources.storage.summary_table): bucket-aligned `aggregate`
        # queries are answered from it without touching leaf rows — the
        # SubtreeRef pushdown analog (stdb/storage/nbtree.cc:922-1035)
        self.summaries = summaries
        self.summary_step_ns = summary_step_ns
        # If the bound DataFrames carry a ``ts_raw`` column (the untouched
        # storage timestamp, e.g. before µs truncation), range queries also
        # apply *coarse* bounds on it widened by ts_slack_ns (the max
        # distance |ts - ts_raw| the transform can introduce).  Filters on
        # the derived ``ts`` are arithmetic over the parquet column and
        # never reach PushedFilters; the ts_raw bounds do — at 100 TB with
        # time-sorted row groups this is the NB+tree time-descent analog
        # (stdb/storage/nbtree.cc:471-616): read one day, not the full
        # metric history.
        self.ts_slack_ns = ts_slack_ns
        if series is None and samples is not None:
            series = model.series_registry(samples)
        self.series = series
        # decimal-backed sum/mean: reproducible independent of partial-agg
        # order (oracle-comparison mode; slower, default off)
        self.exact_sums = exact_sums

    # ------------------------------------------------------------------
    @classmethod
    def from_sf_dir(cls, spark: SparkSession, sf_dir: str) -> "Engine":
        """Bind to the driver's events table (TESTDATA.md adapter)."""
        return cls(
            spark,
            samples=model.events_as_samples(spark, sf_dir, keep_src=True),
            events=model.events_as_event_stream(spark, sf_dir, keep_src=True),
        )

    # ------------------------------------------------------------------
    def query(self, q) -> DataFrame:
        req = parse_query(q)
        dispatch = {
            QueryKind.SELECT: self._select,
            QueryKind.SELECT_EVENTS: self._select_events,
            QueryKind.SELECT_META: self._select_meta,
            QueryKind.AGGREGATE: self._aggregate,
            QueryKind.JOIN: self._join,
            QueryKind.GROUP_AGGREGATE: self._group_aggregate,
            QueryKind.GROUP_AGGREGATE_JOIN: self._group_aggregate_join,
        }
        return dispatch[req.kind](req)

    # ------------------------------------------------------------------
    def search(self, q) -> DataFrame:
        """Search endpoint: metric + where -> matching series names
        (parse_search_query, queryparser.cc:1009-1059).

        Matching modes (SeriesRetreiver, queryparser.cc:160-275):
        - default: exact metric equality (SeriesRetreiver::match);
        - ``"fuzzy": true``: the metric is a PREFIX — the reference
          builds ``<metric>\\S*(\\s k=v)*`` over canonical names
          (fuzzy_match, queryparser.cc:210-260), which on the narrow
          model is a startswith on the metric column (autocomplete);
        - ``"regex": <pattern>``: regex over the full canonical series
          name (PlainSeriesMatcher::regex_match).
        All run on the (small) series registry — sub-second anywhere."""
        if self.series is None:
            raise QueryParseError("no series registry bound")
        from stdb_spark.query.parser import parse_search_query

        sq = parse_search_query(dict(q))
        df = self.series
        if sq.regex:
            df = df.filter(F.col("name").rlike(sq.regex))
        elif sq.metric and sq.fuzzy:
            df = df.filter(F.col("metric").startswith(sq.metric))
        elif sq.metric:
            df = df.filter(F.col("metric") == sq.metric)
        req = QueryRequest(kind=QueryKind.SELECT_META)
        req.where = sq.where
        req.limit, req.offset = sq.limit, sq.offset
        df = self._bind(df, req, metrics=[])
        out = df.select(F.col("name").alias("series")).orderBy("series")
        return self._limit(out, req)

    def suggest(self, q) -> DataFrame:
        """Autocomplete endpoint (parse_suggest_query,
        queryparser.cc:1061-1254): metric-names | tag-names | tag-values,
        optionally filtered by `metric`, `tag`, and `starts-with`.
        Runs on the (small) series registry — sub-second at any scale."""
        if self.series is None:
            raise QueryParseError("no series registry bound")
        from stdb_spark.query.parser import parse_suggest_query

        sq = parse_suggest_query(dict(q))
        df = self.series
        if sq.metric:
            df = df.filter(F.col("metric") == sq.metric)
        if sq.target == "metric-names":
            out = self.series.select(F.col("metric").alias("name")).distinct()
        elif sq.target == "tag-names":
            out = df.select(
                F.explode(F.map_keys(F.col("tags"))).alias("name")
            ).distinct()
        else:  # tag-values (target validated by the parser)
            out = (
                df.select(F.col("tags")[sq.tag].alias("name"))
                .filter(F.col("name").isNotNull())
                .distinct()
            )
        if sq.starts_with:
            out = out.filter(F.col("name").startswith(sq.starts_with))
        return out.orderBy("name")

    # ------------------------------------------------------------------
    # shared stages
    def _bind(self, df: DataFrame, req: QueryRequest, metrics: list[str] | None = None) -> DataFrame:
        """metric + where -> row filter (the parse-time series binding of
        the reference, queryparser.cc:683-740, becomes a pushed-down
        predicate on the fact table)."""
        metrics = metrics if metrics is not None else req.metrics
        if metrics:
            df = df.filter(F.col("metric").isin(list(dict.fromkeys(metrics))))
        if req.where:
            if req.where.tag_values:
                conds = [
                    F.col("tags")[t].isin(vals)
                    for t, vals in req.where.tag_values.items()
                ]
                df = df.filter(_and_all(conds))
            if req.where.series_combos:
                combos = [
                    _and_all([F.col("tags")[k] == F.lit(v) for k, v in combo.items()])
                    for combo in req.where.series_combos
                ]
                df = df.filter(_or_all(combos))
        return df

    def _range(self, df: DataFrame, req: QueryRequest) -> DataFrame:
        """Half-open [from, to); reversed bounds scan backward over
        (to, from] (operator.h:88-94).  When a ``ts_raw`` column is bound,
        coarse bounds on it are added so the Parquet scan prunes row
        groups (see __init__ on ts_slack_ns).  When the table carries the
        layout's ``day`` partition column (sources.storage.write_samples),
        explicit day bounds are added so directory-level partition
        pruning fires — the NB+tree time-descent analog at the file
        system level."""
        if req.begin is None:
            return df
        # widen BOTH ends by the slack: the contract is the symmetric
        # |ts - ts_raw| <= ts_slack_ns, so a transform that can move ts
        # ABOVE ts_raw (round-to-nearest, negative-epoch truncation)
        # must not lose boundary rows to a one-sided bound
        g = self.ts_slack_ns
        if req.backward:
            lo, hi = req.end - g, req.begin + g
            cond = (F.col("ts") <= req.begin) & (F.col("ts") > req.end)
            if "ts_raw" in df.columns:
                cond = cond & (F.col("ts_raw") <= req.begin + g) & (
                    F.col("ts_raw") > req.end - g
                )
        else:
            lo, hi = req.begin - g, req.end + g
            cond = (F.col("ts") >= req.begin) & (F.col("ts") < req.end)
            if "ts_raw" in df.columns:
                cond = cond & (F.col("ts_raw") >= req.begin - g) & (
                    F.col("ts_raw") < req.end + g
                )
        # Physical-column bounds: ts/ts_raw are *derived* (timestamp
        # arithmetic), so their predicates never reach PushedFilters.
        # When the adapter kept the raw parquet column, add coarse
        # attribute-vs-literal bounds on it so the scan prunes row
        # groups (the NB+tree time-descent analog at the storage level).
        src_cond = model.ts_src_bounds(df, int(lo), int(hi))
        if src_cond is not None:
            cond = cond & src_cond
        if "day" in df.columns:
            from stdb_spark.common.timeutil import NS_PER_DAY

            cond = cond & (F.col("day") >= int(lo // NS_PER_DAY)) & (
                F.col("day") <= int(hi // NS_PER_DAY)
            )
        return df.filter(cond)

    @staticmethod
    def _group_remap(df: DataFrame, req: QueryRequest) -> DataFrame:
        """group-by-tag / pivot-by-tag: project the tags map down to the
        listed keys so series sharing them merge (GroupByTag,
        stdb/index/seriesparser.h:66-107).  Both ops reduce to the same
        projection in the DataFrame model; the reference differs only in
        how the output series set is *named* through the id remapper."""
        if not req.group_op:
            return df
        keys = F.array(*[F.lit(t) for t in req.group_tags])
        return df.withColumn(
            "tags", F.map_filter("tags", lambda k, _: F.array_contains(keys, k))
        )

    @staticmethod
    def _order(df: DataFrame, req: QueryRequest, preordered: bool = False) -> DataFrame:
        if preordered:
            return df
        ts = F.col("ts").desc() if req.backward else F.col("ts").asc()
        sr = F.col("series").desc() if req.backward else F.col("series").asc()
        # (series, ts) is not guaranteed unique (duplicate same-µs
        # samples after the adapter truncation); break the final tie on
        # the payload so ORDER BY + LIMIT cuts are a deterministic
        # function of the DATA (the reference's within-tie order is
        # storage-order, i.e. unspecified — any fixed refinement is a
        # valid parity choice, and the suite's oracles mirror this one)
        tiebreaks = [
            (F.col(c).desc() if req.backward else F.col(c).asc())
            for c in ("value", "body")
            if c in df.columns
        ]
        if req.order_by == "series":
            return df.orderBy(sr, ts, *tiebreaks)
        return df.orderBy(ts, sr, *tiebreaks)

    @staticmethod
    def _limit(df: DataFrame, req: QueryRequest) -> DataFrame:
        # the reference overwrote limit with offset (queryparser.cc:624);
        # correct semantics implemented here on purpose.
        if req.offset:
            df = df.offset(req.offset)
        if req.limit is not None:
            df = df.limit(req.limit)
        return df

    def _value_filters(
        self, df: DataFrame, req: QueryRequest, cols: dict[str, str]
    ) -> DataFrame:
        """filters keyed by metric (join/select) or func (group-agg
        HAVING), combined with all/any (queryparser.cc:748-858)."""
        if not req.filters:
            return df
        conds = []
        for key, vf in req.filters.items():
            if key not in cols:
                raise QueryParseError(f"filter key {key!r} matches no output column")
            conds.append(_vf_condition(F.col(cols[key]), vf))
        return df.filter(_and_all(conds) if req.filter_rule == "all" else _or_all(conds))

    def _group_aggregate_filters(
        self,
        df: DataFrame,
        req: QueryRequest,
        cols: dict[str, str],
        metric_keys: dict[str, str],
    ) -> DataFrame:
        """HAVING for group-aggregate. Func-keyed conditions apply to
        every bucket row; metric-keyed conditions are strictly
        per-metric (queryparser.cc:1868,
        plan/query_plan_builder.cc:58-109): a row of a DIFFERENT metric
        is unaffected by them — it passes under "all" and is not
        rescued/rejected by them under "any"."""
        if not req.filters:
            return df
        global_conds, per_metric = [], {}
        for key, vf in req.filters.items():
            if key in cols:
                global_conds.append(_vf_condition(F.col(cols[key]), vf))
            elif key in metric_keys:
                per_metric[key] = _vf_condition(F.col(metric_keys[key]), vf)
            else:
                raise QueryParseError(f"filter key {key!r} matches no output column")
        if req.filter_rule == "all":
            conds = global_conds + [
                (F.col("metric") != F.lit(m)) | c for m, c in per_metric.items()
            ]
            return df.filter(_and_all(conds))
        # "any": a row passes if any condition APPLICABLE to it holds;
        # rows whose metric carries no filter (and no func-keyed
        # condition exists) have an empty applicable set and pass.
        conds = global_conds + [
            (F.col("metric") == F.lit(m)) & c for m, c in per_metric.items()
        ]
        if per_metric and not global_conds:
            unfiltered = ~F.col("metric").isin(list(per_metric))
            return df.filter(_or_all(conds + [unfiltered]))
        return df.filter(_or_all(conds))

    # ------------------------------------------------------------------
    def _select(self, req: QueryRequest) -> DataFrame:
        df = self._bind(self.samples, req)
        df = self._range(df, req)
        df = self._group_remap(df, req)
        if req.filters:
            # reject unknown keys loudly instead of KeyError-crashing /
            # silently dropping extra named filters
            unknown = [k for k in req.filters if k not in req.metrics]
            if unknown:
                raise QueryParseError(
                    f"filter key {unknown[0]!r} matches no selected metric"
                )
            df = df.filter(_vf_condition(F.col("value"), req.filters[req.metrics[0]]))
        out = df.select(
            _series_name(F.col("metric")).alias("series"),
            F.col("ts"),
            F.col("value"),
        )
        out, _, preordered = apply_pipeline(out, req.apply, ["value"], req.backward)
        return self._limit(self._order(out, req, preordered), req)

    def _select_events(self, req: QueryRequest) -> DataFrame:
        if self.events is None:
            raise QueryParseError("no events table bound")
        df = self._bind(self.events, req)
        df = self._range(df, req)
        if req.event_regex:
            # regex pushed into the scan, like BinaryDataFilter
            # (stdb/storage/nbtree.cc:1630)
            df = df.filter(F.col("body").rlike(req.event_regex))
        df = self._group_remap(df, req)
        out = df.select(
            _series_name(F.col("metric")).alias("series"), F.col("ts"), F.col("body")
        )
        return self._limit(self._order(out, req), req)

    def _select_meta(self, req: QueryRequest) -> DataFrame:
        if self.series is None:
            raise QueryParseError("no series registry bound")
        df = self._bind(self.series, req)
        out = df.select(F.col("name").alias("series")).orderBy("series")
        return self._limit(out, req)

    # ------------------------------------------------------------------
    # summary-table aggregate pushdown
    _SUMMARY_FUNCS = {
        "min", "max", "sum", "count", "cnt", "mean", "first", "last",
        "min_timestamp", "max_timestamp", "first_timestamp", "last_timestamp",
    }

    @staticmethod
    def _summary_agg_expr(func: str) -> "F.Column":
        """Combine bucket summaries into the whole-range aggregate —
        AggregationResult::combine (operator.h:48-73) as one Catalyst
        expression per function.  Exactness: `sum` is decimal (exact,
        order-free); min/max/first/last carry their timestamps so struct
        ordering reproduces the leaf scan's deterministic tiebreaks."""
        table = {
            "min": F.min(F.struct("min", "min_ts")).getField("min"),
            "max": F.max(F.struct("max", "max_ts")).getField("max"),
            "sum": F.sum("sum").cast("double"),
            "count": F.sum("cnt").cast("double"),
            "cnt": F.sum("cnt").cast("double"),
            "mean": F.sum("sum").cast("double") / F.sum("cnt"),
            "first": F.min(F.struct("first_ts", "first")).getField("first"),
            "last": F.max(F.struct("last_ts", "last")).getField("last"),
            "min_timestamp": F.min(F.struct("min", "min_ts"))
            .getField("min_ts").cast("double"),
            "max_timestamp": F.max(F.struct("max", "max_ts"))
            .getField("max_ts").cast("double"),
            "first_timestamp": F.min("first_ts").cast("double"),
            "last_timestamp": F.max("last_ts").cast("double"),
        }
        return table[func]

    def _aggregate_from_summaries(self, req: QueryRequest, all_funcs: list[str]):
        """Planner choice: answer `aggregate` from the summary table when
        it is provably exact — forward scan, range aligned to the summary
        step (or absent), no tag regrouping.  Returns None to fall back
        to the leaf scan."""
        if self.summaries is None or not self.summary_step_ns:
            return None
        if req.group_op or req.backward:
            return None
        if not set(all_funcs) <= self._SUMMARY_FUNCS:
            return None
        step = self.summary_step_ns
        s = self.summaries
        if req.begin is not None:
            if req.begin % step or req.end % step:
                return None
            s = s.filter(
                (F.col("bucket_ts") >= req.begin) & (F.col("bucket_ts") < req.end)
            )
        if req.metrics:
            s = s.filter(F.col("metric").isin(list(dict.fromkeys(req.metrics))))
        # tags live in the (small) series registry — bind there, then
        # broadcast-join the matching series ids onto the summaries
        reg = self._bind(self.series, req, metrics=req.metrics)
        reg = reg.select("series_id", _tags_suffix().alias("_tags_s"))
        s = s.join(F.broadcast(reg), "series_id")
        return s.groupBy("metric", "_tags_s").agg(
            *[self._summary_agg_expr(f).alias(f"_f_{f}") for f in all_funcs]
        )

    def _group_aggregate_from_summaries(self, req: QueryRequest):
        """Planner choice: answer `group-aggregate` (downsample) by
        ROLLING UP the summary table when every summary bucket nests
        inside one output bucket — requires begin/end and step aligned
        to the summary step.  The hypertable-rollup shape: a month of
        2d buckets combines ~60 day-summaries per series instead of
        re-scanning every leaf row."""
        if self.summaries is None or not self.summary_step_ns:
            return None
        if req.group_op or req.backward or req.begin is None:
            return None
        if not set(req.agg_funcs) <= self._SUMMARY_FUNCS:
            return None
        sstep = self.summary_step_ns
        if req.step_ns % sstep or req.begin % sstep or req.end % sstep:
            return None
        s = self.summaries.filter(
            (F.col("bucket_ts") >= req.begin) & (F.col("bucket_ts") < req.end)
        )
        if req.metrics:
            s = s.filter(F.col("metric").isin(list(dict.fromkeys(req.metrics))))
        reg = self._bind(self.series, req, metrics=req.metrics)
        reg = reg.select("series_id", _tags_suffix().alias("_tags_s"))
        s = s.join(F.broadcast(reg), "series_id")
        b, st = F.lit(req.begin), F.lit(req.step_ns)
        bucket = (
            b + st * F.expr(f"(bucket_ts - {req.begin}L) div {req.step_ns}L")
        ).alias("ts")
        return s.groupBy("metric", "_tags_s", bucket).agg(
            *[self._summary_agg_expr(f).alias(f) for f in req.agg_funcs]
        )

    def _group_aggregate_join_from_summaries(self, req: QueryRequest):
        """Planner choice: answer single-func `group-aggregate-join` by
        rolling up + pivoting the summary table — same provable-
        exactness eligibility as _group_aggregate_from_summaries (the
        one func must be summary-combinable, buckets must nest).  The
        pivot is over the same combine expressions, so values are
        bit-identical to the leaf scan's."""
        if self.summaries is None or not self.summary_step_ns:
            return None
        if req.group_op or req.backward or req.begin is None:
            return None
        if not set(req.agg_funcs) <= self._SUMMARY_FUNCS:
            return None
        sstep = self.summary_step_ns
        if req.step_ns % sstep or req.begin % sstep or req.end % sstep:
            return None
        fn = req.agg_funcs[0]
        s = self.summaries.filter(
            (F.col("bucket_ts") >= req.begin) & (F.col("bucket_ts") < req.end)
        )
        s = s.filter(F.col("metric").isin(list(dict.fromkeys(req.metrics))))
        reg = self._bind(self.series, req, metrics=req.metrics)
        reg = reg.select("series_id", _tags_suffix().alias("_tags_s"))
        s = s.join(F.broadcast(reg), "series_id")
        b, st = F.lit(req.begin), F.lit(req.step_ns)
        bucket = (
            b + st * F.expr(f"(bucket_ts - {req.begin}L) div {req.step_ns}L")
        ).alias("ts")
        return (
            s.groupBy("_tags_s", bucket)
            .pivot("metric", req.metrics)
            .agg(self._summary_agg_expr(fn))
        )

    # ------------------------------------------------------------------
    def _aggregate(self, req: QueryRequest) -> DataFrame:
        by_metric: dict[str, list[str]] = {}
        for m, fn in zip(req.metrics, req.agg_funcs):
            by_metric.setdefault(m, []).append(fn)
        all_funcs = sorted({f for fs in by_metric.values() for f in fs})
        gb = self._aggregate_from_summaries(req, all_funcs)
        if gb is None:
            df = self._bind(self.samples, req)
            df = self._range(df, req)
            df = self._group_remap(df, req)
            gb = df.groupBy("metric", _tags_suffix().alias("_tags_s")).agg(
                *[agg_expr(f, req.backward, exact=self.exact_sums).alias(f"_f_{f}") for f in all_funcs]
            )
        # one output row per requested (metric, func): a single explode of
        # per-metric (label, value) structs — NOT a union of one branch per
        # pair, which would recompute the final aggregate once per branch
        branches = [
            (
                F.col("metric") == m,
                F.array(
                    *[
                        F.struct(
                            F.lit(f"{m}:{fn}").alias("label"),
                            F.col(f"_f_{fn}").alias("value"),
                        )
                        for fn in fns
                    ]
                ),
            )
            for m, fns in by_metric.items()
        ]
        pairs = F.when(*branches[0])
        for cond, arr in branches[1:]:
            pairs = pairs.when(cond, arr)
        e = gb.select("_tags_s", F.explode(pairs).alias("_e"))
        sname = F.when(
            F.length("_tags_s") > 0,
            F.concat(F.col("_e.label"), F.lit(" "), F.col("_tags_s")),
        ).otherwise(F.col("_e.label"))
        out = e.select(sname.alias("series"), F.col("_e.value").alias("value"))
        # aggregate output is always series-ordered (queryparser.cc:1453+)
        return self._limit(out.orderBy("series"), req)

    # ------------------------------------------------------------------
    def _bucket_col(self, req: QueryRequest):
        """Tumbling buckets aligned to the query's `begin`, NOT to the
        epoch (stdb/storage/operators/aggregate.cc:160-170):
        forward  bucket_ts = begin + step*((ts - begin) div step)
        backward bucket_ts = begin - step*((begin - ts) div step)
        Integer `div` keeps 1e18-scale nanosecond math exact (a double
        division would lose precision past 2^53)."""
        b, s = F.lit(req.begin), F.lit(req.step_ns)
        if req.backward:
            return (b - s * F.expr(f"({req.begin}L - ts) div {req.step_ns}L")).alias("ts")
        return (b + s * F.expr(f"(ts - {req.begin}L) div {req.step_ns}L")).alias("ts")

    def _group_aggregate(self, req: QueryRequest) -> DataFrame:
        funcs = req.agg_funcs
        gb = self._group_aggregate_from_summaries(req)
        if gb is None:
            df = self._bind(self.samples, req)
            df = self._range(df, req)
            df = self._group_remap(df, req)
            gb = df.groupBy(
                "metric", _tags_suffix().alias("_tags_s"), self._bucket_col(req)
            ).agg(*[agg_expr(f, req.backward, exact=self.exact_sums).alias(f) for f in funcs])
        # HAVING over bucket components, keyed by function name — plus
        # the parser's other accepted spellings: the pre-canonical
        # 'cnt' alias, and metric keys (queryparser.cc:1868 parses
        # group-aggregate filters per METRIC, never globally): a
        # metric-keyed threshold gates ONLY the named metric's bucket
        # rows; rows of other metrics pass untouched. The metric
        # spelling is unambiguous only when ONE func is requested; with
        # several, it falls to the "matches no output column" rejection.
        cols = {f: f for f in funcs}
        if "count" in funcs:
            cols.setdefault("cnt", "count")
        metric_keys: dict[str, str] = {}
        if len(funcs) == 1:
            for m in req.metrics:
                if m not in cols:
                    metric_keys[m] = funcs[0]
        gb = self._group_aggregate_filters(gb, req, cols, metric_keys)
        label = "|".join(f"{{m}}:{f}" for f in funcs)
        sname = F.when(
            F.length("_tags_s") > 0,
            F.concat(
                F.regexp_replace(F.lit(label), F.lit("\\{m\\}"), F.col("metric")),
                F.lit(" "),
                F.col("_tags_s"),
            ),
        ).otherwise(F.regexp_replace(F.lit(label), F.lit("\\{m\\}"), F.col("metric")))
        out = gb.select(sname.alias("series"), F.col("ts"), *[F.col(f) for f in funcs])
        return self._limit(self._order(out, req), req)

    # ------------------------------------------------------------------
    def _join(self, req: QueryRequest) -> DataFrame:
        """N metrics aligned on exact timestamp per tag-set -> one row per
        (tags, ts) with one column per metric, missing -> null
        (JoinMaterializer parity, stdb/storage/operators/join.h:18-53).
        Implemented as groupBy(tags, ts).pivot(metric) — one shuffle, no
        M-way self-join."""
        metrics = req.metrics
        df = self._bind(self.samples, req)
        df = self._range(df, req)
        df = self._group_remap(df, req)
        piv = (
            df.groupBy(_tags_suffix().alias("_tags_s"), "ts")
            .pivot("metric", metrics)
            # a (series, ts) pair holds at most one sample; max() picks it
            # deterministically even if duplicates sneak in (first() would
            # be partition-order dependent)
            .agg(F.max("value"))
        )
        piv = self._value_filters(piv, req, {m: m for m in metrics})
        joined_name = "|".join(metrics)
        sname = F.when(
            F.length("_tags_s") > 0,
            F.concat(F.lit(joined_name + " "), F.col("_tags_s")),
        ).otherwise(F.lit(joined_name))
        out = piv.select(sname.alias("series"), "ts", *[F.col(m) for m in metrics])
        out, cols, preordered = apply_pipeline(out, req.apply, list(metrics), req.backward)
        return self._limit(self._order(out, req, preordered), req)

    def _group_aggregate_join(self, req: QueryRequest) -> DataFrame:
        """Downsample N metrics with ONE func, align buckets
        (queryparser.cc:1793-1907)."""
        metrics = req.metrics
        fn = req.agg_funcs[0]
        piv = self._group_aggregate_join_from_summaries(req)
        if piv is None:
            df = self._bind(self.samples, req)
            df = self._range(df, req)
            df = self._group_remap(df, req)
            piv = (
                df.groupBy(_tags_suffix().alias("_tags_s"), self._bucket_col(req))
                .pivot("metric", metrics)
                .agg(agg_expr(fn, req.backward, exact=self.exact_sums))
            )
        piv = self._value_filters(piv, req, {m: m for m in metrics})
        joined_name = "|".join(f"{m}:{fn}" for m in metrics)
        sname = F.when(
            F.length("_tags_s") > 0,
            F.concat(F.lit(joined_name + " "), F.col("_tags_s")),
        ).otherwise(F.lit(joined_name))
        out = piv.select(sname.alias("series"), "ts", *[F.col(m) for m in metrics])
        out, cols, preordered = apply_pipeline(out, req.apply, list(metrics), req.backward)
        return self._limit(self._order(out, req, preordered), req)
