"""Semantic layer: declarative metrics compiled to Spark SQL.

Reference surface (SURVEY.md §2.6): ``SemanticModel`` with entities/
dimensions/measures (``artifacts/resources/v1/semantic_model.py:36-265``,
measure aggs ``:141-160``) and ``Metric`` with
``type ∈ {simple, ratio, cumulative, derived, conversion}``
(``artifacts/resources/v1/metric.py:32-113``). The reference only
parses/validates these (MetricFlow executes them); here ALL five types
compile directly to Spark SQL:

- simple/ratio/derived: aggregate expressions over the grouped model;
- cumulative (``cumulative_type_params`` ``:54-113``): two-level SQL —
  group to the queried time grain, then a window sum per partition
  (unbounded, trailing ``window``, or ``grain_to_date``). One shuffle
  for the groupBy, one for the window — scale-safe because the window
  runs over the already-aggregated grain rows, not raw events;
- conversion (``ConversionTypeParams`` ``:75-90``): the as-of-forward
  trick from ``sparkt/functions/asof.py`` expressed in SQL — union base
  and conversion events, carry the NEXT conversion timestamp back with
  a window min, then test it against the window bound. Linear, one
  shuffle on the entity key, no pair blowup.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from sparkt.exceptions import CompilationError

AGG_SQL = {
    "sum": "sum({e})",
    "min": "min({e})",
    "max": "max({e})",
    "avg": "avg({e})",
    "count": "count({e})",
    "count_distinct": "count(distinct {e})",
    "median": "median({e})",
    "percentile": "percentile({e}, {p})",
    "sum_boolean": "sum(case when {e} then 1 else 0 end)",
}


@dataclass
class Measure:
    name: str
    agg: str
    expr: str
    percentile: float | None = None

    def to_sql(self) -> str:
        if self.agg not in AGG_SQL:
            raise CompilationError(f"unsupported measure agg '{self.agg}'")
        p = 0.5 if self.percentile is None else self.percentile
        return AGG_SQL[self.agg].format(e=self.expr, p=p)


@dataclass
class SemanticModel:
    name: str
    model: str  # relation or ref-able name resolved by caller
    dimensions: dict[str, str] = field(default_factory=dict)  # name -> expr
    measures: dict[str, Measure] = field(default_factory=dict)
    time_dims: set[str] = field(default_factory=set)
    agg_time_dimension: str | None = None

    @classmethod
    def from_yaml(cls, spec: dict) -> "SemanticModel":
        dims = {
            d["name"]: d.get("expr", d["name"])
            for d in spec.get("dimensions", []) or []
        }
        time_dims = {
            d["name"]
            for d in spec.get("dimensions", []) or []
            if d.get("type") == "time"
        }
        measures = {
            m["name"]: Measure(
                name=m["name"],
                agg=m["agg"],
                expr=str(m.get("expr", m["name"])),
                percentile=m.get("agg_params", {}).get("percentile"),
            )
            for m in spec.get("measures", []) or []
        }
        agg_time = (spec.get("defaults") or {}).get("agg_time_dimension")
        if agg_time is None and time_dims:
            agg_time = sorted(time_dims)[0]
        return cls(
            name=spec["name"], model=spec["model"], dimensions=dims,
            measures=measures, time_dims=time_dims,
            agg_time_dimension=agg_time,
        )


@dataclass
class Metric:
    name: str
    type: str  # simple | ratio | derived | cumulative | conversion
    measure: str | None = None
    numerator: str | None = None
    denominator: str | None = None
    expr: str | None = None
    filter: str | None = None
    # cumulative (metric.py:54-113)
    window: str | None = None  # e.g. "7 days"
    grain_to_date: str | None = None  # e.g. "month"
    # conversion (metric.py:75-90)
    base_measure: str | None = None
    conversion_measure: str | None = None
    entity: str | None = None
    calculation: str = "conversion_rate"  # or "conversions"

    @classmethod
    def from_yaml(cls, spec: dict) -> "Metric":
        tp = spec.get("type_params", {}) or {}
        ctp = tp.get("cumulative_type_params") or {}
        vtp = tp.get("conversion_type_params") or {}

        def _measure_name(v):
            return v.get("name") if isinstance(v, dict) else v

        return cls(
            name=spec["name"],
            type=spec["type"],
            measure=_measure_name(tp.get("measure", spec.get("measure"))),
            numerator=_measure_name(tp.get("numerator", spec.get("numerator"))),
            denominator=_measure_name(
                tp.get("denominator", spec.get("denominator"))
            ),
            expr=tp.get("expr", spec.get("expr")),
            filter=spec.get("filter"),
            window=ctp.get("window", vtp.get("window", tp.get("window"))),
            grain_to_date=ctp.get("grain_to_date", tp.get("grain_to_date")),
            base_measure=_measure_name(vtp.get("base_measure")),
            conversion_measure=_measure_name(vtp.get("conversion_measure")),
            entity=vtp.get("entity"),
            calculation=vtp.get("calculation", "conversion_rate"),
        )


class SemanticLayer:
    def __init__(self):
        self.semantic_models: dict[str, SemanticModel] = {}
        self.metrics: dict[str, Metric] = {}

    def add_semantic_model(self, spec: dict) -> None:
        sm = SemanticModel.from_yaml(spec)
        self.semantic_models[sm.name] = sm

    def add_metric(self, spec: dict) -> None:
        m = Metric.from_yaml(spec)
        self.metrics[m.name] = m

    # ------------------------------------------------------------------
    def _find_measure(self, measure: str) -> tuple[SemanticModel, Measure]:
        for sm in self.semantic_models.values():
            if measure in sm.measures:
                return sm, sm.measures[measure]
        raise CompilationError(f"unknown measure '{measure}'")

    def _measure_sql(self, sm, measure, metric_filter):
        """Measure aggregate, honoring a metric-level filter as a
        filtered aggregate (CASE inside the agg) — shared by simple,
        ratio and cumulative metrics so a filter is never silently
        dropped."""
        if not metric_filter:
            return measure.to_sql()
        inner = re.sub(
            r"\{\{\s*dimension\(['\"](\w+)['\"]\)\s*\}\}",
            lambda m: sm.dimensions.get(m.group(1), m.group(1)),
            metric_filter,
        )
        tmpl = AGG_SQL.get(measure.agg)
        if tmpl is None:
            # the same typed error the unfiltered path raises via
            # Measure.to_sql — a filter must not turn it into a bare
            # KeyError (r12 semantic review #7)
            raise CompilationError(
                f"unsupported measure agg '{measure.agg}' "
                f"(supported: {', '.join(sorted(AGG_SQL))})"
            )
        return tmpl.format(
            e=f"case when {inner} then {measure.expr} end",
            p=(0.5 if measure.percentile is None else measure.percentile),
        )

    def _metric_select_expr(self, metric: Metric,
                            _seen: frozenset = frozenset()
                            ) -> tuple[str, SemanticModel]:
        if metric.name in _seen:
            raise CompilationError(
                f"derived metric cycle involving '{metric.name}'"
            )
        _seen = _seen | {metric.name}
        if metric.type == "simple":
            sm, measure = self._find_measure(metric.measure)
            return self._measure_sql(sm, measure, metric.filter), sm
        if metric.type == "ratio":
            sm_n, num = self._find_measure(metric.numerator)
            sm_d, den = self._find_measure(metric.denominator)
            if sm_n.name != sm_d.name:
                raise CompilationError(
                    "ratio metric across semantic models not supported"
                )
            n_sql = self._measure_sql(sm_n, num, metric.filter)
            d_sql = self._measure_sql(sm_d, den, metric.filter)
            return (
                f"cast({n_sql} as double) / "
                f"nullif(cast({d_sql} as double), 0)",
                sm_n,
            )
        if metric.type == "derived":
            # Two-phase substitution: metric names -> opaque tokens
            # first (longest name first), THEN tokens -> compiled SQL.
            # Direct re.sub passes would rewrite matches INSIDE an
            # already-substituted expression (e.g. metric 'value'
            # matching the column 'value' in metric 'total''s SQL).
            expr = metric.expr or ""
            sm_ref = None
            tokens: dict[str, str] = {}
            for name in sorted(self.metrics, key=len, reverse=True):
                sub = self.metrics[name]
                if sub.name == metric.name:
                    continue
                if re.search(rf"\b{re.escape(name)}\b", expr):
                    if sub.type in ("cumulative", "conversion"):
                        raise CompilationError(
                            f"derived metric '{metric.name}' references "
                            f"{sub.type} metric '{name}' — windowed "
                            "components cannot be composed as plain "
                            "aggregates; query them separately"
                        )
                    tok = f"\x00M{len(tokens)}\x00"
                    sub_expr, sub_sm = self._metric_select_expr(
                        sub, _seen
                    )
                    # components must share ONE semantic model: the
                    # compiled SELECT runs against a single relation,
                    # so a cross-model expr would reference missing
                    # columns (or same-named wrong ones) and which
                    # model won depended on metric-name length (r12
                    # semantic review #2)
                    if sm_ref is not None and sub_sm.name != sm_ref.name:
                        raise CompilationError(
                            f"derived metric '{metric.name}' mixes "
                            f"metrics from semantic models "
                            f"'{sm_ref.name}' and '{sub_sm.name}' — "
                            "cross-model derivation is not supported; "
                            "materialize the components first"
                        )
                    sm_ref = sub_sm
                    tokens[tok] = f"({sub_expr})"
                    expr = re.sub(rf"\b{re.escape(name)}\b", tok, expr)
            for tok, sql in tokens.items():
                expr = expr.replace(tok, sql)
            if sm_ref is None:
                raise CompilationError(
                    f"derived metric '{metric.name}' references no known metric"
                )
            return expr, sm_ref
        if metric.type == "cumulative":
            # the base aggregate; the window wrapping happens in
            # compile_query (it needs the queried time grain)
            sm, measure = self._find_measure(metric.measure)
            if measure.agg not in ("sum", "count", "sum_boolean", "min", "max"):
                raise CompilationError(
                    f"cumulative metric '{metric.name}': measure agg "
                    f"'{measure.agg}' is not re-aggregable over time"
                )
            return self._measure_sql(sm, measure, metric.filter), sm
        raise NotImplementedError(
            f"metric type '{metric.type}' is parsed but not compilable yet "
            f"(reference executes it in MetricFlow)"
        )

    @staticmethod
    def _interval(window: str) -> str:
        """'7 days' -> 'INTERVAL 7 DAY' (singular units parse in both
        Spark and DuckDB)."""
        m = re.match(r"^\s*(\d+)\s+(\w+?)s?\s*$", str(window))
        if not m:
            raise CompilationError(f"bad window '{window}'")
        return f"INTERVAL {m.group(1)} {m.group(2).upper()}"

    _GRAINS = {
        "second", "minute", "hour", "day", "week",
        "month", "quarter", "year",
    }

    @staticmethod
    def _parse_dim(d: str) -> tuple[str, str | None]:
        """'ds__day' -> ('ds', 'day'); 'region' -> ('region', None).
        Only a KNOWN grain suffix splits (r15 review): any other
        '__suffix' (e.g. a MetricFlow entity path 'customer__region')
        must surface as an unknown-dimension error downstream, not
        silently compile to date_trunc('region', customer)."""
        name, _, grain = d.partition("__")
        if grain and grain not in SemanticLayer._GRAINS:
            return d, None
        return name, (grain or None)

    def _dim_expr(self, sm: SemanticModel, d: str) -> tuple[str, str]:
        """Returns (select_expr, output_name) for a query dimension,
        resolving metric_time to the model's agg_time_dimension and
        applying a __grain suffix via date_trunc."""
        name, grain = self._parse_dim(d)
        if name == "metric_time":
            if not sm.agg_time_dimension:
                raise CompilationError(
                    f"model '{sm.name}' has no agg_time_dimension for "
                    "metric_time"
                )
            name = sm.agg_time_dimension
        if name not in sm.dimensions:
            raise CompilationError(f"unknown dimension '{name}'")
        expr = sm.dimensions[name]
        out = d.replace("__", "_") if grain else name
        if grain:
            expr = f"date_trunc('{grain}', {expr})"
        return expr, out

    def _compile_cumulative_query(
        self, metric_names, dimensions, relation_for_model
    ) -> str:
        """Two-level SQL: group to the queried grain, then window-sum
        each cumulative metric per non-time partition."""
        dims = dimensions or []
        metrics = [self.metrics[n] for n in metric_names]
        sm = None
        base_exprs = []
        for met in metrics:
            if met.type not in ("simple", "cumulative"):
                raise CompilationError(
                    "cumulative queries may mix only simple and cumulative "
                    f"metrics (got '{met.type}')"
                )
            expr, m_sm = self._metric_select_expr(met)
            if sm is not None and m_sm.name != sm.name:
                raise CompilationError(
                    "metrics from multiple semantic models in one query "
                    "are not supported"
                )
            sm = m_sm
            base_exprs.append(expr)
        time_dims = [
            d for d in dims
            if self._parse_dim(d)[0] in (sm.time_dims | {"metric_time"})
        ]
        if len(time_dims) != 1:
            raise CompilationError(
                "a cumulative metrics query needs exactly one time "
                f"dimension (got {time_dims or 'none'})"
            )
        time_dim = time_dims[0]
        cat_dims = [d for d in dims if d != time_dim]
        t_expr, t_out = self._dim_expr(sm, time_dim)
        cat = [self._dim_expr(sm, d) for d in cat_dims]
        relation = (
            relation_for_model(sm.model) if relation_for_model else sm.model
        )
        group_cols = [f"{t_expr} AS {t_out}"] + [
            f"{e} AS {o}" for e, o in cat
        ]
        base_cols = [
            f"{expr} AS __base_{i}" for i, expr in enumerate(base_exprs)
        ]
        grouped = (
            f"SELECT {', '.join(group_cols + base_cols)} FROM {relation} "
            f"GROUP BY {', '.join([t_expr] + [e for e, _ in cat])}"
        )
        part = (
            f"PARTITION BY {', '.join(o for _, o in cat)} " if cat else ""
        )
        # the outer re-aggregation over time must honor the measure's
        # agg: per-grain COUNTs re-aggregate by SUM, but a running MIN
        # over per-day minima is min(), not sum() — the hardcoded sum
        # silently returned wrong numbers for min/max measures (r12
        # semantic review #1)
        _REAGG = {
            "sum": "sum", "count": "sum", "sum_boolean": "sum",
            "min": "min", "max": "max",
        }

        def _reagg_fn(met):
            _, measure = self._find_measure(met.measure)
            return _REAGG[measure.agg]

        outer = []
        for i, met in enumerate(metrics):
            if met.type == "simple":
                outer.append(f"__base_{i} AS {met.name}")
            elif met.grain_to_date:
                gtd_keys = [o for _, o in cat] + [
                    f"date_trunc('{met.grain_to_date}', {t_out})"
                ]
                outer.append(
                    f"{_reagg_fn(met)}(__base_{i}) OVER (PARTITION BY "
                    f"{', '.join(gtd_keys)} ORDER BY {t_out} "
                    f"ROWS UNBOUNDED PRECEDING) AS {met.name}"
                )
            elif met.window:
                outer.append(
                    f"{_reagg_fn(met)}(__base_{i}) OVER ({part}"
                    f"ORDER BY {t_out} "
                    f"RANGE BETWEEN {self._interval(met.window)} PRECEDING "
                    f"AND CURRENT ROW) AS {met.name}"
                )
            else:
                outer.append(
                    f"{_reagg_fn(met)}(__base_{i}) OVER ({part}"
                    f"ORDER BY {t_out} "
                    f"ROWS UNBOUNDED PRECEDING) AS {met.name}"
                )
        out_dims = [t_out] + [o for _, o in cat]
        order = ", ".join(out_dims)
        return (
            f"WITH __grouped AS ({grouped}) "
            f"SELECT {', '.join(out_dims + outer)} FROM __grouped "
            f"ORDER BY {order}"
        )

    def _compile_conversion_query(
        self, metric, dimensions, relation_for_model
    ) -> str:
        """As-of-forward in SQL (same shape as functions/asof.py): union
        base and conversion events, window-min the NEXT conversion ts
        back onto each base event, then test the window bound."""
        sm_b, base = self._find_measure(metric.base_measure)
        sm_c, conv = self._find_measure(metric.conversion_measure)
        if not metric.entity:
            raise CompilationError(
                f"conversion metric '{metric.name}' needs an entity"
            )
        for sm in (sm_b, sm_c):
            if not sm.agg_time_dimension:
                raise CompilationError(
                    f"model '{sm.name}' has no agg_time_dimension"
                )
        dims = dimensions or []
        cat = [self._dim_expr(sm_b, d) for d in dims]
        rel_b = (
            relation_for_model(sm_b.model) if relation_for_model else sm_b.model
        )
        rel_c = (
            relation_for_model(sm_c.model) if relation_for_model else sm_c.model
        )
        t_b = sm_b.dimensions.get(
            sm_b.agg_time_dimension, sm_b.agg_time_dimension
        )
        t_c = sm_c.dimensions.get(
            sm_c.agg_time_dimension, sm_c.agg_time_dimension
        )
        # an event participates when its measure expression is non-NULL
        # (count semantics over `case when ... then 1 end` exprs)
        b_pred = f"({base.expr}) IS NOT NULL"
        c_pred = f"({conv.expr}) IS NOT NULL"
        dim_sel = "".join(f", {e} AS {o}" for e, o in cat)
        dim_null = "".join(f", NULL AS {o}" for _, o in cat)
        bound = (
            f"__ts + {self._interval(metric.window)}"
            if metric.window
            else None
        )
        converted = (
            f"CASE WHEN __next_conv IS NOT NULL AND __next_conv <= {bound} "
            "THEN 1 ELSE 0 END"
            if bound
            else "CASE WHEN __next_conv IS NOT NULL THEN 1 ELSE 0 END"
        )
        if metric.calculation == "conversions":
            calc = f"sum({converted}) AS {metric.name}"
        else:
            calc = (
                f"round(cast(sum({converted}) AS DOUBLE) / count(*), 6) "
                f"AS {metric.name}"
            )
        out_dims = [o for _, o in cat]
        group = (
            f" GROUP BY {', '.join(out_dims)} ORDER BY {', '.join(out_dims)}"
            if out_dims
            else ""
        )
        sel_dims = (", ".join(out_dims) + ", ") if out_dims else ""
        return (
            f"WITH __b AS (SELECT {metric.entity} AS __ent, {t_b} AS __ts, "
            f"1 AS __is_base{dim_sel} FROM {rel_b} WHERE {b_pred}), "
            f"__c AS (SELECT {metric.entity} AS __ent, {t_c} AS __ts, "
            f"0 AS __is_base{dim_null} FROM {rel_c} WHERE {c_pred}), "
            f"__u AS (SELECT * FROM __b UNION ALL SELECT * FROM __c), "
            f"__m AS (SELECT *, min(CASE WHEN __is_base = 0 THEN __ts END) "
            f"OVER (PARTITION BY __ent ORDER BY __ts ASC, __is_base DESC "
            f"ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS __next_conv "
            f"FROM __u) "
            f"SELECT {sel_dims}{calc} FROM __m WHERE __is_base = 1{group}"
        )

    def compile_query(
        self,
        metric_names: list[str],
        dimensions: list[str] | None = None,
        relation_for_model=None,
    ) -> str:
        """Compile a metrics query: SELECT dims..., metric_exprs...
        FROM semantic_model GROUP BY dims. Cumulative and conversion
        metrics dispatch to their dedicated SQL shapes."""
        if not metric_names:
            # a typed error, not an AttributeError on the never-set
            # sm_used downstream (r12 semantic review #6)
            raise CompilationError(
                "metrics query needs at least one metric"
            )
        metrics = []
        for name in metric_names:
            metric = self.metrics.get(name)
            if metric is None:
                raise CompilationError(f"unknown metric '{name}'")
            metrics.append(metric)
        if any(m.type == "conversion" for m in metrics):
            if len(metrics) != 1:
                raise CompilationError(
                    "a conversion metric must be queried alone"
                )
            return self._compile_conversion_query(
                metrics[0], dimensions, relation_for_model
            )
        if any(m.type == "cumulative" for m in metrics):
            return self._compile_cumulative_query(
                metric_names, dimensions, relation_for_model
            )
        exprs = []
        sm_used: SemanticModel | None = None
        for name, metric in zip(metric_names, metrics):
            expr, sm = self._metric_select_expr(metric)
            if sm_used is not None and sm.name != sm_used.name:
                raise CompilationError(
                    "metrics from multiple semantic models in one query "
                    "are not supported"
                )
            sm_used = sm
            exprs.append(f"{expr} as {name}")
        dims = dimensions or []
        # _dim_expr resolves metric_time / __grain syntax — the same
        # dimensions the cumulative path accepts work here too
        resolved = [self._dim_expr(sm_used, d) for d in dims]
        dim_exprs = [f"{expr} as {out}" for expr, out in resolved]
        relation = (
            relation_for_model(sm_used.model)
            if relation_for_model
            else sm_used.model
        )
        select = ", ".join(dim_exprs + exprs)
        sql = f"select {select} from {relation}"
        if dims:
            sql += f" group by {', '.join(expr for expr, _ in resolved)}"
            sql += f" order by {', '.join(str(i + 1) for i in range(len(dims)))}"
        return sql
