"""Semantic layer: declarative metrics compiled to Spark SQL.

Reference surface (SURVEY.md §2.6): ``SemanticModel`` with entities/
dimensions/measures (``artifacts/resources/v1/semantic_model.py:36-265``,
measure aggs ``:141-160``) and ``Metric`` with
``type ∈ {simple, ratio, cumulative, derived, conversion}``
(``artifacts/resources/v1/metric.py:32-113``). The reference only
parses/validates these (MetricFlow executes them); here simple, ratio,
and derived metrics compile directly to Spark SQL — the §7 Phase-3
plan. Cumulative/conversion raise NotImplementedError explicitly.
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
        return AGG_SQL[self.agg].format(e=self.expr, p=self.percentile or 0.5)


@dataclass
class SemanticModel:
    name: str
    model: str  # relation or ref-able name resolved by caller
    dimensions: dict[str, str] = field(default_factory=dict)  # name -> expr
    measures: dict[str, Measure] = field(default_factory=dict)

    @classmethod
    def from_yaml(cls, spec: dict) -> "SemanticModel":
        dims = {
            d["name"]: d.get("expr", d["name"])
            for d in spec.get("dimensions", []) or []
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
        return cls(
            name=spec["name"], model=spec["model"], dimensions=dims,
            measures=measures,
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

    @classmethod
    def from_yaml(cls, spec: dict) -> "Metric":
        tp = spec.get("type_params", {}) or {}
        return cls(
            name=spec["name"],
            type=spec["type"],
            measure=tp.get("measure", spec.get("measure")),
            numerator=tp.get("numerator", spec.get("numerator")),
            denominator=tp.get("denominator", spec.get("denominator")),
            expr=tp.get("expr", spec.get("expr")),
            filter=spec.get("filter"),
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

    def _metric_select_expr(self, metric: Metric) -> tuple[str, SemanticModel]:
        if metric.type == "simple":
            sm, measure = self._find_measure(metric.measure)
            expr = measure.to_sql()
            if metric.filter:
                # filtered measure: agg over CASE
                inner = re.sub(
                    r"\{\{\s*dimension\(['\"](\w+)['\"]\)\s*\}\}",
                    lambda m: sm.dimensions.get(m.group(1), m.group(1)),
                    metric.filter,
                )
                expr = AGG_SQL[measure.agg].format(
                    e=f"case when {inner} then {measure.expr} end",
                    p=measure.percentile or 0.5,
                )
            return expr, sm
        if metric.type == "ratio":
            sm_n, num = self._find_measure(metric.numerator)
            sm_d, den = self._find_measure(metric.denominator)
            if sm_n.name != sm_d.name:
                raise CompilationError(
                    "ratio metric across semantic models not supported"
                )
            return (
                f"cast({num.to_sql()} as double) / "
                f"nullif(cast({den.to_sql()} as double), 0)",
                sm_n,
            )
        if metric.type == "derived":
            # expr references other metric names
            expr = metric.expr
            sm_ref = None
            for name, sub in self.metrics.items():
                if sub.name == metric.name:
                    continue
                if re.search(rf"\b{re.escape(name)}\b", expr or ""):
                    sub_expr, sm_ref = self._metric_select_expr(sub)
                    expr = re.sub(rf"\b{re.escape(name)}\b", f"({sub_expr})", expr)
            if sm_ref is None:
                raise CompilationError(
                    f"derived metric '{metric.name}' references no known metric"
                )
            return expr, sm_ref
        raise NotImplementedError(
            f"metric type '{metric.type}' is parsed but not compilable yet "
            f"(reference executes it in MetricFlow)"
        )

    def compile_query(
        self,
        metric_names: list[str],
        dimensions: list[str] | None = None,
        relation_for_model=None,
    ) -> str:
        """Compile a metrics query: SELECT dims..., metric_exprs...
        FROM semantic_model GROUP BY dims."""
        exprs = []
        sm_used: SemanticModel | None = None
        for name in metric_names:
            metric = self.metrics.get(name)
            if metric is None:
                raise CompilationError(f"unknown metric '{name}'")
            expr, sm = self._metric_select_expr(metric)
            if sm_used is not None and sm.name != sm_used.name:
                raise CompilationError(
                    "metrics from multiple semantic models in one query "
                    "are not supported"
                )
            sm_used = sm
            exprs.append(f"{expr} as {name}")
        dims = dimensions or []
        dim_exprs = []
        for d in dims:
            if d not in sm_used.dimensions:
                raise CompilationError(f"unknown dimension '{d}'")
            dim_exprs.append(f"{sm_used.dimensions[d]} as {d}")
        relation = (
            relation_for_model(sm_used.model)
            if relation_for_model
            else sm_used.model
        )
        select = ", ".join(dim_exprs + exprs)
        sql = f"select {select} from {relation}"
        if dims:
            sql += f" group by {', '.join(sm_used.dimensions[d] for d in dims)}"
            sql += f" order by {', '.join(str(i + 1) for i in range(len(dims)))}"
        return sql
