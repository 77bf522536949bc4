"""Report sinks — ≈ the reference's output formatters, table-first.

The reference renders a ``DuplicateReport`` as pretty text / JSON /
YAML (/root/reference/internal/output/). Here the primary sink is
**tables** (groups/clusters/metrics parquet — at 10¹² docs a report is
a dataset, not a document); the JSON/pretty forms are driver-side
renderings of the aggregated stats for humans and CI artifacts.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame

from doppel_spark.config import format_bytes
from doppel_spark.operators.exact import ExactDupResult


@dataclass
class DuplicateReport:
    """≈ model.DuplicateReport (/root/reference/internal/model/model.go:36-48)."""

    scan_date: str
    stats: dict
    total_wasted_space: int
    n_groups: int

    def to_json(self) -> str:
        """2-space-indented JSON ≈ json_formatter.go:19-24."""
        return json.dumps(
            {
                "scan_date": self.scan_date,
                "stats": self.stats,
                "total_wasted_space": self.total_wasted_space,
                "duplicate_groups": self.n_groups,
            },
            indent=2,
        )

    def to_yaml(self) -> str:
        """YAML form ≈ yaml_formatter.go:19-26. The report is a flat
        scalar mapping plus one nested stats block, so it is emitted
        directly — no YAML library dependency for a document this
        shape (strings here are timestamps/identifiers, never
        YAML-special)."""

        def _scalar(v) -> str:
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, (int, float)):
                return str(v)
            return f"'{v}'" if v is not None else "null"

        lines = [f"scan_date: {_scalar(self.scan_date)}", "stats:"]
        lines += [f"  {k}: {_scalar(v)}" for k, v in self.stats.items()]
        lines.append(f"total_wasted_space: {self.total_wasted_space}")
        lines.append(f"duplicate_groups: {self.n_groups}")
        return "\n".join(lines) + "\n"

    def pretty(self) -> str:
        """Human summary ≈ pretty_formatter.go:24-149 (incl. the docs/sec
        processing-rate line, pretty_formatter.go:141-146)."""
        s = self.stats
        lines = [
            "Duplicate Detection Report",
            f"  scan date:        {self.scan_date}",
            f"  total docs:       {s['total_docs']}",
            f"  processed docs:   {s['processed_docs']}",
            f"  duplicate groups: {s['duplicate_groups']}",
            f"  duplicate docs:   {s['duplicate_docs']}",
            f"  wasted space:     {format_bytes(self.total_wasted_space)}",
        ]
        if s.get("duration_s"):
            rate = s["processed_docs"] / s["duration_s"]
            lines.append(f"  processing rate:  {rate:.1f} docs/sec")
        return "\n".join(lines)


#: formatter registry ≈ InitFormatters + name dispatch
#: (/root/reference/internal/output/formatter.go:27-94); same three
#: registered formats as the reference (json/pretty/yaml)
FORMATTERS: dict[str, str] = {"json": "to_json", "pretty": "pretty",
                              "yaml": "to_yaml"}


def render(report: DuplicateReport, output_format: str = "json") -> str:
    """Dispatch a report through the named formatter
    (≈ FormatterRegistry.Format, formatter.go:71-94; unknown format is
    a build-time error like formatter.go:52-60)."""
    try:
        method = FORMATTERS[output_format]
    except KeyError:
        raise ValueError(
            f"unknown output format {output_format!r}; have {sorted(FORMATTERS)}"
        ) from None
    return getattr(report, method)()


def build_report(result: ExactDupResult, duration_s: float | None = None) -> DuplicateReport:
    m = result.metrics().collect()[0].asDict()
    if duration_s is not None:
        m["duration_s"] = round(duration_s, 3)
    return DuplicateReport(
        scan_date=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        stats=m,
        total_wasted_space=int(m["total_wasted_space"]),
        n_groups=int(m["duplicate_groups"]),
    )


def write_tables(out_dir: str, **tables: DataFrame) -> None:
    """Write each named DataFrame to ``{out_dir}/{name}`` as parquet."""
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}")
