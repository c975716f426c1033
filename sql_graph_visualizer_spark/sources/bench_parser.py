"""sysbench / pgbench stdout parser (SURVEY §2.1 S15).

The reference shells out to sysbench/pgbench and regex-extracts the
metrics block from stdout (``internal/application/services/performance/
sysbench_adapter.go:414-505``). The engine's own throughput is measured
directly by ``bench.py``, but a user of the reference also feeds
EXTERNAL benchmark output into the monitoring pipeline — this module
ports that parsing surface so those metrics land in the same lineage /
alert tables as the engine's.

Pure-Python parse (stdout is one small text blob — there is nothing to
distribute); the result enters Spark as a one-row DataFrame so the
downstream alert ladder / regression windows treat external benchmarks
exactly like engine epochs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, fields

from pyspark.sql import DataFrame, SparkSession

# field -> extraction regex, exactly the reference's pattern set
# (sysbench_adapter.go:425-488); first capture group is the value
_PATTERNS: dict[str, str] = {
    "queries_per_second": r"([0-9]+\.?[0-9]*)\s*queries/sec",
    "transactions_per_sec": r"([0-9]+\.?[0-9]*)\s*transactions/sec",
    "average_latency": r"avg:\s*([0-9]+\.?[0-9]*)",
    "min_latency": r"min:\s*([0-9]+\.?[0-9]*)",
    "max_latency": r"max:\s*([0-9]+\.?[0-9]*)",
    "percentile_95": r"95th percentile:\s*([0-9]+\.?[0-9]*)",
    "percentile_99": r"99th percentile:\s*([0-9]+\.?[0-9]*)",
    "read_qps": r"reads/s:\s*([0-9]+\.?[0-9]*)",
    "write_qps": r"writes/s:\s*([0-9]+\.?[0-9]*)",
    "error_rate": r"errors/s:\s*([0-9]+\.?[0-9]*)",
}


@dataclass
class BenchmarkMetrics:
    """ports.PerformanceMetrics analogue — zero means 'not found', the
    reference's convention (extractFloat returns 0 on no match)."""

    queries_per_second: float = 0.0
    transactions_per_sec: float = 0.0
    average_latency: float = 0.0
    min_latency: float = 0.0
    max_latency: float = 0.0
    percentile_95: float = 0.0
    percentile_99: float = 0.0
    read_qps: float = 0.0
    write_qps: float = 0.0
    error_rate: float = 0.0


def parse_sysbench_output(output: str) -> BenchmarkMetrics:
    """Line-oriented regex extraction, mirroring the reference's
    parseOutput: last matching line wins per metric, zero-valued matches
    are ignored (``> 0`` guard in the reference)."""
    m = BenchmarkMetrics()
    for raw in output.splitlines():
        line = raw.strip()
        for name, pattern in _PATTERNS.items():
            found = re.search(pattern, line)
            if found:
                value = float(found.group(1))
                if value > 0:
                    setattr(m, name, value)
    return m


def metrics_frame(spark: SparkSession, m: BenchmarkMetrics, run_id: str) -> DataFrame:
    """One-row DataFrame for the lineage/alert pipeline (the reference
    pushes the parsed metrics into its monitoring channel)."""
    cols = [f.name for f in fields(BenchmarkMetrics)]
    row = tuple([run_id] + [float(getattr(m, c)) for c in cols])
    schema = "run_id string, " + ", ".join(f"{c} double" for c in cols)
    return spark.createDataFrame([row], schema)
