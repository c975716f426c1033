"""P6 connection security validation + S15 benchmark stdout parser."""

from __future__ import annotations

from sql_graph_visualizer_spark.sources.bench_parser import (
    metrics_frame,
    parse_sysbench_output,
)
from sql_graph_visualizer_spark.sources.jdbc import JdbcConfig, JdbcSource
from sql_graph_visualizer_spark.sources.security import (
    SecurityPolicy,
    check_permissions,
    validate_connection,
)

URL = "jdbc:mysql://{h}:3306/db"


def test_weak_password_is_critical_risk():
    r = validate_connection(URL.format(h="db.internal"), "app", "short")
    assert not r.is_valid
    assert r.security_level == "CRITICAL_RISK"
    assert not r.validations["credentials_security"].passed
    assert any("strong passwords" in rec for rec in r.recommendations)
    # prefix-weak even when long (reference's pattern list)
    r2 = validate_connection(URL.format(h="db.internal"), "app", "password123456")
    assert not r2.is_valid


def test_default_credentials_detected():
    # every reference default combo is also prefix-weak, and the weak
    # check runs first (same if/else-if order as the reference) — the
    # observable contract is: invalid + CRITICAL either way
    r = validate_connection(URL.format(h="db.internal"), "Root", "Password")
    assert not r.is_valid
    assert r.validations["credentials_security"].severity == "CRITICAL"
    assert r.security_level == "CRITICAL_RISK"


def test_production_host_blocked_unless_allowed():
    r = validate_connection(URL.format(h="mysql-prod-1.corp"), "app", "S3cure#Pass!")
    assert not r.is_valid and r.security_level == "HIGH_RISK"
    ok = validate_connection(
        URL.format(h="mysql-prod-1.corp"), "app", "S3cure#Pass!",
        SecurityPolicy(allow_production_connections=True),
    )
    assert ok.is_valid and ok.security_level == "HIGH"


def test_policy_allowed_hosts_and_forbidden_patterns():
    pol = SecurityPolicy(allowed_hosts=("*.corp.example",), forbidden_patterns=("*.public.*",))
    assert validate_connection(URL.format(h="db1.corp.example"), "app", "S3cure#Pass!", pol).is_valid
    r = validate_connection(URL.format(h="db1.other.example"), "app", "S3cure#Pass!", pol)
    assert not r.is_valid
    assert "not in allowed hosts" in r.validations["security_policies"].message
    r2 = validate_connection(
        URL.format(h="db.public.example"), "app", "S3cure#Pass!",
        SecurityPolicy(forbidden_patterns=("*.public.*",)),
    )
    assert not r2.is_valid and "forbidden pattern" in r2.validations["security_policies"].message


def test_localhost_is_medium_severity_note():
    r = validate_connection(URL.format(h="localhost"), "app", "S3cure#Pass!")
    assert r.is_valid
    assert r.validations["host_security"].severity == "MEDIUM"


def test_check_permissions_flags_write_capable_user(spark):
    calls = []

    def reader(options):
        calls.append(options["dbtable"])
        return spark.createDataFrame(
            [("'app'@'%'", "SELECT"), ("'app'@'%'", "INSERT")],
            "grantee string, privilege_type string",
        )

    s = JdbcSource(spark, JdbcConfig(url="jdbc:mysql://h/db"), reader=reader)
    privs, has_write = check_permissions(s)
    assert privs == ["INSERT", "SELECT"]
    assert has_write is True  # the reference flags INSERT/UPDATE/DELETE/DROP
    assert "information_schema.user_privileges" in calls[-1]


SYSBENCH_OUT = """
SQL statistics:
    queries performed:
        read:                            140126
        write:                           40036
    transactions:                        10009  (1000.38 transactions/sec)
    queries:                             200180 (20014.56 queries/sec)
    reads/s:                             14009.19
    writes/s:                            4003.82
    errors/s:                            0.10

Latency (ms):
         min:                                    2.61
         avg:                                    9.99
         max:                                   57.23
         95th percentile:                       17.32
         99th percentile:                       28.67
"""


def test_parse_sysbench_output_extracts_all_metrics():
    m = parse_sysbench_output(SYSBENCH_OUT)
    assert m.transactions_per_sec == 1000.38
    assert m.queries_per_second == 20014.56
    assert m.read_qps == 14009.19
    assert m.write_qps == 4003.82
    assert m.error_rate == 0.10
    assert (m.min_latency, m.average_latency, m.max_latency) == (2.61, 9.99, 57.23)
    assert (m.percentile_95, m.percentile_99) == (17.32, 28.67)


def test_parse_missing_metrics_default_to_zero():
    m = parse_sysbench_output("no metrics here\navg: 0\n")
    assert m.queries_per_second == 0.0
    assert m.average_latency == 0.0  # zero-valued match ignored, reference's > 0 guard


def test_metrics_frame_row(spark):
    m = parse_sysbench_output(SYSBENCH_OUT)
    df = metrics_frame(spark, m, run_id="oltp_rw_1")
    row = df.collect()[0]
    assert row.run_id == "oltp_rw_1"
    assert row.queries_per_second == 20014.56
    assert df.columns[0] == "run_id" and len(df.columns) == 11
