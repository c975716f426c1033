"""Connection security validation (SURVEY §2.2 P6 — the last uncovered row).

The reference validates a DB connection before extraction: host/port/
credential checks, security policies (allowed hosts, forbidden
patterns), an overall security-level ladder
(``internal/application/services/security_validation_service.go:40-464``),
and a grants probe that flags write-capable users
(``mysql/repository.go:194-219``). This is control-plane logic — pure
Python over the connection config — so the Spark-first restatement keeps
it off the data path entirely: validate once, then hand the config to
``JdbcSource``.

Differences from the reference, on purpose:
- network reachability / SSL certificate-file checks are environment
  probes, not config validation — out of scope for a data engine and
  unavailable in-sandbox;
- the grants probe uses ``information_schema.user_privileges`` (a real
  relation Spark's JDBC source can read as a subquery) instead of
  ``SHOW GRANTS`` (a statement, not a relation) — same signal, same
  write-permission classification.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import urlparse

# host patterns the reference treats as production
# (security_validation_service.go:343-359)
_PROD_PATTERNS = (r".*prod.*", r".*production.*", r".*live.*", r".*master.*")
_LOCALHOSTS = ("localhost", "127.0.0.1", "::1", "0.0.0.0")
# weak-password prefixes (security_validation_service.go:381-404)
_WEAK_PREFIXES = (r"^password", r"^123", r"^admin", r"^root", r"^test")
# default credential combos (security_validation_service.go:406-430)
_DEFAULT_COMBOS = {
    ("root", "root"), ("root", "password"), ("root", "admin"),
    ("admin", "admin"), ("admin", "password"), ("test", "test"),
}
# privileges that make a connection write-capable (repository.go:208-215)
_WRITE_PRIVS = ("INSERT", "UPDATE", "DELETE", "DROP")


@dataclass(frozen=True)
class SecurityPolicy:
    """config.yml ``security:`` block analogue (SecurityConfig)."""

    allow_production_connections: bool = False
    allowed_hosts: tuple[str, ...] = ()
    forbidden_patterns: tuple[str, ...] = ()


@dataclass
class ValidationCheck:
    check_name: str
    passed: bool
    severity: str  # LOW | MEDIUM | HIGH | CRITICAL
    message: str


@dataclass
class SecurityValidationResult:
    is_valid: bool = True
    security_level: str = "HIGH"
    validations: dict[str, ValidationCheck] = field(default_factory=dict)
    recommendations: list[str] = field(default_factory=list)


def _host_port(jdbc_url: str) -> tuple[str, int]:
    """host/port from a ``jdbc:mysql://host:port/db`` url."""
    parsed = urlparse(jdbc_url[len("jdbc:"):] if jdbc_url.startswith("jdbc:") else jdbc_url)
    return parsed.hostname or "", parsed.port or 3306


def _is_production_host(host: str) -> bool:
    h = host.lower()
    return any(re.match(p, h) for p in _PROD_PATTERNS)


def _is_weak_password(password: str) -> bool:
    if len(password) < 8:
        return True
    p = password.lower()
    return any(re.match(pat, p) for pat in _WEAK_PREFIXES)


def _matches(host: str, pattern: str) -> bool:
    """Glob-ish host pattern (``*.corp.example`` style), per the
    reference's matchesHostPattern."""
    rx = "^" + re.escape(pattern).replace(r"\*", ".*") + "$"
    return re.match(rx, host, re.IGNORECASE) is not None


def validate_connection(
    url: str, user: str, password: str, policy: SecurityPolicy | None = None
) -> SecurityValidationResult:
    """The reference's ValidateConnectionSecurity pipeline: parameter
    checks → policy checks → security-level ladder. Call before handing
    the config to ``JdbcSource``; a ``is_valid=False`` result means the
    extraction must not run."""
    policy = policy or SecurityPolicy()
    host, port = _host_port(url)
    result = SecurityValidationResult()

    # -- host security (HIGH)
    if _is_production_host(host) and not policy.allow_production_connections:
        check = ValidationCheck(
            "host_security", False, "HIGH",
            "Production database connections are not allowed",
        )
        result.is_valid = False
    elif host in _LOCALHOSTS:
        check = ValidationCheck(
            "host_security", True, "MEDIUM",
            "Localhost connection detected - ensure proper authentication",
        )
    else:
        check = ValidationCheck("host_security", True, "HIGH", "Host validation passed")
    result.validations["host_security"] = check

    # -- port security (LOW/MEDIUM informational)
    std = port in (3306, 3307) or "postgresql" in url and port == 5432
    result.validations["port_security"] = ValidationCheck(
        "port_security", True,
        "MEDIUM" if std else "LOW",
        "Standard port in use" if std else "Non-standard port detected",
    )

    # -- credentials (CRITICAL)
    if _is_weak_password(password):
        result.validations["credentials_security"] = ValidationCheck(
            "credentials_security", False, "CRITICAL",
            "Weak password detected - use strong passwords for production",
        )
        result.is_valid = False
        result.recommendations.append(
            "Use strong passwords with mixed case, numbers, and special characters"
        )
    elif (user.lower(), password.lower()) in _DEFAULT_COMBOS:
        result.validations["credentials_security"] = ValidationCheck(
            "credentials_security", False, "CRITICAL", "Default credentials detected",
        )
        result.is_valid = False
        result.recommendations.append("Change default database credentials immediately")
    else:
        result.validations["credentials_security"] = ValidationCheck(
            "credentials_security", True, "CRITICAL", "Credentials validation passed",
        )

    # -- policy compliance (MEDIUM)
    violations: list[str] = []
    if policy.allowed_hosts and not any(_matches(host, p) for p in policy.allowed_hosts):
        violations.append("Host not in allowed hosts list")
    for pattern in policy.forbidden_patterns:
        if _matches(host, pattern):
            violations.append(f"Host matches forbidden pattern: {pattern}")
    result.validations["security_policies"] = ValidationCheck(
        "security_policies", not violations, "MEDIUM",
        "; ".join(violations) if violations else "Security policy compliance verified",
    )
    if violations:
        result.is_valid = False

    # -- level ladder (calculateSecurityLevel)
    critical = sum(
        1 for v in result.validations.values() if not v.passed and v.severity == "CRITICAL"
    )
    high = sum(
        1 for v in result.validations.values() if not v.passed and v.severity == "HIGH"
    )
    if critical:
        result.security_level = "CRITICAL_RISK"
    elif high:
        result.security_level = "HIGH_RISK"
    elif result.recommendations:
        result.security_level = "MEDIUM"
    else:
        result.security_level = "HIGH"
    return result


def check_permissions(source) -> tuple[list[str], bool]:
    """The reference's grants probe (mysql/repository.go:194-219): list
    the current user's privileges and flag write capability — an
    extraction pipeline should run read-only. Reads
    ``information_schema.user_privileges`` through the source's
    (injectable) JDBC reader."""
    q = "SELECT grantee, privilege_type FROM information_schema.user_privileges"
    opts = source.config.options()
    opts["dbtable"] = f"({q}) AS sgv_grants"
    rows = source._reader(opts).collect()
    privileges = sorted({str(r[1]).upper() for r in rows})
    has_write = any(p in privileges for p in _WRITE_PRIVS)
    return privileges, has_write
