"""YAML pipeline config (reference S1/S2: ``src/wins_transform_staging.py:26-78``,
``src/app.yml``).

The reference drives its run from a YAML mapping of item-ids, paths and email
settings. We keep the same shape: a YAML file maps logical table names to
input paths, declares the lookup table, and the staging (publish) directory.
Credentials support both reference paths: env vars (``:77-78``) via the
``${NAME}`` indirection, and the "dual environment" INI file (``:69-74``,
ConfigParser section lookup) via :func:`load_credentials`, with the same
precedence — env wins when present, INI is the fallback.
"""

from __future__ import annotations

import configparser
import os
import re
from dataclasses import dataclass, field
from typing import Any

try:
    import yaml
except ImportError:  # pragma: no cover - pyyaml ships with pyspark images
    yaml = None

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _resolve_env(value: Any) -> Any:
    def sub(m: "re.Match[str]") -> str:
        # an UNSET variable must fail loudly, not substitute "" — an empty
        # staging_dir silently publishes to cwd-relative paths and an empty
        # password "succeeds" into an auth error far from the real cause
        name = m.group(1)
        if name not in os.environ:
            raise KeyError(
                f"config references ${{{name}}} but {name} is not set in the "
                "environment"
            )
        return os.environ[name]

    if isinstance(value, str):
        return _ENV_RE.sub(sub, value)
    if isinstance(value, dict):
        return {k: _resolve_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve_env(v) for v in value]
    return value


@dataclass
class PipelineConfig:
    """Mirrors the keys the reference consumes from app.yml
    (``src/wins_transform_staging.py:37-52``): working dir, staging dir,
    source tables, lookup table."""

    tables: dict[str, str] = field(default_factory=dict)  # name -> input path
    lookup: dict[str, str] = field(default_factory=dict)  # name -> input path
    staging_dir: str = ""
    options: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_yaml(cls, path: str) -> "PipelineConfig":
        if yaml is None:
            raise RuntimeError("pyyaml not available")
        with open(path) as fh:
            raw = _resolve_env(yaml.safe_load(fh)) or {}
        return cls(
            tables=raw.get("tables", {}),
            lookup=raw.get("lookup", {}),
            staging_dir=raw.get("staging_dir", ""),
            options=raw.get("options", {}),
        )


def load_credentials(
    ini_path: str | None = None,
    section: str = "bcmaphub",
    env_user: str = "MAPHUB_USER",
    env_pass: str = "MAPHUB_PASS",
) -> tuple[str, str]:
    """Resolve (user, password) with the reference's dual-environment
    precedence (``src/wins_transform_staging.py:69-78``): environment
    variables win when BOTH are present; a half-set environment (user
    exported, password not — e.g. leaked from another tool) falls through
    to the INI instead of raising a bare KeyError and bricking the
    documented fallback. Raises KeyError/configparser errors exactly where
    the reference would assert."""
    if env_user in os.environ and env_pass in os.environ:
        return os.environ[env_user], os.environ[env_pass]
    if ini_path is None:
        raise KeyError(
            f"credentials not established: set {env_user}/{env_pass} or pass ini_path"
        )
    parser = configparser.ConfigParser()
    if not parser.read(ini_path):
        raise FileNotFoundError(ini_path)
    return parser.get(section, "user"), parser.get(section, "password")
