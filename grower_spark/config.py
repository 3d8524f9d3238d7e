"""Pipeline configuration: YAML schema identical to the reference's.

Reference: /root/reference/config/config.go:11-59 — two sections:

``nginx``:
    log_type, log_time_format, log_time_rewrite, log_custom_casts_enable,
    log_custom_casts (field -> ClickHouse type name), log_format,
    log_remove_hyphen
``scheme``:
    logs_table (target table), columns (target column -> nginx variable).

Deliberate divergences from the reference (documented per SURVEY.md §7):

- Column order is the YAML declaration order (deterministic).  The reference
  iterates a Go map (config/config.go:31-37) so its column order is
  nondeterministic per process; it only works because inserts name their
  columns.
- ``log_remove_hyphen`` and ``log_time_rewrite`` are dead config in the
  reference (parsed but never read; caster.go:73-75 scrubs hyphens
  unconditionally and caster.go:293-296 rewrites empty times to now()
  unconditionally).  We accept and ignore them the same way, and apply both
  behaviors unconditionally for parity.
- ``log_type: json`` is a stub in the reference (template.go:39-41 returns
  nil); here it is implemented (plans/pipeline.py uses ``from_json``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

try:
    import yaml
except ImportError:  # pragma: no cover - PyYAML is available in this env
    yaml = None

DEFAULT_TIME_FORMAT = "02/Jan/2006:15:04:05 -0700"


class ConfigError(ValueError):
    pass


@dataclass
class NginxConfig:
    log_format: str = ""
    log_type: str = "csv"
    log_time_format: str = DEFAULT_TIME_FORMAT
    log_time_rewrite: bool = True  # accepted, unconditional (see module doc)
    log_custom_casts_enable: bool = False
    log_custom_casts: dict[str, str] = field(default_factory=dict)
    log_remove_hyphen: bool = True  # accepted, unconditional (see module doc)


@dataclass
class SchemeConfig:
    logs_table: str = ""
    # target column name -> nginx variable name, in YAML declaration order
    columns: dict[str, str] = field(default_factory=dict)

    def column_names(self) -> list[str]:
        return list(self.columns.keys())


@dataclass
class PipelineConfig:
    nginx: NginxConfig
    scheme: SchemeConfig

    @staticmethod
    def from_dict(raw: dict) -> "PipelineConfig":
        nginx_raw = dict(raw.get("nginx") or {})
        scheme_raw = dict(raw.get("scheme") or {})
        nginx = NginxConfig(
            log_format=nginx_raw.get("log_format", ""),
            log_type=nginx_raw.get("log_type", "csv"),
            log_time_format=nginx_raw.get("log_time_format") or DEFAULT_TIME_FORMAT,
            log_time_rewrite=bool(nginx_raw.get("log_time_rewrite", True)),
            log_custom_casts_enable=bool(nginx_raw.get("log_custom_casts_enable", False)),
            log_custom_casts=dict(nginx_raw.get("log_custom_casts") or {}),
            log_remove_hyphen=bool(nginx_raw.get("log_remove_hyphen", True)),
        )
        scheme = SchemeConfig(
            logs_table=scheme_raw.get("logs_table", ""),
            columns=dict(scheme_raw.get("columns") or {}),
        )
        cfg = PipelineConfig(nginx=nginx, scheme=scheme)
        cfg.validate()
        return cfg

    @staticmethod
    def from_yaml(path: str) -> "PipelineConfig":
        if yaml is None:
            raise ConfigError("PyYAML is not available; use from_dict")
        with open(path, encoding="utf-8") as fh:
            raw = yaml.safe_load(fh)
        if not isinstance(raw, dict):
            raise ConfigError(f"config {path!r} is not a mapping")
        return PipelineConfig.from_dict(raw)

    def validate(self) -> None:
        # Mirrors config/config.go:49-57: table and columns must be non-empty.
        if not self.scheme.logs_table:
            raise ConfigError("scheme.logs_table is required")
        if not self.scheme.columns:
            raise ConfigError("scheme.columns must contain at least one column")
        if not self.nginx.log_format and self.nginx.log_type != "json":
            raise ConfigError("nginx.log_format is required for csv log_type")
