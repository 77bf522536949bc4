"""Layered job configuration: defaults < config files < env < CLI.

Re-expresses the reference's provider/merge framework
(/root/reference/internal/config/loader.go:103-144 ``createLoader``,
``env_provider.go``, ``file_provider.go``, ``merger.go``) for the Spark
deployment model. Provider precedence is identical to the reference's
priority ordering (yaml 10 < toml 20 < json 30 < env 40,
loader.go:150-160), with explicit CLI overrides as the top layer (the
reference applies cobra flag bindings above the loader the same way).

Differences that are deliberate Spark idiom, not gaps:

* Config carriers are the repo's frozen dataclasses
  (:class:`~doppel_spark.config.FilterConfig`,
  :class:`~doppel_spark.config.NearDupConfig`) — validation happens in
  their constructors, which plays the reference's ``Validator`` role.
* YAML parsing is gated behind an import-try (PyYAML is not a
  dependency of this repo); a ``config.yaml`` present without the lib
  raises a clear error instead of being silently skipped.
* The merge is key-presence based: a layer overrides exactly the keys
  it explicitly sets (files/env/CLI only ever carry explicit keys,
  which is what the reference's non-zero-field ``defaultMerger``
  approximates with Go zero values).

File layout — one document with up to three sections::

    {
      "filter":  {"min_size": "1KB", "langs": ["en", "de"]},
      "neardup": {"bands": 16, "jaccard_threshold": 0.7},
      "job":     {"mode": "both", "output_format": "pretty"}
    }

Environment variables use the ``DOPPEL_SPARK_<SECTION>_<FIELD>`` shape
(≈ the reference's ``DOPPEL_`` prefix, env_provider.go:17-76), e.g.
``DOPPEL_SPARK_FILTER_MIN_SIZE=1KB``,
``DOPPEL_SPARK_NEARDUP_BANDS=16``,
``DOPPEL_SPARK_JOB_OUTPUT_FORMAT=yaml``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import warnings
from dataclasses import dataclass
from typing import Any, Mapping

from doppel_spark.config import (
    FilterConfig,
    FilterConfigError,
    NearDupConfig,
    get_preset,
    parse_size,
)

ENV_PREFIX = "DOPPEL_SPARK_"

#: size-string-accepting int fields (parse_size: "1.5MB", "10KiB", …)
_SIZE_FIELDS = {("filter", "min_size"), ("filter", "max_size")}

_JOB_DEFAULTS: dict[str, Any] = {
    "mode": "both",
    "output_format": "json",
    "preset": None,
    "simhash": False,
}
_JOB_CHOICES = {
    "mode": ("exact", "near", "both"),
    "output_format": ("json", "pretty", "yaml"),
}


@dataclass(frozen=True)
class JobConfig:
    """Fully merged + validated job configuration."""

    filter: FilterConfig
    neardup: NearDupConfig
    mode: str = "both"
    output_format: str = "json"
    preset: str | None = None
    simhash: bool = False
    #: (provider, section.key) pairs in application order — the audit
    #: trail the reference logs per provider (loader.go:117-131)
    provenance: tuple[tuple[str, str], ...] = ()


# --------------------------------------------------------------------------
# providers: each returns ({"filter": {...}, "neardup": {...}, "job": {...}},
# name) with only the keys it explicitly sets


def _file_provider(path: str) -> dict[str, dict[str, Any]] | None:
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        if path.endswith(".json"):
            doc = json.load(f)
        elif path.endswith(".toml"):
            import tomllib

            doc = tomllib.load(f)
        elif path.endswith((".yaml", ".yml")):
            try:
                import yaml  # type: ignore[import-not-found]
            except ImportError as e:
                raise FilterConfigError(
                    f"{path} exists but PyYAML is not installed; "
                    "use config.json or config.toml"
                ) from e
            doc = yaml.safe_load(f)
        else:
            raise FilterConfigError(f"unsupported config format: {path}")
    if doc is None:
        return {}
    if not isinstance(doc, dict):
        raise FilterConfigError(f"{path}: top level must be a mapping")
    unknown = set(doc) - {"filter", "neardup", "job"}
    if unknown:
        raise FilterConfigError(f"{path}: unknown sections {sorted(unknown)}")
    return {k: dict(v) for k, v in doc.items()}


def _env_provider(env: Mapping[str, str]) -> dict[str, dict[str, Any]]:
    """Prefixed env vars → sectioned config fragment.

    Unknown sections warn and are SKIPPED rather than failing the job —
    the environment is a shared namespace and a stray forward-compat
    deployment variable must not crash every run (mirrors the
    reference's env provider, which silently ignores unparseable keys,
    /root/reference/internal/config/env_provider.go; we keep a warning
    because silent is how typos go unnoticed). Unknown *fields* within
    a known section get the same treatment at merge time."""
    out: dict[str, dict[str, Any]] = {}
    for key, raw in env.items():
        if not key.startswith(ENV_PREFIX):
            continue
        rest = key[len(ENV_PREFIX):]
        for section in ("FILTER", "NEARDUP", "JOB"):
            if rest.startswith(section + "_"):
                field_name = rest[len(section) + 1:].lower()
                out.setdefault(section.lower(), {})[field_name] = raw
                break
        else:
            warnings.warn(
                f"ignoring unrecognized env var {key}: expected "
                f"{ENV_PREFIX}{{FILTER|NEARDUP|JOB}}_<FIELD>",
                RuntimeWarning, stacklevel=2)
    return out


# --------------------------------------------------------------------------
# coercion + merge


def _coerce(section: str, field_name: str, value: Any, target_type: type) -> Any:
    """Coerce a raw (possibly string, from env) value to the field type.

    Mirrors env_provider.go:78-99 (string/int/bool loaders) plus the
    size-literal and csv-list conveniences this repo's fields need.
    """
    if (section, field_name) in _SIZE_FIELDS and isinstance(value, str):
        return parse_size(value)
    if target_type is bool:
        if isinstance(value, bool):
            return value
        return str(value).strip().lower() in ("1", "true", "yes", "on")
    if target_type is int and not isinstance(value, int):
        return int(str(value).strip())
    if target_type is float and not isinstance(value, float):
        return float(str(value).strip())
    if target_type is tuple:
        if isinstance(value, str):
            return tuple(p.strip() for p in value.split(",") if p.strip())
        return tuple(value)
    return value


def _dataclass_field_types(cls: type) -> dict[str, type]:
    out = {}
    for f in dataclasses.fields(cls):
        t = f.type if isinstance(f.type, type) else None
        if t is None:  # string annotation ("int", "tuple[str, ...]", …)
            name = str(f.type)
            t = {"int": int, "float": float, "bool": bool, "str": str}.get(
                name.split("|")[0].strip(), tuple if "tuple" in name else str)
        out[f.name] = t
    return out


def load_job_config(
    config_dir: str | None = None,
    env: Mapping[str, str] | None = None,
    cli: Mapping[str, Mapping[str, Any]] | None = None,
) -> JobConfig:
    """Merge all providers (low → high priority) and validate.

    ``cli`` has the same sectioned shape as a config file and should
    carry only the flags the user explicitly passed.
    """
    env = os.environ if env is None else env
    layers: list[tuple[str, dict[str, dict[str, Any]]]] = []
    if config_dir:
        # reference order: yaml lowest, then toml, then json (loader.go:150-160)
        for fname in ("config.yaml", "config.yml", "config.toml", "config.json"):
            doc = _file_provider(os.path.join(config_dir, fname))
            if doc is not None:
                layers.append((fname, doc))
    layers.append(("env", _env_provider(env)))
    if cli:
        layers.append(("cli", {k: dict(v) for k, v in cli.items()}))

    filter_types = _dataclass_field_types(FilterConfig)
    neardup_types = _dataclass_field_types(NearDupConfig)

    merged: dict[str, dict[str, Any]] = {"filter": {}, "neardup": {}, "job": {}}
    provenance: list[tuple[str, str]] = []
    for name, doc in layers:
        for section, fields in doc.items():
            types = {"filter": filter_types, "neardup": neardup_types,
                     "job": {k: type(v) if v is not None else str
                             for k, v in _JOB_DEFAULTS.items()}}[section]
            for field_name, value in fields.items():
                if field_name not in types:
                    if name == "env":  # warn-and-skip: see _env_provider
                        warnings.warn(
                            f"ignoring unknown env config key "
                            f"{section}.{field_name}",
                            RuntimeWarning, stacklevel=2)
                        continue
                    raise FilterConfigError(
                        f"{name}: unknown key {section}.{field_name}")
                merged[section][field_name] = _coerce(
                    section, field_name, value, types[field_name])
                provenance.append((name, f"{section}.{field_name}"))

    job = dict(_JOB_DEFAULTS, **merged["job"])
    for key, choices in _JOB_CHOICES.items():
        if job[key] not in choices:
            raise FilterConfigError(f"job.{key} must be one of {choices}")

    # a named preset supplies the filter BASE; explicit filter keys from
    # any layer override it field-by-field (presets.go:6-33 semantics)
    base = get_preset(job["preset"]) if job["preset"] else FilterConfig()
    fc = dataclasses.replace(base, **merged["filter"])
    ncfg = NearDupConfig(**merged["neardup"])  # validates in __post_init__
    ncfg.rows_per_band  # noqa: B018 — triggers bands-divisibility check

    return JobConfig(filter=fc, neardup=ncfg, mode=job["mode"],
                     output_format=job["output_format"], preset=job["preset"],
                     simhash=bool(job["simhash"]),
                     provenance=tuple(provenance))
