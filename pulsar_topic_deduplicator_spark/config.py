"""Engine configuration — the reference's env-var surface, typed.

The reference configures everything through environment variables with
fail-fast validation (``src/config.ts:274-279``; readers at ``:44-98``).
The engine keeps the same variable names and semantics so an operator of
the reference can bring their deployment config across unchanged:

| env var | reference | semantics |
|---|---|---|
| ``DEDUPLICATION_WINDOW_IN_SECONDS`` | ``src/config.ts:132-140`` | non-negative FLOAT seconds (not int), default 3600 |
| ``CACHE_WINDOW_IN_SECONDS`` | ``src/config.ts:100-111`` | non-negative float seconds, default 172800 (48 h); ≤ 0 disables warm-up (``src/cacheBuilding.ts:71-77``) |
| ``DEDUPLICATION_IGNORED_PROPERTIES`` | ``src/config.ts:113-130`` | JSON array of strings |
| ``CACHE_REBUILD_DISABLE_SEEK`` | ``src/config.ts:94-98`` | boolean ("true"/"false") |
| ``HEALTH_CHECK_PORT`` | ``src/config.ts:216-222`` | int port, default 8080 |
| ``PULSAR_OAUTH2_ISSUER_URL`` / ``_KEY_PATH`` / ``_AUDIENCE`` | ``src/config.ts:142-168`` | all-or-none group: set none (anonymous) or all three (client-credentials) |

Spark-specific additions use the ``SPARK_GRAFT_*`` prefix (CPUs, sf dir,
driver memory) and are read in ``session.py`` / ``bench.py``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field


class ConfigError(ValueError):
    """Fail-fast configuration error (reference throws on invalid env,
    ``src/config.ts:44-63``)."""


def _read_float_nonneg(env: dict, name: str, default: float) -> float:
    raw = env.get(name)
    if raw is None:
        return default
    try:
        v = float(raw)
    except ValueError as exc:
        raise ConfigError(f"{name} must parse as a float, got {raw!r}") from exc
    if v < 0:
        raise ConfigError(f"{name} must be non-negative, got {v}")
    return v


def _read_bool(env: dict, name: str, default: bool) -> bool:
    raw = env.get(name)
    if raw is None:
        return default
    if raw not in ("true", "false"):
        raise ConfigError(f"{name} must be 'true' or 'false', got {raw!r}")
    return raw == "true"


def _read_str_list(env: dict, name: str, default: tuple[str, ...]) -> tuple[str, ...]:
    raw = env.get(name)
    if raw is None:
        return default
    try:
        parsed = json.loads(raw)
    except json.JSONDecodeError as exc:
        raise ConfigError(f"{name} must be a JSON array of strings") from exc
    if not isinstance(parsed, list) or not all(
        isinstance(x, str) and x for x in parsed
    ):
        raise ConfigError(f"{name} must be a JSON array of non-empty strings")
    return tuple(parsed)


def _read_int(env: dict, name: str, default: int) -> int:
    raw = env.get(name)
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError as exc:
        raise ConfigError(f"{name} must parse as an int, got {raw!r}") from exc


def _read_int_nonneg(env: dict, name: str, default: int) -> int:
    """The reference's ``getOptionalNonNegativeInteger``
    (``src/config.ts:86-98``): optional, but if present must be an
    integer ≥ 0 — fail-fast otherwise."""
    v = _read_int(env, name, default)
    if v < 0:
        raise ConfigError(f"{name} must be non-negative, got {v}")
    return v


@dataclass(frozen=True)
class OAuth2Config:
    """Pulsar OAuth2 client-credentials group (``src/config.ts:142-168``)."""

    issuer_url: str
    key_path: str
    audience: str


_OAUTH2_VARS = (
    "PULSAR_OAUTH2_ISSUER_URL",
    "PULSAR_OAUTH2_KEY_PATH",
    "PULSAR_OAUTH2_AUDIENCE",
)


def _read_oauth2(env: dict) -> OAuth2Config | None:
    """All-or-none rule (``src/config.ts:142-168``): if ANY of the three
    OAuth2 variables is set, all three must be set and non-empty; with none
    set, auth is simply absent (anonymous client)."""
    vals = {name: env.get(name) for name in _OAUTH2_VARS}
    if all(v is None for v in vals.values()):
        return None
    if not all(vals.values()):  # missing OR empty — the reference's !v check
        raise ConfigError(
            "If any of PULSAR_OAUTH2_ISSUER_URL, PULSAR_OAUTH2_KEY_PATH, "
            "PULSAR_OAUTH2_AUDIENCE is defined, all must be defined."
        )
    return OAuth2Config(
        issuer_url=vals["PULSAR_OAUTH2_ISSUER_URL"],
        key_path=vals["PULSAR_OAUTH2_KEY_PATH"],
        audience=vals["PULSAR_OAUTH2_AUDIENCE"],
    )


@dataclass(frozen=True)
class EngineConfig:
    """Typed view of the reference's deduplication/cache-rebuild config
    (``src/config.ts:37-42``)."""

    dedup_window_seconds: float = 3600.0
    cache_window_seconds: float = 172800.0
    ignored_properties: tuple[str, ...] = ()
    cache_rebuild_disable_seek: bool = False
    health_check_port: int = 8080
    oauth2: OAuth2Config | None = None
    #: the reference's warm-up reader admission bound
    #: (``PULSAR_CACHE_READER_RECEIVER_QUEUE_SIZE``, default 10,
    #: ``src/config.ts:233-235``): at most N messages buffered client-side.
    #: The engine's broker connectors take it verbatim
    #: (``sources/formats.py:pulsar_reader_options``); the file-source
    #: analog is ``max_files_per_trigger`` on the service starters —
    #: bounded ingest slices instead of one unbounded replay batch.
    cache_reader_receiver_queue_size: int = 10

    @property
    def dedup_window_ms(self) -> int:
        return int(self.dedup_window_seconds * 1000)

    @property
    def warmup_enabled(self) -> bool:
        """Warm-up runs only for a positive cache window
        (``src/cacheBuilding.ts:71-77``)."""
        return self.cache_window_seconds > 0

    @classmethod
    def from_env(cls, env: dict | None = None) -> "EngineConfig":
        env = dict(os.environ) if env is None else env
        return cls(
            dedup_window_seconds=_read_float_nonneg(
                env, "DEDUPLICATION_WINDOW_IN_SECONDS", 3600.0
            ),
            cache_window_seconds=_read_float_nonneg(
                env, "CACHE_WINDOW_IN_SECONDS", 172800.0
            ),
            ignored_properties=_read_str_list(
                env, "DEDUPLICATION_IGNORED_PROPERTIES", ()
            ),
            cache_rebuild_disable_seek=_read_bool(
                env, "CACHE_REBUILD_DISABLE_SEEK", False
            ),
            health_check_port=_read_int(env, "HEALTH_CHECK_PORT", 8080),
            oauth2=_read_oauth2(env),
            cache_reader_receiver_queue_size=_read_int_nonneg(
                env, "PULSAR_CACHE_READER_RECEIVER_QUEUE_SIZE", 10
            ),
        )
