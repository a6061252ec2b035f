"""DuckLake secrets: named ATTACH-configuration bundles.

Reference (src/storage/ducklake_secret.cpp, 66 LoC): a 'ducklake'
secret stores attach parameters (metadata_path, data_path, encrypted,
metadata_parameters, ...) under a name; ``ATTACH 'ducklake:my_secret'``
resolves them when the attach path looks like a secret name
(alphanumeric + underscore only — PathIsSecret,
ducklake_secret.cpp:17-29). Secrets live client-side (DuckDB keeps
them in the in-memory or local_file secret providers), never in the
lake's own catalog.

This port keeps both providers: an in-process registry ("memory") and
a JSON file per secret under ``~/.ducklake_spark/secrets``
("local_file"), resolved in that order like the reference's GetSecret.
"""

from __future__ import annotations

import json
import os
import re
import stat

_NAME_RE = re.compile(r"^[A-Za-z0-9_]+$")
_MEMORY: dict[str, dict] = {}

_ALLOWED = {
    "metadata_path", "data_path", "metadata_schema", "metadata_catalog",
    "metadata_parameters", "encrypted", "ducklake_version",
}


def secrets_dir() -> str:
    return os.environ.get(
        "DUCKLAKE_SECRET_DIR",
        os.path.join(os.path.expanduser("~"), ".ducklake_spark", "secrets"),
    )


def path_is_secret(path: str) -> bool:
    """True when an attach path is a secret NAME, not a filesystem path
    (reference PathIsSecret: alphanumeric/underscore only)."""
    return bool(_NAME_RE.fullmatch(path))


def create_secret(name: str, *, persistent: bool = False, **options) -> dict:
    """CREATE SECRET (TYPE ducklake, ...): metadata_path is required
    (ducklake_secret.cpp:9-11); unknown parameters are rejected like
    the reference's named-parameter list."""
    if not path_is_secret(name):
        raise ValueError(f"invalid secret name {name!r}")
    if "metadata_path" not in options:
        raise ValueError(
            "metadata_path must be defined when creating a DuckLake secret"
        )
    unknown = set(options) - _ALLOWED
    if unknown:
        raise ValueError(f"unknown secret parameters: {sorted(unknown)}")
    record = dict(options)
    if persistent:
        d = secrets_dir()
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"{name}.json")
        with open(p, "w") as f:
            json.dump(record, f)
        os.chmod(p, stat.S_IRUSR | stat.S_IWUSR)  # 0600: credentials
    else:
        _MEMORY[name] = record
    return record


def get_secret(name: str) -> dict | None:
    """memory first, then local_file — reference GetSecret order."""
    if name in _MEMORY:
        return dict(_MEMORY[name])
    p = os.path.join(secrets_dir(), f"{name}.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def drop_secret(name: str) -> bool:
    found = _MEMORY.pop(name, None) is not None
    p = os.path.join(secrets_dir(), f"{name}.json")
    if os.path.exists(p):
        os.remove(p)
        found = True
    return found


def list_secrets() -> list[str]:
    names = set(_MEMORY)
    d = secrets_dir()
    if os.path.isdir(d):
        names |= {f[:-5] for f in os.listdir(d) if f.endswith(".json")}
    return sorted(names)
