"""Index aliases — the Elasticsearch alias API analog: a tiny registry
mapping stable NAMES to index directories, with atomic swap. The
blue/green cutover primitive that completes this engine's lifecycle
story: build (or compact/merge/restore) a NEW index directory, validate
it, then ``set_alias`` — readers resolving the alias see the old index
until the instant of the rename-based swap, never a half state.

The registry is one JSON file (``aliases.json``) written with the same
tmp+rename discipline as every manifest here; a swap is a single atomic
file replace, so concurrent resolvers read either the old or the new
mapping, nothing in between. Multi-writer coordination is out of scope
(same as the build's quiesce contract) — one operator owns a registry.
"""

from __future__ import annotations

import json
import os

from colbert_ray.stages.manifests import atomic_write_json

REGISTRY_FILE = "aliases.json"


def _registry_path(registry_dir: str) -> str:
    return os.path.join(registry_dir, REGISTRY_FILE)


def list_aliases(registry_dir: str) -> dict:
    p = _registry_path(registry_dir)
    if not os.path.isfile(p):
        return {}
    with open(p) as f:
        return json.load(f)


def set_alias(registry_dir: str, name: str, index_dir: str) -> dict:
    """Point ``name`` at ``index_dir`` (must be a built index). Returns
    the full mapping after the atomic swap."""
    if not os.path.isfile(os.path.join(index_dir, "metadata.json")):
        raise ValueError(f"{index_dir} is not a built index "
                         "(no metadata.json)")
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid alias name {name!r}")
    os.makedirs(registry_dir, exist_ok=True)
    m = list_aliases(registry_dir)
    m[name] = os.path.abspath(index_dir)
    atomic_write_json(_registry_path(registry_dir), m)
    return m


def drop_alias(registry_dir: str, name: str) -> dict:
    m = list_aliases(registry_dir)
    if name not in m:
        return m          # no-op: nothing to drop, nothing to rewrite
    m.pop(name)
    atomic_write_json(_registry_path(registry_dir), m)
    return m


def resolve(registry_dir: str, name_or_path: str) -> str:
    """Resolve an alias name to its index dir; a path that IS an index
    directory passes through unchanged (so every API accepts either)."""
    if os.path.isfile(os.path.join(name_or_path, "metadata.json")):
        return name_or_path
    m = list_aliases(registry_dir)
    if name_or_path in m:
        target = m[name_or_path]
        if not os.path.isfile(os.path.join(target, "metadata.json")):
            raise ValueError(f"alias {name_or_path!r} points at "
                             f"{target}, which is not a built index")
        return target
    raise ValueError(f"{name_or_path!r} is neither an index directory "
                     f"nor a known alias "
                     f"(registry has {sorted(m)})")
