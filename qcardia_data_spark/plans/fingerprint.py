"""Logical-plan fingerprinting for content-addressed caches (C1, F16).

The reference keys its materialized cache by a deterministic encoding of the
producing config + an MD5 of the sorted subject list
(``_generate_dataset_paths``/``generate_name_from_keys``, reference
``src/qcardia_data/pipeline/dataset_cacher.py:78-131``). Here the key is an
MD5 of the *normalized* pipeline spec: stable under dict ordering, list vs
tuple, and absent-vs-None fields — the same config always hits the same
cache path, on any machine.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any


def normalize_spec(spec: Any) -> Any:
    """Canonicalize a spec tree: sort mapping keys, drop None/empty values,
    coerce tuples to lists (mirrors the reference's key-pair normalization,
    ``process_key_pairs``, pipeline/utils.py:9-24)."""
    if isinstance(spec, dict):
        # normalize children FIRST, then drop the empties: a value that
        # only becomes empty after normalization ({"x": None} → {}) must
        # fingerprint identically to an already-empty one, or two
        # semantically identical specs miss each other's cache (r11
        # review)
        out = {}
        for k, v in sorted(spec.items()):
            nv = normalize_spec(v)
            if nv is None or nv == {} or nv == []:
                continue
            out[k] = nv
        return out
    if isinstance(spec, (list, tuple)):
        return [normalize_spec(v) for v in spec]
    if isinstance(spec, float) and spec.is_integer():
        return int(spec)
    return spec


def spec_fingerprint(spec: dict) -> str:
    """MD5 hex of the canonical JSON encoding of ``spec``."""
    canon = json.dumps(normalize_spec(spec), sort_keys=True, separators=(",", ":"))
    return hashlib.md5(canon.encode()).hexdigest()


def subject_set_fingerprint(subjects: list[str]) -> str:
    """MD5 of the sorted, comma-joined subject ids (F16 — reference
    dataset_cacher.py:103-127 hashes sorted dataset+subject names)."""
    return hashlib.md5(",".join(sorted(subjects)).encode()).hexdigest()


def cache_name(spec: dict, subjects: list[str] | None = None, prefix: str = "cache") -> str:
    """Human-scannable cache folder name: ``{prefix}-{spec_fp[:12]}`` plus a
    subject-set hash when subject filtering participates in the plan
    (mirrors the reference's name = encoded-config + subjects-MD5)."""
    name = f"{prefix}-{spec_fingerprint(spec)[:12]}"
    if subjects is not None:
        name += f"-{subject_set_fingerprint(subjects)[:8]}"
    return name
