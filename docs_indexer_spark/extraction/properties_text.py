"""OpenAPI/JSON-schema property text flattening (reference A22 —
``collect_properties_text``, /root/reference/hugo.py:363-375).

Vestigial in the reference (dead in ``run()`` but kept and tested,
/root/reference/hugo_test.py:152-186); reimplemented for parity because it
documents the text-flattening behavior for JSON-schema payloads: DFS over
the ``properties`` tree collecting each node's description followed by
property names, in order.
"""

from __future__ import annotations

from typing import Any


def collect_properties_text(schema: dict[str, Any]) -> list[str]:
    """Depth-first: [description?, (name, recurse(child))*]."""
    out: list[str] = []
    if not isinstance(schema, dict):
        return out
    # the reference appends whenever the key EXISTS (including empty
    # strings): `if 'description' in schema_dict` — hugo.py:367-368
    if "description" in schema:
        out.append(schema["description"])
    for name, child in (schema.get("properties") or {}).items():
        out.append(name)
        out.extend(collect_properties_text(child))
    return out
