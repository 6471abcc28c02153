"""Minimal pytree dataclass decorator (equinox.Module stand-in).

Fields annotated with ``static=True`` metadata become aux data (hashable,
trace-static); everything else is a pytree child.
"""

from __future__ import annotations

import dataclasses

import jax


def static_field(**kwargs):
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls
