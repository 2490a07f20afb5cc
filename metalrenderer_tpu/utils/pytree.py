"""Tiny pytree-dataclass helper.

The reference shares POD structs between C++ and MSL via a common header
(VertexData.hpp:6-28). The TPU-native analogue is typed, frozen dataclasses
registered as JAX pytrees, shared by the host API and the kernels.
"""
from __future__ import annotations

import dataclasses

import jax


def static_field(**kwargs):
    """Mark a dataclass field as static (part of the treedef, not traced)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields created with :func:`static_field` become metadata (hashable,
    compile-time constants); everything else is a traced leaf.
    """
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

    def replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = replace
    return cls
