"""Frozen-dataclass pytrees.

The reference moves mutable SoA structs between host and device with
per-struct `Adapt.adapt_structure` overloads (reference:
src/infra/MPASMesh/HorzMesh.jl:357-399 and siblings). The JAX-native
equivalent is a frozen dataclass registered as a pytree: device placement,
sharding, `jit`, `grad` and `scan` all traverse it for free, and fields that
must stay static for tracing (dimension sizes) are hashable aux data.
"""

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")


def static_field(**kwargs: Any) -> dataclasses.Field:
    """Mark a dataclass field as static (pytree aux data, not a leaf)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[T]) -> type[T]:
    """Decorator: freeze ``cls`` as a dataclass and register it as a pytree.

    Fields created with :func:`static_field` become aux data; all other
    fields are children. Provides ``.replace(**updates)``.
    """
    cls = dataclasses.dataclass(frozen=True)(cls)

    leaf_names = []
    static_names = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            static_names.append(f.name)
        else:
            leaf_names.append(f.name)

    def flatten(obj):
        children = tuple(getattr(obj, n) for n in leaf_names)
        aux = tuple(getattr(obj, n) for n in static_names)
        return children, aux

    def flatten_with_keys(obj):
        children = tuple(
            (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in leaf_names
        )
        aux = tuple(getattr(obj, n) for n in static_names)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(leaf_names, children))
        kwargs.update(zip(static_names, aux))
        return cls(**kwargs)

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)

    def replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = replace
    cls.__pytree_leaf_fields__ = tuple(leaf_names)
    cls.__pytree_static_fields__ = tuple(static_names)
    return cls
