"""Metadata decorators (parity: reference ``tobac_flow/decorators.py``).

``configure_dataarray`` wraps a detection function so that when its first
array argument (after the flow) is a :class:`DataArray`, the numpy result is
wrapped back into a DataArray inheriting that argument's coords/dims, with a
configured name and attributes and stale attrs dropped.
"""

from __future__ import annotations

import functools

import numpy as np

from tobac_flow_tpu.data.ncdataset import DataArray

__all__ = ["configure_dataarray"]


def configure_dataarray(name=None, drop_attrs=(), **attrs):
    def decorator(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            # call-time overrides (reference scripts pass name=/attributes=)
            out_name = kwargs.pop("name", name)
            extra_attrs = kwargs.pop("attributes", None) or {}
            template = None
            for a in args[1:]:
                if isinstance(a, DataArray):
                    template = a
                    break
            result = func(*args, **kwargs)
            if template is None or isinstance(result, DataArray):
                if isinstance(result, DataArray):
                    result.name = out_name
                    result.attrs.update(extra_attrs)
                return result
            out_attrs = {
                k: v for k, v in template.attrs.items() if k not in set(drop_attrs)
            }
            out_attrs.update({k: v for k, v in attrs.items() if v is not None})
            out_attrs.update(extra_attrs)
            return DataArray(
                np.asarray(result),
                coords=dict(template.coords),
                dims=template.dims,
                name=out_name,
                attrs=out_attrs,
            )

        return wrapper

    return decorator
