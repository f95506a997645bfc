"""Wire serialization for protocol types.

Replaces the reference's bincode-over-WebSocket framing
(``src/server.rs:240,354``; ``frontend/src/session.rs:62,215``) with a
versioned, self-describing JSON encoding.  bincode is a Rust-specific
non-self-describing format; a versioned JSON protocol is the deliberate
TPU-build replacement (documented deviation — the client is rebuilt too, so
both ends of the wire are ours).

Every dataclass/enum in :mod:`mixlab_tpu.protocol` round-trips through
``dumps``/``loads``.  Union types (WorkspaceOp, ServerUpdate, messages) are
encoded as ``{"t": <class name>, ...fields}``.
"""

from __future__ import annotations

import dataclasses
import json
from enum import Enum
from typing import Any, get_args, get_origin, get_type_hints

from mixlab_tpu import protocol as p

WIRE_VERSION = 1

# classes addressable by tag in tagged-union encodings
_TAGGED: dict[str, type] = {}


def _register(*classes):
    for c in classes:
        _TAGGED[c.__name__] = c


_register(
    p.CreateModule,
    p.UpdateModuleParams,
    p.UpdateWindowGeometry,
    p.DeleteModule,
    p.CreateConnection,
    p.DeleteConnection,
    p.SUCreateModule,
    p.SUUpdateModuleParams,
    p.SUUpdateWindowGeometry,
    p.SUUpdateModuleIndication,
    p.SUDeleteModule,
    p.SUCreateConnection,
    p.SUDeleteConnection,
    p.WorkspaceMessage,
    p.WorkspaceState,
    p.PerformanceInfo,
    p.MediaLibrary,
    p.MediaItem,
    p.PlotterIndication,
    p.MonitorIndication,
    p.StreamOutputIndication,
    p.OutputDeviceIndication,
)


def encode(obj: Any) -> Any:
    """Encode a protocol value into JSON-serializable data."""
    if obj is None or isinstance(obj, (bool, int, float, str)):
        return obj
    if isinstance(obj, Enum):
        return obj.value
    if isinstance(obj, p.ModuleId):
        return obj.value
    if isinstance(obj, p.MediaId):
        return obj.value
    if isinstance(obj, p.InputId):
        return [obj.module_id.value, obj.index]
    if isinstance(obj, p.OutputId):
        return [obj.module_id.value, obj.index]
    if isinstance(obj, p.Decibel):
        return obj.db
    if isinstance(obj, p.Microseconds):
        return obj.us
    if isinstance(obj, p.Terminal):
        return [obj.label, obj.line_type.value]
    if isinstance(obj, p.ModuleParams):
        return {"kind": obj.kind, "params": encode(obj.params)}
    if isinstance(obj, p.Indication):
        return {"kind": obj.kind, "value": encode(obj.value)}
    if isinstance(obj, p.PerformanceAccount):
        if obj.kind == "engine":
            return "engine"
        return {"module": obj.module_id.value}
    if dataclasses.is_dataclass(obj):
        out = {"t": type(obj).__name__}
        for f in dataclasses.fields(obj):
            out[f.name] = encode(getattr(obj, f.name))
        return out
    if isinstance(obj, (list, tuple)):
        return [encode(x) for x in obj]
    if isinstance(obj, dict):
        return {k: encode(v) for k, v in obj.items()}
    raise TypeError(f"cannot encode {type(obj)!r}")


def _decode_typed(data: Any, ty: Any) -> Any:
    """Decode ``data`` as type ``ty`` (a protocol class or typing construct)."""
    if ty is type(None):
        return None
    if ty in (int, float, str, bool, object, Any):
        return data
    origin = get_origin(ty)
    if origin in (list, tuple):
        args = get_args(ty)
        if origin is tuple and len(args) == 2 and args[1] is Ellipsis:
            return tuple(_decode_typed(x, args[0]) for x in data)
        if origin is tuple:
            return tuple(_decode_typed(x, a) for x, a in zip(data, args))
        return [_decode_typed(x, args[0]) for x in data]
    import types
    import typing

    if origin is typing.Union or origin is types.UnionType:
        args = [a for a in get_args(ty)]
        if type(None) in args and data is None:
            return None
        args = [a for a in args if a is not type(None)]
        if len(args) == 1:
            return _decode_typed(data, args[0])
        # tagged union of dataclasses
        return decode_tagged(data)
    # UnionType via | on py3.12 shows up as types.UnionType handled above;
    # direct classes:
    if isinstance(ty, type):
        if issubclass(ty, Enum):
            return ty(data)
        if ty is p.ModuleId:
            return p.ModuleId(data)
        if ty is p.MediaId:
            return p.MediaId(data)
        if ty is p.InputId:
            return p.InputId(p.ModuleId(data[0]), data[1])
        if ty is p.OutputId:
            return p.OutputId(p.ModuleId(data[0]), data[1])
        if ty is p.Decibel:
            return p.Decibel(data)
        if ty is p.Microseconds:
            return p.Microseconds(data)
        if ty is p.Terminal:
            return p.Terminal(data[0], p.LineType(data[1]))
        if ty is p.ModuleParams:
            return decode_module_params(data)
        if ty is p.Indication:
            return p.Indication(data["kind"], decode_indication_value(data))
        if ty is p.PerformanceAccount:
            if data == "engine":
                return p.PerformanceAccount("engine")
            return p.PerformanceAccount("module", p.ModuleId(data["module"]))
        if dataclasses.is_dataclass(ty):
            return _decode_dataclass(data, ty)
    raise TypeError(f"cannot decode as {ty!r}")


def _decode_dataclass(data: dict, cls: type) -> Any:
    hints = get_type_hints(cls)
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name in data:
            kwargs[f.name] = _decode_typed(data[f.name], hints[f.name])
    return cls(**kwargs)


def decode_tagged(data: dict) -> Any:
    cls = _TAGGED[data["t"]]
    return _decode_dataclass(data, cls)


def decode_module_params(data: dict) -> p.ModuleParams:
    kind = data["kind"]
    cls = p.ModuleParams.KINDS[kind]
    if cls is type(None):
        return p.ModuleParams(kind, None)
    if issubclass(cls, Enum):
        return p.ModuleParams(kind, cls(data["params"]))
    return p.ModuleParams(kind, _decode_dataclass(data["params"], cls))


_INDICATION_VALUES = {
    "Monitor": p.MonitorIndication,
    "Plotter": p.PlotterIndication,
    "StreamOutput": p.StreamOutputIndication,
    "OutputDevice": p.OutputDeviceIndication,
}


def decode_indication_value(data: dict) -> Any:
    cls = _INDICATION_VALUES.get(data["kind"])
    if cls is None or data.get("value") is None:
        return None
    return _decode_dataclass(data["value"], cls)


# ---------------------------------------------------------------------------
# top-level message framing
# ---------------------------------------------------------------------------


def dumps(msg: Any) -> str:
    """Serialize one protocol message (with version header)."""
    return json.dumps({"v": WIRE_VERSION, "m": encode(msg)}, separators=(",", ":"))


def loads(text: str | bytes) -> Any:
    data = json.loads(text)
    if data.get("v") != WIRE_VERSION:
        raise ValueError(f"unsupported wire version {data.get('v')!r}")
    return decode_tagged(data["m"])


# client<->server envelope helpers (ServerMessage / ClientMessage analogues,
# protocol/src/lib.rs:14-20,80-82)


def server_message(kind: str, payload: Any) -> str:
    return json.dumps(
        {"v": WIRE_VERSION, "kind": kind, "m": encode(payload)},
        separators=(",", ":"),
    )


def parse_envelope(text: str | bytes) -> tuple[str, Any]:
    data = json.loads(text)
    # raise ValueError (the server's skip-malformed-message class,
    # server/app.py) on any shape violation — a top-level non-dict or a
    # missing key must not leak KeyError/AttributeError into the session
    if not isinstance(data, dict):
        raise ValueError("wire envelope is not an object")
    if data.get("v") != WIRE_VERSION:
        raise ValueError(f"unsupported wire version {data.get('v')!r}")
    try:
        return data["kind"], data["m"]
    except KeyError as e:
        raise ValueError(f"wire envelope missing {e}") from None
