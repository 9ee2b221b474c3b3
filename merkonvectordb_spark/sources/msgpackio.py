"""Minimal MessagePack codec — derived from the PUBLIC format spec
(https://github.com/msgpack/msgpack/blob/master/spec.md), implemented
here because the container has no ``msgpack`` wheel and the migration
reader (``sources.merkondb``) must parse the reference engine's native
database file (one MessagePack document; see SURVEY §2.1 S1/S2,
`MerkonDatabase.cs:128-162`).

Scope: the full decode surface a reference database can contain (nil,
bool, ints, floats, str, bin, array, map) and the encode surface the
round-trip tests need.  Not a general-purpose library: no ext types,
no streaming, documents are assumed to fit in memory — exactly the
reference's own constraint (it holds the whole file in memory too).
"""

from __future__ import annotations

import struct
from typing import Any


def _too_short(need: int, have: int) -> ValueError:
    return ValueError(f"truncated msgpack: need {need} bytes, have {have}")


def _unpack(fmt: str, buf: bytes, pos: int) -> tuple:
    """struct.unpack_from with the module's truncation contract: a cut
    inside a fixed-width payload raises ValueError like every other
    truncation, never struct.error/IndexError."""
    size = struct.calcsize(fmt)
    if pos + size > len(buf):
        raise _too_short(pos + size, len(buf))
    return struct.unpack_from(fmt, buf, pos)


def _decode(buf: bytes, pos: int) -> tuple[Any, int]:
    if pos >= len(buf):
        raise _too_short(pos + 1, len(buf))
    b = buf[pos]
    pos += 1
    # fix types
    if b <= 0x7F:  # positive fixint
        return b, pos
    if b >= 0xE0:  # negative fixint
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:  # fixmap
        return _decode_map(buf, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:  # fixarray
        return _decode_array(buf, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:  # fixstr
        return _decode_str(buf, pos, b & 0x1F)
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b == 0xC4:  # bin8
        (n,) = _unpack(">B", buf, pos)
        return _decode_bin(buf, pos + 1, n)
    if b == 0xC5:  # bin16
        (n,) = _unpack(">H", buf, pos)
        return _decode_bin(buf, pos + 2, n)
    if b == 0xC6:  # bin32
        (n,) = _unpack(">I", buf, pos)
        return _decode_bin(buf, pos + 4, n)
    if b == 0xCA:  # float32
        (v,) = _unpack(">f", buf, pos)
        return v, pos + 4
    if b == 0xCB:  # float64
        (v,) = _unpack(">d", buf, pos)
        return v, pos + 8
    if b == 0xCC:
        if pos >= len(buf):
            raise _too_short(pos + 1, len(buf))
        return buf[pos], pos + 1
    if b == 0xCD:
        (v,) = _unpack(">H", buf, pos)
        return v, pos + 2
    if b == 0xCE:
        (v,) = _unpack(">I", buf, pos)
        return v, pos + 4
    if b == 0xCF:
        (v,) = _unpack(">Q", buf, pos)
        return v, pos + 8
    if b == 0xD0:
        (v,) = _unpack(">b", buf, pos)
        return v, pos + 1
    if b == 0xD1:
        (v,) = _unpack(">h", buf, pos)
        return v, pos + 2
    if b == 0xD2:
        (v,) = _unpack(">i", buf, pos)
        return v, pos + 4
    if b == 0xD3:
        (v,) = _unpack(">q", buf, pos)
        return v, pos + 8
    if b == 0xD9:  # str8
        (n,) = _unpack(">B", buf, pos)
        return _decode_str(buf, pos + 1, n)
    if b == 0xDA:  # str16
        (n,) = _unpack(">H", buf, pos)
        return _decode_str(buf, pos + 2, n)
    if b == 0xDB:  # str32
        (n,) = _unpack(">I", buf, pos)
        return _decode_str(buf, pos + 4, n)
    if b == 0xDC:  # array16
        (n,) = _unpack(">H", buf, pos)
        return _decode_array(buf, pos + 2, n)
    if b == 0xDD:  # array32
        (n,) = _unpack(">I", buf, pos)
        return _decode_array(buf, pos + 4, n)
    if b == 0xDE:  # map16
        (n,) = _unpack(">H", buf, pos)
        return _decode_map(buf, pos + 2, n)
    if b == 0xDF:  # map32
        (n,) = _unpack(">I", buf, pos)
        return _decode_map(buf, pos + 4, n)
    raise ValueError(f"unsupported msgpack type byte 0x{b:02x} at {pos - 1}")


def _decode_str(buf: bytes, pos: int, n: int) -> tuple[str, int]:
    if pos + n > len(buf):
        raise _too_short(pos + n, len(buf))
    return buf[pos : pos + n].decode("utf-8"), pos + n


def _decode_bin(buf: bytes, pos: int, n: int) -> tuple[bytes, int]:
    if pos + n > len(buf):
        raise _too_short(pos + n, len(buf))
    return buf[pos : pos + n], pos + n


def _decode_array(buf: bytes, pos: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        v, pos = _decode(buf, pos)
        out.append(v)
    return out, pos


def _decode_map(buf: bytes, pos: int, n: int) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, pos = _decode(buf, pos)
        v, pos = _decode(buf, pos)
        out[k] = v
    return out, pos


def unpackb(buf: bytes) -> Any:
    """Decode ONE MessagePack document; trailing bytes raise."""
    v, pos = _decode(buf, 0)
    if pos != len(buf):
        raise ValueError(f"{len(buf) - pos} trailing bytes after document")
    return v


def packb(obj: Any) -> bytes:
    """Encode the subset the round-trip tests and fixture writer use:
    None/bool/int/float/str/bytes/list/dict — MessagePack-CSharp's
    standard layout for the reference's classes (int-keyed
    [MessagePackObject] → array; Dictionary → map; string → str)."""
    out = bytearray()
    _encode(obj, out)
    return bytes(out)


def _encode(obj: Any, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(obj & 0xFF)
        elif 0 <= obj <= 0xFFFFFFFFFFFFFFFF:
            out.append(0xCF)
            out += struct.pack(">Q", obj)
        else:
            out.append(0xD3)
            out += struct.pack(">q", obj)
    elif isinstance(obj, float):
        out.append(0xCB)
        out += struct.pack(">d", obj)
    elif isinstance(obj, str):
        raw = obj.encode("utf-8")
        n = len(raw)
        if n <= 0x1F:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out.append(0xD9)
            out += struct.pack(">B", n)
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += raw
    elif isinstance(obj, bytes):
        n = len(obj)
        if n <= 0xFF:
            out.append(0xC4)
            out += struct.pack(">B", n)
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += obj
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 0x0F:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for v in obj:
            _encode(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 0x0F:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in obj.items():
            _encode(k, out)
            _encode(v, out)
    else:
        raise TypeError(f"cannot msgpack-encode {type(obj).__name__}")
