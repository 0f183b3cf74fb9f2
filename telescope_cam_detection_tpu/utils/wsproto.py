"""Minimal RFC 6455 WebSocket server-side framing.

fastapi/uvicorn are not available in this environment, so the web plane runs
on stdlib http.server; this module supplies the WebSocket upgrade handshake
and frame codec needed for the ``/ws/detections`` endpoint (byte-compatible
with the reference's FastAPI WebSocket surface, web_server.py:732-801).
"""
from __future__ import annotations

import base64
import hashlib
import os
import struct
from typing import Optional, Tuple

GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT = 0x0
OP_TEXT = 0x1
OP_BINARY = 0x2
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def accept_key(sec_websocket_key: str) -> str:
    digest = hashlib.sha1((sec_websocket_key + GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def handshake_response(sec_websocket_key: str) -> bytes:
    return (
        "HTTP/1.1 101 Switching Protocols\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Accept: {accept_key(sec_websocket_key)}\r\n"
        "\r\n"
    ).encode()


def encode_frame(payload: bytes, opcode: int = OP_TEXT, fin: bool = True,
                 mask: bool = False) -> bytes:
    """Server frames are unmasked (RFC 6455 §5.1)."""
    header = bytearray()
    header.append((0x80 if fin else 0x00) | (opcode & 0x0F))
    n = len(payload)
    mask_bit = 0x80 if mask else 0x00
    if n < 126:
        header.append(mask_bit | n)
    elif n < 65536:
        header.append(mask_bit | 126)
        header += struct.pack(">H", n)
    else:
        header.append(mask_bit | 127)
        header += struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        header += key
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return bytes(header) + payload


def encode_text(text: str) -> bytes:
    return encode_frame(text.encode("utf-8"), OP_TEXT)


def encode_close(code: int = 1000) -> bytes:
    return encode_frame(struct.pack(">H", code), OP_CLOSE)


def encode_pong(payload: bytes = b"") -> bytes:
    return encode_frame(payload, OP_PONG)


class FrameReader:
    """Incremental frame decoder over a socket-like object with .recv()."""

    def __init__(self, rfile):
        self.rfile = rfile

    def _read_exact(self, n: int) -> Optional[bytes]:
        data = b""
        while len(data) < n:
            chunk = self.rfile.read(n - len(data))
            if not chunk:
                return None
            data += chunk
        return data

    # inbound messages are control-only (pings/close); a client declaring a
    # huge frame would otherwise pin a handler thread buffering it forever
    MAX_FRAME_BYTES = 1 << 20

    def read_frame(self) -> Optional[Tuple[int, bytes]]:
        """Returns (opcode, payload) or None on EOF (also on protocol abuse:
        oversized or RFC-6455-invalid lengths close the connection). Client
        frames must be masked; unmasks automatically."""
        head = self._read_exact(2)
        if head is None:
            return None
        b1, b2 = head
        opcode = b1 & 0x0F
        masked = bool(b2 & 0x80)
        length = b2 & 0x7F
        if length == 126:
            ext = self._read_exact(2)
            if ext is None:
                return None
            (length,) = struct.unpack(">H", ext)
        elif length == 127:
            ext = self._read_exact(8)
            if ext is None:
                return None
            (length,) = struct.unpack(">Q", ext)
            if length & (1 << 63):  # RFC 6455 5.2: MSB must be 0
                return None
        if length > self.MAX_FRAME_BYTES:
            return None
        key = b""
        if masked:
            key = self._read_exact(4)
            if key is None:
                return None
        payload = self._read_exact(length) if length else b""
        if payload is None:
            return None
        if masked and payload:
            payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        return opcode, payload
