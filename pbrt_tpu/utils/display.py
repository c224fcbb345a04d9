"""Live image display via the tev viewer's TCP protocol (reference
util/display.{h,cpp}: DisplayDynamic streams film tiles to tev).

Implements the tev IPC wire format (public protocol, tev Ipc.cpp):
little-endian, each packet = uint32 total-length (self-inclusive) +
uint8 type + payload. Types used: 4 CreateImage, 3 UpdateImage (per
channel), 2 CloseImage.
"""
from __future__ import annotations

import socket
import struct as pystruct

import numpy as np

_CREATE = 4
_UPDATE = 3
_CLOSE = 2


def _pack(ptype: int, payload: bytes) -> bytes:
    body = bytes([ptype]) + payload
    return pystruct.pack("<I", len(body) + 4) + body


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class DisplayServer:
    """Connection to a running tev instance (reference ConnectToDisplayServer,
    display.cpp). Silently no-ops after a connection failure so a missing
    viewer never kills a render."""

    def __init__(self, host="127.0.0.1", port=14158, timeout=1.0):
        self.sock = None
        try:
            self.sock = socket.create_connection((host, port),
                                                 timeout=timeout)
        except OSError:
            self.sock = None

    @property
    def connected(self):
        return self.sock is not None

    def _send(self, data: bytes):
        if self.sock is None:
            return
        try:
            self.sock.sendall(data)
        except OSError:
            self.sock = None

    def create_image(self, name, width, height,
                     channels=("R", "G", "B")):
        payload = bytes([1]) + _cstr(name) + \
            pystruct.pack("<iii", width, height, len(channels))
        for c in channels:
            payload += _cstr(c)
        self._send(_pack(_CREATE, payload))

    def update_image(self, name, img, x=0, y=0,
                     channels=("R", "G", "B")):
        """img: (h, w, C) float32 tile at offset (x, y)."""
        img = np.asarray(img, np.float32)
        h, w = img.shape[:2]
        for ci, c in enumerate(channels):
            payload = bytes([0]) + _cstr(name) + _cstr(c) + \
                pystruct.pack("<iiii", x, y, w, h) + \
                np.ascontiguousarray(img[..., ci]).tobytes()
            self._send(_pack(_UPDATE, payload))

    def close_image(self, name):
        self._send(_pack(_CLOSE, _cstr(name)))

    def close(self):
        if self.sock is not None:
            try:
                self.sock.close()
            finally:
                self.sock = None
