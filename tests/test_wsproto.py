import io
import struct

from telescope_cam_detection_tpu.utils import wsproto


def test_accept_key_rfc_example():
    # RFC 6455 §1.3 worked example
    assert wsproto.accept_key("dGhlIHNhbXBsZSBub25jZQ==") == \
        "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def _decode(data: bytes):
    return wsproto.FrameReader(io.BytesIO(data)).read_frame()


def test_encode_decode_roundtrip_masked():
    payload = b"hello websocket"
    frame = wsproto.encode_frame(payload, wsproto.OP_TEXT, mask=True)
    opcode, out = _decode(frame)
    assert opcode == wsproto.OP_TEXT and out == payload


def test_length_encodings():
    for n in (0, 125, 126, 65535, 65536):
        frame = wsproto.encode_frame(b"x" * n, wsproto.OP_BINARY, mask=True)
        opcode, out = _decode(frame)
        assert opcode == wsproto.OP_BINARY and len(out) == n


def test_server_frames_unmasked():
    frame = wsproto.encode_text("hi")
    assert not (frame[1] & 0x80)  # mask bit clear
    opcode, out = _decode(frame)
    assert opcode == wsproto.OP_TEXT and out == b"hi"


def test_close_and_pong():
    opcode, payload = _decode(wsproto.encode_close(1001))
    assert opcode == wsproto.OP_CLOSE
    assert struct.unpack(">H", payload)[0] == 1001
    opcode, payload = _decode(wsproto.encode_pong(b"ping-payload"))
    assert opcode == wsproto.OP_PONG and payload == b"ping-payload"


def test_reader_eof_returns_none():
    assert _decode(b"") is None
    assert _decode(b"\x81") is None  # truncated header


def test_oversized_declared_frame_rejected():
    """A client declaring a huge payload must not pin the reader: the frame
    is rejected (None -> connection close) without buffering."""
    # 64-bit length header declaring 2^62 bytes, no payload actually sent
    head = bytes([0x82, 0x80 | 127]) + struct.pack(">Q", 1 << 62) + b"\0" * 4
    assert _decode(head) is None
    # just over the cap
    head = bytes([0x82, 0x80 | 127]) + struct.pack(
        ">Q", wsproto.FrameReader.MAX_FRAME_BYTES + 1) + b"\0" * 4
    assert _decode(head) is None


def test_rfc6455_msb_length_rejected():
    head = bytes([0x82, 0x80 | 127]) + struct.pack(">Q", (1 << 63) | 10) \
        + b"\0" * 4
    assert _decode(head) is None


def test_frame_at_cap_still_accepted():
    n = 100_000  # well under the cap but uses the 64-bit length encoding
    frame = bytes([0x82, 127]) + struct.pack(">Q", n) + b"y" * n
    opcode, out = _decode(frame)
    assert opcode == wsproto.OP_BINARY and len(out) == n
