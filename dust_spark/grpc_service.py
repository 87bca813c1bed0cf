"""gRPC wire-parity facade for the reference's RaftApi service.

The reference ships a tonic SayHello stub (`grpc/src/raft_service.rs:22-31`,
`grpc/proto/service.proto`): one rpc, ``SayHello(HelloRequest{name}) ->
HelloReply{message: "Hello {name}!"}``. This module reproduces that
surface without requiring grpcio (absent in this container):

- :class:`HelloRequest` / :class:`HelloReply` carry a hand-rolled proto3
  wire codec for their single string field (field 1, wire type 2 —
  varint tag ``0x0A`` + varint length + UTF-8 bytes), so the encoded
  bytes are exactly what a protoc-generated stub would produce.
- :class:`RaftApiService` is the service core (the ``ServiceCore`` of
  the reference) with the same reply semantics.
- :func:`serve` starts a real gRPC server via generic method handlers
  when ``grpcio`` is importable, and raises a clear error otherwise —
  the codec and service core stay fully testable either way.
"""

from __future__ import annotations

from dataclasses import dataclass


def _encode_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _encode_string_field(field: int, s: str) -> bytes:
    data = s.encode("utf-8")
    return _encode_varint((field << 3) | 2) + _encode_varint(len(data)) + data


def _decode_string_field(buf: bytes, field: int) -> str:
    """Proto3 semantics: unknown fields skipped, last value wins,
    missing string field decodes to ''."""
    pos, val = 0, ""
    while pos < len(buf):
        tag, pos = _decode_varint(buf, pos)
        f, wt = tag >> 3, tag & 7
        if wt == 2:
            ln, pos = _decode_varint(buf, pos)
            chunk, pos = buf[pos : pos + ln], pos + ln
            if f == field:
                val = chunk.decode("utf-8")
        elif wt == 0:
            _, pos = _decode_varint(buf, pos)
        elif wt == 5:
            pos += 4
        elif wt == 1:
            pos += 8
        else:  # pragma: no cover - malformed input
            raise ValueError(f"unsupported wire type {wt}")
    return val


@dataclass
class HelloRequest:
    name: str = ""

    def encode(self) -> bytes:
        return _encode_string_field(1, self.name) if self.name else b""

    @classmethod
    def decode(cls, buf: bytes) -> "HelloRequest":
        return cls(name=_decode_string_field(buf, 1))


@dataclass
class HelloReply:
    message: str = ""

    def encode(self) -> bytes:
        return _encode_string_field(1, self.message) if self.message else b""

    @classmethod
    def decode(cls, buf: bytes) -> "HelloReply":
        return cls(message=_decode_string_field(buf, 1))


class RaftApiService:
    """Service core — mirrors the reference's ``ServiceCore`` reply
    (`grpc/src/raft_service.rs:24-31`)."""

    def say_hello(self, request: HelloRequest) -> HelloReply:
        return HelloReply(message=f"Hello {request.name}!")


def serve(address: str = "127.0.0.1:50051"):
    """Start a real gRPC server for RaftApi when grpcio is available.

    Returns the started ``grpc.Server``. Raises ImportError with a
    clear message when grpcio is absent (this container) — the wire
    codec and service core above do not depend on it.
    """
    try:
        import grpc
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "grpcio is not installed; RaftApiService and the proto3 codec "
            "remain usable without it"
        ) from e

    core = RaftApiService()

    def _say_hello(request_bytes: bytes, _ctx) -> bytes:
        return core.say_hello(HelloRequest.decode(request_bytes)).encode()

    handler = grpc.method_handlers_generic_handler(
        "raft_service.RaftApi",
        {
            "SayHello": grpc.unary_unary_rpc_method_handler(
                _say_hello,
                request_deserializer=lambda b: b,
                response_serializer=lambda b: b,
            )
        },
    )
    from concurrent import futures

    server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
    server.add_generic_rpc_handlers((handler,))
    server.add_insecure_port(address)
    server.start()
    return server
