"""Batched render server: protocol, dynamic batching, concurrent clients."""

import threading

import jax
import numpy as np
import pytest

from ai_font_renderer_tpu.config import ModelConfig
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.render.server import RenderServer, request_render

MCFG = ModelConfig(max_length=16, sheet_height=16, sheet_width=48)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    params = font_renderer.init(jax.random.PRNGKey(0), MCFG)
    sock = str(tmp_path_factory.mktemp("srv") / "afr.sock")
    srv = RenderServer(params, MCFG, socket_path=sock, batch_size=8)
    srv.start()
    yield srv, sock, params
    srv.stop()


def test_raw_roundtrip_matches_direct_render(server):
    srv, sock, params = server
    from ai_font_renderer_tpu.render.render import render_batch

    strings = ["HELLO", "WORLD", ""]
    header, payloads = request_render(sock, strings)
    assert header["count"] == 3
    assert (header["height"], header["width"]) == (16, 48)
    direct = render_batch(params, strings, MCFG)
    for i, p in enumerate(payloads):
        got = np.frombuffer(p, np.uint8).reshape(16, 48) / 255.0
        want = np.round(np.clip(direct[i], 0, 1) * 255) / 255.0
        np.testing.assert_allclose(got, want, atol=1 / 255 + 1e-6)


def test_bmp_format(server):
    _, sock, _ = server
    from ai_font_renderer_tpu.fontgen.bmp import read_bmp

    header, payloads = request_render(sock, ["ABC"], fmt="bmp")
    assert header["format"] == "bmp"
    img = read_bmp(payloads[0])
    assert img.shape == (16, 48)


def test_oversized_request_batches_in_chunks(server):
    """More strings than batch_size must still come back, in order."""
    srv, sock, params = server
    strings = [f"S{i}" for i in range(20)]  # batch_size is 8
    header, payloads = request_render(sock, strings)
    assert header["count"] == 20
    from ai_font_renderer_tpu.render.render import render_batch

    direct = render_batch(params, strings, MCFG)
    got = np.frombuffer(payloads[7], np.uint8).reshape(16, 48) / 255.0
    np.testing.assert_allclose(
        got, np.round(np.clip(direct[7], 0, 1) * 255) / 255.0, atol=1 / 255 + 1e-6
    )


def test_concurrent_clients(server):
    _, sock, _ = server
    results = {}
    errors = []

    def client(i):
        try:
            header, payloads = request_render(sock, [f"CLIENT {i}"])
            results[i] = (header["count"], len(payloads[0]))
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not errors
    assert all(results[i] == (1, 16 * 48) for i in range(6))


def test_empty_request_replies_immediately(server):
    _, sock, _ = server
    header, payloads = request_render(sock, [])
    assert header["count"] == 0
    assert payloads == []


def test_cross_request_packing_correctness(server):
    """Concurrent requests whose sizes straddle chunk boundaries (batch 8;
    sizes 5/6/3/20/1) are packed into shared device batches by the
    pipelined batcher — every client must still get exactly its own
    sheets, in its own order."""
    srv, sock, params = server
    from ai_font_renderer_tpu.render.render import render_batch

    sizes = [5, 6, 3, 20, 1]
    reqs = {
        i: [f"REQ{i} S{j}" for j in range(n)] for i, n in enumerate(sizes)
    }
    results = {}
    errors = []

    def client(i):
        try:
            header, payloads = request_render(sock, reqs[i])
            results[i] = (header["count"], payloads)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in reqs]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors
    for i, strings in reqs.items():
        count, payloads = results[i]
        assert count == len(strings)
        direct = render_batch(params, strings, MCFG)
        for j, p in enumerate(payloads):
            got = np.frombuffer(p, np.uint8).reshape(16, 48) / 255.0
            want = np.round(np.clip(direct[j], 0, 1) * 255) / 255.0
            np.testing.assert_allclose(got, want, atol=1 / 255 + 1e-6)


def test_int8_server_roundtrip(tmp_path):
    """RenderServer(int8=True) serves the quantized projection end-to-end;
    rendered sheets stay within a couple of gray levels of full precision
    (per-channel int8 weight scales + dynamic per-row activation scales)."""
    params = font_renderer.init(jax.random.PRNGKey(0), MCFG)
    sock = str(tmp_path / "afr8.sock")
    srv = RenderServer(params, MCFG, socket_path=sock, batch_size=8, int8=True)
    srv.start()
    try:
        from ai_font_renderer_tpu.render.render import render_batch

        strings = ["HELLO", "INT8"]
        header, payloads = request_render(sock, strings)
        assert header["count"] == 2
        direct = render_batch(params, strings, MCFG)  # full precision
        for i, p in enumerate(payloads):
            got = np.frombuffer(p, np.uint8).reshape(16, 48) / 255.0
            assert np.max(np.abs(got - np.clip(direct[i], 0, 1))) < 4 / 255
    finally:
        srv.stop()


def test_auth_token_gates_requests(tmp_path):
    """With auth_token set: wrong/missing tokens get {"error":
    "unauthorized"} (PermissionError in the client helper) and no render;
    the right token serves normally. Without a token the field is
    ignored."""
    params = font_renderer.init(jax.random.PRNGKey(0), MCFG)
    sock = str(tmp_path / "afrauth.sock")
    srv = RenderServer(
        params, MCFG, socket_path=sock, batch_size=8, auth_token="s3cret"
    )
    srv.start()
    try:
        with pytest.raises(PermissionError):
            request_render(sock, ["HI"])
        with pytest.raises(PermissionError):
            request_render(sock, ["HI"], auth_token="wrong")
        header, payloads = request_render(sock, ["HI"], auth_token="s3cret")
        assert header["count"] == 1
        assert len(payloads[0]) == 16 * 48
    finally:
        srv.stop()


def test_tcp_roundtrip(tmp_path):
    """The same framing protocol over plaintext TCP: port 0 binds an
    ephemeral port (exposed via srv.address) and a loopback client gets
    byte-identical sheets to the direct render."""
    params = font_renderer.init(jax.random.PRNGKey(0), MCFG)
    srv = RenderServer(params, MCFG, batch_size=8, tcp=("127.0.0.1", 0))
    srv.start()
    try:
        from ai_font_renderer_tpu.render.render import render_batch

        assert srv.address[1] != 0
        header, payloads = request_render(
            "", ["TCP"], tcp=("127.0.0.1", srv.address[1])
        )
        assert header["count"] == 1
        direct = render_batch(params, ["TCP"], MCFG)
        got = np.frombuffer(payloads[0], np.uint8).reshape(16, 48) / 255.0
        want = np.round(np.clip(direct[0], 0, 1) * 255) / 255.0
        np.testing.assert_allclose(got, want, atol=1 / 255 + 1e-6)
    finally:
        srv.stop()


@pytest.fixture(scope="module")
def self_signed_cert(tmp_path_factory):
    """openssl-generated self-signed cert with loopback SANs (skip if the
    binary is missing); the cert doubles as the client's trust root."""
    import shutil
    import subprocess

    if shutil.which("openssl") is None:  # pragma: no cover
        pytest.skip("openssl not available for cert generation")
    d = tmp_path_factory.mktemp("tls")
    cert, key = str(d / "cert.pem"), str(d / "key.pem")
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", key, "-out", cert, "-days", "2", "-subj",
            "/CN=localhost", "-addext",
            "subjectAltName=DNS:localhost,IP:127.0.0.1",
        ],
        check=True,
        capture_output=True,
    )
    return cert, key


def test_tls_roundtrip_and_rejects_plaintext(self_signed_cert, tmp_path):
    """TLS serving end-to-end: a verifying client (cafile = the
    self-signed cert, hostname checked) renders over the encrypted
    channel; a plaintext client on the same port gets no reply (the
    server drops it at the handshake) and auth still composes."""
    import socket as socket_mod
    import struct

    cert, key = self_signed_cert
    params = font_renderer.init(jax.random.PRNGKey(0), MCFG)
    srv = RenderServer(
        params,
        MCFG,
        batch_size=8,
        tcp=("127.0.0.1", 0),
        tls_cert=cert,
        tls_key=key,
        auth_token="tls-tok",
    )
    srv.start()
    try:
        addr = ("127.0.0.1", srv.address[1])
        header, payloads = request_render(
            "", ["TLS"], tcp=addr, tls_ca=cert, auth_token="tls-tok"
        )
        assert header["count"] == 1
        assert len(payloads[0]) == 16 * 48
        with pytest.raises(PermissionError):
            request_render("", ["TLS"], tcp=addr, tls_ca=cert)
        # Plaintext framing into the TLS port: server must drop the
        # connection without replying (never serve unencrypted).
        with socket_mod.create_connection(addr, timeout=10) as s:
            payload = b'{"strings": ["X"], "auth": "tls-tok"}'
            s.sendall(struct.pack(">I", len(payload)) + payload)
            assert s.recv(4096) == b""
    finally:
        srv.stop()


def test_serve_from_exported_artifact(tmp_path):
    """Artifact-first serving (afr serve --exported): a StableHLO export
    plugged in as the batcher's render_fn — params=None, no model code —
    serves sheets byte-identical to the weights-based server's
    quantization grid. Mirrors cmd_serve's wiring (cli.py)."""
    import dataclasses

    import jax.numpy as jnp

    from ai_font_renderer_tpu.fontgen.layout import encode_codes
    from ai_font_renderer_tpu.render.render import render_batch
    from ai_font_renderer_tpu.utils.export import (
        export_render,
        exported_contract,
        load_exported,
    )

    params = font_renderer.init(jax.random.PRNGKey(0), MCFG)
    path = str(tmp_path / "renderer.hlo")
    export_render(params, MCFG, path, platforms=("cpu",))
    exported = load_exported(path)
    max_length, height, width = exported_contract(exported)
    assert (max_length, height, width) == (16, 16, 48)
    mcfg = dataclasses.replace(
        ModelConfig(),
        max_length=max_length,
        sheet_height=height,
        sheet_width=width,
    )
    sock = str(tmp_path / "afrexp.sock")
    srv = RenderServer(
        None,
        mcfg,
        socket_path=sock,
        batch_size=8,
        render_fn=lambda strings: exported.call(
            jnp.asarray(encode_codes(strings, max_length))
        ),
    )
    srv.start()
    try:
        strings = ["HELLO", "ARTIFACT", ""]
        header, payloads = request_render(sock, strings)
        assert header["count"] == 3
        direct = render_batch(params, strings, MCFG)
        for i, p in enumerate(payloads):
            got = np.frombuffer(p, np.uint8).reshape(16, 48) / 255.0
            want = np.round(np.clip(direct[i], 0, 1) * 255) / 255.0
            np.testing.assert_allclose(got, want, atol=1 / 255 + 1e-6)
    finally:
        srv.stop()


def test_tls_requires_tcp_and_pairing():
    params = font_renderer.init(jax.random.PRNGKey(0), MCFG)
    with pytest.raises(ValueError, match="together"):
        RenderServer(params, MCFG, tcp=("127.0.0.1", 0), tls_cert="c.pem")
    with pytest.raises(ValueError, match="TCP"):
        RenderServer(params, MCFG, tls_cert="c.pem", tls_key="k.pem")


def test_ipv6_tcp_roundtrip(tmp_path):
    """IPv6 literal hosts bind AF_INET6 (the stdlib ThreadingTCPServer
    default would fail on '::1') and serve the same protocol."""
    import socket as _socket

    try:
        probe = _socket.socket(_socket.AF_INET6, _socket.SOCK_STREAM)
        probe.bind(("::1", 0))
        probe.close()
    except OSError:
        pytest.skip("no IPv6 loopback on this host")
    params = font_renderer.init(jax.random.PRNGKey(0), MCFG)
    srv = RenderServer(params, MCFG, batch_size=8, tcp=("::1", 0))
    srv.start()
    try:
        header, payloads = request_render(
            "", ["V6"], tcp=("::1", srv.address[1])
        )
        assert header["count"] == 1 and len(payloads[0]) == 16 * 48
    finally:
        srv.stop()


def test_rle_codec_roundtrip():
    """rle_encode/rle_decode invert each other, including runs past the
    u16 length cap (an all-white 4-sheet blob is one 76800-byte run)."""
    from ai_font_renderer_tpu.render.server import rle_decode, rle_encode

    rng = np.random.default_rng(0)
    cases = [
        np.full((4, 80, 240), 255, np.uint8),  # run >> 65535
        np.zeros((1, 3), np.uint8),
        rng.integers(0, 256, (2, 80, 240)).astype(np.uint8),  # worst case
        np.array([], np.uint8),
    ]
    for arr in cases:
        out = rle_decode(rle_encode(arr)) if arr.size else rle_encode(arr)
        if arr.size:
            np.testing.assert_array_equal(out, arr.reshape(-1))
        else:
            assert out == b""
    # Compression on text-like sheets: mostly-white rows with contiguous
    # ink strokes must come out far smaller than raw.
    sheet = np.full((64, 80, 240), 255, np.uint8)
    sheet[:, 20:30, 40:60] = 0  # a contiguous stroke per row
    assert len(rle_encode(sheet)) < sheet.size // 10


@pytest.mark.parametrize("fmt", ["rle", "zlib"])
def test_compressed_reply_matches_raw(server, fmt):
    """format=rle/zlib replies decode to byte-identical sheets vs raw —
    the opt-in wire compression (VERDICT r3 #6) changes bytes on the
    wire, never pixels."""
    srv, sock, params = server
    strings = ["HELLO", "WORLD WIDE WEB", ""]
    _, raw = request_render(sock, strings, fmt="raw")
    header, comp = request_render(sock, strings, fmt=fmt)
    assert header["format"] == fmt and header["count"] == 3
    assert [bytes(c) for c in comp] == [bytes(r) for r in raw]


def test_recv_msg_asymmetric_caps():
    """Framing caps are asymmetric: the default 16 MB bounds what the
    server will buffer for a request BEFORE the auth check; only the
    client opts into the 64 MB cap when reading compressed reply blobs.
    A frame length over the active cap raises instead of allocating."""
    import socket
    import struct

    from ai_font_renderer_tpu.render.server import _recv_msg

    a, b = socket.socketpair()
    try:
        a.sendall(struct.pack(">I", 17 << 20))
        with pytest.raises(ValueError, match="oversized"):
            _recv_msg(b)  # server-side default: 16 MB
        a.sendall(struct.pack(">I", 5) + b"hello")
        assert _recv_msg(b, cap=64 << 20) == b"hello"  # client reply cap
        a.sendall(struct.pack(">I", (17 << 20) + 1))
        with pytest.raises(ValueError, match="oversized"):
            _recv_msg(b, cap=17 << 20)
    finally:
        a.close()
        b.close()


def test_malformed_request_gets_error_reply(server):
    """Non-JSON and non-object frames get a clean error reply and a close —
    not a handler traceback (any unauthenticated peer can send these)."""
    import json
    import socket
    import struct

    from ai_font_renderer_tpu.render.server import _recv_msg

    _, sock, _ = server
    for payload in (b"not json{", json.dumps(["a", "list"]).encode()):
        with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
            s.connect(sock)
            s.sendall(struct.pack(">I", len(payload)) + payload)
            reply = _recv_msg(s)
            assert reply is not None
            assert json.loads(reply) == {"error": "malformed request"}
            assert _recv_msg(s) is None  # server closed the connection


def test_client_raises_connection_error_when_server_closes(tmp_path):
    """request_render raises ConnectionError (not TypeError on a None
    payload) when the server goes away mid-reply."""
    import socket
    import struct
    import threading

    sock_path = str(tmp_path / "dead.sock")
    srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    srv.bind(sock_path)
    srv.listen(1)

    def accept_and_drop():
        conn, _ = srv.accept()
        (n,) = struct.unpack(">I", conn.recv(4))
        left = n
        while left > 0:  # drain the request so close() sends FIN, not RST
            left -= len(conn.recv(left))
        conn.close()  # vanish before replying

    t = threading.Thread(target=accept_and_drop, daemon=True)
    t.start()
    with pytest.raises(ConnectionError, match="mid-reply"):
        request_render(sock_path, ["HELLO"])
    t.join(timeout=5)
    srv.close()
