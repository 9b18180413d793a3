"""Security + scale contract of the driver-side message channel
(burla_spark/logs.py): host-bound listener, per-job token auth, a
pickle-free transport envelope, one selector-driven reader thread, and
first-delivery-wins log dedup. Pure-socket tests — no Spark session."""

from __future__ import annotations

import pickle
import queue
import socket
import threading
import time

import pytest

from burla_spark.logs import (
    LogStreamClient,
    LogStreamServer,
    MessageStreamClient,
    MessageStreamServer,
    decode_log_frame,
    decode_result_row,
    encode_log_frame,
    encode_result_row,
    once_per_index,
)

HOST = "127.0.0.1"


# ---------------------------------------------------------------------------
# frame codecs: struct round-trips, no pickle on the wire
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "row",
    [
        (0, False, b"\x80payload", "", None, None, None, None),
        (41, True, None, "caught: déjà vu\n", "ValueError", "bad", "tb…", b"\x00\x01"),
        (2**40, False, b"", None, None, None, None, None),
    ],
)
def test_result_row_codec_roundtrip(row):
    assert decode_result_row(encode_result_row(row)) == row


def test_result_batch_codec_roundtrip():
    """Columnar batch frame (one packed array per column, mode byte 0
    for an all-None column): every null/empty/unicode/binary shape must
    survive, including the all-clean fast path and single/empty
    batches."""
    from burla_spark.logs import decode_result_batch, encode_result_batch

    varied = [
        (0, False, b"abc", "", None, None, None, None),
        (1, True, None, "out\n", "ValueError", "boom", "tb…", b"\x00pkl"),
        (2, False, b"", "", "", None, "x", None),
        (3, False, b"\x00\xff", "unicode é", None, "", None, b""),
        (2**40, False, b"big-idx", None, None, None, None, None),
    ]
    assert decode_result_batch(encode_result_batch(varied)) == varied
    # all-clean fast path: empty stdout strings, all error columns None
    clean = [
        (i, False, pickle.dumps(i), "", None, None, None, None)
        for i in range(300)
    ]
    assert decode_result_batch(encode_result_batch(clean)) == clean
    assert decode_result_batch(encode_result_batch([varied[1]])) == [varied[1]]
    assert decode_result_batch(encode_result_batch([])) == []


def test_log_frame_codec_roundtrip():
    assert decode_log_frame(encode_log_frame(7, "héllo\nwörld")) == (7, "héllo\nwörld")
    assert decode_log_frame(encode_log_frame(-1, "")) == (-1, "")


def test_envelope_contains_no_pickle_opcodes():
    # the transport frame for a log message is struct+utf8; feeding it
    # to pickle must fail, proving nothing on the wire auto-executes.
    frame = encode_log_frame(3, "print output")
    with pytest.raises(Exception):
        pickle.loads(frame)


# ---------------------------------------------------------------------------
# listener security
# ---------------------------------------------------------------------------
def test_server_binds_advertised_host_only():
    srv = MessageStreamServer(lambda b: None, HOST)
    try:
        assert srv._srv.getsockname()[0] == HOST  # not 0.0.0.0
        host, port, token = srv.advertise
        assert host == HOST and len(token) == 16
    finally:
        srv.__exit__()


def test_wrong_token_dropped_before_any_parse():
    hits: list = []
    with LogStreamServer(lambda i, t: hits.append((i, t)), HOST) as srv:
        host, port, _ = srv.advertise
        evil = pickle.dumps((0, "pwn"))
        with socket.create_connection((host, port), timeout=2) as s:
            s.sendall(b"X" * 16 + len(evil).to_bytes(4, "big") + evil)
            s.settimeout(3)
            assert s.recv(1) == b""  # server closed on us
    assert hits == []


def test_missing_token_prefix_never_reaches_sink():
    hits: list = []
    with LogStreamServer(lambda i, t: hits.append((i, t)), HOST) as srv:
        host, port, token = srv.advertise
        # a valid frame but the first 16 bytes aren't the token
        frame = encode_log_frame(1, "x")
        with socket.create_connection((host, port), timeout=2) as s:
            s.sendall(len(frame).to_bytes(4, "big") + frame + b"\x00" * 8)
            s.settimeout(3)
            assert s.recv(1) == b""
    assert hits == []


def test_authenticated_client_delivers():
    got: "queue.Queue" = queue.Queue()
    with LogStreamServer(lambda i, t: got.put((i, t)), HOST) as srv:
        client = LogStreamClient(*srv.advertise)
        assert client.send(5, "live line\n")
        assert client.send(9, "second\n")
        client.close()
        assert got.get(timeout=5) == (5, "live line\n")
        assert got.get(timeout=5) == (9, "second\n")


def test_oversize_frame_drops_connection():
    got: list = []
    with MessageStreamServer(got.append, HOST, max_msg=64) as srv:
        client = MessageStreamClient(*srv.advertise, max_msg=1 << 20)
        assert client.send_frame(b"y" * 1000)  # accepted locally, rejected remotely
        deadline = time.time() + 3
        while time.time() < deadline and not client._dead:
            client.send_frame(b"z")  # eventually hits the closed socket
            time.sleep(0.05)
    assert got == [] or all(len(f) <= 64 for f in got)


# ---------------------------------------------------------------------------
# scale: many concurrent pushers, ONE reader thread
# ---------------------------------------------------------------------------
def test_selector_reader_handles_256_concurrent_pushers():
    n_conns, per_conn = 256, 4
    got: "queue.Queue" = queue.Queue()
    failures: list = []
    baseline = threading.active_count()
    with MessageStreamServer(got.put, HOST) as srv:
        addr = srv.advertise

        def pusher(i: int) -> None:
            try:
                c = MessageStreamClient(*addr)
                for j in range(per_conn):
                    if not c.send_frame(f"{i}:{j}".encode()):
                        failures.append((i, j))
                c.close()
            except Exception as exc:  # noqa: BLE001
                failures.append((i, repr(exc)))

        threads = [threading.Thread(target=pusher, args=(i,)) for i in range(n_conns)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert not failures, failures[:5]
        frames = set()
        deadline = time.time() + 20
        while len(frames) < n_conns * per_conn and time.time() < deadline:
            try:
                frames.add(got.get(timeout=1))
            except queue.Empty:
                pass
        assert len(frames) == n_conns * per_conn
        # thread-per-connection would have spawned ~256 reader threads;
        # the selector design adds exactly one.
        assert threading.active_count() <= baseline + 2


# ---------------------------------------------------------------------------
# delivery dedup
# ---------------------------------------------------------------------------
def test_once_per_index_first_delivery_wins():
    out: list = []
    sink = once_per_index(lambda i, t: out.append((i, t)))
    sink(1, "first attempt")
    sink(2, "other input")
    sink(1, "speculative replay")  # dropped
    sink(1, "with-result fallback replay")  # dropped
    assert out == [(1, "first attempt"), (2, "other input")]
