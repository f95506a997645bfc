"""Ogg container + Vorbis header tests (synthetic pages)."""

import struct

import pytest

from mixlab_tpu.av import ogg


def make_page(serial, sequence, packets, header_type=0, granule=0, partial_last=False):
    """Build a valid Ogg page; packets is a list of bytes. If partial_last,
    the final packet's lacing omits the terminating <255 lace."""
    lacing = bytearray()
    body = bytearray()
    for i, pkt in enumerate(packets):
        body += pkt
        n = len(pkt)
        while n >= 255:
            lacing.append(255)
            n -= 255
        if not (partial_last and i == len(packets) - 1):
            lacing.append(n)
        elif n != 0:
            raise ValueError("partial packet must be a multiple of 255 bytes")
    header = b"OggS" + struct.pack(
        "<BBqIIIB", 0, header_type, granule, serial, sequence, 0, len(lacing)
    ) + bytes(lacing)
    raw = header + bytes(body)
    crc = ogg.ogg_crc(raw)
    raw = raw[:22] + struct.pack("<I", crc) + raw[26:]
    return raw


def test_single_page_packets():
    page = make_page(7, 0, [b"hello", b"world!!"], header_type=2)
    r = ogg.PacketReader()
    pkts = r.feed(page)
    assert pkts == [(7, b"hello"), (7, b"world!!")]


def test_packet_spanning_pages():
    big = bytes(range(256)) * 2  # 512 bytes -> laces 255,255,2
    part1 = big[:510]
    page1 = make_page(9, 0, [part1], header_type=2, partial_last=True)
    page2 = make_page(9, 1, [big[510:]], header_type=1)  # continued
    r = ogg.PacketReader()
    assert r.feed(page1) == []
    assert r.feed(page2) == [(9, big)]


def test_crc_rejected():
    page = bytearray(make_page(1, 0, [b"data"]))
    page[-1] ^= 0xFF  # corrupt body
    r = ogg.PacketReader()
    r.pages.feed(bytes(page))
    with pytest.raises(ogg.OggError):
        list(r.pages.pages())


def test_incremental_feed():
    page = make_page(3, 0, [b"abc" * 50])
    r = ogg.PacketReader()
    out = []
    for i in range(0, len(page), 7):
        out += r.feed(page[i : i + 7])
    assert out == [(3, b"abc" * 50)]


def test_vorbis_ident_and_comments():
    ident = b"\x01vorbis" + struct.pack("<IBI", 0, 2, 44100) + struct.pack(
        "<iii", -1, 128000, -1
    ) + b"\xb8\x01"
    info = ogg.parse_vorbis_ident(ident)
    assert info.channels == 2 and info.sample_rate == 44100
    assert info.bitrate_nominal == 128000

    vendor = b"mixlab"
    c1 = b"TITLE=Chronos"
    c2 = b"ARTIST=Someone"
    comments = (
        b"\x03vorbis"
        + struct.pack("<I", len(vendor)) + vendor
        + struct.pack("<I", 2)
        + struct.pack("<I", len(c1)) + c1
        + struct.pack("<I", len(c2)) + c2
        + b"\x01"
    )
    tags = ogg.parse_vorbis_comments(comments)
    assert tags == {"TITLE": "Chronos", "ARTIST": "Someone"}


def test_non_vorbis_rejected():
    with pytest.raises(ogg.OggError):
        ogg.parse_vorbis_ident(b"\x01theora" + b"\x00" * 30)
