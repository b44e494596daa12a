"""Micro-bench for the round-8 decoder vectorization (VERDICT r7 item
5): the numpy BMP/PNG decode vs the round-7 per-byte reference, on a
512x512 RGB frame. The reference implementations below are the exact
round-7 loops, kept here so the speedup claim stays measurable.

Usage: python tools/decode_bench.py
"""

from __future__ import annotations

import os
import struct
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_sorted_spark.functions.multimodal import (  # noqa: E402
    _decode_bmp,
    _decode_png,
)

W = H = 512


def _ref_decode_bmp(data: bytes) -> dict:
    """Round-7 per-byte BMP decode (reference for the bench)."""
    px_off = struct.unpack_from("<I", data, 10)[0]
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    top_down = height < 0
    h = abs(height)
    step = bpp // 8
    row_bytes = (width * step + 3) & ~3
    out = bytearray()
    for r in range(h):
        src_row = r if top_down else h - 1 - r
        base = px_off + src_row * row_bytes
        for c in range(width):
            i = base + c * step
            out += bytes((data[i + 2], data[i + 1], data[i]))
    return {"width": width, "height": h, "mode": "RGB", "pixels": bytes(out)}


def _ref_unfilter(raw: bytes, w: int, h: int, ch: int) -> bytes:
    """Round-7 per-byte PNG unfilter (reference for the bench)."""
    stride = w * ch
    out = bytearray()
    prev = bytearray(stride)
    p = 0
    for _ in range(h):
        ft = raw[p]
        p += 1
        line = bytearray(raw[p : p + stride])
        p += stride
        if ft == 1:
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pr = a + b - c
                pa, pb, pc = abs(pr - a), abs(pr - b), abs(pr - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        out += line
        prev = line
    return bytes(out)


def make_bmp() -> bytes:
    row_bytes = (W * 3 + 3) & ~3
    px = bytearray()
    for r in range(H):
        line = bytearray()
        for c in range(W):
            line += bytes(((r * 7 + c) % 256, (c * 3) % 256, (r * 5) % 256))
        line += b"\x00" * (row_bytes - len(line))
        px += line
    header_size = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", header_size + len(px), 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, W, H, 1, 24, 0, len(px), 0, 0, 0, 0)
        + bytes(px)
    )


def make_png(filters: list[int]) -> bytes:
    ch = 3
    stride = W * ch
    flat = bytes(
        b
        for r in range(H)
        for c in range(W)
        for b in ((r * 7 + c) % 256, (c * 3) % 256, (r * 5) % 256)
    )
    raw = bytearray()
    prev = bytearray(stride)
    for r in range(H):
        line = flat[r * stride : (r + 1) * stride]
        ft = filters[r % len(filters)]
        raw.append(ft)
        enc = bytearray()
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                v = line[i]
            elif ft == 1:
                v = (line[i] - a) & 0xFF
            elif ft == 2:
                v = (line[i] - b) & 0xFF
            elif ft == 3:
                v = (line[i] - ((a + b) >> 1)) & 0xFF
            else:
                pr = a + b - c
                pa, pb, pc = abs(pr - a), abs(pr - b), abs(pr - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (line[i] - pred) & 0xFF
            enc.append(v)
        raw += enc
        prev = bytearray(line)

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    ihdr = struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def timed(fn, runs=3):
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best, r


def main():
    bmp = make_bmp()
    t_new, d_new = timed(lambda: _decode_bmp(bmp))
    t_ref, d_ref = timed(lambda: _ref_decode_bmp(bmp))
    assert d_new["pixels"] == d_ref["pixels"], "BMP outputs diverge"
    print(f"BMP {W}x{H}: ref {t_ref*1e3:.1f} ms -> new {t_new*1e3:.1f} ms "
          f"({t_ref/t_new:.1f}x)")

    for name, filters in (
        ("vectorizable filters 0/1/2", [0, 1, 2]),
        ("sequential filters 3/4", [3, 4]),
        ("typical mix 0..4", [0, 1, 2, 3, 4]),
    ):
        png = make_png(filters)
        t_new, d_new = timed(lambda: _decode_png(png))
        # reference: same inflate, per-byte unfilter
        pos = 8
        idat = bytearray()
        while pos + 8 <= len(png):
            ln, typ = struct.unpack_from(">I4s", png, pos)
            if typ == b"IDAT":
                idat += png[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        raw = zlib.decompress(bytes(idat))
        t_ref, p_ref = timed(lambda: _ref_unfilter(raw, W, H, 3))
        assert d_new["pixels"] == p_ref, "PNG outputs diverge"
        print(f"PNG {W}x{H} {name}: ref {t_ref*1e3:.1f} ms -> "
              f"new {t_new*1e3:.1f} ms ({t_ref/t_new:.1f}x)")


if __name__ == "__main__":
    main()
