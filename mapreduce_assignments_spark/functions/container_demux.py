"""Pure-stdlib video container mux/demux: AVI (RIFF) and MP4 (ISO BMFF).

Real container formats, zero third-party imports — the same role
`png_codec`/`jpeg_codec` play for images. A demuxer turns an opaque
video BINARY column into an ordered list of frame payloads; with
MJPEG streams those payloads are baseline JPEGs the sibling
`jpeg_codec` decodes, so the full video path (demux -> per-frame
decode -> feature rows) runs on genuine on-disk formats inside the
Arrow pipeline.

Parity target: the reference treats all media as opaque bytes
(SequenceFile BytesWritable values); these codecs are the
Spark-first extension SURVEY.md's multimodal section calls for.

Subset honesty:

- AVI: single RIFF, frames read from the ``LIST movi`` payload
  (``##db``/``##dc`` chunks, ``LIST rec`` groups descended);
  OpenDML ``RIFF AVIX`` extensions and ``indx`` super-indexes are
  out of subset (ValueError).
- MP4: version-0/1 full boxes, one video (`hdlr` type ``vide``)
  track, sample tables ``stsz``/``stz2``(8/16-bit)/``stsc``/
  ``stco``/``co64``. Fragmented MP4 (``moof``) is out of subset
  (ValueError).

Both demuxers raise ``ValueError`` on structurally corrupt input;
``multimodal.demux_video`` converts that to the documented
drop-undecodable-rows contract.
"""

from __future__ import annotations

import struct

__all__ = [
    "mux_avi_mjpeg",
    "mux_avi_raw",
    "demux_avi",
    "mux_mp4",
    "demux_mp4",
]


# ---------------------------------------------------------------------------
# AVI (RIFF) — little-endian chunks, even-byte padding


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + body)


def mux_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Build a minimal standards-shaped AVI whose single ``vids``
    stream is MJPG: each frame payload becomes one ``00dc`` chunk.
    Valid header set (``avih``/``strh``/``strf``), ``idx1`` index.
    Deterministic bytes for fixed input."""
    return _mux_avi(frames, width, height, fps, b"MJPG", b"MJPG", 24)


def mux_avi_raw(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Build a minimal standards-shaped AVI whose single ``vids``
    stream is UNCOMPRESSED 8-bit (``DIB `` handler, BI_RGB strf):
    each raw frame payload becomes one ``00dc`` chunk, recoverable
    byte-for-byte by :func:`demux_avi` — the AVI analogue of
    ``mux_mp4``'s raw text samples, so demux correctness is
    value-checkable against the source bytes (MJPEG frames are
    lossy-JPEG and only presence/dims-checkable). Deterministic
    bytes for fixed input.

    The strh/strf dims (and the derived ``biSizeImage`` /
    ``dwSuggestedBufferSize``) are NOMINAL: callers may pass frame
    payloads whose length differs from ``width*height`` (registry
    stagings feed 16-byte payloads under 8x8 declared dims).
    :func:`demux_avi` recovers frames purely from the ``00dc``
    chunk sizes and never trusts the declared geometry, so the
    round-trip is exact regardless — but a strict external AVI
    parser that validates chunk size against biSizeImage may
    reject such a file. Declare payload-sized dims if the output
    must survive strict parsers."""
    return _mux_avi(frames, width, height, fps, b"DIB ", b"\x00\x00\x00\x00", 8)


def _mux_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int,
    handler: bytes,
    compression: bytes,
    bit_count: int,
) -> bytes:
    usec = 1_000_000 // fps
    n = len(frames)
    avih = struct.pack(
        "<14I",
        usec,            # dwMicroSecPerFrame
        0, 0,            # dwMaxBytesPerSec, dwPaddingGranularity
        0x10,            # dwFlags: AVIF_HASINDEX
        n, 0, 1,         # dwTotalFrames, dwInitialFrames, dwStreams
        max((len(f) for f in frames), default=0),
        width, height,
        0, 0, 0, 0,      # dwReserved
    )
    strh = (
        b"vids" + handler
        + struct.pack(
            "<IHHIIIIIIII",
            0, 0, 0,     # dwFlags, wPriority, wLanguage
            0,           # dwInitialFrames
            1, fps,      # dwScale, dwRate
            0, n,        # dwStart, dwLength
            max((len(f) for f in frames), default=0),
            0xFFFFFFFF,  # dwQuality (default)
            0,           # dwSampleSize (0 = variable)
        )
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, bit_count, compression,
        width * height * (bit_count // 8), 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_body = b"".join(_riff_chunk(b"00dc", f) for f in frames)
    movi = _riff_list(b"movi", movi_body)
    # idx1 offsets are relative to the 'movi' fourcc position
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _riff_chunk(b"idx1", b"".join(idx_entries))
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def demux_avi(content: bytes) -> list[bytes]:
    """Ordered video frame payloads from an AVI: walk the RIFF tree
    to ``LIST movi`` and collect ``##db``/``##dc`` stream chunks
    (descending into ``LIST rec`` interleave groups). Raises
    ValueError when the container is not a well-formed AVI."""
    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' header missing)")
    riff_size = struct.unpack("<I", content[4:8])[0]
    end = min(len(content), 8 + riff_size)
    frames: list[bytes] = []

    def walk(start: int, stop: int, in_movi: bool) -> None:
        pos = start
        while pos + 8 <= stop:
            cid = content[pos : pos + 4]
            (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
            body = pos + 8
            if body + size > stop:
                raise ValueError("AVI chunk overruns its parent")
            if cid == b"LIST":
                if size < 4:
                    raise ValueError("AVI LIST too short for a type")
                ltype = content[body : body + 4]
                if ltype == b"movi" or (in_movi and ltype == b"rec "):
                    walk(body + 4, body + size, True)
            elif in_movi and cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(bytes(content[body : body + size]))
            pos = body + size + (size & 1)

    walk(12, end, False)
    return frames


# ---------------------------------------------------------------------------
# MP4 (ISO base media file format) — big-endian length-prefixed boxes


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full_box(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def mux_mp4(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    codec: bytes = b"mp4v",
    samples_per_chunk: int = 2,
) -> bytes:
    """Build a minimal progressive MP4: ``ftyp`` + ``mdat`` (frame
    payloads, chunked ``samples_per_chunk`` at a time) + ``moov``
    with the full sample-table set (``stsd``/``stts``/``stsc``/
    ``stsz``/``stco``) a real reader needs to locate every sample.
    Chunking > 1 exercises the stsc/stco expansion on the demux
    side. Deterministic bytes for fixed input."""
    if samples_per_chunk < 1:
        raise ValueError("samples_per_chunk must be >= 1")
    n = len(frames)
    timescale, delta = fps * 100, 100
    duration = n * delta
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    # absolute chunk offsets: mdat body starts right after ftyp + mdat header
    base = len(ftyp) + 8
    chunk_offsets, pos = [], base
    for i in range(0, n, samples_per_chunk):
        chunk_offsets.append(pos)
        pos += sum(len(f) for f in frames[i : i + samples_per_chunk])

    mvhd = _full_box(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x00010000, 0x0100) + b"\x00" * 10
        + _MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _full_box(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 16
        + _MATRIX + struct.pack(">II", width << 16, height << 16),
    )
    mdhd = _full_box(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = _full_box(
        b"hdlr", 0, 0,
        struct.pack(">I4s", 0, b"vide") + b"\x00" * 12 + b"VideoHandler\x00",
    )
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved, data_ref_index
        + b"\x00" * 16                               # pre_defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)
        + b"\x00" * 32                               # compressorname
        + struct.pack(">Hh", 24, -1)                 # depth, pre_defined
    )
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + _box(codec, entry))
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc_entries = (
        [(1, samples_per_chunk, 1)] if n >= samples_per_chunk else []
    )
    tail = n % samples_per_chunk
    if tail and n > samples_per_chunk:
        stsc_entries.append((len(chunk_offsets), tail, 1))
    elif tail and n <= samples_per_chunk:
        stsc_entries = [(1, tail, 1)]
    stsc = _full_box(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full_box(
        b"stco", 0, 0,
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full_box(
        b"dref", 0, 0, struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b"")
    )
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _iter_boxes(content: bytes, start: int, stop: int):
    pos = start
    while pos + 8 <= stop:
        (size,) = struct.unpack(">I", content[pos : pos + 4])
        fourcc = content[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if body + 8 > stop:
                raise ValueError("MP4 largesize header truncated")
            (size,) = struct.unpack(">Q", content[body : body + 8])
            body += 8
            end = pos + size
        elif size == 0:  # box extends to EOF
            end = stop
        else:
            end = pos + size
        if end > stop or end < body:
            raise ValueError("MP4 box overruns its parent")
        yield fourcc, body, end
        pos = end


def _find_box(content: bytes, start: int, stop: int, fourcc: bytes):
    for fc, body, end in _iter_boxes(content, start, stop):
        if fc == fourcc:
            return body, end
    return None


def _full_body(content: bytes, body: int):
    version = content[body]
    return version, body + 4


def demux_mp4(content: bytes) -> list[bytes]:
    """Ordered video sample payloads from a progressive MP4: locate
    the ``vide`` track's sample tables (stsz/stz2 sizes, stsc
    sample-to-chunk runs, stco/co64 chunk offsets) and slice each
    sample out of the file — the same offset arithmetic every ISO
    BMFF reader performs. Raises ValueError when no well-formed
    video track exists (fragmented/moof files are out of subset)."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        raise ValueError("not an MP4 (no leading ftyp box)")
    moov = _find_box(content, 0, len(content), b"moov")
    if moov is None:
        if _find_box(content, 0, len(content), b"moof") is not None:
            raise ValueError("fragmented MP4 (moof) is out of subset")
        raise ValueError("MP4 has no moov box")
    for fc, t_body, t_end in _iter_boxes(content, moov[0], moov[1]):
        if fc != b"trak":
            continue
        mdia = _find_box(content, t_body, t_end, b"mdia")
        if mdia is None:
            continue
        hdlr = _find_box(content, mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            continue
        _, h = _full_body(content, hdlr[0])
        if content[h + 4 : h + 8] != b"vide":
            continue
        minf = _find_box(content, mdia[0], mdia[1], b"minf")
        stbl = minf and _find_box(content, minf[0], minf[1], b"stbl")
        if not stbl:
            raise ValueError("video trak lacks minf/stbl")
        return _read_samples(content, stbl[0], stbl[1])
    raise ValueError("MP4 has no video (hdlr 'vide') track")


def _read_samples(content: bytes, start: int, stop: int) -> list[bytes]:
    sizes: list[int] | None = None
    offsets: list[int] | None = None
    stsc_runs: list[tuple[int, int]] | None = None
    for fc, body, end in _iter_boxes(content, start, stop):
        if fc == b"stsz":
            _, p = _full_body(content, body)
            fixed, count = struct.unpack(">II", content[p : p + 8])
            if fixed:
                sizes = [fixed] * count
            else:
                sizes = list(
                    struct.unpack(f">{count}I", content[p + 8 : p + 8 + 4 * count])
                )
        elif fc == b"stz2":
            _, p = _full_body(content, body)
            field_size = content[p + 3]
            (count,) = struct.unpack(">I", content[p + 4 : p + 8])
            raw = content[p + 8 : end]
            if field_size == 8:
                sizes = list(raw[:count])
            elif field_size == 16:
                sizes = list(struct.unpack(f">{count}H", raw[: 2 * count]))
            else:
                raise ValueError(f"stz2 field size {field_size} out of subset")
        elif fc in (b"stco", b"co64"):
            _, p = _full_body(content, body)
            (count,) = struct.unpack(">I", content[p : p + 4])
            fmt = ">%d%s" % (count, "I" if fc == b"stco" else "Q")
            width = 4 if fc == b"stco" else 8
            offsets = list(
                struct.unpack(fmt, content[p + 4 : p + 4 + width * count])
            )
        elif fc == b"stsc":
            _, p = _full_body(content, body)
            (count,) = struct.unpack(">I", content[p : p + 4])
            stsc_runs = [
                struct.unpack(">II", content[p + 4 + 12 * i : p + 12 + 12 * i])
                for i in range(count)
            ]  # (first_chunk, samples_per_chunk); description index ignored
    if sizes is None or offsets is None or stsc_runs is None:
        raise ValueError("MP4 stbl missing stsz/stco/stsc")
    # expand stsc runs -> per-chunk sample counts
    if stsc_runs and stsc_runs[0][0] != 1:
        # ISO 14496-12 8.7.4: the first run MUST start at chunk 1.
        # Without this check a corrupt table whose first run starts
        # later silently shifts sample counts onto the wrong chunks,
        # and when the shifted counts still total len(sizes) the
        # final si==len(sizes) guard passes and WRONG sample bytes
        # come back instead of the documented drop contract.
        raise ValueError("MP4 stsc first run does not start at chunk 1")
    per_chunk: list[int] = []
    for i, (first, spc) in enumerate(stsc_runs):
        last = stsc_runs[i + 1][0] if i + 1 < len(stsc_runs) else len(offsets) + 1
        if first < 1 or (i + 1 < len(stsc_runs) and last <= first):
            raise ValueError("MP4 stsc run order corrupt")
        per_chunk.extend([spc] * (last - first))
    samples: list[bytes] = []
    si = 0
    for ci, chunk_off in enumerate(offsets):
        count = per_chunk[ci] if ci < len(per_chunk) else 0
        pos = chunk_off
        for _ in range(count):
            if si >= len(sizes):
                break
            size = sizes[si]
            if pos + size > len(content):
                raise ValueError("MP4 sample overruns the file")
            samples.append(bytes(content[pos : pos + size]))
            pos += size
            si += 1
    if si != len(sizes):
        raise ValueError(
            f"MP4 sample walk found {si} of {len(sizes)} declared samples"
        )
    return samples
