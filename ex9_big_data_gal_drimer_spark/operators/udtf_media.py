"""PNG container walk as a Python UDTF (SURVEY.md §2.10 UDF tier).

Completes the Python-execution tier: scalar ``pandas_udf`` (X5 dims),
grouped-map ``applyInPandas`` (resample), ``mapInPandas`` (features,
vectorized top-k), ``applyInPandasWithState`` (streaming TTL) — and
here a **table function**: one input row fans out into a variable
number of typed output rows.  That shape (iterate a container format's
internal structure, emit a row per element) has no column-expression
form: the chunk count, offsets and lengths are data-dependent, so the
walk is inherently imperative.  The same pattern covers video
frame-sampling and audio packet walks — PNG chunks are the
container-structure stand-in this testdata can synthesize.

Scale shape: a UDTF is applied with ``lateralJoin``/TVF over the
payload table; rows fan out inside the Python worker, partition by
partition — no driver involvement, no shuffle added by the fan-out
itself.  Arrow transfer is enabled via
``spark.sql.execution.pythonUDTF.arrow.enabled`` (session.PLAN_CONF
leaves it to the caller; the registered query sets it).
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql.functions import udtf

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def make_png(width: int, height: int, seed_bytes: bytes) -> bytes:
    """Deterministic minimal spec-conformant PNG: IHDR + one IDAT
    (zlib-compressed grayscale scanlines tiled from seed_bytes) + IEND,
    every chunk with a correct CRC-32."""

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    body_len = height * (1 + width)  # filter byte + row of grayscale
    seed = seed_bytes or b"\x00"
    raw = (seed * (body_len // len(seed) + 1))[:body_len]
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 1))
        + chunk(b"IEND", b"")
    )


def make_png_rgb(width: int, height: int, body: bytes) -> bytes:
    """Deterministic VALID RGB PNG (color type 2, filter 0 scanlines)
    whose pixel bytes are exactly ``body[:width*height*3]`` tiled —
    i.e. the same image a P6 PPM with that body encodes, so the two
    containers decode to identical pixels (decode-parity fixture for
    multimodal.decode_png_pixels).  Unlike :func:`make_png` (whose
    scanlines are arbitrary seed bytes — chunk-walk fixtures, not
    decodable), every scanline here carries a spec-valid filter byte."""

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    stride = width * 3
    need = stride * height
    src = body or b"\x00"
    pixels = (src * (need // len(src) + 1))[:need]
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


@udtf(
    returnType="chunk_index int, chunk_type string, data_len int, "
    "crc_ok boolean, truncated boolean"
)
class PngChunkWalk:
    """Emit one row per PNG chunk of a payload; non-PNG payloads emit
    nothing.  ``truncated`` marks a chunk whose declared length runs
    past the buffer (corrupt file) — the walk stops there, which is the
    audit signal a media-ingest pipeline wants."""

    def eval(self, payload):  # noqa: D102 — UDTF contract method
        if payload is None or not bytes(payload).startswith(PNG_SIG):
            return
        buf = bytes(payload)
        pos, index = len(PNG_SIG), 0
        while pos + 8 <= len(buf):
            (length,) = struct.unpack(">I", buf[pos : pos + 4])
            ctype = buf[pos + 4 : pos + 8]
            data_end = pos + 8 + length
            if data_end + 4 > len(buf):
                yield (index, ctype.decode("latin-1"), length, False, True)
                return
            data = buf[pos + 8 : data_end]
            (crc,) = struct.unpack(">I", buf[data_end : data_end + 4])
            crc_ok = crc == (zlib.crc32(ctype + data) & 0xFFFFFFFF)
            yield (index, ctype.decode("latin-1"), length, crc_ok, False)
            if ctype == b"IEND":
                return
            pos, index = data_end + 4, index + 1


# ---------------------------------------------------------------------------
# Deterministic JPEG synthesis (grayscale, flat unit quantizer) for the
# media decode-parity corpus: the SAME quantized DCT coefficients emitted
# either as a baseline (SOF0) or a progressive (SOF2, spectral selection +
# DC successive approximation) stream, so the two containers decode to
# IDENTICAL pixels despite JPEG being lossy — the decode-parity invariant
# media_jpeg_decode_parity audits.  Kept deliberately smaller than the
# independent test encoder (tests/test_multimodal.py `_jpeg_progressive`:
# color, 4:2:0, AC successive approximation), which remains the decoder's
# correctness pin; this one only has to PRODUCE spec-valid corpus files.
# ---------------------------------------------------------------------------

def _jpeg_gray_zzq(width: int, height: int, body: bytes):
    """Tile ``body`` into a width×height grayscale image (the same
    tiling contract as :func:`make_png_rgb`) and return its unit-
    quantized zigzag DCT coefficients as an int list per 8×8 block,
    blocks in raster order over the edge-padded grid."""
    import numpy as np

    # the decoder's zigzag table IS the spec table — share it so the
    # encoder/decoder pair cannot drift (round-9 review)
    from .multimodal import _ZIGZAG

    need = width * height
    src = body or b"\x00"
    pix = (
        np.frombuffer((src * (need // len(src) + 1))[:need], dtype=np.uint8)
        .astype(np.float64)
        .reshape(height, width)
    )
    bh, bw = -(-height // 8), -(-width // 8)
    padded = np.pad(pix, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge")
    k = np.arange(8)
    basis = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.where(
        k[:, None] == 0, (1 / 8) ** 0.5, (2 / 8) ** 0.5
    )
    blocks = []
    for by in range(bh):
        for bx in range(bw):
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            f = np.round(basis @ blk @ basis.T).astype(np.int64)
            blocks.append([int(f[rc]) for rc in _ZIGZAG])
    return bh, bw, blocks


def _jpeg_canon(symbols):
    """Canonical single-length Huffman table over the scan's symbol
    set: all codes one length L with 2**L > n, so the all-ones code
    stays unused as T.81 requires."""
    ordered = sorted(set(symbols))
    length = max(1, len(ordered).bit_length())
    counts = [0] * 16
    counts[length - 1] = len(ordered)
    return counts, ordered, {s: (i, length) for i, s in enumerate(ordered)}


def _jpeg_emit_scan(out: bytearray, events, klass: int, ss: int, se: int,
                    ah: int, al: int) -> None:
    """Append one DHT + SOS + entropy-coded segment for a single-
    component scan; ``events`` is a sequence of ("SYM", s) huffman
    symbols and ("BITS", v, n) raw appended bits."""
    evs = list(events)
    code = {}
    syms = {e[1] for e in evs if e[0] == "SYM"}
    if syms:
        counts, order, code = _jpeg_canon(syms)
        payload = bytes([klass << 4]) + bytes(counts) + bytes(order)
        out.extend(b"\xff\xc4" + (2 + len(payload)).to_bytes(2, "big") + payload)
    sos = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
    out.extend(b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos)
    _jpeg_pack_bits(
        out, (code[e[1]] if e[0] == "SYM" else (e[1], e[2]) for e in evs)
    )


def _jpeg_pack_bits(out: bytearray, items) -> None:
    """Pack (value, nbits) pairs MSB-first with 0xFF byte stuffing,
    padding the final byte with 1-bits per T.81 B.1.1.5."""
    acc = nbits = 0
    for v, n in items:
        acc = (acc << n) | (v & ((1 << n) - 1))
        nbits += n
        while nbits >= 8:
            nbits -= 8
            byte = (acc >> nbits) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            acc &= (1 << nbits) - 1
    if nbits:
        byte = ((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xFF
        out.append(byte)
        if byte == 0xFF:  # stuffing applies to the padded tail byte too
            out.append(0x00)


def _jpeg_dc_events(blocks, al: int):
    """DC scan events at point transform ``al`` (size symbol + extend
    bits of the prediction difference over arithmetic-shifted values)."""
    pred = 0
    for zz in blocks:
        d = zz[0] >> al
        diff, pred = d - pred, d
        size = abs(diff).bit_length()
        yield ("SYM", size)
        if size:
            yield ("BITS", diff if diff >= 0 else diff + (1 << size) - 1, size)


def _jpeg_ac_events(blocks, ss: int, se: int):
    """AC band scan events at Al=0: run/size symbols with ZRL, and
    EOB runs accumulated ACROSS blocks (progressive EOBn coding;
    baseline callers pass one block at a time so runs never exceed 1)."""
    eobrun = 0

    def flush():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            yield ("SYM", nb << 4)
            if nb:
                yield ("BITS", eobrun - (1 << nb), nb)
            eobrun = 0

    for zz in blocks:
        band = zz[ss : se + 1]
        nz = [i for i, v in enumerate(band) if v]
        if not nz:
            eobrun += 1
            if eobrun == 0x7FFF:
                yield from flush()
            continue
        yield from flush()
        run = 0
        for k in range(nz[-1] + 1):
            if band[k] == 0:
                run += 1
                if run == 16:
                    yield ("SYM", 0xF0)
                    run = 0
                continue
            size = abs(band[k]).bit_length()
            yield ("SYM", (run << 4) | size)
            yield ("BITS", band[k] if band[k] > 0 else band[k] + (1 << size) - 1,
                   size)
            run = 0
        if nz[-1] < len(band) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                yield from flush()
    yield from flush()


def make_jpeg_gray(width: int, height: int, body: bytes,
                   progressive: bool = False) -> bytes:
    """Deterministic VALID grayscale JPEG whose unit-quantized DCT
    coefficients come from ``body`` tiled to width×height pixels.
    ``progressive=False`` emits a baseline SOF0 single-scan stream;
    ``progressive=True`` emits an SOF2 stream — interleaved DC first
    scan at Al=1, AC spectral-selection bands 1–5 and 6–63 at Al=0
    (with cross-block EOB runs), then the DC refinement scan — from
    the SAME coefficients, so both decode to identical pixels."""
    _, _, blocks = _jpeg_gray_zzq(width, height, body)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([0] + [1] * 64)
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big") \
        + bytes([1, 1, 0x11, 0])
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") \
        + (2 + len(sof)).to_bytes(2, "big") + sof
    if progressive:
        _jpeg_emit_scan(out, _jpeg_dc_events(blocks, 1), 0, 0, 0, 0, 1)
        _jpeg_emit_scan(out, _jpeg_ac_events(blocks, 1, 5), 1, 1, 5, 0, 0)
        _jpeg_emit_scan(out, _jpeg_ac_events(blocks, 6, 63), 1, 6, 63, 0, 0)
        _jpeg_emit_scan(
            out,
            (("BITS", zz[0] & 1, 1) for zz in blocks),
            0, 0, 0, 1, 0,
        )
    else:
        def interleaved():
            pred = 0
            for zz in blocks:
                d = zz[0]
                diff, pred = d - pred, d
                size = abs(diff).bit_length()
                yield ("SYM", 0, size)
                if size:
                    yield ("BITS",
                           diff if diff >= 0 else diff + (1 << size) - 1, size)
                for ev in _jpeg_ac_events([zz], 1, 63):
                    yield ("SYM", 1, ev[1]) if ev[0] == "SYM" else ev
        _jpeg_emit_baseline(out, interleaved())
    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_emit_baseline(out: bytearray, events) -> None:
    """Append the two baseline DHTs (DC class 0 + AC class 1, both
    table id 0) and the single SOF0 scan; ``events`` tags each symbol
    with its table class: ("SYM", klass, s) / ("BITS", v, n)."""
    evs = list(events)
    codes = {}
    for klass in (0, 1):
        syms = {e[2] for e in evs if e[0] == "SYM" and e[1] == klass}
        if not syms:
            continue
        counts, order, code = _jpeg_canon(syms)
        payload = bytes([(klass << 4)]) + bytes(counts) + bytes(order)
        out.extend(b"\xff\xc4" + (2 + len(payload)).to_bytes(2, "big") + payload)
        codes[klass] = code
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out.extend(b"\xff\xda" + (2 + len(sos)).to_bytes(2, "big") + sos)
    _jpeg_pack_bits(
        out,
        (codes[e[1]][e[2]] if e[0] == "SYM" else (e[1], e[2]) for e in evs),
    )


def make_wav(tag: int, bits: int, data: bytes, rate: int = 8000,
             channels: int = 1, block_align: int | None = None) -> bytes:
    """Minimal spec-conformant RIFF/WAVE container around raw codec
    bytes (canonical fmt chunk + data chunk) — the ONE WAV byte layout
    every corpus synthesizer shares, so a header fix reaches all of
    them (round-9 review).  ``block_align`` overrides the PCM-derived
    default for block codecs (IMA ADPCM)."""
    block = block_align if block_align else max(1, channels * bits // 8)
    fmt = (
        b"fmt " + (16).to_bytes(4, "little")
        + tag.to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    body = b"WAVE" + fmt + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def g711_compress(samples16, law: str) -> bytes:
    """Vectorized G.711 compressor for corpus synthesis: int16-scale
    linear samples → companded bytes.  ``law`` is "ulaw" (tag 7,
    complemented sign-magnitude) or "alaw" (tag 6, XOR 0x55, sign bit
    set = positive).  Segment search via the integer log2 of the
    (biased) magnitude — the encode half of the expansions
    multimodal.decode_wav_samples implements."""
    import numpy as np

    x = np.asarray(samples16, dtype=np.int64)

    def bitlen(v):  # exact integer bit_length via frexp (v < 2^53)
        return np.frexp(np.maximum(v, 1).astype(np.float64))[1].astype(np.int64)

    if law == "ulaw":
        neg = x < 0
        mag = np.minimum(np.abs(x), 32635) + 0x84
        e = np.minimum(bitlen(mag) - 8, 7)  # mag >= 0x84: bitlen >= 8
        m = (mag >> (e + 3)) & 0x0F
        return (
            (~(np.where(neg, 0x80, 0) | (e << 4) | m)) & 0xFF
        ).astype(np.uint8).tobytes()
    if law == "alaw":
        pos = x >= 0
        mag = np.minimum(np.abs(x), 0x7FFF)
        big = mag >= 256
        e = np.minimum(bitlen(mag) - 8, 7)
        a = np.where(big, (e << 4) | ((mag >> (np.maximum(e, 1) + 3)) & 0x0F),
                     mag >> 4)
        return ((np.where(pos, 0x80, 0) | a) ^ 0x55).astype(np.uint8).tobytes()
    raise ValueError(f"unknown companding law: {law}")


def ima_adpcm_compress(samples16, spb: int = 505) -> tuple[bytes, int]:
    """IMA ADPCM encoder for corpus synthesis: int16-scale mono
    samples → ``(block_bytes, block_align)``.  Full blocks of ``spb``
    samples (odd, so nibbles pair up): the first sample goes verbatim
    into the 4-byte header, the step index persists across blocks, a
    trailing partial block is dropped.  Shares the spec step tables
    with the decoder; INDEPENDENCE of the parity evidence comes from
    the test-side encoder (tests/test_multimodal.py), exactly the
    make_jpeg_gray / g711_compress precedent."""
    from .multimodal import _IMA_INDEX_ADJUST, _IMA_STEPS

    if spb < 3 or spb % 2 == 0:
        raise ValueError("spb must be odd and >= 3")
    xs = [int(v) for v in samples16]
    nb = (spb - 1) // 2
    out = bytearray()
    idx = 0
    for base in range(0, len(xs) - spb + 1, spb):
        pred = xs[base]
        out += pred.to_bytes(2, "little", signed=True) + bytes([idx, 0])
        nibs = []
        for s in xs[base + 1 : base + spb]:
            step = _IMA_STEPS[idx]
            delta = s - pred
            nib = 8 if delta < 0 else 0
            if delta < 0:
                delta = -delta
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            diff = step >> 3
            if nib & 4:
                diff += step
            if nib & 2:
                diff += step >> 1
            if nib & 1:
                diff += step >> 2
            pred += -diff if nib & 8 else diff
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + _IMA_INDEX_ADJUST[nib & 7]))
            nibs.append(nib)
        out += bytes(
            nibs[i] | (nibs[i + 1] << 4) for i in range(0, nb * 2, 2)
        )
    return bytes(out), 4 + nb


def make_mp4_mjpeg(frames, width: int, height: int, *,
                   samples_per_chunk: int = 2, co64: bool = False,
                   timescale: int = 1000, frame_duration: int = 40) -> bytes:
    """Minimal VALID ISO-BMFF muxer for corpus synthesis: a list of
    self-contained JPEG streams → one MP4 with a single 'vide' track
    whose stsd entry is the QuickTime 'jpeg' codec.  The sample table
    is REAL — stsc packs ``samples_per_chunk`` samples per chunk (a
    trailing short chunk gets its own run, so the decoder's run
    expansion is exercised, not just the 1-sample-per-chunk trivial
    case) and chunk offsets are absolute stco (or co64) positions
    into the mdat that precedes moov.  Independence of the parity
    evidence stays with the test-side walk (tests/test_multimodal.py)
    — this only has to PRODUCE spec-valid files, the make_jpeg_gray /
    g711_compress precedent."""
    frames = [bytes(f) for f in frames]
    if not frames or samples_per_chunk < 1:
        raise ValueError("need >= 1 frame and a positive chunk packing")

    def box(cc: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + cc + body

    def full(cc: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
        return box(cc, bytes([version]) + flags.to_bytes(3, "big") + body)

    ftyp = box(b"ftyp", b"isom" + (512).to_bytes(4, "big") + b"isomiso2")
    mdat_payload = b"".join(frames)
    # mdat follows ftyp directly; its body starts 8 bytes into the box
    mdat_body_at = len(ftyp) + 8
    n = len(frames)

    chunks = [frames[i : i + samples_per_chunk]
              for i in range(0, n, samples_per_chunk)]
    offsets, pos = [], mdat_body_at
    for c in chunks:
        offsets.append(pos)
        pos += sum(len(f) for f in c)
    runs = []
    if len(chunks) > 1:
        runs.append((1, samples_per_chunk, 1))
    if len(chunks) == 1 or len(chunks[-1]) != samples_per_chunk:
        runs.append((len(chunks), len(chunks[-1]), 1))

    entry = (  # VisualSampleEntry, 78 bytes after the 8-byte box header
        bytes(6) + (1).to_bytes(2, "big")            # data_reference_index
        + bytes(16)                                   # pre_defined/reserved
        + width.to_bytes(2, "big") + height.to_bytes(2, "big")
        + (0x00480000).to_bytes(4, "big") * 2         # 72 dpi h/v
        + bytes(4) + (1).to_bytes(2, "big")           # frame_count
        + bytes(32)                                   # compressorname
        + (24).to_bytes(2, "big") + b"\xff\xff"       # depth, pre_defined -1
    )
    stsd = full(b"stsd", (1).to_bytes(4, "big") + box(b"jpeg", entry))
    stts = full(b"stts", (1).to_bytes(4, "big")
                + n.to_bytes(4, "big") + frame_duration.to_bytes(4, "big"))
    stsc = full(b"stsc", len(runs).to_bytes(4, "big")
                + b"".join(b"".join(v.to_bytes(4, "big") for v in r)
                           for r in runs))
    stsz = full(b"stsz", bytes(4) + n.to_bytes(4, "big")
                + b"".join(len(f).to_bytes(4, "big") for f in frames))
    osize = 8 if co64 else 4
    stco = full(b"co64" if co64 else b"stco",
                len(offsets).to_bytes(4, "big")
                + b"".join(o.to_bytes(osize, "big") for o in offsets))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)

    dinf = box(b"dinf", full(b"dref", (1).to_bytes(4, "big")
                             + full(b"url ", b"", flags=1)))
    minf = box(b"minf", full(b"vmhd", bytes(8), flags=1) + dinf + stbl)
    hdlr = full(b"hdlr", bytes(4) + b"vide" + bytes(12) + b"\x00")
    duration = n * frame_duration
    mdhd = full(b"mdhd", bytes(8) + timescale.to_bytes(4, "big")
                + duration.to_bytes(4, "big")
                + (0x55C4).to_bytes(2, "big") + bytes(2))
    mdia = box(b"mdia", mdhd + hdlr + minf)
    matrix = b"".join(v.to_bytes(4, "big")
                      for v in (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000))
    tkhd = full(b"tkhd", bytes(8) + (1).to_bytes(4, "big") + bytes(4)
                + duration.to_bytes(4, "big") + bytes(16) + matrix
                + (width << 16).to_bytes(4, "big")
                + (height << 16).to_bytes(4, "big"), flags=7)
    mvhd = full(b"mvhd", bytes(8) + timescale.to_bytes(4, "big")
                + duration.to_bytes(4, "big") + (0x10000).to_bytes(4, "big")
                + (0x0100).to_bytes(2, "big") + bytes(10) + matrix
                + bytes(24) + (2).to_bytes(4, "big"))
    moov = box(b"moov", mvhd + box(b"trak", tkhd + mdia))
    return ftyp + box(b"mdat", mdat_payload) + moov


# ---------------------------------------------------------------------------
# Polymorphic UDTF (Spark 4 `analyze`): output schema computed from the
# call's CONSTANT arguments at plan time.
# ---------------------------------------------------------------------------


def _token_windows_udtf():
    """Build the TokenWindows UDTF class (deferred so importing this
    module never requires a SparkSession).

    ``token_windows(text, n)`` emits every n-token sliding window as a
    row with n TYPED COLUMNS t1..tn — the schema is derived from the
    constant ``n`` by the static ``analyze`` hook, so one function
    serves every window width with full column typing (the dynamic-
    schema half of the UDTF tier; png_chunks above is the fixed-schema
    half).  The n-column layout is the feature-ready form of
    chunk_documents' string chunks: each window position is its own
    column, directly usable as model inputs."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class TokenWindows:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if n.value is None or int(n.value) < 1:
                raise ValueError("token_windows: n must be a constant >= 1")
            schema = StructType()
            for i in range(int(n.value)):
                schema = schema.add(f"t{i + 1}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, text, n):
            toks = (text or "").split()
            for i in range(len(toks) - n + 1):
                yield tuple(toks[i : i + n])

    return TokenWindows


def register_token_windows(spark) -> None:
    """Register ``token_windows`` as a SQL table function."""
    spark.udtf.register("token_windows", _token_windows_udtf())


class _FlacBitWriter:
    """MSB-first bit accumulator for FLAC frame synthesis."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _flac_utf8_encode(n: int) -> bytes:
    """The frame-number coding of the FLAC frame header (UTF-8-style,
    extended to 7 bytes)."""
    if n < 0x80:
        return bytes([n])
    for extra in range(1, 7):
        if n < 1 << (extra * 6 + (6 - extra)):
            head = (0xFF << (7 - extra)) & 0xFF | (n >> (extra * 6))
            return bytes(
                [head]
                + [
                    0x80 | ((n >> (6 * (extra - 1 - i))) & 0x3F)
                    for i in range(extra)
                ]
            )
    raise ValueError("frame number too large")


def flac_encode(
    samples_by_ch,
    rate: int = 8000,
    bps: int = 16,
    blocksize: int = 4096,
) -> bytes:
    """Native-FLAC encoder for corpus synthesis: per-channel integer
    samples → a spec-conformant stream (STREAMINFO with the decoded-
    stream md5, fixed-blocking frames with correct CRC-8/CRC-16,
    independent channels, FIXED order-2 subframes — order 0 for short
    blocks — rice method 0 at partition order 0).  The DECODER
    (multimodal.decode_flac_samples) handles the full subframe
    surface; this encoder emits the simple subset corpus synthesis
    needs, and INDEPENDENCE of the parity evidence comes from the
    test-side encoder exercising the wider surface
    (tests/test_multimodal.py), exactly the ima_adpcm_compress
    precedent."""
    import hashlib

    from .multimodal import _flac_crc8, _flac_crc16

    chans = [[int(v) for v in ch] for ch in samples_by_ch]
    nch = len(chans)
    n = len(chans[0])
    if nch < 1 or nch > 8 or n == 0 or any(len(c) != n for c in chans):
        raise ValueError("flac_encode: 1-8 equal-length channels required")
    if bps not in (8, 16, 24):
        raise ValueError("flac_encode: bps must be 8, 16, or 24")
    if blocksize < 16:
        # RFC 9639: block sizes under 16 are invalid except for the
        # stream's LAST block — a fixed encoder parameter under 16
        # would make every frame non-conformant
        raise ValueError("flac_encode: blocksize must be >= 16")
    lim = 1 << (bps - 1)
    if any(v < -lim or v >= lim for c in chans for v in c):
        raise ValueError("flac_encode: sample exceeds bps range")

    md5 = hashlib.md5()
    step = bps // 8
    for i in range(n):
        for c in chans:
            md5.update(c[i].to_bytes(step, "little", signed=True))

    frames = bytearray()
    for fi, base in enumerate(range(0, n, blocksize)):
        bs = min(blocksize, n - base)
        w = _FlacBitWriter()
        w.write(0x3FFE, 14)  # sync
        w.write(0, 1)        # reserved
        w.write(0, 1)        # fixed blocking strategy
        w.write(7, 4)        # blocksize: 16-bit at header end
        w.write(0, 4)        # sample rate: from STREAMINFO
        w.write(nch - 1, 4)  # independent channels
        w.write({8: 1, 16: 4, 24: 6}[bps], 3)
        w.write(0, 1)        # reserved
        for byte in _flac_utf8_encode(fi):
            w.write(byte, 8)
        w.write(bs - 1, 16)
        hdr = bytes(w.buf)
        w.write(_flac_crc8(hdr), 8)
        for ch in chans:
            blk = ch[base : base + bs]
            order = 2 if bs > 4 else 0
            w.write(0, 1)
            w.write(8 + order, 6)  # FIXED subframe
            w.write(0, 1)          # no wasted bits
            for v in blk[:order]:
                w.write(v, bps)
            if order:
                res = [
                    blk[i] - (2 * blk[i - 1] - blk[i - 2])
                    for i in range(order, bs)
                ]
            else:
                res = blk
            w.write(0, 2)  # rice method 0
            w.write(0, 4)  # partition order 0
            mean = sum(2 * abs(r) for r in res) // max(len(res), 1)
            param = min(max(mean, 1).bit_length() - 1, 14)
            w.write(param, 4)
            for r in res:
                u = (r << 1) if r >= 0 else (-r << 1) - 1
                q = u >> param
                w.write(1, q + 1)  # q zeros then the terminating 1
                w.write(u, param)
        w.align()
        body = bytes(w.buf)
        frames += body + _flac_crc16(body).to_bytes(2, "big")

    si = bytearray()
    # Fixed-blocking stream: min == max == the encoder blocksize (RFC
    # 9639 excludes the stream's short LAST block from min/max — equal
    # values are what SIGNALS the fixed-blocksize strategy).
    si += blocksize.to_bytes(2, "big")
    si += blocksize.to_bytes(2, "big")
    si += (0).to_bytes(3, "big") + (0).to_bytes(3, "big")  # framesize unknown
    si += bytes(
        [
            (rate >> 12) & 0xFF,
            (rate >> 4) & 0xFF,
            ((rate & 0x0F) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4),
            (((bps - 1) & 0x0F) << 4) | ((n >> 32) & 0x0F),
        ]
    )
    si += (n & 0xFFFFFFFF).to_bytes(4, "big")
    si += md5.digest()
    header = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)
    return header + bytes(frames)
