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
