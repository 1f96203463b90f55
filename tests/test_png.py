"""Real PNG codec (stdlib zlib + unfilter) — no media library required.

The decode path must be a *true* PNG decoder for the grayscale-8 subset:
signature + per-chunk CRC validation, IHDR parsing, IDAT inflate, and
correct inversion of all five scanline filters. The distributed kernels
(png_encode_images / png_decode_images / resize_gray8) must roundtrip the
synth_image pixel source byte-exactly — that equality is what the DuckDB
hash gates on mm_decode_features / mm_resize_images rest on.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from clinical_api_etl_spark.operators.multimodal import (
    _paeth,
    _png_chunk,
    png_decode_gray8,
    png_encode_gray8,
)


def _synth_pixels(doc_id: int) -> bytes:
    return bytes.fromhex(
        "".join(hashlib.md5(f"im{c}:{doc_id}".encode()).hexdigest() for c in range(4))
    )


class TestCodec:
    @pytest.mark.parametrize("side", [1, 2, 4, 5, 8, 16, 33])
    def test_roundtrip_all_filters(self, side):
        """filters='cycle' exercises every unfilter path once side >= 5."""
        px = bytes((i * 131 + 7 * side) % 256 for i in range(side * side))
        w, h, out = png_decode_gray8(png_encode_gray8(px, side))
        assert (w, h, out) == (side, side, px)

    def test_each_filter_alone(self):
        """Force a single filter type for the whole image and decode —
        isolates each unfilter implementation (Sub/Up/Average/Paeth)."""
        side = 8
        px = bytes((i * 89 + 3) % 256 for i in range(side * side))
        for f in range(5):
            raw = bytearray()
            prev = bytes(side)
            for r in range(side):
                row = px[r * side : (r + 1) * side]
                raw.append(f)
                if f == 0:
                    raw += row
                elif f == 1:
                    raw += bytes(
                        (row[i] - (row[i - 1] if i else 0)) & 0xFF for i in range(side)
                    )
                elif f == 2:
                    raw += bytes((row[i] - prev[i]) & 0xFF for i in range(side))
                elif f == 3:
                    raw += bytes(
                        (row[i] - (((row[i - 1] if i else 0) + prev[i]) >> 1)) & 0xFF
                        for i in range(side)
                    )
                else:
                    raw += bytes(
                        (
                            row[i]
                            - _paeth(
                                row[i - 1] if i else 0, prev[i], prev[i - 1] if i else 0
                            )
                        )
                        & 0xFF
                        for i in range(side)
                    )
                prev = row
            ihdr = struct.pack(">IIBBBBB", side, side, 8, 0, 0, 0, 0)
            png = (
                b"\x89PNG\r\n\x1a\n"
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
                + _png_chunk(b"IEND", b"")
            )
            assert png_decode_gray8(png)[2] == px, f"filter {f}"

    def test_crc_validated(self):
        png = bytearray(png_encode_gray8(bytes(64), 8))
        png[20] ^= 0xFF
        with pytest.raises(ValueError, match="CRC"):
            png_decode_gray8(bytes(png))

    def test_bad_signature_and_unsupported_format(self):
        with pytest.raises(ValueError, match="signature"):
            png_decode_gray8(b"JFIF" + bytes(32))
        ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 2, 0, 0, 0)  # RGB: unsupported
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported"):
            png_decode_gray8(png)

    def test_pillow_agrees_when_available(self):
        PIL = pytest.importorskip("PIL.Image")
        import io

        px = _synth_pixels(7)
        png = png_encode_gray8(px, 8)
        img = PIL.open(io.BytesIO(png))
        assert img.size == (8, 8) and img.tobytes() == px


class TestCodecProperties:
    def test_roundtrip_property(self):
        """Hypothesis: encode→decode is identity for arbitrary pixel
        payloads and sides — the lossless contract the hash gate rests on."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=60, deadline=None)
        @given(
            side=st.integers(min_value=1, max_value=24),
            seed=st.integers(min_value=0, max_value=2**32 - 1),
        )
        def check(side, seed):
            import random

            rng = random.Random(seed)
            px = bytes(rng.randrange(256) for _ in range(side * side))
            assert png_decode_gray8(png_encode_gray8(px, side)) == (side, side, px)

        check()


class TestDistributedKernels:
    def test_encode_decode_resize_pipeline(self, spark):
        from clinical_api_etl_spark.operators.multimodal import (
            png_decode_images,
            png_encode_images,
            resize_gray8,
            synth_image,
        )

        ids = spark.range(12).withColumnRenamed("id", "doc_id")
        px = png_decode_images(png_encode_images(synth_image(ids)))
        got = {r["doc_id"]: bytes(r["pixels"]) for r in px.collect()}
        assert got == {i: _synth_pixels(i) for i in range(12)}
        rz = {
            r["doc_id"]: bytes(r["pixels"])
            for r in resize_gray8(px, side=8, new_side=4).collect()
        }
        for i in range(12):
            src = _synth_pixels(i)
            expect = bytes(src[16 * r + 2 * c] for r in range(4) for c in range(4))
            assert rz[i] == expect
