"""Image-codec cross-implementation conformance via the JDK's ImageIO
(reached through Spark's own JVM gateway — the same JVM the engine
runs on; no new dependency).

Closes the image+audio half of SURVEY §7.4 item 7: PNG/GIF/BMP/TIFF
and WAV/AIFF/AU streams produced by an INDEPENDENT public
implementation must decode pixel/sample-exactly through the
from-scratch decoders, and streams produced by OUR encoders must
decode exactly through the JDK. JPEG is lossy and the spec does not
mandate bit-exact IDCT, so the JPEG checks are decoder-AGREEMENT on
the same compressed bytes: grayscale within the ±1 IDCT envelope on
every sample, color per-pixel within ±2 under fancy_chroma (the
libjpeg triangular convention), plus box-mode block-mean agreement.
Ledgered in BENCH/CONFORMANCE.md."""

import numpy as np
import pytest


def _jvm(spark):
    return spark._jvm


def _test_rgb(w=24, h=16, seed=3):
    rng = np.random.RandomState(seed)
    # mix of smooth gradient + hard edges + noise: exercises filters,
    # predictors and runs without being pathological
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    base = ((xx * 255 // max(w - 1, 1))[..., None]
            * np.array([1, 0, 0])
            + (yy * 255 // max(h - 1, 1))[..., None]
            * np.array([0, 1, 0]))
    noise = rng.randint(0, 64, (h, w, 3))
    arr = np.clip(base + noise, 0, 255).astype(np.uint8)
    arr[h // 2:, : w // 3] = (255, 0, 255)        # flat block
    return arr


def _imageio_encode(spark, arr: np.ndarray, fmt: str) -> bytes:
    j = _jvm(spark)
    h, w = arr.shape[:2]
    img = j.java.awt.image.BufferedImage(
        w, h, j.java.awt.image.BufferedImage.TYPE_INT_RGB)
    flat = (arr[..., 0].astype(np.int64) << 16) \
        | (arr[..., 1].astype(np.int64) << 8) | arr[..., 2]
    for y in range(h):
        for x in range(w):
            img.setRGB(x, y, int(flat[y, x]))
    bos = j.java.io.ByteArrayOutputStream()
    ok = j.javax.imageio.ImageIO.write(img, fmt, bos)
    assert ok, f"ImageIO has no {fmt} writer"
    return bytes(bos.toByteArray())


def _imageio_decode(spark, data: bytes) -> np.ndarray:
    j = _jvm(spark)
    bis = j.java.io.ByteArrayInputStream(data)
    img = j.javax.imageio.ImageIO.read(bis)
    assert img is not None, "ImageIO could not decode"
    w, h = img.getWidth(), img.getHeight()
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px = img.getRGB(x, y)
            out[y, x] = ((px >> 16) & 0xFF, (px >> 8) & 0xFF,
                         px & 0xFF)
    return out


class TestReferenceEncoderStreams:
    """JDK-encoded streams through the from-scratch decoders."""

    def test_png(self, spark):
        from tika_spark.analysis.pixels import decode_png
        arr = _test_rgb()
        data = _imageio_encode(spark, arr, "png")
        got = decode_png(data)
        assert got.shape[:2] == arr.shape[:2]
        assert np.array_equal(got[..., :3], arr)

    def test_bmp(self, spark):
        from tika_spark.analysis.pixels import decode_bmp
        arr = _test_rgb(seed=5)
        data = _imageio_encode(spark, arr, "bmp")
        got = decode_bmp(data)
        assert np.array_equal(got[..., :3], arr)

    def test_gif(self, spark):
        from tika_spark.analysis.pixels import decode_gif
        # GIF is 256-color: use a paletted-friendly image (few colors)
        arr = _test_rgb(seed=7)
        arr = (arr // 64) * 64                   # <= 64 colors
        data = _imageio_encode(spark, arr, "gif")
        got = decode_gif(data)
        assert np.array_equal(got[..., :3], arr)

    def test_tiff(self, spark):
        from tika_spark.analysis.pixels import decode_tiff
        arr = _test_rgb(seed=11)
        data = _imageio_encode(spark, arr, "tiff")
        got = decode_tiff(data)
        assert np.array_equal(got[..., :3], arr)

    def test_jpeg_grayscale_decoder_agreement(self, spark):
        # single-component JPEG isolates the entropy+DCT pipeline
        # from chroma conventions: same compressed bytes through both
        # decoders must agree within the +/-1 spec-conformant-IDCT
        # envelope on EVERY sample. (Read the JDK side through the
        # raw Raster — getRGB silently converts gray through linear
        # sRGB and would skew both directions by ~40.)
        from tika_spark.analysis.jpegcodec import decode_jpeg
        j = _jvm(spark)
        g = _test_rgb(32, 32, seed=13)[..., 1]
        img = j.java.awt.image.BufferedImage(
            32, 32, j.java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        for y in range(32):
            for x in range(32):
                v = int(g[y, x])
                img.setRGB(x, y, (v << 16) | (v << 8) | v)
        bos = j.java.io.ByteArrayOutputStream()
        assert j.javax.imageio.ImageIO.write(img, "jpg", bos)
        data = bytes(bos.toByteArray())
        ours = decode_jpeg(data).astype(np.int32)[..., 0]
        bis = j.java.io.ByteArrayInputStream(data)
        rimg = j.javax.imageio.ImageIO.read(bis)
        raster = rimg.getRaster()
        ref = np.empty((32, 32), np.int32)
        for y in range(32):
            for x in range(32):
                ref[y, x] = raster.getSample(x, y, 0)
        diff = np.abs(ours - ref)
        assert diff.max() <= 1
        assert float(diff.mean()) < 0.1

    def test_jpeg_color_fancy_perpixel_agreement(self, spark):
        # with fancy_chroma=True our decoder uses the same triangular
        # upsampling convention as libjpeg-derived decoders (incl. the
        # JDK) — per-pixel agreement within the +/-2 envelope on the
        # HARD-EDGE image where box mode legitimately differs by 100+
        from tika_spark.analysis.jpegcodec import decode_jpeg
        arr = _test_rgb(32, 32, seed=13)
        data = _imageio_encode(spark, arr, "jpg")
        ours = decode_jpeg(data, fancy_chroma=True).astype(np.int32)
        ref = _imageio_decode(spark, data).astype(np.int32)
        diff = np.abs(ours - ref)
        assert diff.max() <= 3
        assert float((diff <= 2).mean()) >= 0.999
        assert float(diff.mean()) < 0.6

    def test_jpeg_color_decoder_agreement_block_means(self, spark):
        # color 4:2:0 decodes differ by chroma-upsampling CONVENTION
        # (ours is box replication = libjpeg's -nosmooth mode; the
        # JDK uses triangular "fancy" upsampling), so per-pixel
        # equality is not a spec requirement. 2x2 block means cancel
        # the upsampling phase: both decoders must agree there.
        from tika_spark.analysis.jpegcodec import decode_jpeg
        # smooth chroma field: at hard color edges the two upsampling
        # conventions legitimately differ even in block means (the
        # triangular filter smooths across 2x2 boundaries), so the
        # cross-check uses gradients — which still exercise the full
        # YCbCr 4:2:0 color path end-to-end
        xx, yy = np.meshgrid(np.arange(32), np.arange(32))
        arr = np.stack([(xx * 8) % 256, (yy * 8) % 256,
                        ((xx + yy) * 4) % 256], axis=-1) \
            .astype(np.uint8)
        data = _imageio_encode(spark, arr, "jpg")
        ours = decode_jpeg(data).astype(np.float64)
        ref = _imageio_decode(spark, data).astype(np.float64)
        assert ours.shape == ref.shape
        po = ours.reshape(16, 2, 16, 2, 3).mean((1, 3))
        pr = ref.reshape(16, 2, 16, 2, 3).mean((1, 3))
        diff = np.abs(po - pr)
        assert float((diff <= 3).mean()) >= 0.98, \
            f"block-mean agreement {float((diff <= 3).mean()):.3f}"
        assert float(diff.mean()) < 1.5


class TestOwnEncoderStreams:
    """Our encoders through the JDK decoder (the reverse direction)."""

    def test_png_bytes(self, spark):
        from tika_spark.analysis.pixels import png_bytes
        arr = _test_rgb(seed=17)
        got = _imageio_decode(spark, png_bytes(arr))
        assert np.array_equal(got, arr)

    def test_gif_bytes(self, spark):
        from tika_spark.analysis.pixels import gif_bytes
        rng = np.random.RandomState(19)
        palette = rng.randint(0, 256, (64, 3)).astype(np.uint8)
        indices = rng.randint(0, 64, (16, 24)).astype(np.uint8)
        got = _imageio_decode(spark, gif_bytes(indices, palette))
        assert np.array_equal(got, palette[indices])

    def test_tiff_bytes(self, spark):
        from tika_spark.analysis.pixels import tiff_bytes
        arr = _test_rgb(seed=23)
        for compression in (1, 5, 32773):     # none / LZW / PackBits
            got = _imageio_decode(spark,
                                  tiff_bytes(arr,
                                             compression=compression))
            assert np.array_equal(got, arr), compression

    def test_jpeg_encoder_through_imageio(self, spark):
        # our baseline JPEG encoder's streams must be readable by the
        # reference decoder and land near the source (lossy: loose
        # bound, the point is stream VALIDITY + approximate fidelity)
        from tika_spark.analysis.jpegcodec import jpeg_bytes
        arr = _test_rgb(32, 32, seed=29)
        try:
            data = jpeg_bytes(arr)
        except ImportError:
            pytest.skip("no fixture JPEG encoder in this build")
        got = _imageio_decode(spark, data).astype(np.int32)
        err = np.abs(got - arr.astype(np.int32)).mean()
        assert err < 24, f"mean abs error {err:.1f}"


class TestAudioConformance:
    """Audio container conformance via javax.sound (JDK AudioSystem):
    PCM written by the independent implementation must decode
    sample-exactly through the from-scratch WAV/AIFF/AU readers, and
    our writers' output must read back sample-exactly through the
    JDK. Pure lossless-container checks — sample values round-trip
    bit-exactly or the parser is wrong."""

    def _pcm16(self, n=800, rate=8000, seed=31):
        rng = np.random.RandomState(seed)
        t = np.arange(n)
        sig = (8000 * np.sin(2 * np.pi * 440 * t / rate)
               + rng.randint(-500, 500, n)).astype(np.int16)
        return sig, rate

    def _jdk_write(self, spark, samples, rate, filetype, big_endian):
        j = _jvm(spark)
        fmt = j.javax.sound.sampled.AudioFormat(
            float(rate), 16, 1, True, big_endian)
        raw = samples.astype(">i2" if big_endian else "<i2").tobytes()
        bis = j.java.io.ByteArrayInputStream(raw)
        ais = j.javax.sound.sampled.AudioInputStream(
            bis, fmt, len(samples))
        ft = getattr(j.javax.sound.sampled.AudioFileFormat.Type,
                     filetype)
        bos = j.java.io.ByteArrayOutputStream()
        j.javax.sound.sampled.AudioSystem.write(ais, ft, bos)
        return bytes(bos.toByteArray())

    def test_jdk_wav_through_our_reader(self, spark):
        from tika_spark.analysis.pcm import decode_wav
        sig, rate = self._pcm16()
        data = self._jdk_write(spark, sig, rate, "WAVE",
                               big_endian=False)
        got, got_rate = decode_wav(data)
        assert got_rate == rate
        assert np.array_equal(got.ravel(), sig)

    def test_jdk_aiff_through_our_reader(self, spark):
        from tika_spark.analysis.pcm import decode_aiff
        sig, rate = self._pcm16(seed=37)
        data = self._jdk_write(spark, sig, rate, "AIFF",
                               big_endian=True)
        got, got_rate = decode_aiff(data)
        assert got_rate == rate
        assert np.array_equal(got.ravel(), sig)

    def test_jdk_au_through_our_reader(self, spark):
        from tika_spark.analysis.pcm import decode_au
        sig, rate = self._pcm16(seed=41)
        data = self._jdk_write(spark, sig, rate, "AU",
                               big_endian=True)
        got, got_rate = decode_au(data)
        assert got_rate == rate
        assert np.array_equal(got.ravel(), sig)

    def _jdk_read(self, spark, data):
        j = _jvm(spark)
        bis = j.java.io.ByteArrayInputStream(data)
        ais = j.javax.sound.sampled.AudioSystem.getAudioInputStream(bis)
        fmt = ais.getFormat()
        n = int(ais.getFrameLength()) * fmt.getFrameSize()
        buf = bytearray()
        while True:
            chunk = ais.readNBytes(min(65536, max(1, n - len(buf))))
            if not chunk:
                break
            buf += chunk
            if len(buf) >= n:
                break
        dt = ">i2" if fmt.isBigEndian() else "<i2"
        arr = np.frombuffer(bytes(buf), dtype=dt)
        return arr, int(fmt.getSampleRate())

    def test_our_wav_through_jdk(self, spark):
        from tika_spark.analysis.pcm import wav_bytes
        sig, rate = self._pcm16(seed=43)
        got, got_rate = self._jdk_read(spark, wav_bytes(sig, rate))
        assert got_rate == rate
        assert np.array_equal(got.astype(np.int16), sig)

    def test_our_aiff_through_jdk(self, spark):
        from tika_spark.analysis.pcm import aiff_bytes
        sig, rate = self._pcm16(seed=47)
        got, got_rate = self._jdk_read(spark, aiff_bytes(sig, rate))
        assert got_rate == rate
        assert np.array_equal(got.astype(np.int16), sig)


class TestPngVariantStreams:
    """JDK-encoded PNG color-type variants through the from-scratch
    decoder: palette (color type 3), RGBA (6), grayscale (0) — each a
    distinct decode path. Lossless, so the check is equality against
    the SOURCE array (no JDK decode needed)."""

    def test_palette_png(self, spark):
        from tika_spark.analysis.pixels import decode_png
        j = _jvm(spark)
        img = j.java.awt.image.BufferedImage(
            20, 12, j.java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
        rng = np.random.RandomState(53)
        src = np.zeros((12, 20, 3), np.uint8)
        for y in range(12):
            for x in range(20):
                px = int(rng.randint(0, 1 << 24))
                img.setRGB(x, y, px)
                # read back what the indexed model actually stored
                stored = img.getRGB(x, y)
                src[y, x] = ((stored >> 16) & 0xFF,
                             (stored >> 8) & 0xFF, stored & 0xFF)
        bos = j.java.io.ByteArrayOutputStream()
        assert j.javax.imageio.ImageIO.write(img, "png", bos)
        got = decode_png(bytes(bos.toByteArray()))
        assert np.array_equal(got[..., :3], src)

    def test_rgba_png(self, spark):
        from tika_spark.analysis.pixels import decode_png
        j = _jvm(spark)
        rng = np.random.RandomState(59)
        h, w = 10, 14
        src = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
        img = j.java.awt.image.BufferedImage(
            w, h, j.java.awt.image.BufferedImage.TYPE_INT_ARGB)
        for y in range(h):
            for x in range(w):
                r, g, b, a = (int(v) for v in src[y, x])
                v = (a << 24) | (r << 16) | (g << 8) | b
                if v >= 1 << 31:      # py4j needs a signed int32
                    v -= 1 << 32
                img.setRGB(x, y, v)
        bos = j.java.io.ByteArrayOutputStream()
        assert j.javax.imageio.ImageIO.write(img, "png", bos)
        got = decode_png(bytes(bos.toByteArray()))
        assert got.shape[-1] == 4
        assert np.array_equal(got, src)

    def test_gray_png(self, spark):
        from tika_spark.analysis.pixels import decode_png
        j = _jvm(spark)
        rng = np.random.RandomState(61)
        h, w = 9, 13
        src = rng.randint(0, 256, (h, w)).astype(np.uint8)
        img = j.java.awt.image.BufferedImage(
            w, h, j.java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        raster = img.getRaster()
        for y in range(h):
            for x in range(w):
                raster.setSample(x, y, 0, int(src[y, x]))
        bos = j.java.io.ByteArrayOutputStream()
        assert j.javax.imageio.ImageIO.write(img, "png", bos)
        got = decode_png(bytes(bos.toByteArray()))
        gray = got[..., 0] if got.ndim == 3 else got
        assert np.array_equal(gray, src)


class TestTiffCompressionVariants:
    """JDK-encoded COMPRESSED TIFFs through the from-scratch decoder:
    LZW, PackBits, and both Deflate tag spellings (8 'ZLib'/'Adobe'
    and 32946 legacy — added round 5), each pixel-exact."""

    @pytest.mark.parametrize("ctype", ["LZW", "ZLib", "PackBits",
                                       "Deflate"])
    def test_compressed_tiff(self, spark, ctype):
        from tika_spark.analysis.pixels import decode_tiff
        j = _jvm(spark)
        arr = _test_rgb(40, 28, seed=71)
        h, w = arr.shape[:2]
        img = j.java.awt.image.BufferedImage(
            w, h, j.java.awt.image.BufferedImage.TYPE_INT_RGB)
        for y in range(h):
            for x in range(w):
                r, g, b = (int(v) for v in arr[y, x])
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
        writer = j.javax.imageio.ImageIO \
            .getImageWritersByFormatName("tiff").next()
        param = writer.getDefaultWriteParam()
        param.setCompressionMode(
            j.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionType(ctype)
        bos = j.java.io.ByteArrayOutputStream()
        ios = j.javax.imageio.ImageIO.createImageOutputStream(bos)
        writer.setOutput(ios)
        writer.write(None, j.javax.imageio.IIOImage(img, None, None),
                     param)
        ios.flush()
        got = decode_tiff(bytes(bos.toByteArray()))
        assert np.array_equal(got[..., :3], arr)

    def test_large_png(self, spark):
        from tika_spark.analysis.pixels import decode_png
        big = np.random.RandomState(5).randint(
            0, 256, (256, 384, 3)).astype(np.uint8)
        data = _imageio_encode(spark, big, "png")
        got = decode_png(data)
        assert np.array_equal(got[..., :3], big)
