package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Jpeg

class JpegSpec extends AnyFunSuite {

  test("per-block-constant grayscale round-trips bit-exactly (DC-only + flat quant)") {
    (0L until 12L).foreach { id =>
      val bytes = Jpeg.jpegFixture(id)
      val img = Jpeg.decode(bytes)
      val w = 8 * (2 + id % 3).toInt
      val h = 8 * (1 + id % 2).toInt
      assert(img.width == w && img.height == h && img.nComponents == 1)
      var i = 0
      while (i < w * h) {
        val bx = (i % w) / 8
        val by = (i / w) / 8
        val want = ((bx * 31 + by * 17 + 5 * id) % 256).toInt
        assert(img.planes(0)(i) == want,
          s"id=$id pixel $i: got ${img.planes(0)(i)}, want $want")
        i += 1
      }
    }
  }

  test("arbitrary grayscale round-trips within IDCT rounding at flat quant") {
    val rng = new scala.util.Random(7)
    val (w, h) = (23, 17) // partial edge blocks on both axes
    val px = Array.fill(w * h)(rng.nextInt(256))
    val img = Jpeg.decode(Jpeg.encodeGray(px, w, h))
    assert(img.width == w && img.height == h)
    val maxErr = px.indices.map(i => math.abs(img.planes(0)(i) - px(i))).max
    // quantization error at q=1 is bounded by the DCT round-off: coefficient
    // rounding injects ≤0.5 per coefficient, ≤ ~2 levels after the IDCT
    assert(maxErr <= 2, s"max per-pixel error $maxErr > 2")
  }

  test("color 4:4:4 round-trips within color-transform tolerance") {
    val rng = new scala.util.Random(11)
    val (w, h) = (20, 12)
    val px = Array.fill(w * h)(rng.nextInt(1 << 24))
    val img = Jpeg.decode(Jpeg.encodeRgb(px, w, h))
    assert(img.nComponents == 3)
    var worst = 0
    px.indices.foreach { i =>
      worst = math.max(worst, math.abs(img.planes(0)(i) - ((px(i) >> 16) & 0xff)))
      worst = math.max(worst, math.abs(img.planes(1)(i) - ((px(i) >> 8) & 0xff)))
      worst = math.max(worst, math.abs(img.planes(2)(i) - (px(i) & 0xff)))
    }
    // YCbCr forward+inverse rounding costs up to ~3 levels; q=1 adds ~2
    assert(worst <= 5, s"max channel error $worst > 5")
  }

  test("decoder is standard-conformant: reads the JDK ImageIO encoder's output") {
    // an INDEPENDENT encoder (the JDK's JPEG plugin) — real quant tables,
    // JFIF APP0 — decoded by our pure-JVM decoder. Grayscale keeps the
    // comparison exact: no chroma upsample-filter latitude, and we read
    // raw raster samples (getRGB would gamma-convert gray to sRGB).
    val (w, h) = (40, 24)
    val buf = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val wr = buf.getRaster
    (0 until h).foreach { y =>
      (0 until w).foreach { x => wr.setSample(x, y, 0, (x * 11 + y * 17 + 30) % 256) }
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(buf, "jpg", bos))
    val img = Jpeg.decode(bos.toByteArray)
    assert(img.width == w && img.height == h && img.nComponents == 1)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    val rr = ref.getRaster
    var sumAbs = 0L
    var worst = 0
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val d = math.abs(rr.getSample(x, y, 0) - img.planes(0)(y * w + x))
        sumAbs += d; worst = math.max(worst, d)
      }
    }
    val meanAbs = sumAbs.toDouble / (w * h)
    // two decoders of the same stream: only T.81 IDCT latitude remains
    assert(meanAbs <= 1.0, s"mean |diff| vs ImageIO $meanAbs > 1.0")
    assert(worst <= 2, s"worst pixel diff vs ImageIO $worst > 2")

    // color + 4:2:0: structural conformance (dims, components, and the
    // channel MEANS agree) — per-pixel bounds are dominated by chroma
    // upsample-filter latitude (ImageIO interpolates, we use nearest)
    val cbuf = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        cbuf.setRGB(x, y, ((x * 11 + 30) % 256 << 16) | ((y * 17 + 60) % 256 << 8) | ((x * 3 + y * 5) % 256))
      }
    }
    val cbos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(cbuf, "jpg", cbos))
    val cimg = Jpeg.decode(cbos.toByteArray)
    assert(cimg.width == w && cimg.height == h && cimg.nComponents == 3)
    val cref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(cbos.toByteArray))
    (0 until 3).foreach { c =>
      val shift = Seq(16, 8, 0)(c)
      var refSum = 0L
      (0 until h).foreach(y => (0 until w).foreach(x => refSum += (cref.getRGB(x, y) >> shift) & 0xff))
      val ourMean = cimg.planes(c).sum.toDouble / (w * h)
      val refMean = refSum.toDouble / (w * h)
      assert(math.abs(ourMean - refMean) <= 2.0,
        s"channel $c mean: ours $ourMean vs ImageIO $refMean")
    }
  }

  test("encoder is standard-conformant: JDK ImageIO reads our output") {
    val rng = new scala.util.Random(13)
    val (w, h) = (17, 9)
    val px = Array.fill(w * h)(rng.nextInt(256))
    val ours = Jpeg.encodeGray(px, w, h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(ref != null, "ImageIO failed to parse our stream")
    assert(ref.getWidth == w && ref.getHeight == h)
    var worst = 0
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        // raw raster sample — getRGB gamma-converts grayscale to sRGB
        val got = ref.getRaster.getSample(x, y, 0)
        worst = math.max(worst, math.abs(got - px(y * w + x)))
      }
    }
    assert(worst <= 3, s"ImageIO decode of our stream: worst diff $worst > 3")

    val rgb = Array.fill(w * h)(rng.nextInt(1 << 24))
    val refC = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(Jpeg.encodeRgb(rgb, w, h)))
    assert(refC != null && refC.getWidth == w && refC.getHeight == h)
    var worstC = 0
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val got = refC.getRGB(x, y)
        val want = rgb(y * w + x)
        Seq(16, 8, 0).foreach { s =>
          worstC = math.max(worstC, math.abs(((got >> s) & 0xff) - ((want >> s) & 0xff)))
        }
      }
    }
    assert(worstC <= 6, s"ImageIO decode of our color stream: worst diff $worstC > 6")
  }

  test("unsupported modes fail loudly; junk is rejected") {
    val e = intercept[IllegalArgumentException] {
      Jpeg.decode(Array[Byte](1, 2, 3, 4))
    }
    assert(e.getMessage.contains("SOI"))
    // progressive: flip our SOF0 marker to SOF2
    val bytes = Jpeg.jpegFixture(1L)
    val idx = bytes.indices.drop(2).find(i =>
      (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0).get
    val prog = bytes.clone(); prog(idx + 1) = 0xc2.toByte
    val e2 = intercept[IllegalArgumentException] { Jpeg.decode(prog) }
    assert(e2.getMessage.contains("progressive"))
  }
}
