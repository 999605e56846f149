package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Png

class PngSpec extends AnyFunSuite {

  test("truecolor round-trips bit-exactly (lossless)") {
    val rng = new scala.util.Random(3)
    Seq((1, 1), (7, 5), (23, 17), (64, 64)).foreach { case (w, h) =>
      val px = Array.fill(w * h)(rng.nextInt(1 << 24))
      val img = Png.decode(Png.encodeRgb(px, w, h))
      assert(img.width == w && img.height == h)
      assert(img.pixels.sameElements(px), s"pixel mismatch at ${w}x$h")
    }
  }

  test("adaptive filter selection exercises more than one filter type") {
    // a gradient image makes Sub/Up/Paeth cheaper than None on most rows
    val (w, h) = (32, 32)
    val px = Array.tabulate(w * h)(i => {
      val x = i % w; val y = i / w
      ((x * 8 % 256) << 16) | ((y * 8 % 256) << 8) | ((x + y) % 256)
    })
    val bytes = Png.encodeRgb(px, w, h)
    assert(Png.decode(bytes).pixels.sameElements(px))
    // peek at the filtered stream: inflate and collect filter bytes
    val inf = new java.util.zip.Inflater()
    // find IDAT payload (single chunk in our encoder): sig(8) IHDR(25) then IDAT
    val idatLen = ((bytes(33) & 0xff) << 24) | ((bytes(34) & 0xff) << 16) |
      ((bytes(35) & 0xff) << 8) | (bytes(36) & 0xff)
    assert(new String(bytes, 37, 4, "US-ASCII") == "IDAT")
    inf.setInput(bytes, 41, idatLen)
    val raw = new Array[Byte]((w * 3 + 1) * h)
    var got = 0
    while (got < raw.length && !inf.finished()) got += inf.inflate(raw, got, raw.length - got)
    val filters = (0 until h).map(y => raw((w * 3 + 1) * y) & 0xff).toSet
    assert(filters.size > 1, s"expected multiple filter types, got $filters")
  }

  test("decoder reads the JDK ImageIO encoder's output bit-exactly") {
    val (w, h) = (31, 19)
    val buf = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rng = new scala.util.Random(17)
    (0 until h).foreach { y =>
      (0 until w).foreach { x => buf.setRGB(x, y, rng.nextInt(1 << 24)) }
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(buf, "png", bos))
    val img = Png.decode(bos.toByteArray)
    assert(img.width == w && img.height == h)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        assert(img.pixels(y * w + x) == (buf.getRGB(x, y) & 0xffffff),
          s"pixel ($x,$y) differs from ImageIO")
      }
    }
  }

  test("JDK ImageIO decodes our encoder's output bit-exactly") {
    val (w, h) = (13, 9)
    val rng = new scala.util.Random(23)
    val px = Array.fill(w * h)(rng.nextInt(1 << 24))
    val bytes = Png.encodeRgb(px, w, h)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "ImageIO rejected our PNG stream")
    assert(ref.getWidth == w && ref.getHeight == h)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        assert((ref.getRGB(x, y) & 0xffffff) == px(y * w + x),
          s"pixel ($x,$y): ImageIO read differs")
      }
    }
  }

  test("greyscale and palette color types decode (via ImageIO-encoded streams)") {
    val (w, h) = (16, 10)
    // greyscale
    val g = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    (0 until h).foreach(y => (0 until w).foreach(x => g.getRaster.setSample(x, y, 0, (x * 13 + y * 7) % 256)))
    val gb = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(g, "png", gb))
    val gi = Png.decode(gb.toByteArray)
    assert(gi.width == w && gi.height == h)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val want = (x * 13 + y * 7) % 256
        assert(gi.pixels(y * w + x) == ((want << 16) | (want << 8) | want))
      }
    }
    // palette (indexed)
    val cmap = (0 until 4).map(i => (i * 80 << 16) | (255 - i * 60 << 8) | i * 40).toArray
    val icm = new java.awt.image.IndexColorModel(8, 4,
      cmap.map(c => ((c >> 16) & 0xff).toByte),
      cmap.map(c => ((c >> 8) & 0xff).toByte),
      cmap.map(c => (c & 0xff).toByte))
    val p = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    (0 until h).foreach(y => (0 until w).foreach(x => p.getRaster.setSample(x, y, 0, (x + y) % 4)))
    val pb = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(p, "png", pb))
    val pi = Png.decode(pb.toByteArray)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        assert(pi.pixels(y * w + x) == cmap((x + y) % 4), s"palette pixel ($x,$y)")
      }
    }
  }

  test("fixture features match the closed form") {
    (0L until 20L).foreach { id =>
      val f = Png.decodeFeatures(Png.pngFixture(id))
      val w = (5 + id % 6).toInt; val h = (4 + id % 3).toInt
      assert(f.width == w && f.height == h)
      var sr = 0L; var sg = 0L; var sb = 0L
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          sr += (x * 5 + y * 11 + 3 * id) % 256
          sg += (x * 13 + y * 3 + 5 * id) % 256
          sb += (x * 2 + y * 7 + 7 * id) % 256
        }
      }
      assert(f.meanR == sr.toDouble / (w * h))
      assert(f.meanG == sg.toDouble / (w * h))
      assert(f.meanB == sb.toDouble / (w * h))
    }
  }

  test("corrupt streams are rejected loudly") {
    intercept[IllegalArgumentException](Png.decode(Array[Byte](1, 2, 3)))
    val ok = Png.pngFixture(0L)
    val truncated = java.util.Arrays.copyOf(ok, ok.length - 20)
    intercept[Exception](Png.decode(truncated))
  }
}
