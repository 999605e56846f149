package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Gif

class GifSpec extends AnyFunSuite {

  test("indexed round-trip is bit-exact across sizes and palette widths") {
    val rng = new scala.util.Random(13)
    Seq((1, 1, 2), (5, 3, 4), (16, 16, 16), (40, 25, 256), (300, 7, 256)).foreach {
      case (w, h, nc) =>
        val palette = Array.tabulate(nc)(_ => rng.nextInt(1 << 24))
        val idx = Array.fill(w * h)(rng.nextInt(nc))
        val img = Gif.decode(Gif.encodeIndexed(idx, w, h, palette))
        assert(img.width == w && img.height == h)
        assert(img.pixels.sameElements(idx.map(palette)), s"${w}x$h/$nc")
    }
  }

  test("long repetitive runs exercise dictionary growth and the 4096 reset") {
    // 100x100 of a 4-symbol repeating texture → dictionary passes several
    // code-width bumps; then a noisy tail defeats reuse to push toward reset
    val rng = new scala.util.Random(29)
    val w = 128; val h = 128
    val idx = Array.tabulate(w * h)(i => if (i < w * h / 2) (i / 3) % 4 else rng.nextInt(16))
    val palette = Array.tabulate(16)(c => c * 0x111111)
    val img = Gif.decode(Gif.encodeIndexed(idx, w, h, palette))
    assert(img.pixels.sameElements(idx.map(palette)))
  }

  test("decoder reads the JDK ImageIO GIF encoder's output") {
    val (w, h) = (23, 14)
    val cmap = Array.tabulate(8)(c => ((c * 36) << 16) | ((255 - c * 30) << 8) | (c * 13))
    val icm = new java.awt.image.IndexColorModel(8, 8,
      cmap.map(c => ((c >> 16) & 0xff).toByte),
      cmap.map(c => ((c >> 8) & 0xff).toByte),
      cmap.map(c => (c & 0xff).toByte))
    val buf = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    (0 until h).foreach(y => (0 until w).foreach(x =>
      buf.getRaster.setSample(x, y, 0, (x * 5 + y * 3) % 8)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(buf, "gif", bos))
    val img = Gif.decode(bos.toByteArray)
    assert(img.width == w && img.height == h)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        assert(img.pixels(y * w + x) == cmap((x * 5 + y * 3) % 8), s"pixel ($x,$y)")
      }
    }
  }

  test("JDK ImageIO decodes our encoder's output") {
    val (w, h) = (17, 9)
    val rng = new scala.util.Random(31)
    val palette = Array.tabulate(32)(_ => rng.nextInt(1 << 24))
    val idx = Array.fill(w * h)(rng.nextInt(32))
    val bytes = Gif.encodeIndexed(idx, w, h, palette)
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(ref != null, "ImageIO rejected our GIF stream")
    assert(ref.getWidth == w && ref.getHeight == h)
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        assert((ref.getRGB(x, y) & 0xffffff) == palette(idx(y * w + x)), s"pixel ($x,$y)")
      }
    }
  }

  test("fixture features match the closed form") {
    (0L until 20L).foreach { id =>
      val f = Gif.decodeFeatures(Gif.gifFixture(id))
      val w = (6 + id % 5).toInt; val h = (3 + id % 4).toInt
      assert(f.width == w && f.height == h)
      var sr = 0L; var sg = 0L; var sb = 0L
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val c = ((x * 3 + y * 5 + id) % 16).toInt
          sr += (c * 17 + id) % 256; sg += (c * 29 + 2 * id) % 256; sb += (c * 43 + 3 * id) % 256
        }
      }
      assert(f.meanR == sr.toDouble / (w * h), s"id=$id")
      assert(f.meanG == sg.toDouble / (w * h))
      assert(f.meanB == sb.toDouble / (w * h))
    }
  }

  test("corrupt streams are rejected loudly") {
    intercept[IllegalArgumentException](Gif.decode(Array[Byte](1, 2, 3, 4)))
    intercept[IllegalArgumentException](
      Gif.decode("GIF89a".getBytes("US-ASCII") ++ Array.fill[Byte](10)(0)))
  }
}
