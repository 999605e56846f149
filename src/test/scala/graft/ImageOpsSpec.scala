package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{ImageOps, Png}

class ImageOpsSpec extends AnyFunSuite {

  test("identity resize returns the same pixels") {
    val rng = new scala.util.Random(2)
    val (w, h) = (7, 5)
    val px = Array.fill(w * h)(rng.nextInt(1 << 24))
    assert(ImageOps.resizeBilinear(px, w, h, w, h).sameElements(px))
  }

  test("constant image stays constant at any size") {
    val px = Array.fill(6 * 4)(0xa1b2c3)
    Seq((1, 1), (3, 3), (12, 8)).foreach { case (w2, h2) =>
      assert(ImageOps.resizeBilinear(px, 6, 4, w2, h2).forall(_ == 0xa1b2c3))
    }
  }

  test("2x downscale of a 2x2 checker averages the corners") {
    // 2x2 → 1x1 with half-pixel centers samples the exact middle:
    // equal 1/4 weights on all four pixels
    val px = Array(0xff0000, 0x00ff00, 0x0000ff, 0x000000)
    val out = ImageOps.resizeBilinear(px, 2, 2, 1, 1)
    // r = floor(255/4 + .5) = 64, g likewise, b likewise
    assert(out(0) == (64 << 16 | 64 << 8 | 64))
  }

  test("horizontal gradient upscale interpolates monotonically") {
    val px = Array.tabulate(4)(x => (x * 60) << 16) // r = 0,60,120,180
    val out = ImageOps.resizeBilinear(px, 4, 1, 8, 1).map(p => (p >>> 16) & 0xff)
    assert(out.zip(out.tail).forall { case (a, b) => a <= b }, out.mkString(","))
    assert(out.head == 0 && out.last == 180) // edge clamp keeps extremes
  }

  test("grayscale matches the BT.601 integer formula") {
    val px = Array(0xffffff, 0x000000, 0xff0000, 0x00ff00, 0x0000ff, 0x123456)
    val g = ImageOps.grayscale(px)
    assert(g(0) == 255 && g(1) == 0)
    assert(g(2) == (299 * 255 + 500) / 1000)
    assert(g(3) == (587 * 255 + 500) / 1000)
    assert(g(4) == (114 * 255 + 500) / 1000)
    assert(g(5) == (299 * 0x12 + 587 * 0x34 + 114 * 0x56 + 500) / 1000)
  }

  test("channelStats reproduces direct mean/std") {
    val rng = new scala.util.Random(8)
    val px = Array.fill(100)(rng.nextInt(1 << 24))
    val (mean, std) = ImageOps.channelStats(px)
    val rs = px.map(p => ((p >>> 16) & 0xff).toDouble)
    val rMean = rs.sum / rs.length
    val rStd = math.sqrt(rs.map(v => (v - rMean) * (v - rMean)).sum / rs.length)
    assert(math.abs(mean(0) - rMean) < 1e-9)
    assert(math.abs(std(0) - rStd) < 1e-9)
  }

  test("resize composes with the PNG decoder on the fixture") {
    val img = Png.decode(Png.pngFixture(7L))
    val out = ImageOps.resizeBilinear(img.pixels, img.width, img.height, 4, 4)
    assert(out.length == 16)
    assert(out.forall(p => (p & 0xffffff) == p))
  }
}
